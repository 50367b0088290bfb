"""AutoPGD (APGD) as a shape-static `jax.lax.scan`.

One implementation serves both reference variants:
- the training inner attack (reference train/apgd_train.py:125-373 — zero init,
  per-example adaptive step size, oscillation-triggered halving, best restore),
- the canonical AutoAttack APGD (reference autoattack/autopgd_base.py:205-451 —
  random init, ce/dlr/targeted-dlr losses, identical schedule).

Design (TPU-first):
- The step-size checkpoint schedule (counter3/k bookkeeping, reference
  apgd_train.py:150-170, 331-355) is *static*: it is unrolled at trace time into
  per-iteration (is_checkpoint, window) arrays fed to the scan as `xs`, so the
  compiled loop body has no data-dependent control flow.
- Per-example data-dependent branches (best tracking, oscillation halving,
  best-restore) are vectorized `jnp.where` — exactly the masked-index updates
  the reference performs with fancy indexing.
- The loss history needed by the oscillation check lives in the scan carry as a
  fixed (n_iter, B) buffer updated with `dynamic_update_slice`; the reference's
  window sum (check_oscillation, apgd_train.py:117-122) becomes a masked
  reduction over the buffer, including the reference's wrap-around quirk at the
  first checkpoint (torch x[-1] indexing the still-zero last row).
- The Linf elementwise update is the fused Pallas kernel
  (robustvlm_tpu.ops.pallas.attack_step); everything else is XLA-fused.
- Per-example attack state shards with the batch over the mesh data axis.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.ops.pallas.attack_step import fused_linf_apgd_step
from robustvlm_tpu.ops.projections import (
    canonical_norm,
    l0_norm,
    l1_ball_projection,
    l2_norm,
    lp_normalize,
)


# compiled attack cores, keyed on (model/criterion identities + static
# config); see the cache comment inside apgd_attack
_CORE_CACHE: dict = {}
_CORE_CACHE_MAX = 128


class APGDResult(NamedTuple):
    x_best: jax.Array      # iterate attaining the highest loss
    x_best_adv: jax.Array  # last iterate observed misclassified (or last iterate)
    loss_best: jax.Array   # (B,) best loss per example
    acc: jax.Array         # (B,) bool: still classified correctly at every step


def _checkpoint_schedule(n_iter: int, norm: str):
    """Unroll the counter3/k bookkeeping into static per-iteration arrays.

    Returns (is_ckpt[n_iter] bool, window[n_iter] int): window is the
    oscillation-check span `k` in effect at each checkpoint iteration
    (before its decrement), matching reference apgd_train.py:150-170,329-355.
    """
    if norm in ("linf", "l2"):
        k = max(int(0.22 * n_iter), 1)
        n_iter_min = max(int(0.06 * n_iter), 1)
        size_decr = max(int(0.03 * n_iter), 1)
    else:  # l1
        k = max(int(0.04 * n_iter), 1)
        n_iter_min = size_decr = 0  # k never decays for l1
    is_ckpt = np.zeros(n_iter, dtype=bool)
    window = np.zeros(n_iter, dtype=np.int32)
    counter3 = 0
    for i in range(n_iter):
        counter3 += 1
        if counter3 == k:
            is_ckpt[i] = True
            window[i] = k
            counter3 = 0
            if norm in ("linf", "l2"):
                k = max(k - size_decr, n_iter_min)
    return jnp.asarray(is_ckpt), jnp.asarray(window)


def _oscillation_count(hist: jax.Array, i: jax.Array, k: jax.Array) -> jax.Array:
    """t[b] = #{ j in (i-k, i] : hist[j] > hist[j-1 mod n_iter] }.

    The mod reproduces the reference's torch negative-index wraparound when the
    first checkpoint reads hist[-1] (a still-zero row); see
    reference apgd_train.py:117-122.
    """
    n_iter = hist.shape[0]
    prev = jnp.roll(hist, 1, axis=0)
    increased = (hist > prev).astype(jnp.float32)  # (n_iter, B)
    j = jax.lax.broadcasted_iota(jnp.int32, (n_iter, 1), 0)
    in_window = ((j > i - k) & (j <= i)).astype(jnp.float32)
    return jnp.sum(increased * in_window, axis=0)  # (B,)


def _random_init(rng, x, eps, norm):
    """Canonical APGD random start (reference autopgd_base.py:210-222)."""
    if norm == "linf":
        t = 2.0 * jax.random.uniform(rng, x.shape, x.dtype) - 1.0
        return x + eps * lp_normalize(t, "linf")
    if norm == "l2":
        t = jax.random.normal(rng, x.shape, x.dtype)
        return x + eps * lp_normalize(t, "l2")
    # l1
    t = jax.random.normal(rng, x.shape, x.dtype)
    return x + t + l1_ball_projection(x, t, eps)


def apgd_attack(
    model_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    y: Optional[jax.Array] = None,
    *,
    criterion: Callable[[jax.Array, Optional[jax.Array]], jax.Array],
    eps: float,
    n_iter: int = 100,
    norm: str = "linf",
    alpha: Optional[float] = None,
    initial_stepsize: Optional[float] = None,
    use_rs: bool = False,
    rng: Optional[jax.Array] = None,
    x_init: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    topk_init: Optional[float] = None,
    use_fused_kernel: bool = True,
    eot_iter: int = 1,
    model_rng_fn: Optional[Callable] = None,
    host_loop: bool = False,
    criterion_args: tuple = (),
    skip_last_grad: Optional[bool] = None,
) -> APGDResult:
    """Run APGD, maximizing `criterion(model_fn(x_adv), y)` per example.

    Args:
      model_fn: pure fn(x_adv in [0,1]) -> logits or embeddings; normalization
        lives inside (threat-model contract).
      x: clean images in [0,1], (B, ...).
      y: integer labels (B,) used for accuracy tracking and by the criterion;
        None disables accuracy tracking (x_best_adv then tracks the last
        iterate, the effective behavior of FARE's unsupervised inner attack).
      criterion: fn(out, y) -> (B,) per-example loss to maximize.
      eps: ball radius; n_iter: static step count; norm: linf/l2/l1.
      alpha: initial step-size multiplier (step = alpha * eps); defaults to the
        reference's 2.0 (linf/l2) / 1.0 (l1). `initial_stepsize` (absolute
        units) overrides alpha, per reference apgd_train.py:168-169.
      use_rs: canonical random start; requires rng.
      x_init: explicit warm start (ensemble chaining / decr-eps schedules).
      mask: optional gradient multiplier (VLM context-frame masking).
      topk_init: l1 sparsity init (.2 eval / .05 train, apgd_train.py:161).
    """
    norm = canonical_norm(norm)
    if norm not in ("linf", "l2", "l1"):
        raise ValueError(f"apgd: unsupported norm {norm}")
    from robustvlm_tpu.attacks._validate import check_image_range

    check_image_range(x)
    b = x.shape[0]
    n_fts = math.prod(x.shape[1:])
    track_acc = y is not None

    if alpha is None:
        alpha = 2.0 if norm in ("linf", "l2") else 1.0
    if initial_stepsize is not None:
        alpha = initial_stepsize / eps

    # --- init point
    if x_init is not None:
        x_adv = x_init
    elif use_rs:
        if rng is None:
            raise ValueError("use_rs=True requires rng")
        x_adv = _random_init(rng, x, eps, norm)
    else:
        x_adv = x
    x_adv = jnp.clip(x_adv, 0.0, 1.0)

    # --- loss/grad closure, with optional EOT averaging over stochastic
    # model passes (reference autopgd_base.py:370-390; model_rng_fn(x, key)
    # runs the randomized model — deterministic models ignore eot_iter > 1).
    # "Bound model" protocol: when model_fn exposes .pure / .bound_args
    # (see eval/classifier.make_zero_shot_classifier), the bound parameter
    # tree travels as an explicit runtime OPERAND of the compiled loop — a
    # closed-over tree becomes an HLO constant, which (a) remote-compile
    # backends reject outright (hundred-MB program uploads), (b) changes
    # the cache key every batch, and (c) measurably degrades the compiled
    # loop itself (~30% on v5e ViT-L). The same applies to x/y/mask: ALL
    # batch data rides in `inv`, the loop-invariant operand bundle.
    m_pure = getattr(model_fn, "pure", None)
    m_bound = tuple(getattr(model_fn, "bound_args", ())) if m_pure else ()

    def call_model(xa, margs):
        if m_pure is not None:
            return m_pure(*margs, xa)
        return model_fn(xa)

    def total_loss(xa, inv, key=None):
        out = call_model(xa, inv["margs"]) if model_rng_fn is None else model_rng_fn(xa, key)
        # criterion_args (e.g. apgd-t's per-example target classes) are
        # runtime operands, not baked constants — a new target set must
        # not trigger a recompile
        li = criterion(out, inv["y"] if track_acc else None, *inv["cargs"])
        return jnp.sum(li), (li, out)

    grad_fn = jax.value_and_grad(total_loss, has_aux=True)

    eot_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def eval_point(xa, inv, it=None):
        # fresh model randomness every attack iteration (reference draws new
        # noise per forward, autopgd_base.py:370-390): fold the iteration
        # index into the key; `it=None` is the pre-loop init eval
        if model_rng_fn is not None:
            k_it = (
                inv["eot_rng"] if it is None
                else jax.random.fold_in(inv["eot_rng"], it)
            )
        if eot_iter <= 1 or model_rng_fn is None:
            (_, (loss_indiv, out)), grad = grad_fn(
                xa, inv, None if model_rng_fn is None else k_it
            )
        else:
            def eot_body(carry, key):
                g_acc, l_acc = carry
                (_, (li, out_i)), g = grad_fn(xa, inv, key)
                return (g_acc + g, l_acc + li), out_i

            keys = jax.random.split(k_it, eot_iter)
            (g_sum, l_sum), outs = jax.lax.scan(
                eot_body, (jnp.zeros_like(xa), jnp.zeros((b,), jnp.float32)),
                keys,
            )
            grad = g_sum / eot_iter
            loss_indiv = l_sum / eot_iter
            out = outs[-1]
        if mask is not None:
            grad = grad * inv["mask"]
        if track_acc:
            pred_correct = jnp.argmax(out, axis=-1) == inv["y"]
        else:
            pred_correct = jnp.zeros((b,), bool)
        return loss_indiv, grad, pred_correct

    def fwd_only_eval(xa, inv):
        """Loss without the pixel gradient — the LAST iteration's gradient
        is dead (only consumed by the next step / checkpoint restore, and
        grad_best is never read after the loop), so skipping its backward
        saves one bwd per attack (~2.2x a fwd; the reference's training
        APGD makes the same final-iteration saving, apgd_train.py grad
        guard). Deterministic-model path only; EOT/stochastic models keep
        the uniform body."""
        _, (loss_indiv, out) = total_loss(xa, inv)
        if track_acc:
            pred_correct = jnp.argmax(out, axis=-1) == inv["y"]
        else:
            pred_correct = jnp.zeros((b,), bool)
        return loss_indiv, jnp.zeros_like(xa), pred_correct

    # default on for deterministic models; pass False to trade the saved
    # final backward for a smaller program (the fwd-only final iteration is
    # a TRACE-time epilogue appended after the scan — a second instantiation
    # of the model forward + bookkeeping in the same program, whose loop
    # temporaries XLA plans alongside the scan's: measurable HBM on
    # 7B-scale models; on the host-loop path it is a third compiled program)
    if skip_last_grad is None:
        skip_last_grad = eot_iter <= 1 and model_rng_fn is None
    else:
        skip_last_grad = skip_last_grad and eot_iter <= 1 and model_rng_fn is None

    # loop-invariant runtime operands (see the bound-model note above)
    inv = dict(
        x=x,
        margs=m_bound,
        cargs=tuple(criterion_args),
        eot_rng=eot_rng,
    )
    if track_acc:
        inv["y"] = y
    if mask is not None:
        inv["mask"] = mask

    if norm == "l1" and topk_init is None:
        topk_init = 0.2
    from_init = x_init is not None

    is_ckpt, window = _checkpoint_schedule(n_iter, norm)

    def init_carry(x_adv_, loss_indiv0, grad0, correct0, inv_):
        carry = dict(
            x_adv=x_adv_,
            x_adv_old=x_adv_,
            grad=grad0,
            grad_best=grad0,
            x_best=x_adv_,
            x_best_adv=x_adv_,
            loss_best=loss_indiv0,
            loss_best_last_check=loss_indiv0,
            reduced_last_check=jnp.ones((b,), x.dtype),
            step_size=jnp.full((b,), alpha * eps, x.dtype),
            acc=correct0,
            hist=jnp.zeros((n_iter, b), jnp.float32),
        )
        if norm == "l1":
            if not from_init:
                carry["topk"] = jnp.full((b,), topk_init, x.dtype)
                carry["sp_old"] = jnp.full((b,), float(n_fts), x.dtype)
            else:
                sp0 = l0_norm(x_adv_ - inv_["x"])
                carry["topk"] = (sp0 / n_fts / 1.5).astype(x.dtype)
                carry["sp_old"] = sp0.astype(x.dtype)
        return carry

    def expand(v):  # (B,) -> broadcastable over image dims
        return v.reshape(-1, *([1] * (x.ndim - 1)))

    def step_linf(c, a, x):
        return fused_linf_apgd_step(
            c["x_adv"], c["x_adv_old"], c["grad"], x, c["step_size"], eps, a,
            use_pallas=None if use_fused_kernel else False,
        )

    def step_l2(c, a, x):
        x_adv, grad = c["x_adv"], c["grad"]
        z = x_adv + expand(c["step_size"]) * lp_normalize(grad, "l2")
        d = z - x
        z = jnp.clip(
            x + lp_normalize(d, "l2") * jnp.minimum(eps, l2_norm(d, keepdims=True)),
            0.0, 1.0,
        )
        z = x_adv + (z - x_adv) * a + (x_adv - c["x_adv_old"]) * (1.0 - a)
        d = z - x
        return jnp.clip(
            x + lp_normalize(d, "l2") * jnp.minimum(eps, l2_norm(d, keepdims=True)),
            0.0, 1.0,
        )

    def step_l1(c, a, x):
        del a  # the reference l1 branch has no momentum blend
        x_adv, grad = c["x_adv"], c["grad"]
        gabs = jnp.abs(grad.reshape(b, -1))
        gsort = jnp.sort(gabs, axis=-1)  # ascending
        topk_curr = jnp.clip(
            ((1.0 - c["topk"]) * n_fts).astype(jnp.int32), 0, n_fts - 1
        )
        thr = expand(jnp.take_along_axis(gsort, topk_curr[:, None], axis=1)[:, 0])
        sparse = grad * (jnp.abs(grad) >= thr).astype(grad.dtype)
        ssign = jnp.sign(sparse)
        denom = jnp.sum(jnp.abs(ssign.reshape(b, -1)), axis=-1) + 1e-10
        z = x_adv + expand(c["step_size"]) * ssign / expand(denom)
        delta_u = z - x
        return x + delta_u + l1_ball_projection(x, delta_u, eps)

    step_fns = {"linf": step_linf, "l2": step_l2, "l1": step_l1}
    step_fn = step_fns[norm]

    def body(c, xs, inv, fwd_only=False):
        i, ck, kwin = xs["i"], xs["is_ckpt"], xs["window"]
        a = jnp.where(i > 0, 0.75, 1.0).astype(x.dtype)

        x_new = step_fn(c, a, inv["x"])
        c = dict(c, x_adv_old=c["x_adv"], x_adv=x_new)

        # `fwd_only` is a TRACE-time flag (the final-iteration epilogue):
        # the same bookkeeping with the backward skipped — no lax.cond, so
        # no duplicated branch buffers in the compiled program
        if fwd_only:
            loss_indiv, grad, pred_correct = fwd_only_eval(c["x_adv"], inv)
        else:
            loss_indiv, grad, pred_correct = eval_point(c["x_adv"], inv, i)
        acc = jnp.logical_and(c["acc"], pred_correct) if track_acc else c["acc"]
        fooled = jnp.logical_not(pred_correct)
        x_best_adv = jnp.where(expand(fooled), c["x_adv"], c["x_best_adv"])

        # best tracking (strictly-greater, reference apgd_train.py:321-327)
        improved = loss_indiv > c["loss_best"]
        imx = expand(improved)
        x_best = jnp.where(imx, c["x_adv"], c["x_best"])
        grad_best = jnp.where(imx, grad, c["grad_best"])
        loss_best = jnp.where(improved, loss_indiv, c["loss_best"])

        hist = jax.lax.dynamic_update_slice(
            c["hist"], loss_indiv.astype(jnp.float32)[None, :], (i, 0)
        )

        c = dict(
            c,
            grad=grad,
            acc=acc,
            x_best_adv=x_best_adv,
            x_best=x_best,
            grad_best=grad_best,
            loss_best=loss_best,
            hist=hist,
        )

        if norm in ("linf", "l2"):
            # oscillation check at static checkpoints
            t = _oscillation_count(hist, i, kwin)
            fl_osc = (t <= kwin.astype(jnp.float32) * 0.75).astype(x.dtype)
            fl_no_impr = (1.0 - c["reduced_last_check"]) * (
                c["loss_best_last_check"] >= loss_best
            ).astype(x.dtype)
            fl = jnp.maximum(fl_osc, fl_no_impr)
            halve = jnp.logical_and(ck, fl > 0)

            step_size = jnp.where(halve, c["step_size"] / 2.0, c["step_size"])
            x_adv2 = jnp.where(expand(halve), x_best, c["x_adv"])
            grad2 = jnp.where(expand(halve), grad_best, grad)
            reduced_last_check = jnp.where(ck, fl, c["reduced_last_check"])
            loss_best_last_check = jnp.where(
                ck, loss_best, c["loss_best_last_check"]
            )
            c = dict(
                c,
                step_size=step_size,
                x_adv=x_adv2,
                grad=grad2,
                reduced_last_check=reduced_last_check,
                loss_best_last_check=loss_best_last_check,
            )
        else:  # l1 sparsity adaptation (reference apgd_train.py:357-370)
            sp_curr = l0_norm(x_best - inv["x"]).astype(x.dtype)
            fl_red = (sp_curr / c["sp_old"]) < 0.95
            new_topk = sp_curr / n_fts / 1.5
            step_up = jnp.full_like(c["step_size"], alpha * eps)
            step_dn = c["step_size"] / 1.5
            step_size = jnp.clip(
                jnp.where(fl_red, step_up, step_dn),
                alpha * eps / 10.0,
                alpha * eps,
            )
            c = dict(
                c,
                step_size=jnp.where(ck, step_size, c["step_size"]),
                topk=jnp.where(ck, new_topk, c["topk"]),
                sp_old=jnp.where(ck, sp_curr, c["sp_old"]),
                x_adv=jnp.where(expand(jnp.logical_and(ck, fl_red)), x_best, c["x_adv"]),
                grad=jnp.where(expand(jnp.logical_and(ck, fl_red)), grad_best, grad),
            )
        return c, None

    xs = dict(
        i=jnp.arange(n_iter, dtype=jnp.int32),
        is_ckpt=is_ckpt,
        window=window,
    )

    def core(x_adv_, inv_):
        """Init eval + the whole attack scan as ONE program; inv_ entries
        are tracers here, so inner closures never bake constants. With
        skip_last_grad the scan covers iterations 0..n-2 and the final
        iteration runs as a forward-only EPILOGUE (its gradient is dead:
        only the next step / checkpoint restore would read it, and
        grad_best is never read after the loop — the reference training
        APGD makes the same saving). One backward (~2.2x a fwd) saved per
        attack: ~0.7% at 100 iters, ~3% at the 20-iter training protocol."""
        loss0, grad0, correct0 = eval_point(x_adv_, inv_)
        carry = init_carry(x_adv_, loss0, grad0, correct0, inv_)
        if skip_last_grad:
            head = jax.tree.map(lambda a: a[:-1], xs)
            carry, _ = jax.lax.scan(
                lambda c, s: body(c, s, inv_), carry, head
            )
            last = jax.tree.map(lambda a: a[-1], xs)
            carry, _ = body(carry, last, inv_, fwd_only=True)
        else:
            carry, _ = jax.lax.scan(
                lambda c, s: body(c, s, inv_), carry, xs
            )
        return carry

    # The compiled core is cached at module level keyed on everything the
    # trace bakes in (model/criterion identities + static config). Measured
    # on v5e ViT-L: the whole-attack jit with data as operands runs ~237
    # steps/s vs 180 for an eager scan closing over params (constants) and
    # 172 for an eager scan threading them through the carry — AND fresh
    # batches reuse the same executable instead of recompiling.
    cache_key = (
        m_pure if m_pure is not None else model_fn, criterion, model_rng_fn,
        norm, n_iter, float(eps), float(alpha), int(eot_iter),
        bool(use_fused_kernel), track_acc, mask is not None,
        bool(host_loop), None if topk_init is None else float(topk_init),
        from_init, x.shape, str(x.dtype), bool(skip_last_grad),
    )
    cached = _CORE_CACHE.get(cache_key)
    if cached is None:
        # Donate the attack-state operand on TPU: the scan core consumes
        # x_adv (always a fresh buffer — the eager clip above copies), and
        # each host-loop step consumes the previous carry, so XLA may
        # update the ~7 image-sized state buffers in place instead of
        # allocating a fresh set per step. CPU ignores donation with a
        # warning, so gate on backend; trajectories are identical either
        # way (donation is pure buffer aliasing).
        donate = jax.default_backend() == "tpu"
        if host_loop:
            step_donate = dict(donate_argnums=(0,)) if donate else {}
            cached = (
                jax.jit(eval_point),
                jax.jit(
                    lambda c, s, inv_: body(c, s, inv_)[0], **step_donate
                ),
                jax.jit(
                    lambda c, s, inv_: body(c, s, inv_, fwd_only=True)[0],
                    **step_donate,
                ) if skip_last_grad else None,
            )
        else:
            cached = jax.jit(core, donate_argnums=(0,) if donate else ())
        if len(_CORE_CACHE) >= _CORE_CACHE_MAX:
            _CORE_CACHE.pop(next(iter(_CORE_CACHE)))
        _CORE_CACHE[cache_key] = cached

    if host_loop:
        # identical math, driven from the host: one jitted step reused for
        # every iteration (compile cost O(1) in n_iter). Preferred on
        # backends whose compiler scales poorly with loop trip counts
        # (e.g. remote-compile PJRT plugins); the scan path minimizes
        # dispatches and stays the default. Same math as the scan, but NOT
        # bit-guaranteed: the two compiled forms may fuse/round ops
        # differently (measured ~1e-2 loss drift after 3 iters through a
        # tiny LLaVA even at matmul precision 'highest') and the attack's
        # sign() amplifies any 1-ulp difference into a distinct — equally
        # valid — APGD trajectory. tests/test_qualitative_cli.py pins one
        # configuration where the programs happen to coincide bit-exactly. Batch data + bound model args
        # travel as jit arguments, so new batches and checkpoints hit the
        # SAME compiled program.
        eval_j, step_j, final_j = cached
        loss0, grad0, correct0 = eval_j(x_adv, inv)
        carry = init_carry(x_adv, loss0, grad0, correct0, inv)
        if jax.default_backend() == "tpu" and not isinstance(
            x, jax.core.Tracer
        ):
            # step_j donates its carry argument: the initial carry may
            # alias x_adv/grad0 (and one buffer may appear in several
            # leaves — x_adv == x_best at init), so give step 0 exclusively
            # owned buffers. One-time copy, ~7 image-sized arrays.
            carry = jax.tree.map(jnp.copy, carry)
        n_full = n_iter - 1 if final_j is not None else n_iter
        for it in range(n_full):
            carry = step_j(carry, jax.tree.map(lambda a: a[it], xs), inv)
        if final_j is not None:
            carry = final_j(
                carry, jax.tree.map(lambda a: a[n_iter - 1], xs), inv
            )
    else:
        carry = cached(x_adv, inv)

    return APGDResult(
        x_best=jax.lax.stop_gradient(carry["x_best"]),
        x_best_adv=jax.lax.stop_gradient(carry["x_best_adv"]),
        loss_best=jax.lax.stop_gradient(carry["loss_best"]),
        acc=carry["acc"],
    )


def apgd_decr_eps(
    model_fn,
    x: jax.Array,
    y: Optional[jax.Array] = None,
    *,
    criterion,
    eps: float,
    n_iter: int = 100,
    norm: str = "linf",
    rng: Optional[jax.Array] = None,
    **kwargs,
) -> APGDResult:
    """Multi-epsilon APGD (reference autopgd_base.py:550-582 decr_eps_pgd):
    run the attack at [3eps, 2eps, eps] for [.3, .3, .4]*n_iter iterations,
    warm-starting each stage from the previous stage's best point projected
    into the shrinking ball. The large-ball stages explore; the final stage
    guarantees the eps ball. Used for L1 (reference AutoAttack sets
    use_largereps=True for L1, autoattack.py:313-314); Linf also supported.
    """
    norm = canonical_norm(norm)
    if norm not in ("linf", "l1"):
        raise ValueError(f"decr_eps_pgd supports linf/l1, got {norm}")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    kwargs.pop("use_rs", None)  # stages are explicitly warm-started
    kwargs.pop("x_init", None)

    epss = [3.0 * eps, 2.0 * eps, 1.0 * eps]
    iters = [math.ceil(0.3 * n_iter), math.ceil(0.3 * n_iter)]
    iters.append(n_iter - sum(iters))

    x_init = x + jax.random.normal(rng, x.shape, x.dtype)
    res = None
    for i, (e, ni) in enumerate(zip(epss, iters)):
        # project the carried init into this stage's ball (reference
        # :570-576: L1_projection / clamp-into-Linf-ball + [0,1])
        if norm == "l1":
            x_init = x_init + l1_ball_projection(x, x_init - x, e)
        else:
            x_init = jnp.clip(x_init, 0.0, 1.0)
            x_init = jnp.clip(x_init, x - e, x + e)
        res = apgd_attack(
            model_fn, x, y, criterion=criterion, eps=e, n_iter=ni,
            norm=norm, x_init=x_init, rng=jax.random.fold_in(rng, i),
            **kwargs,
        )
        x_init = res.x_best
    return res


def apgd_restarts(
    model_fn,
    x: jax.Array,
    y: Optional[jax.Array] = None,
    *,
    criterion,
    eps: float,
    n_iter: int = 100,
    norm: str = "linf",
    n_restarts: int = 1,
    use_largereps: bool = False,
    rng: Optional[jax.Array] = None,
    use_rs: bool = True,
    **kwargs,
) -> APGDResult:
    """Restart loop for EVERY APGD variant (reference APGDAttack.perturb,
    autopgd_base.py:453-548): n_restarts independent randomly-initialized
    runs. Per example, x_best_adv keeps the FIRST successful adversarial
    across restarts and x_best/loss_best track the highest-loss point
    (`best_loss=True` semantics) — both reference return modes at once.
    Shape-static: each restart attacks the full batch and already-fooled
    examples are masked out of the adversarial update (the reference's
    shrinking ind_to_fool gather, recast dense).

    use_largereps routes each restart through the decr-eps schedule
    (reference :518-521 -> decr_eps_pgd)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    ndim1 = (-1,) + (1,) * (x.ndim - 1)

    acc = None
    x_adv = x
    x_best = x
    loss_best = jnp.full((x.shape[0],), -jnp.inf, jnp.float32)

    for r in range(max(n_restarts, 1)):
        kr = jax.random.fold_in(rng, r)
        if use_largereps:
            res = apgd_decr_eps(
                model_fn, x, y, criterion=criterion, eps=eps, n_iter=n_iter,
                norm=norm, rng=kr, **kwargs,
            )
        else:
            res = apgd_attack(
                model_fn, x, y, criterion=criterion, eps=eps, n_iter=n_iter,
                norm=norm, use_rs=use_rs, rng=kr, **kwargs,
            )
        if acc is None:
            acc, x_adv = res.acc, res.x_best_adv
        else:
            newly_fooled = jnp.logical_and(acc, jnp.logical_not(res.acc))
            x_adv = jnp.where(newly_fooled.reshape(ndim1), res.x_best_adv, x_adv)
            acc = jnp.logical_and(acc, res.acc)
        improved = res.loss_best > loss_best
        x_best = jnp.where(improved.reshape(ndim1), res.x_best, x_best)
        loss_best = jnp.where(improved, res.loss_best, loss_best)

    return APGDResult(
        x_best=x_best, x_best_adv=x_adv, loss_best=loss_best, acc=acc
    )
