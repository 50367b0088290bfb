"""AutoAttack orchestrator: run an attack cascade over still-robust examples.

Behavioral parity target: reference autoattack/autoattack.py:12-339 —
versions standard/rand/custom, the robust-flags bookkeeping (only examples
still classified correctly are attacked by later cascade stages), per-attack
robust-accuracy reporting, resumable EvaluationState, and pre-run sanity
checks. The vendored fork's `alpha` initial-step override and `use_rs` flag
(reference autopgd_base.py:122,151,296-299) are first-class arguments here, as
the CLIP evaluation scripts rely on them.

TPU-first: the reference's shrinking active set (dynamic shapes) becomes
fixed-size batches gathered from the host-side robust index list, padded by
repeating the last index so every compiled attack step sees one static shape;
padding results are discarded on the host. Attacks themselves are the
scan-based engines from robustvlm_tpu.attacks.
"""

from __future__ import annotations

import logging
import time
import zlib
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.attacks.apgd import apgd_restarts
from robustvlm_tpu.attacks.square import square_attack_linf
from robustvlm_tpu.eval import checks
from robustvlm_tpu.eval.state import EvaluationState
from robustvlm_tpu.ops.losses import ce_loss, dlr_loss, dlr_loss_targeted

log = logging.getLogger("robustvlm_tpu.autoattack")

VERSIONS = {
    # reference autoattack.py set_version :303-339
    "standard": ["apgd-ce", "apgd-t", "fab-t", "square"],
    "plus": ["apgd-ce", "apgd-dlr", "fab", "square", "apgd-t", "fab-t"],
    "rand": ["apgd-ce", "apgd-dlr"],
    "custom": None,
}


def _ce_criterion(o, yy):
    # module-level (stable identity): apgd.py's _CORE_CACHE keys on the
    # criterion object, so a per-call lambda would force a full retrace
    # and remote recompile for EVERY batch of the cascade
    return ce_loss(o, yy, reduction="none")


class AutoAttackTPU:
    def __init__(
        self,
        logits_fn: Callable[[jax.Array], jax.Array],
        *,
        norm: str = "linf",
        eps: float,
        seed: int = 0,
        version: str = "custom",
        attacks_to_run: Optional[Sequence[str]] = None,
        n_iter: int = 100,
        n_restarts: int = 1,
        n_target_classes: int = 9,
        square_n_queries: int = 5000,
        alpha: Optional[float] = None,
        use_rs: bool = True,
        use_largereps: Optional[bool] = None,
        verbose: bool = True,
        host_loop: bool = False,
        eot_iter: int = 1,
        model_rng_fn: Optional[Callable] = None,
    ):
        self.logits_fn = logits_fn
        self.norm = norm
        self.eps = eps
        self.seed = seed
        self.n_iter = n_iter
        self.n_restarts = n_restarts
        self.n_target_classes = n_target_classes
        self.square_n_queries = square_n_queries
        self.alpha = alpha
        self.use_rs = use_rs
        # the decr-eps multi-epsilon schedule is the reference default for L1
        # (autoattack.py:313-314)
        self.use_largereps = (
            (norm == "l1") if use_largereps is None else use_largereps
        )
        self.verbose = verbose
        self.host_loop = host_loop
        self.eot_iter = eot_iter
        self.model_rng_fn = model_rng_fn
        if version != "custom":
            if attacks_to_run:
                raise ValueError("attacks_to_run requires version='custom'")
            attacks_to_run = VERSIONS[version]
            # version presets override restart/target counts as the
            # reference set_version does (autoattack.py:303-339)
            if version == "standard":
                self.n_restarts = 5 if norm == "l1" else 1
                self.n_target_classes = 5 if norm == "l1" else 9
            elif version == "plus":
                self.n_restarts = 5
                self.n_target_classes = 9
            elif version == "rand":
                # EOT against randomized defenses (reference :335-338)
                self.n_restarts = 1
                self.eot_iter = max(eot_iter, 20)
        self.attacks_to_run: List[str] = list(attacks_to_run or [])
        self.version = version
        if version == "rand" and model_rng_fn is None:
            log.warning(
                "version='rand' runs EOT (eot_iter=%d) but no model_rng_fn "
                "was given — a deterministic logits_fn makes EOT a no-op; "
                "pass model_rng_fn=(lambda x, key: logits) for randomized "
                "defenses", self.eot_iter,
            )

    # ---------------------------------------------------------------- helpers
    def _predict(self, x: jax.Array, bs: int) -> np.ndarray:
        preds = []
        for i in range(0, x.shape[0], bs):
            xb = _pad_batch(x[i : i + bs], bs)
            preds.append(np.asarray(jnp.argmax(self.logits_fn(xb), -1))[: min(bs, x.shape[0] - i)])
        return np.concatenate(preds)

    def _run_attack(
        self, attack: str, xb: jax.Array, yb: jax.Array, rng: jax.Array
    ) -> jax.Array:
        """Run one cascade stage on a fixed-size batch; return candidate advs."""
        common = dict(
            eps=self.eps, n_iter=self.n_iter, norm=self.norm,
            alpha=self.alpha, use_rs=self.use_rs, host_loop=self.host_loop,
            n_restarts=self.n_restarts, use_largereps=self.use_largereps,
            eot_iter=self.eot_iter, model_rng_fn=self.model_rng_fn,
        )
        if attack == "apgd-ce":
            # restart loop (and L1 decr-eps schedule) live inside the attack
            # for every APGD variant (reference autopgd_base.py:453-582)
            res = apgd_restarts(
                self.logits_fn, xb, yb, criterion=_ce_criterion,
                rng=rng, **common,
            )
            return res.x_best_adv
        if attack == "apgd-dlr":
            res = apgd_restarts(
                self.logits_fn, xb, yb, criterion=dlr_loss,
                rng=rng, **common,
            )
            return res.x_best_adv
        if attack == "apgd-t":
            # cycle over the 2nd..(n+1)-th most likely classes
            # (reference autopgd_base.py:676-689)
            logits = self.logits_fn(xb)
            order = jnp.argsort(logits, axis=-1)
            adv = xb
            still = np.asarray(jnp.argmax(logits, -1) == yb)
            for tc in range(2, self.n_target_classes + 2):
                if not still.any():
                    break
                y_target = order[:, -tc]
                # y_target threads through as a runtime jit argument so each
                # target class (and each batch) reuses one compiled program
                res = apgd_restarts(
                    self.logits_fn, xb, yb,
                    criterion=dlr_loss_targeted,
                    criterion_args=(y_target,),
                    rng=jax.random.fold_in(rng, tc), **common,
                )
                fooled = ~np.asarray(res.acc) & still
                adv = jnp.where(
                    jnp.asarray(fooled)[:, None, None, None], res.x_best_adv, adv
                )
                still = still & ~fooled
            return adv
        if attack in ("fab", "fab-t"):
            from robustvlm_tpu.attacks.fab import fab_attack

            res = fab_attack(
                self.logits_fn, xb, yb, norm=self.norm, n_iter=self.n_iter,
                n_restarts=self.n_restarts, eps=self.eps,
                targeted=attack == "fab-t",
                n_target_classes=self.n_target_classes, rng=rng,
            )
            return res.x_adv
        if attack == "square":
            if self.norm == "linf":
                res = square_attack_linf(
                    self.logits_fn, xb, yb, eps=self.eps,
                    n_queries=self.square_n_queries, rng=rng,
                )
            elif self.norm == "l2":
                from robustvlm_tpu.attacks.square import square_attack_l2

                res = square_attack_l2(
                    self.logits_fn, xb, yb, eps=self.eps,
                    n_queries=self.square_n_queries, rng=rng,
                )
            elif self.norm == "l1":
                from robustvlm_tpu.attacks.square import square_attack_l1

                res = square_attack_l1(
                    self.logits_fn, xb, yb, eps=self.eps,
                    n_queries=self.square_n_queries, rng=rng,
                )
            else:
                raise NotImplementedError(f"square attack: norm {self.norm}")
            return res.x_adv
        raise ValueError(f"unknown attack: {attack}")

    # ------------------------------------------------------------------- main
    def run_standard_evaluation(
        self,
        x: jax.Array,
        y: jax.Array,
        bs: int = 250,
        state_path=None,
        return_labels: bool = False,
        run_checks: bool = True,
        bs_forward: Optional[int] = None,
    ):
        # bs sizes the ATTACK chunks (per-example APGD throughput on v5e
        # peaks at small batch — see bench.py); clean/adv prediction passes
        # are forward-only and batch-insensitive on-device, so they run at
        # bs_forward (default: at least 128) to amortize per-dispatch
        # latency through remote-execution backends
        bs_fwd = bs_forward or max(bs, 128)
        n = x.shape[0]
        y_np = np.asarray(y)

        if state_path is not None:
            try:
                state = EvaluationState.from_disk(state_path)
                if state.attacks_to_run != set(self.attacks_to_run):
                    raise ValueError(
                        "state file was created with a different attack set"
                    )
                if self.verbose:
                    log.info("restored state from %s", state_path)
            except FileNotFoundError:
                state = EvaluationState(set(self.attacks_to_run), path=state_path)
        else:
            state = EvaluationState(set(self.attacks_to_run))
        todo = [a for a in self.attacks_to_run if a not in state.run_attacks]

        if run_checks:
            xb = _pad_batch(x[:bs], bs)
            checks.check_randomized(self.logits_fn, xb)
            n_cls = checks.check_range_output(self.logits_fn, xb)
            checks.check_n_classes(n_cls, self.attacks_to_run, self.n_target_classes)
            checks.check_dynamic(self.logits_fn, xb)

        # clean pass
        preds = None
        if state.robust_flags is None:
            preds = self._predict(x, bs_fwd)
            robust = preds == y_np
            state.robust_flags = robust
            state.clean_accuracy = float(robust.mean())
            state.to_disk()
        robust = state.robust_flags.copy()
        racc: Dict[str, float] = {"clean": float(robust.mean())}
        if self.verbose:
            log.info("initial accuracy: %.2f%%", 100 * racc["clean"])

        x_np = np.asarray(x)
        x_adv = x_np.copy()
        # clean predictions seed y_adv; recompute only on the resume path
        # (robust_flags restored from disk, preds never computed this run)
        y_adv = preds if preds is not None else self._predict(x, bs_fwd)
        t0 = time.time()

        for attack in todo:
            idcs = np.nonzero(robust)[0]
            if idcs.size == 0:
                break
            rng = jax.random.PRNGKey(
                self.seed + zlib.crc32(attack.encode()) % (1 << 16)
            )
            for bstart in range(0, idcs.size, bs):
                batch_idx = idcs[bstart : bstart + bs]
                pad = bs - batch_idx.size
                padded_idx = np.concatenate(
                    [batch_idx, np.full(pad, batch_idx[-1])]
                ) if pad else batch_idx
                xb = jnp.asarray(x_np[padded_idx])
                yb = jnp.asarray(y_np[padded_idx])
                adv = self._run_attack(
                    attack, xb, yb, jax.random.fold_in(rng, bstart)
                )
                out = np.asarray(jnp.argmax(self.logits_fn(adv), -1))
                adv_np = np.asarray(adv)
                fooled = out != y_np[padded_idx]
                real = np.arange(batch_idx.size)  # ignore padding rows
                sel = real[fooled[: batch_idx.size]]
                robust[batch_idx[sel]] = False
                x_adv[batch_idx[sel]] = adv_np[sel]
                y_adv[batch_idx[sel]] = out[sel]
                state.robust_flags = robust
                state.to_disk()
                if self.verbose:
                    log.info(
                        "%s: batch %d, %d/%d fooled",
                        attack, bstart // bs, int(fooled[: batch_idx.size].sum()),
                        batch_idx.size,
                    )
            racc[attack] = float(robust.mean())
            state.add_run_attack(attack)
            if self.verbose:
                log.info(
                    "robust accuracy after %s: %.2f%% (%.1f s)",
                    attack.upper(), 100 * racc[attack], time.time() - t0,
                )

        checks.check_square_sr(racc)
        state.to_disk(force=True)
        self.robust_accuracy_dict = racc

        x_adv = jnp.asarray(x_adv)
        if return_labels:
            return x_adv, jnp.asarray(y_adv)
        return x_adv


def _pad_batch(xb: jax.Array, bs: int) -> jax.Array:
    """Pad a possibly-short batch to the fixed size by repeating the last row."""
    short = bs - xb.shape[0]
    if short <= 0:
        return xb
    pad = jnp.repeat(xb[-1:], short, axis=0)
    return jnp.concatenate([xb, pad], axis=0)
