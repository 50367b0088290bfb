"""Real-size LLaVA-7B-shaped APGD attack-step bench, batch 1, single chip.

The only published speed datum in the reference is the targeted caption
attack on THIS workload: "APGD 10,000 iterations on LLaVA-7B fp32 takes
about 2 hours per image on an A100" (reference README.md:326-328), i.e.
~1.4 attack-steps/s. The headline bench (bench.py) proxies it with a bare
ViT-L/14 through a derived FLOP ratio; this script measures the real thing:
per-sample teacher-forced CE through the full LLaVA-1.5-7B (ViT-L/14-336
tower, 577 patch tokens -> 576 spliced embeddings, LLaMA-7B, bf16 weights,
random init — throughput is weight-value-independent) driven by the real
APGD engine, grad wrt pixels.

Memory plan for the 16 GB v5e HBM: params bf16 = 13.1 GiB resident; the
attack carries ~6 image-sized f32 buffers (1x3x336x336 = 1.3 MiB each) plus
the loss history — negligible. Backward wrt pixels with remat=True (full
per-block rematerialization, llama/model.py:255) stores only per-block
boundaries (T~640 x 4096 x 32 layers x 2B ~ 160 MiB) and recomputes inside
blocks, leaving ~2 GiB headroom for XLA workspace. Weights are initialized
leaf-by-leaf ON DEVICE (one jitted normal per distinct shape) — a host
init would materialize 26 GiB fp32 on the tunnel.

Protocol knobs: BENCH_ITERS (default 100 — steps/s is iteration-count
invariant well before that; the 10k production run uses the same compiled
step via host_loop), BENCH_HOST_LOOP=1 to measure the dispatch-bound host
loop path instead of the scan, BENCH_BATCH for the batch sweep.

Usage: python scripts/bench_llava7b.py   (needs the TPU; prints one JSON line)

Measured batch curve (v5e, round 4, host_loop, 100 iters, same session):
  batch 1: 5.187 steps/s = 5.187 example-steps/s  (3.71x A100)   fits
  batch 2: 2.601 steps/s = 5.202 example-steps/s  (3.72x A100)   fits
  batch 4: 1.231 steps/s = 4.923 example-steps/s  (3.52x A100)   fits
Unlike the bare-ViT bench (whose per-example throughput peaks at batch 8),
the 7B step saturates the chip at batch 1 — the LM's 577+59-token matmuls
are already MXU-shaped — so batching buys no throughput (and loses ~5% at
4). The production 500-image x ~8-stage x 100-iter ensemble is therefore
~21.4 h per chip regardless of stage batching; the scaling lever is
data-parallel chips (vlm_eval/ensemble.py shards by example), not batch.

Roofline close-out (v5e, round 4, measured): the step executes 24.64
analytic matmul TFLOP (attack_step_matmul_flops — an XLA-cost-analysis-
validated counter that models grad-wrt-pixels-only backwards, checkpoint-
replay dead-code elimination, and the lm_head row slice), so 5.188 steps/s
= 127.8 TF/s sustained = 91.1% of the chip's best measured matmul rate
(140.4, the ViT-shape calibration) and 95% of a serially-dependent up/down
chain at the LM mlp's own shape (134.5, measured in-session). The step is
MATMUL-BOUND on this chip; neither batching (curve above) nor kernel work
can raise it materially — the JSON's `roofline` block carries the numbers.
Round-3 note for comparison: 5.06 steps/s at batch 1 — the round-4 reading
includes the apgd state-donation change (attack state updates in place).
HBM journey, all measured: the scan-over-blocks LM relayout-copies the four
stacked (32,4096,4096) attention weights (+4.1 GiB temp -> compile OOM
17.3/15.75 GiB); Python-unrolling the stacked scan makes it WORSE
(25.4 GiB — copies remain, plus per-layer slice fusions); per-layer
UNSTACKED weights kill the copies but the monolithic attack-scan program
still plans 17.2 GiB (loop temporaries + the skip-last-grad cond's dual
branches); host_loop + skip_last_grad=False fits and runs. A 2-chip fsdp
sharding (params halved to 6.6 GiB/chip) would admit the scan path
unmodified — parallel/mesh.py's llama rules shard it; this script is
deliberately the single-chip worst case the reference's A100 number
describes.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# the reference's published number for this exact workload
A100_LLAVA7B_STEPS_PER_SEC = 1.4

# vicuna v1.5 prompt skeleton lengths (conversation.py): ~35 pre tokens
# (system + "USER: <image>\n<question> ASSISTANT:") and a ~24-token
# teacher-forced target caption
T_PRE, T_POST = 35, 24


def _init_bf16_on_device(cfg):
    """Per-leaf on-device bf16 init: one compiled kernel per distinct shape,
    no host-side 26 GiB fp32 tree, no transient fp32 copy on device.

    The LM blocks are created UNSTACKED (tuple of per-layer trees under
    'layers') from the start: (a) the stacked (32,4096,4096) weights force
    XLA to relayout-copy the whole stack to the matmuls' preferred
    transposed tiling (+4.1 GiB HLO temp -> compile OOM at 17.3/15.75 GiB),
    and (b) slicing a stacked tree after the fact transiently doubles the
    weights (runtime RESOURCE_EXHAUSTED) — so the stack must never exist."""
    from robustvlm_tpu.models.llava.model import init_llava_params

    shapes = jax.eval_shape(
        lambda k: init_llava_params(k, cfg), jax.random.PRNGKey(0)
    )

    @partial(jax.jit, static_argnums=(1,))
    def leaf(key, shape):
        return 0.02 * jax.random.normal(key, shape, jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    ctr = [0]

    def make(s, shape=None):
        ctr[0] += 1
        return leaf(jax.random.fold_in(key, ctr[0]), shape or tuple(s.shape))

    block_shapes = shapes["llama"].pop("blocks")
    params = jax.tree.map(make, shapes)
    params["layers"] = tuple(
        jax.tree.map(lambda s: make(s, tuple(s.shape[1:])), block_shapes)
        for _ in range(cfg.llama.n_layers)
    )
    return params


def _crit_targeted(o, y):
    # o is the per-sample CE on the teacher-forced target; APGD maximizes
    # the criterion, so the targeted attack maximizes -CE
    return -o


def _make_unstacked_loss(cfg, remat=True):
    """llava_per_sample_loss re-composed from the public pieces with an
    unstacked per-layer LM loop (math-identical; see
    tests/test_llama.py::test_unrolled_blocks_match_scan for the stacked
    unrolled variant and models/llava/model.py:162 for the loss tail).
    remat=False (tests only) skips both towers' per-block checkpointing so
    XLA's cost analysis has no recompute/CSE ambiguity."""
    from robustvlm_tpu.models.llama.model import _block, rms_norm, rope_freqs
    from robustvlm_tpu.models.llava.model import (
        encode_images, splice_embeddings,
    )

    lcfg = cfg.llama

    def loss_fn(p, pre, post, labels, mask, xa):
        img = encode_images(
            p, xa, cfg, compute_dtype=jnp.bfloat16, remat=remat
        )
        embeds = splice_embeddings(p, img, pre, post, cfg)
        x = embeds.astype(jnp.bfloat16)
        t = x.shape[1]
        cos, sin = rope_freqs(lcfg, jnp.arange(t))

        blk = lambda h, bp: _block(h, bp, lcfg, cos, sin, flash=False)[0]
        if remat:
            blk = jax.checkpoint(blk)
        for bp in p["layers"]:
            x = blk(x, bp)
        h = rms_norm(x, p["llama"]["norm"], lcfg.norm_eps)
        logits = (
            h @ p["llama"]["lm_head"].astype(jnp.bfloat16)
        ).astype(jnp.float32)

        t_post = post.shape[1]
        pred = logits[:, -t_post - 1 : -1]
        lp = jax.nn.log_softmax(pred, axis=-1)
        tok_lp = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
        masked = tok_lp * mask
        return -jnp.sum(masked, axis=-1) / jnp.maximum(
            jnp.sum(mask, axis=-1), 1.0
        )

    return loss_fn


def attack_step_matmul_flops(cfg, batch, t_pre, t_post, remat=True):
    """Analytic matmul FLOPs of ONE APGD attack step — one forward + one
    gradient wrt PIXELS of the LLaVA teacher-forced CE loss — counting a
    dot as 2*M*N*K, at DEFAULT matmul precision (single-pass bf16, the
    bench config). Per-site multipliers, matching what XLA actually emits
    (each validated against compiled cost_analysis at a mid-size config,
    tests/test_llava7b_flops.py):

      - weights are NOT differentiated (grad wrt pixels only), so a param
        matmul's backward is dx = dy @ W^T alone: 1x its forward — and it
        consumes NOTHING from the forward, only dy and W
      - the attention matmuls (q@k^T, probs@v) differentiate BOTH operands:
        backward = 2x forward
      - jax.checkpoint(full) per block (both towers — the bench config)
        replays the block interior during the backward, BUT XLA dead-codes
        replayed matmuls whose outputs no backward op consumes: probs@v
        (its output feeds only the out-proj, whose dx needs neither input)
        and the final mlp matmul (down-proj / c_proj, output = block
        output). So the replay adds +1x to scores and to the param matmuls
        whose OUTPUTS the backward needs (q/k/v values for attention bwd,
        pre-activations for gelu/silu bwd, residual-stream inputs for
        norm bwd) and +0x to probs@v and down-proj/c_proj
      - the loss reads only the last t_post logit rows, and XLA pushes the
        slice into the lm_head matmul (forward) and exploits the matching
        zero rows of dlogits (backward): 2x a t_post-row matmul, not t
      - outside any block (patch embed, projector, lm_head): never
        rematerialized, forward + dx only

    Excluded: elementwise ops (LN/RMSNorm/rope/gelu/softmax), embedding
    gathers, and the attack's ~10 image-sized bookkeeping ops (<0.01% at
    7B scale) — so the count sits a few percent UNDER the true total."""
    in_mult = 3 if remat else 2   # interior param matmuls w/ needed outputs
    dn_mult = 2                   # down-proj / c_proj: replay always dead
    sc_mult = 4 if remat else 3   # q@k^T
    pv_mult = 3                   # probs@v: replay always dead

    v = cfg.vision.vision  # vision TransformerConfig
    n_tok = cfg.vision.n_vision_tokens  # incl CLS
    n_img = cfg.n_image_tokens  # CLS dropped before the projector
    l_eff = v.layers - (1 if cfg.drop_last_vision_block else 0)
    w, h = v.width, int(v.width * v.mlp_ratio)
    p = cfg.vision.patch_size
    vis = 2 * (2 * n_img * (3 * p * p) * w)  # patch embed, fwd + dx
    vis += in_mult * 2 * n_tok * (4 * w * w + w * h) * l_eff  # qkv,out,fc
    vis += dn_mult * 2 * n_tok * (w * h) * l_eff  # c_proj
    vis += (sc_mult + pv_mult) * (2 * n_tok * n_tok * w) * l_eff

    d = cfg.lm_dim
    if cfg.projector_type == "linear":
        proj = 2 * (2 * n_img * w * d)
    else:  # mlp2x_gelu
        proj = 2 * (2 * n_img * w * d + 2 * n_img * d * d)

    lc = cfg.llama
    t = n_img + t_pre + t_post
    kv_dim = lc.n_kv_heads * lc.head_dim  # == d unless GQA
    lm = in_mult * 2 * t * (2 * d * d + 2 * d * kv_dim + 2 * d * lc.ffn_dim) * lc.n_layers
    lm += dn_mult * 2 * t * (d * lc.ffn_dim) * lc.n_layers  # down-proj
    lm += (sc_mult + pv_mult) * (2 * t * t * d) * lc.n_layers
    lm += 2 * (2 * t_post * d * lc.vocab_size)  # lm_head, sliced rows

    return float(batch) * (vis + proj + lm)


def _measure_serial_matmul_chain(m, k, n, iters=100):
    """Sustained bf16 TFLOP/s of a serially-dependent up/down matmul pair
    at the caller's shapes — the LM mlp's own (m,k)x(k,n) then (m,n)x(n,k),
    chained (scan-carry dependency, scripts/perf_sweep.py harness style).

    This is a LOWER bound on the matmul ceiling, not the ceiling: a single
    dependent chain cannot overlap independent matmuls across the v5e
    TensorCore's 4 MXUs the way a real model step does — measured, the 7B
    attack step itself sustains MORE analytic matmul TF/s than this chain."""
    a = jnp.full((m, k), 1.0 / k, jnp.bfloat16)
    w1 = jnp.full((k, n), 1.0 / n, jnp.bfloat16)
    w2 = jnp.full((n, k), 1.0, jnp.bfloat16)

    @jax.jit
    def f(a, w1, w2):
        def one(c, _):
            return (c @ w1) @ w2, None
        out, _ = jax.lax.scan(one, a, None, length=iters)
        return out

    r = f(a, w1, w2)
    float(jnp.sum(r.astype(jnp.float32)))  # scalar readback = remote sync
    t0 = time.perf_counter()
    r = f(a, w1, w2)
    float(jnp.sum(r.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return iters * 2 * (2 * m * k * n) / dt / 1e12


def main(batch=None, n_iter=None, host_loop=None):
    """Run the bench; knobs default from env (BENCH_BATCH / BENCH_ITERS /
    BENCH_HOST_LOOP) so the CLI behaves as before, but bench.py's full-story
    run passes them explicitly (its own BENCH_* envs steer the attack stage)."""
    from robustvlm_tpu.attacks.apgd import apgd_attack
    from robustvlm_tpu.models.llava.model import LLAVA_CONFIGS

    BATCH = int(os.environ.get("BENCH_BATCH", 1)) if batch is None else batch
    N_ITER = int(os.environ.get("BENCH_ITERS", 100)) if n_iter is None else n_iter
    HOST_LOOP = (
        bool(os.environ.get("BENCH_HOST_LOOP")) if host_loop is None else host_loop
    )

    cfg = LLAVA_CONFIGS["llava-1.5-7b"]
    params = _init_bf16_on_device(cfg)
    n_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree.leaves(params)
    )
    print(f"params resident: {n_bytes / 2**30:.2f} GiB bf16", file=sys.stderr)

    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(BATCH, 3, 336, 336).astype(np.float32))
    pre = jnp.asarray(npr.randint(3, 32000, (BATCH, T_PRE)), jnp.int32)
    post = jnp.asarray(npr.randint(3, 32000, (BATCH, T_POST)), jnp.int32)
    labels = post
    mask = jnp.ones((BATCH, T_POST), jnp.float32)

    # bound-model protocol: the 13 GiB param tree and the token tensors ride
    # as runtime operands of the compiled attack, never as HLO constants.
    # The LM loop runs UNSTACKED per-layer (init creates it that way): both
    # the scan and the stacked-unrolled paths OOM on relayout copies of the
    # stacked attention weights (measured 17.3 / 25.4 GiB vs 15.75).
    loss_fn = _make_unstacked_loss(cfg)

    def pure(p, pr, po, lb, mk, xa):
        return loss_fn(p, pr, po, lb, mk, xa)

    def model_fn(xa):
        return pure(params, pre, post, labels, mask, xa)

    model_fn.pure = pure
    model_fn.bound_args = (params, pre, post, labels, mask)

    def attack():
        # skip_last_grad=False: the fwd-only final-iteration epilogue is a
        # third compiled program on the host-loop path — minutes of extra
        # remote compile for a ~3%-at-20-iters saving; at the 10k-iter
        # production count the saving is noise
        return apgd_attack(
            model_fn, x, None, criterion=_crit_targeted,
            eps=2.0 / 255.0, n_iter=N_ITER, norm="linf",
            host_loop=HOST_LOOP, skip_last_grad=False,
        )

    t0 = time.perf_counter()
    try:
        res = attack()
        float(jnp.sum(res.x_best))  # scalar readback = remote sync
    except Exception as e:  # HBM verdict must be a JSON line, not a trace
        msg = str(e)
        if "RESOURCE_EXHAUSTED" not in msg and "Out of memory" not in msg:
            raise
        print(
            json.dumps(
                {
                    "metric": f"apgd_attack_steps_per_sec_llava7b_b{BATCH}",
                    "value": None,
                    "unit": "attack-steps/s/chip",
                    "batch": BATCH,
                    "host_loop": HOST_LOOP,
                    "hbm_verdict": "OOM",
                    "error": msg[:600],
                }
            )
        )
        return
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    try:  # HBM verdict: peak bytes if the runtime exposes them
        ms = jax.local_devices()[0].memory_stats() or {}
        peak_gib = round(ms.get("peak_bytes_in_use", 0) / 2**30, 2) or None
    except Exception:
        peak_gib = None

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        res = attack()
        float(jnp.sum(res.x_best))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    steps_per_sec = (N_ITER + 1) / best
    example_steps = steps_per_sec * BATCH
    # production protocol wall-clock: the untargeted ensemble is ~8 APGD
    # stages x 100 iters over 500 images (reference vlm_eval
    # run_evaluation.py:909-918 stage schedule); batched stages
    # (vlm_eval/ensemble.py batch_size) make example-steps/s the divisor
    prod_hours = 500 * 8 * 100 / example_steps / 3600

    # Roofline: analytic matmul FLOPs of the step (XLA-validated counter,
    # tests/test_llava7b_flops.py) / measured wall, against three anchors:
    # the v5e bf16 peak (197), the chip's best measured sustained matmul
    # rate (the ViT-shape calibration, perf_sweep.py: 140.4), and an
    # in-session serially-dependent chain at the LM mlp's own shape (a
    # LOWER bound — no cross-matmul MXU overlap). One small extra compile;
    # never fatal.
    flops_step = attack_step_matmul_flops(cfg, BATCH, T_PRE, T_POST)
    achieved_tf_s = flops_step * steps_per_sec / 1e12
    t_seq = cfg.n_image_tokens + T_PRE + T_POST
    try:
        chain_tf_s = _measure_serial_matmul_chain(
            BATCH * t_seq, cfg.lm_dim, cfg.llama.ffn_dim
        )
    except Exception as e:  # noqa: BLE001 — roofline is diagnostics
        print(f"serial-chain measurement failed: {e!s:.200}", file=sys.stderr)
        chain_tf_s = None
    roofline = {
        "analytic_matmul_tflop_per_step": round(flops_step / 1e12, 2),
        "achieved_matmul_tf_s": round(achieved_tf_s, 1),
        "bf16_peak_tf_s": 197.0,
        "pct_of_bf16_peak": round(100.0 * achieved_tf_s / 197.0, 1),
        "vit_calibrated_sol_tf_s": 140.4,
        "pct_of_vit_calibrated_sol": round(
            100.0 * achieved_tf_s / 140.4, 1
        ),
    }
    if chain_tf_s is not None:
        roofline["serial_chain_at_lm_mlp_shape_tf_s"] = round(chain_tf_s, 1)
    print(
        json.dumps(
            {
                "metric": f"apgd_attack_steps_per_sec_llava7b_b{BATCH}",
                "value": round(steps_per_sec, 3),
                "unit": "attack-steps/s/chip",
                "vs_baseline": round(example_steps / A100_LLAVA7B_STEPS_PER_SEC, 3),
                "batch": BATCH,
                "example_steps_per_sec": round(example_steps, 3),
                "n_iter": N_ITER,
                "host_loop": HOST_LOOP,
                "hbm_verdict": "fits",
                "peak_hbm_gib": peak_gib,
                "production_500img_8stage_100iter_hours": round(prod_hours, 2),
                "a100_anchor_steps_per_sec": A100_LLAVA7B_STEPS_PER_SEC,
                "roofline": roofline,
            }
        )
    )


if __name__ == "__main__":
    main()
