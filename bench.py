"""Headline benchmark: APGD attack-steps/sec/chip on CLIP ViT-L/14.

Measures the #1 hot path (SURVEY.md §3.2) with the REAL attack engine:
`robustvlm_tpu.attacks.apgd.apgd_attack` — the full scan-based AutoPGD
(per-example adaptive step sizes, best tracking, oscillation checkpoints)
driving fwd+grad-wrt-pixels through the ViT-L/14 vision tower in the
production eval configuration (ℓ∞ ε=2/255, CE vs a 1000-class zero-shot
classifier, bf16 activations, fp32 softmax).

Tuned configuration and its measurement trail (v5e, round 2, see
scripts/perf_sweep.py):
  - batch 8 is the per-example throughput peak on this chip: bare fused
    steps/s by batch = 1:150, 2:226, 4:274, 6:294, 8:302, 12:295, 16:285,
    32:241, 64:204 — per-example cost rises monotonically with batch
    (XLA's attention fusions tile better when the (B,H,N,N) softmax
    intermediates stay small).
  - remat='dots' (save param-matmul outputs, recompute elementwise +
    attention): bwd(dx) is ~2.2x fwd wall. Measured alternatives all lose:
    no-remat 244/s @b16 (fails to compile at b32), dots_saveable 219 @b32,
    saving softmax probs across remat ('dots_probs') 212 @b32 — the HBM
    round-trip for (B,H,N,N) tensors costs more than the recompute.
  - fp32 vs bf16 softmax: identical wall (241.4 vs 241.6 @b32) — keep fp32.
  - attention kernels: XLA's einsum attention spreads the batched
    (257,64)x(64,257) matmuls across the chip's 4 MXUs (~42 TF/s in-model);
    Pallas batched dots serialize (~5-8 TF/s), so the whole-sequence fused
    kernel (ops/pallas/vit_attention.py, 228/s @b32) and the flash kernel
    (101/s) both lose to XLA here and stay off the default path.
  - params pre-cast to bf16: +2% (240.7/s bare).
  - batch data + params as LOOP OPERANDS, never closure constants: the
    eager scan with closed-over params ran 180/s; with everything as
    runtime operands the same attack runs ~237/s AND fresh batches reuse
    the compiled program (HLO constants changed the cache key per batch).
  - per-dispatch host-loop overhead through the remote tunnel ~14 ms/call;
    the in-jit scan path amortizes it.
  - speed-of-light audit (round 2): back-to-back bf16 matmul at the exact
    qkv shape (8224x1024x3072) calibrates to 140.4 TF/s on this chip — the
    in-model 135 TF/s is 96% of that practical ceiling. Step decomposition
    at b8 (ablations, scripts/perf_sweep.py): matmul-only skeleton
    19.25 ms (fwd 8.98 + bwd 10.3), attention fwd 1.67 ms, attention
    bwd+recompute 5.4 ms (FLOP-fair: 3x the fwd einsums) = 26.3 ms total,
    ~91% of the composable ceiling (~24 ms). Structural alternatives all
    measured SLOWER: cls-split tile-aligned attention (fwd 11.45 vs
    10.65 ms; step 28.5 — slice/concat pad-transposes in the remat bwd),
    scan unroll 2/4/24 (249/238/290 steps/s), dots_probs 261,
    dots_saveable 279, no-remat 251, sdpa == einsum.

Unit: per-example attack steps (model evals) per second per chip; the
attack performs n_iter+1 evals. vs_baseline anchors the A100 PyTorch
reference derived from the published targeted-attack cost (≈2 h/image
@10k iters on LLaVA-7B, reference README.md:326-328) scaled by the
LLaVA-7B : bare-ViT-L FLOP ratio -> ≈80 example-steps/s/A100 fp16.

Prints ONE JSON line.
"""

import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

A100_ANCHOR_STEPS_PER_SEC = 80.0

BATCH = int(os.environ.get("BENCH_BATCH", 8))
# 100 iterations = the production eval protocol (BASELINE.md: AutoAttack
# APGD-CE/APGD-T at 100 iters) and amortizes the attack's fixed setup
# (init eval, first-step bookkeeping): measured 312 steps/s at 100 iters
# vs 298 at 20 on the same code.
N_ITER = int(os.environ.get("BENCH_ITERS", 100))


def _timed_run(attack):
    t0 = time.perf_counter()
    res = attack()
    float(jnp.sum(res.x_best))
    return time.perf_counter() - t0


def main():
    from robustvlm_tpu.attacks.apgd import apgd_attack
    from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
    from robustvlm_tpu.models.clip.model import encode_image
    from robustvlm_tpu.ops.image import normalize_clip
    from robustvlm_tpu.ops.losses import ce_loss

    cfg = CLIP_CONFIGS["ViT-L-14"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        init_clip_params(jax.random.PRNGKey(0), cfg),
    )
    temb = jax.random.normal(jax.random.PRNGKey(1), (cfg.embed_dim, 1000))
    temb = temb / jnp.linalg.norm(temb, axis=0, keepdims=True)

    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(BATCH, 3, 224, 224).astype(np.float32))
    y = jnp.asarray(npr.randint(0, 1000, BATCH))
    eps = 2.0 / 255.0

    # bound-model protocol: params/classifier ride as runtime operands of
    # the compiled attack loop (attacks/apgd.py), keeping programs small
    # and cache keys stable across batches/checkpoints
    def model_fn_pure(p, t, xa):
        e = encode_image(
            p, normalize_clip(xa), cfg, normalize=True,
            compute_dtype=jnp.bfloat16, remat="dots",
        )
        return e @ (100.0 * t)

    def model_fn(xa):
        return model_fn_pure(params, temb, xa)

    model_fn.pure = model_fn_pure
    model_fn.bound_args = (params, temb)

    criterion = lambda o, t: ce_loss(o, t, reduction="none")

    def attack():
        return apgd_attack(
            model_fn, x, y, criterion=criterion, eps=eps,
            n_iter=N_ITER, norm="linf",
        )

    # compile + warmup; sync via scalar readback (block_until_ready does
    # not reliably synchronize through remote-execution PJRT backends)
    res = attack()
    float(jnp.sum(res.x_best))

    # best-of-3 timed runs: dispatch through the remote tunnel adds a few
    # ms of run-to-run jitter; the best run reflects the device time
    dt = min(_timed_run(attack) for _ in range(3))
    # the attack evaluates the model (fwd+bwd) n_iter+1 times per example
    steps_per_sec = BATCH * (N_ITER + 1) / dt

    n_chips = jax.local_device_count()
    value = steps_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "apgd_attack_steps_per_sec_per_chip_vitl14",
                "value": round(value, 2),
                "unit": "example-steps/s/chip",
                "vs_baseline": round(value / A100_ANCHOR_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
