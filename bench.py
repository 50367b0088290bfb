"""Headline benchmark: APGD attack-steps/sec/chip on CLIP ViT-L/14.

Measures the #1 hot path (SURVEY.md §3.2): one APGD inner step — a full
fwd+bwd through the ViT-L/14 vision tower w.r.t. input pixels (bf16
activations, fp32 softmax, Pallas flash attention, per-block remat) plus
the fused elementwise Linf update — in the production eval configuration
(ℓ∞ ε=2/255, CE loss vs a 1000-class classifier, batch 64 @ 224²).

The step is one jitted function with params as explicit arguments (stable
persistent-cache keys; no giant constants) driven from a host loop: per-call
dispatch overhead is <1% of the ~0.2-0.7s step, and compile cost stays at a
single fwd+bwd graph instead of an n_iter-unrolled scan.

Unit: per-example attack steps per second per chip. vs_baseline anchors the
A100 PyTorch reference derived from the published targeted-attack cost
(≈2 h/image @10k iters on LLaVA-7B, reference README.md:326-328) scaled by
the LLaVA-7B : bare-ViT-L FLOP ratio -> ≈80 example-steps/s/A100 fp16.

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

BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_ITER = int(os.environ.get("BENCH_ITERS", 20))


def main():
    from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
    from robustvlm_tpu.models.clip.model import encode_image
    from robustvlm_tpu.ops.image import normalize_clip
    from robustvlm_tpu.ops.losses import ce_loss
    from robustvlm_tpu.ops.pallas.attack_step import fused_linf_apgd_step

    cfg = CLIP_CONFIGS["ViT-L-14"]
    rng = jax.random.PRNGKey(0)
    params = init_clip_params(rng, cfg)
    temb = jax.random.normal(jax.random.PRNGKey(1), (cfg.embed_dim, 1000))
    temb = temb / jnp.linalg.norm(temb, axis=0, keepdims=True)

    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(BATCH, 3, 224, 224).astype(np.float32))
    y = jnp.asarray(npr.randint(0, 1000, BATCH))
    eps = 2.0 / 255.0

    def loss_fn(x_adv, params, temb, y):
        e = encode_image(
            params, normalize_clip(x_adv), cfg, normalize=True,
            compute_dtype=jnp.bfloat16, remat=True,
        )
        logits = e @ (100.0 * temb)
        return jnp.sum(ce_loss(logits, y, reduction="none"))

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def apgd_step(params, temb, x, x_adv, x_adv_old, step_size, y):
        g = grad_fn(x_adv, params, temb, y)
        x_new = fused_linf_apgd_step(
            x_adv, x_adv_old, g, x, step_size, eps, jnp.float32(0.75)
        )
        return x_new, x_adv

    step_size = jnp.full((BATCH,), 2.0 * eps, jnp.float32)
    x_adv = jnp.clip(x + eps * jnp.sign(
        jax.random.normal(rng, x.shape)), 0.0, 1.0)
    x_old = x_adv

    # compile + warmup; sync via scalar readback (block_until_ready does not
    # reliably synchronize through remote-execution PJRT backends)
    x_adv, x_old = apgd_step(params, temb, x, x_adv, x_old, step_size, y)
    float(jnp.sum(x_adv))

    t0 = time.perf_counter()
    for _ in range(N_ITER):
        x_adv, x_old = apgd_step(params, temb, x, x_adv, x_old, step_size, y)
    float(jnp.sum(x_adv))
    dt = time.perf_counter() - t0
    steps_per_sec = BATCH * N_ITER / dt

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
