"""Headline benchmark: APGD attack-steps/sec/chip on CLIP ViT-L/14.

Measures the #1 hot path (SURVEY.md §3.2): the APGD inner loop — each step a
full fwd+bwd through the ViT-L/14 vision tower w.r.t. input pixels plus the
fused elementwise update — as a single jitted `lax.scan`, exactly the
production eval configuration (ℓ∞ ε=2/255, CE loss vs a 1000-class text
classifier, bf16 activations / fp32 softmax+update, batch 64 @ 224²).

Unit: per-example attack steps per second per chip (batch × n_iter / time).
vs_baseline anchors the A100 PyTorch reference: the published targeted-attack
cost (≈2 h/image @10k iters on LLaVA-7B, reference README.md:326-328) plus the
FLOP ratio of LLaVA-7B to bare ViT-L/14 gives ≈55 example-steps/s/A100 for
this workload in fp16 eager torch; we use a generous 80 steps/s anchor.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_ANCHOR_STEPS_PER_SEC = 80.0

BATCH = 64
N_ITER = 20  # timed iterations (schedule identical per-step cost)


def main():
    from robustvlm_tpu.attacks.apgd import apgd_attack
    from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
    from robustvlm_tpu.models.clip.model import encode_image
    from robustvlm_tpu.ops.image import normalize_clip
    from robustvlm_tpu.ops.losses import ce_loss

    cfg = CLIP_CONFIGS["ViT-L-14"]
    rng = jax.random.PRNGKey(0)
    params = init_clip_params(rng, cfg)
    temb = jax.random.normal(jax.random.PRNGKey(1), (cfg.embed_dim, 1000))
    temb = temb / jnp.linalg.norm(temb, axis=0, keepdims=True)

    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(BATCH, 3, 224, 224).astype(np.float32))
    y = jnp.asarray(npr.randint(0, 1000, BATCH))

    def model_fn(x01):
        emb = encode_image(
            params, normalize_clip(x01), cfg, normalize=True,
            compute_dtype=jnp.bfloat16,
        )
        return emb @ (100.0 * temb)

    @jax.jit
    def run(x, y):
        return apgd_attack(
            model_fn, x, y,
            criterion=lambda o, yy: ce_loss(o, yy, reduction="none"),
            eps=2.0 / 255.0, n_iter=N_ITER, norm="linf",
        ).x_best_adv

    # compile + warmup
    run(x, y).block_until_ready()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(x, y).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    # n_iter scan steps + 1 initial eval, each a full fwd+bwd
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
