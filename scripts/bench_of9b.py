"""OpenFlamingo-9B scale close-out: HBM plan, FLOP projection, compile check.

The reference's other flagship VLM (OpenFlamingo-9B = ViT-L/14 + perceiver
resampler + MPT-7B with gated cross-attention every 4 layers; reference
open_flamingo/src/flamingo.py:252-351 and the README OF-9B eval rows) does
NOT fit one v5e for the attack path, so the honest artifacts are:

1. an HBM plan (this script, `plan`): measured-parameter arithmetic in the
   style of scripts/bench_llava7b.py's journey — 8.132B params = 15.15 GiB
   bf16 against the chip's 15.75 GiB usable; params alone leave no room
   for activations + the attack state, so the attack step requires fsdp
   over >= 2 chips (each holding ~7.6 GiB at rest).
2. a REAL-DIMS compile check (`compile_check`): the fsdp-sharded whole-VLM
   APGD step — grad wrt pixels through ViT -> resampler -> gated-xattn MPT
   at production shapes — lowered and AOT-compiled over a virtual 8-device
   CPU mesh (the dryrun-phase-2 pattern, __graft_entry__.py, at full size).
   SPMD partitioning is dim-exact: this catches divisibility/layout
   failures a tiny-dims dryrun cannot (it caught ViT-L's 588-row
   patch_embed being indivisible by an 8-way fsdp axis —
   parallel/mesh._fit_spec). Per-device argument bytes from XLA's own
   memory analysis confirm the 8-way parameter split. NOTE: the CPU
   backend's temp-buffer number is NOT a TPU HBM prediction (the CPU
   buffer assignment neither overlaps all-gathers nor streams them;
   it keeps every gathered weight live) — the plan above is the HBM story.
3. a throughput PROJECTION (`flops`): analytic matmul FLOPs of one APGD
   step using the multiplier discipline validated against XLA cost
   analysis for LLaVA-7B (scripts/bench_llava7b.attack_step_matmul_flops,
   tests/test_llava7b_flops.py), priced at the v5e's MEASURED attack-step
   matmul rate (127.8 TF/s sustained, 91% of the 140.4 TF/s bf16 matmul
   calibration — BENCH_r04.json roofline). A projection, NOT a
   measurement: no 2-chip hardware exists in this environment to run it.

Usage: python scripts/bench_of9b.py            # plan + flops (instant)
       OF9B_COMPILE=1 python scripts/bench_of9b.py   # + the ~6 min
           real-dims AOT compile check (CPU-only, no TPU needed)
Prints one JSON line per section. Tested by tests/test_of9b_plan.py
(plan arithmetic + flops scaling on CPU; the real-dims compile check is
the `-m heavy` tier).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# v5e HBM usable by XLA (16 GiB - runtime reserve), matching
# scripts/bench_llava7b.py's measured 15.75 GiB budget
V5E_USABLE_GIB = 15.75
# measured sustained attack-step matmul rate on this chip (BENCH_r04.json
# roofline: 24.64 TFLOP/step at 5.19 steps/s) and the bf16 matmul
# calibration at the qkv shape — the projection's price and its ceiling
MEASURED_ATTACK_TF_S = 127.8
MEASURED_MATMUL_TF_S = 140.4


def plan(batch: int = 8):
    """Analytic HBM plan for the OF-9B APGD attack step."""
    import jax
    import jax.numpy as jnp

    from robustvlm_tpu.models.flamingo import (
        FLAMINGO_CONFIGS, init_flamingo_params,
    )

    cfg = FLAMINGO_CONFIGS["openflamingo-9b"]
    shapes = jax.eval_shape(
        lambda k: init_flamingo_params(k, cfg), jax.random.PRNGKey(0)
    )
    comp = {
        k: sum(l.size for l in jax.tree.leaves(v)) for k, v in shapes.items()
    }
    n_params = sum(comp.values())
    params_gib = n_params * 2 / 2**30  # bf16 at rest
    s = cfg.vision.image_size
    # APGD linf state: x_adv/x_best/x_best_adv/grad/momentum-ish ~ 8
    # image-sized fp32 buffers (attacks/apgd.py scan carry)
    img_bytes = batch * 3 * s * s * 4
    state_gib = 8 * img_bytes / 2**30
    # residual-stream checkpoints under remat: ~(n_mpt + n_xattn + n_vit)
    # bf16 (B,T,D) block boundaries — small at eval seq lens
    t_txt = 44
    act_gib = (
        (cfg.mpt.n_layers + cfg.n_xattn) * batch * t_txt * cfg.mpt.d_model * 2
        + cfg.vision.vision.layers * batch * 257 * cfg.vision.vision.width * 2
    ) / 2**30
    total_1chip = params_gib + state_gib + act_gib
    min_chips = 2
    out = {
        "metric": "of9b_hbm_plan",
        "params_by_component_b": {k: round(v / 1e9, 3) for k, v in comp.items()},
        "n_params_b": round(n_params / 1e9, 3),
        "params_gib_bf16": round(params_gib, 2),
        "attack_state_gib": round(state_gib, 3),
        "remat_checkpoint_gib": round(act_gib, 3),
        "single_chip_estimate_gib": round(total_1chip, 2),
        "v5e_usable_gib": V5E_USABLE_GIB,
        "verdict": (
            f"params alone are {params_gib:.2f} GiB of {V5E_USABLE_GIB} "
            f"usable — no headroom for gathered-weight working set + "
            f"activations; attack path needs fsdp over >= {min_chips} "
            f"v5e chips (~{params_gib / min_chips:.1f} GiB params/chip "
            f"at rest)"
        ),
        "min_chips_fsdp": min_chips,
    }
    print(json.dumps(out))
    return out


def attack_step_matmul_flops(cfg, batch, t_img, frames, t_txt):
    """Analytic matmul FLOPs of ONE OF-9B APGD step (forward + grad wrt
    PIXELS), 2*M*N*K per dot. Multiplier discipline from
    bench_llava7b.attack_step_matmul_flops (validated vs XLA cost analysis
    at LLaVA shapes, tests/test_llava7b_flops.py): interior param matmuls
    under remat 3x (fwd + dx + replay), down/out-proj 2x (replay dead-coded),
    attention scores 4x / probs@v 3x; modules OUTSIDE remat (perceiver,
    gated xattn here) count fwd + dx only (param 2x, attention 3x+3x... the
    perceiver is <1% of the total, so second-order replay effects there are
    noise). A projection aid, not an XLA-validated close-out."""
    in_mult, dn_mult, sc_mult, pv_mult = 3, 2, 4, 3

    v = cfg.vision.vision
    n_tok = cfg.vision.n_vision_tokens          # 257 incl CLS
    n_img = n_tok - 1
    w, h = v.width, int(v.width * v.mlp_ratio)
    p = cfg.vision.patch_size
    n_frames = t_img * frames
    vis = 2 * (2 * n_img * (3 * p * p) * w)      # patch embed fwd + dx
    vis += in_mult * 2 * n_tok * (4 * w * w + w * h) * v.layers
    vis += dn_mult * 2 * n_tok * (w * h) * v.layers
    vis += (sc_mult + pv_mult) * (2 * n_tok * n_tok * w) * v.layers
    vis *= n_frames

    # perceiver resampler (outside remat: param 2x, attn 2x fwd+bwd each op)
    d_vis = w
    inner = cfg.resampler_heads * cfg.resampler_dim_head
    n_lat, n_media = cfg.num_latents, frames * n_img
    n_kv = n_media + n_lat
    per_layer = (
        2 * (2 * n_lat * d_vis * inner)          # to_q
        + 2 * (2 * n_kv * d_vis * (2 * inner))   # to_kv
        + 3 * (2 * n_lat * n_kv * inner) * 2     # scores + probs@v
        + 2 * (2 * n_lat * inner * d_vis)        # to_out
        + 2 * (2 * n_lat * d_vis * (cfg.ff_mult * d_vis)) * 2  # ff w1+w2
    )
    perceiver = t_img * cfg.resampler_depth * per_layer

    # gated cross-attention blocks (outside remat)
    d = cfg.mpt.d_model
    kv_tok = t_img * n_lat
    per_x = (
        2 * (2 * t_txt * d * inner)              # to_q
        + 2 * (2 * kv_tok * d_vis * (2 * inner)) # to_kv
        + 3 * (2 * t_txt * kv_tok * inner) * 2   # scores + probs@v
        + 2 * (2 * t_txt * inner * d)            # to_out
        + 2 * (2 * t_txt * d * (cfg.ff_mult * d)) * 2  # ff
    )
    xattn = cfg.n_xattn * per_x

    # MPT decoder (remat'd blocks): fused wqkv (d->3d), out d->d, mlp 4x
    lm = in_mult * 2 * t_txt * (3 * d * d + 4 * d * d) * cfg.mpt.n_layers
    lm += dn_mult * 2 * t_txt * (d * d + 4 * d * d) * cfg.mpt.n_layers
    lm += (sc_mult + pv_mult) * (2 * t_txt * t_txt * d) * cfg.mpt.n_layers
    lm += 2 * (2 * t_txt * d * cfg.mpt.vocab_size)  # weight-tied head

    return float(batch) * (vis + perceiver + xattn + lm)


def flops_projection(batch: int = 8):
    """Price the analytic step at the chip's measured rates, for the two
    reference OF-9B eval shapes: 0-shot captioning and 4-shot few-shot."""
    from robustvlm_tpu.models.flamingo import FLAMINGO_CONFIGS

    cfg = FLAMINGO_CONFIGS["openflamingo-9b"]
    points = []
    for name, t_img, frames, t_txt in (
        ("caption_0shot", 1, 1, 44),
        ("fewshot_4shot", 5, 1, 220),
    ):
        f = attack_step_matmul_flops(cfg, batch, t_img, frames, t_txt)
        points.append({
            "workload": name,
            "batch": batch,
            "t_img": t_img,
            "t_txt": t_txt,
            "analytic_tflop_per_step": round(f / 1e12, 2),
            "projected_steps_per_sec_at_measured_rate": round(
                MEASURED_ATTACK_TF_S * 1e12 / f, 2
            ),
            "ceiling_steps_per_sec_at_matmul_calibration": round(
                MEASURED_MATMUL_TF_S * 1e12 / f, 2
            ),
        })
    out = {
        "metric": "of9b_attack_step_projection",
        "label": (
            "PROJECTION — priced at the v5e's measured LLaVA-7B attack "
            "matmul rate; needs >= 2 fsdp chips to run (see of9b_hbm_plan)"
        ),
        "measured_rate_tf_s": MEASURED_ATTACK_TF_S,
        "points": points,
    }
    print(json.dumps(out))
    return out


_CHILD_ENV = "_OF9B_COMPILE_CHILD"


def compile_check(n_devices: int = 8, batch: int = 8, t_txt: int = 44):
    """AOT-compile the fsdp-sharded OF-9B APGD step at REAL dims over a
    virtual n-device CPU mesh; print per-device argument bytes from XLA's
    memory analysis. Subprocess re-exec (the __graft_entry__ pattern):
    the session env pins the platform before imports."""
    if os.environ.get(_CHILD_ENV):
        return _compile_check_impl(n_devices, batch, t_txt)
    import re

    env = dict(os.environ)
    env[_CHILD_ENV] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    code = (
        f"import sys; sys.path.insert(0, {_REPO!r}); "
        f"sys.path.insert(0, {os.path.join(_REPO, 'scripts')!r}); "
        f"from bench_of9b import compile_check; "
        f"compile_check({n_devices}, {batch}, {t_txt})"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env, cwd=_REPO)
    if res.returncode != 0:
        raise RuntimeError(f"of9b compile check failed (rc={res.returncode})")


def _compile_check_impl(n_devices: int, batch: int, t_txt: int):
    import dataclasses as dc
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from robustvlm_tpu.attacks.apgd import apgd_attack
    from robustvlm_tpu.models.flamingo import (
        FLAMINGO_CONFIGS, init_flamingo_params,
    )
    from robustvlm_tpu.models.flamingo.model import flamingo_per_sample_loss
    from robustvlm_tpu.parallel.mesh import (
        batch_sharding, make_mesh, param_sharding_rules,
    )
    from robustvlm_tpu.vlm_eval.ensemble import _crit_untargeted

    cfg = dc.replace(
        FLAMINGO_CONFIGS["openflamingo-9b"],
        media_token_id=FLAMINGO_CONFIGS["openflamingo-9b"].mpt.vocab_size - 2,
    )
    mesh = make_mesh(data=1, fsdp=n_devices, model=1)
    shapes = jax.eval_shape(
        lambda k: init_flamingo_params(k, cfg), jax.random.PRNGKey(0)
    )
    shardings = param_sharding_rules(shapes, mesh)
    # bf16 at rest, abstract: nothing is materialized — this is a pure
    # lower+compile existence proof at production dims
    absp = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16, sharding=sh),
        shapes, shardings,
    )
    s = cfg.vision.image_size
    vx = jax.ShapeDtypeStruct(
        (batch, 1, 1, 3, s, s), jnp.float32, sharding=batch_sharding(mesh, 6)
    )
    lx = jax.ShapeDtypeStruct(
        (batch, t_txt), jnp.int32, sharding=batch_sharding(mesh, 2)
    )
    lm = jax.ShapeDtypeStruct(
        (batch, t_txt), jnp.float32, sharding=batch_sharding(mesh, 2)
    )

    def attack(params, vision_x, lang_x, labels, label_mask):
        def model_fn(v):
            return flamingo_per_sample_loss(
                params, v, lang_x, labels, label_mask, cfg,
                compute_dtype=jnp.bfloat16, remat=True,
            )

        res = apgd_attack(
            model_fn, vision_x, None, criterion=_crit_untargeted,
            eps=2 / 255, n_iter=2, norm="linf",
        )
        return res.x_best, res.loss_best

    t0 = time.perf_counter()
    lowered = jax.jit(attack).lower(absp, vx, lx, lx, lm)
    compiled = lowered.compile()
    dt = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    out = {
        "metric": "of9b_compile_check",
        "n_devices": n_devices,
        "batch": batch,
        "t_txt": t_txt,
        "compile_s": round(dt, 1),
        "per_device_argument_gib": round(
            ma.argument_size_in_bytes / 2**30, 3
        ),
        "note": (
            "arguments = params/"
            f"{n_devices} + inputs (proves the 8-way fsdp split); CPU "
            "temp bytes omitted — the CPU buffer assignment keeps every "
            "all-gathered weight live and is not a TPU HBM prediction"
        ),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    plan()
    flops_projection()
    if os.environ.get("OF9B_COMPILE") == "1" or os.environ.get(_CHILD_ENV):
        compile_check()
    else:
        print(json.dumps({
            "metric": "of9b_compile_check",
            "skipped": "set OF9B_COMPILE=1 (CPU-only, ~6 min)",
        }))


if __name__ == "__main__":
    main()
