"""Perf ablation sweep for the APGD hot path (ViT-L/14 fwd+grad-wrt-pixels).

Times a jitted `lax.scan` of K fwd+bwd evals per config on the session TPU
and prints ms/eval + equivalent example-steps/s/chip. Used to steer bench.py
tuning (VERDICT round-1 item 4). Run: python scripts/perf_sweep.py [names...]
"""

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from robustvlm_tpu.models.clip.model import encode_image
from robustvlm_tpu.ops.image import normalize_clip
from robustvlm_tpu.ops.losses import ce_loss

K = int(os.environ.get("SWEEP_K", 20))

CONFIGS = {
    # name: (batch, model kwargs)
    "base_b32_dots": (32, dict(remat="dots")),
    "b32_dots_saveable": (32, dict(remat="dots_saveable")),
    "b32_noremat": (32, dict(remat=False)),
    "b32_bf16sm": (32, dict(remat="dots", softmax_dtype=jnp.bfloat16)),
    "b32_flash": (32, dict(remat="dots", flash=True)),
    "b1_dots": (1, dict(remat="dots")),
    "b2_dots": (2, dict(remat="dots")),
    "b4_dots": (4, dict(remat="dots")),
    "b6_dots": (6, dict(remat="dots")),
    "b8_dots": (8, dict(remat="dots")),
    "b8_noremat": (8, dict(remat=False)),
    "b8_full": (8, dict(remat="full")),
    "b8_sdpa": (8, dict(remat="dots", _ablate="sdpa")),
    "b8_fwdonly": (8, dict(remat="dots", _fwd_only=True)),
    "b8_noattn": (8, dict(remat="dots", _ablate="noattn")),
    "b8_fwdonly_noattn": (8, dict(remat="dots", _fwd_only=True, _ablate="noattn")),
    "b8_flash": (8, dict(remat="dots", flash=True)),
    "b8_dots_probs": (8, dict(remat="dots_probs")),
    "b8_dots_saveable": (8, dict(remat="dots_saveable")),
    "b8_unroll2": (8, dict(remat="dots", unroll=2)),
    "b8_unroll4": (8, dict(remat="dots", unroll=4)),
    "b8_unroll24": (8, dict(remat="dots", unroll=24)),
    # fold normalize_clip's per-channel affine into the patch-embed matmul
    # (models/clip/model.py fold_normalization, exact math): removes one
    # (B,3,224,224) elementwise pass per eval AND its recompute under remat
    # — a candidate for the last ~2.3 ms/step vs the composable ceiling
    "b8_foldnorm": (8, dict(remat="dots", _fold_norm=True)),
    "b8_foldnorm_fwdonly": (8, dict(remat="dots", _fold_norm=True,
                                    _fwd_only=True)),
    # dense einsum attention is the DEFAULT (CLS_SPLIT_ATTENTION=False);
    # _cls_split forces the tile-aligned [cls; patches] path for A/B
    "b8_split": (8, dict(remat="dots", _cls_split=True)),
    "b8_split_fwdonly": (8, dict(remat="dots", _fwd_only=True, _cls_split=True)),
    "b8_split_unroll4": (8, dict(remat="dots", unroll=4, _cls_split=True)),
    "b16_sdpa": (16, dict(remat="dots", _ablate="sdpa")),
    "b12_dots": (12, dict(remat="dots")),
    "b16_dots": (16, dict(remat="dots")),
    "b16_noremat": (16, dict(remat=False)),
    "b20_dots": (20, dict(remat="dots")),
    "b24_dots": (24, dict(remat="dots")),
    "b48_dots": (48, dict(remat="dots")),
    "b64_dots": (64, dict(remat="dots")),
    "b64_noremat": (64, dict(remat=False)),
    "b64_dots_saveable": (64, dict(remat="dots_saveable")),
    "b32_fwdonly": (32, dict(remat="dots", _fwd_only=True)),
    "b32_bf16sm_noremat": (32, dict(remat=False, softmax_dtype=jnp.bfloat16)),
    "b32_dots_probs": (32, dict(remat="dots_probs")),
    "b64_dots_probs": (64, dict(remat="dots_probs")),
    # ablations (monkeypatched attention internals — measurement only)
    "b32_noattn": (32, dict(remat="dots", _ablate="noattn")),
    "b32_fwdonly_noattn": (32, dict(remat="dots", _fwd_only=True, _ablate="noattn")),
}


def calibrate_matmul():
    """Peak bf16 matmul throughput at the qkv-projection shape."""
    m, kd, n = 32 * 257, 1024, 3072
    a = jnp.ones((m, kd), jnp.bfloat16)
    w = jnp.ones((kd, n), jnp.bfloat16)

    @jax.jit
    def f(a, w):
        def one(c, _):
            return (c @ w)[:, :kd] * 0.999, None
        out, _ = jax.lax.scan(one, a, None, length=100)
        return out

    r = f(a, w); float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    r = f(a, w); float(jnp.sum(r.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    tf = 100 * 2 * m * kd * n / dt / 1e12
    print(f"matmul calib ({m}x{kd}x{n} bf16): {tf:.1f} TFLOP/s", flush=True)


def run_one(name, batch, mkw):
    fwd_only = mkw.pop("_fwd_only", False)
    ablate = mkw.pop("_ablate", None)
    cls_split = mkw.pop("_cls_split", None)
    fold_norm = mkw.pop("_fold_norm", False)
    import robustvlm_tpu.models.clip.model as M

    orig_attention = M._attention
    orig_cls_split = M.CLS_SPLIT_ATTENTION
    if cls_split is not None:
        M.CLS_SPLIT_ATTENTION = cls_split
    if ablate == "noattn":
        def _attention_noattn(x, p, heads, attn_mask, flash=False,
                              softmax_dtype=jnp.float32):
            cd = x.dtype
            qkv = x @ p["qkv_w"].astype(cd) + p["qkv_b"].astype(cd)
            _, _, v = jnp.split(qkv, 3, axis=-1)
            return v @ p["out_w"].astype(cd) + p["out_b"].astype(cd)
        M._attention = _attention_noattn
    elif ablate == "sdpa":
        def _attention_sdpa(x, p, heads, attn_mask, flash=False,
                            softmax_dtype=jnp.float32):
            b, n, w = x.shape
            hd = w // heads
            cd = x.dtype
            qkv = x @ p["qkv_w"].astype(cd) + p["qkv_b"].astype(cd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = jax.nn.dot_product_attention(
                q.reshape(b, n, heads, hd), k.reshape(b, n, heads, hd),
                v.reshape(b, n, heads, hd),
            ).reshape(b, n, w)
            return out @ p["out_w"].astype(cd) + p["out_b"].astype(cd)
        M._attention = _attention_sdpa
    cfg = CLIP_CONFIGS["ViT-L-14"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        init_clip_params(jax.random.PRNGKey(0), cfg),
    )
    if fold_norm:
        from robustvlm_tpu.models.clip.model import fold_normalization

        params = dict(params)
        params["visual"] = fold_normalization(params["visual"], cfg.patch_size)
    temb = jax.random.normal(jax.random.PRNGKey(1), (cfg.embed_dim, 1000))
    temb = temb / jnp.linalg.norm(temb, axis=0, keepdims=True)
    npr = np.random.RandomState(0)
    x = jnp.asarray(npr.rand(batch, 3, 224, 224).astype(np.float32))
    y = jnp.asarray(npr.randint(0, 1000, batch))

    def loss(p, t, xa, yy):
        e = encode_image(
            p, xa if fold_norm else normalize_clip(xa), cfg, normalize=True,
            compute_dtype=jnp.bfloat16, **mkw,
        )
        return jnp.sum(ce_loss(e @ (100.0 * t), yy, reduction="none"))

    grad_fn = jax.grad(loss, argnums=2)

    @jax.jit
    def many(p, t, xa, yy):
        def one(xc, _):
            if fwd_only:
                return xc + 1e-6 * loss(p, t, xc, yy), None
            g = grad_fn(p, t, xc, yy)
            return jnp.clip(xc + (1.0 / 255.0) * jnp.sign(g), 0.0, 1.0), None

        out, _ = jax.lax.scan(one, xa, None, length=K)
        return out

    try:
        t0 = time.perf_counter()
        r = many(params, temb, x, y)
        float(jnp.sum(r))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = many(params, temb, x, y)
        float(jnp.sum(r))
        dt = time.perf_counter() - t0
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    finally:
        M._attention = orig_attention
        M.CLS_SPLIT_ATTENTION = orig_cls_split
    ms = dt / K * 1000.0
    sps = batch * K / dt
    print(
        f"{name:24s} batch={batch:3d} {ms:8.2f} ms/eval "
        f"{sps:8.1f} ex-steps/s  (first call {t_compile:.1f}s)",
        flush=True,
    )


def main():
    if os.environ.get("SWEEP_CALIB"):
        calibrate_matmul()
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        batch, mkw = CONFIGS[name]
        run_one(name, batch, dict(mkw))


if __name__ == "__main__":
    main()
