"""ConvNeXt CLIP vision tower (open_clip `convnext_base_w` family).

The reference's published robust model zoo includes TeCoA/FARE ConvNeXt-B
LAION-2B checkpoints (reference README.md:267-268) which it loads through
open_clip's timm-backed `TimmModel`; the code path is otherwise
model-name-agnostic (CLIP_eval/eval_utils.py:30-61). This module owns that
architecture natively.

TPU-first design:
- NHWC layout end to end (TPU conv layouts are channels-last; the single
  NCHW->NHWC transpose happens once at the input boundary).
- Within a stage all blocks share shapes, so per-stage block weights are
  *stacked* along a leading axis and the depth loop is a `jax.lax.scan`
  (O(1) compile in depth); the four stages unroll in Python (shapes differ).
- The 7x7 depthwise conv lowers to an XLA depthwise convolution (VPU/MXU
  hybrid); the 4x mlp runs as channel matmuls on the MXU.
- LayerNorm statistics are fp32 regardless of activation dtype (eps 1e-6,
  the ConvNeXt/timm constant) — same policy as the ViT tower.
- `remat` accepts the same per-block checkpoint policies as the ViT path.

Torch-layout import/export matches the open_clip TimmModel state dict:
  trunk.stem.0 (4x4/s4 conv) + trunk.stem.1 (LN2d)
  trunk.stages.{s}.downsample.{0:LN2d,1:2x2/s2 conv}   (s >= 1)
  trunk.stages.{s}.blocks.{i}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}
  trunk.head.norm (post-pool LN)        head.proj (Linear -> embed_dim)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    patch_size: int = 4          # stem conv kernel == stride
    kernel_size: int = 7         # depthwise conv
    mlp_ratio: int = 4
    ln_eps: float = 1e-6


def _layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _conv(x, w, b, stride, groups=1, padding="VALID"):
    """NHWC x HWIO conv."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + b.astype(x.dtype)


def _block(x, bp, cfg: ConvNeXtConfig):
    """ConvNeXt block: dw7x7 -> LN -> fc1 -> GELU -> fc2 -> gamma -> +res."""
    dim = x.shape[-1]
    k = cfg.kernel_size
    h = _conv(
        x, bp["dw_w"], bp["dw_b"], 1, groups=dim,
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
    )
    h = _layer_norm(h, bp["norm_g"], bp["norm_b"], cfg.ln_eps)
    cd = x.dtype
    h = h @ bp["fc1_w"].astype(cd) + bp["fc1_b"].astype(cd)
    h = jax.nn.gelu(h, approximate=False)
    h = h @ bp["fc2_w"].astype(cd) + bp["fc2_b"].astype(cd)
    return x + bp["gamma"].astype(cd) * h


def _maybe_remat(body, remat):
    from robustvlm_tpu.models.clip.model import _maybe_remat as vit_maybe_remat

    return vit_maybe_remat(body, remat)


def convnext_forward(
    visual: Params,
    x: jax.Array,
    cfg: ConvNeXtConfig,
    embed_dim: int,
    *,
    normalize: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """(B, 3, H, W) normalized pixels -> (B, embed_dim) embedding.

    Matches open_clip TimmModel forward: trunk (stem -> 4 stages) ->
    global avg pool -> head LN -> linear proj.
    """
    x = x.astype(compute_dtype).transpose(0, 2, 3, 1)  # NCHW -> NHWC

    p = cfg.patch_size
    x = _conv(x, visual["stem"]["w"], visual["stem"]["b"], p)
    x = _layer_norm(
        x, visual["stem"]["norm_g"], visual["stem"]["norm_b"], cfg.ln_eps
    )

    for s in range(len(cfg.depths)):
        sp = visual["stages"][s]
        if s > 0:
            x = _layer_norm(x, sp["ds_norm_g"], sp["ds_norm_b"], cfg.ln_eps)
            x = _conv(x, sp["ds_w"], sp["ds_b"], 2)

        def body(h, bp):
            return _block(h, bp, cfg), None

        body = _maybe_remat(body, remat)
        x, _ = jax.lax.scan(body, x, sp["blocks"])

    x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
    x = _layer_norm(
        x, visual["head"]["norm_g"], visual["head"]["norm_b"], cfg.ln_eps
    )
    x = x @ visual["head"]["proj_w"].astype(x.dtype) + visual["head"][
        "proj_b"
    ].astype(x.dtype)
    x = x.astype(jnp.float32)
    if normalize:
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    return x


def init_convnext_params(
    rng: jax.Array, cfg: ConvNeXtConfig, embed_dim: int
) -> Params:
    ks = jax.random.split(rng, 3 + len(cfg.depths))
    p = cfg.patch_size
    d0 = cfg.dims[0]

    def dense(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) * (fan_in ** -0.5)

    out: Params = {
        "stem": {
            "w": dense(ks[0], (p, p, 3, d0), 3 * p * p),
            "b": jnp.zeros((d0,)),
            "norm_g": jnp.ones((d0,)),
            "norm_b": jnp.zeros((d0,)),
        },
        "stages": [],
    }
    for s, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        sk = jax.random.split(ks[1 + s], 6)
        stage: Params = {}
        if s > 0:
            prev = cfg.dims[s - 1]
            stage["ds_norm_g"] = jnp.ones((prev,))
            stage["ds_norm_b"] = jnp.zeros((prev,))
            stage["ds_w"] = dense(sk[5], (2, 2, prev, dim), 4 * prev)
            stage["ds_b"] = jnp.zeros((dim,))
        hid = cfg.mlp_ratio * dim
        k7 = cfg.kernel_size
        stage["blocks"] = {
            "dw_w": dense(sk[0], (depth, k7, k7, 1, dim), k7 * k7),
            "dw_b": jnp.zeros((depth, dim)),
            "norm_g": jnp.ones((depth, dim)),
            "norm_b": jnp.zeros((depth, dim)),
            "fc1_w": dense(sk[1], (depth, dim, hid), dim),
            "fc1_b": jnp.zeros((depth, hid)),
            "fc2_w": dense(sk[2], (depth, hid, dim), hid),
            "fc2_b": jnp.zeros((depth, dim)),
            "gamma": jnp.full((depth, dim), 1e-6),
        }
        out["stages"].append(stage)
    df = cfg.dims[-1]
    out["head"] = {
        "norm_g": jnp.ones((df,)),
        "norm_b": jnp.zeros((df,)),
        "proj_w": dense(ks[-1], (df, embed_dim), df),
        "proj_b": jnp.zeros((embed_dim,)),
    }
    return out


# ------------------------------------------------------------ torch interop
def _to_np(v) -> np.ndarray:
    from robustvlm_tpu.models.clip.import_torch import _to_np as f

    return f(v)


def import_convnext_state_dict(
    sd: Mapping[str, Any], cfg: ConvNeXtConfig, prefix: str = ""
) -> Params:
    """open_clip TimmModel visual state dict -> param tree.

    Conv weights: torch (O, I, H, W) -> HWIO; depthwise (C, 1, k, k) ->
    (k, k, 1, C). Linear: (out, in) -> (in, out).
    """
    g = lambda k: _to_np(sd[prefix + k])

    def conv_w(k):
        return np.transpose(g(k), (2, 3, 1, 0))

    out: Params = {
        "stem": {
            "w": jnp.asarray(conv_w("trunk.stem.0.weight")),
            "b": jnp.asarray(g("trunk.stem.0.bias")),
            "norm_g": jnp.asarray(g("trunk.stem.1.weight")),
            "norm_b": jnp.asarray(g("trunk.stem.1.bias")),
        },
        "stages": [],
    }
    for s, depth in enumerate(cfg.depths):
        st = f"trunk.stages.{s}."
        stage: Params = {}
        if s > 0:
            stage["ds_norm_g"] = jnp.asarray(g(st + "downsample.0.weight"))
            stage["ds_norm_b"] = jnp.asarray(g(st + "downsample.0.bias"))
            stage["ds_w"] = jnp.asarray(conv_w(st + "downsample.1.weight"))
            stage["ds_b"] = jnp.asarray(g(st + "downsample.1.bias"))

        def stacked(fmt, f=lambda a: a):
            return jnp.asarray(
                np.stack([f(g(st + f"blocks.{i}." + fmt)) for i in range(depth)])
            )

        stage["blocks"] = {
            "dw_w": stacked(
                "conv_dw.weight", lambda a: np.transpose(a, (2, 3, 1, 0))
            ),
            "dw_b": stacked("conv_dw.bias"),
            "norm_g": stacked("norm.weight"),
            "norm_b": stacked("norm.bias"),
            "fc1_w": stacked("mlp.fc1.weight", lambda a: a.T),
            "fc1_b": stacked("mlp.fc1.bias"),
            "fc2_w": stacked("mlp.fc2.weight", lambda a: a.T),
            "fc2_b": stacked("mlp.fc2.bias"),
            "gamma": stacked("gamma"),
        }
        out["stages"].append(stage)
    out["head"] = {
        "norm_g": jnp.asarray(g("trunk.head.norm.weight")),
        "norm_b": jnp.asarray(g("trunk.head.norm.bias")),
        "proj_w": jnp.asarray(g("head.proj.weight").T),
        "proj_b": jnp.asarray(g("head.proj.bias")),
    }
    return out


def export_convnext_state_dict(
    visual: Params, cfg: ConvNeXtConfig
) -> Dict[str, np.ndarray]:
    """Inverse of import_convnext_state_dict (torch-layout numpy values)."""
    out: Dict[str, np.ndarray] = {}

    def conv_w(a):
        return np.transpose(np.asarray(a), (3, 2, 0, 1))

    st = visual["stem"]
    out["trunk.stem.0.weight"] = conv_w(st["w"])
    out["trunk.stem.0.bias"] = np.asarray(st["b"])
    out["trunk.stem.1.weight"] = np.asarray(st["norm_g"])
    out["trunk.stem.1.bias"] = np.asarray(st["norm_b"])
    for s, depth in enumerate(cfg.depths):
        sp = visual["stages"][s]
        pre = f"trunk.stages.{s}."
        if s > 0:
            out[pre + "downsample.0.weight"] = np.asarray(sp["ds_norm_g"])
            out[pre + "downsample.0.bias"] = np.asarray(sp["ds_norm_b"])
            out[pre + "downsample.1.weight"] = conv_w(sp["ds_w"])
            out[pre + "downsample.1.bias"] = np.asarray(sp["ds_b"])
        b = sp["blocks"]
        for i in range(depth):
            bp = pre + f"blocks.{i}."
            out[bp + "conv_dw.weight"] = conv_w(b["dw_w"][i])
            out[bp + "conv_dw.bias"] = np.asarray(b["dw_b"][i])
            out[bp + "norm.weight"] = np.asarray(b["norm_g"][i])
            out[bp + "norm.bias"] = np.asarray(b["norm_b"][i])
            out[bp + "mlp.fc1.weight"] = np.asarray(b["fc1_w"][i]).T
            out[bp + "mlp.fc1.bias"] = np.asarray(b["fc1_b"][i])
            out[bp + "mlp.fc2.weight"] = np.asarray(b["fc2_w"][i]).T
            out[bp + "mlp.fc2.bias"] = np.asarray(b["fc2_b"][i])
            out[bp + "gamma"] = np.asarray(b["gamma"][i])
    hd = visual["head"]
    out["trunk.head.norm.weight"] = np.asarray(hd["norm_g"])
    out["trunk.head.norm.bias"] = np.asarray(hd["norm_b"])
    out["head.proj.weight"] = np.asarray(hd["proj_w"]).T
    out["head.proj.bias"] = np.asarray(hd["proj_b"])
    return out
