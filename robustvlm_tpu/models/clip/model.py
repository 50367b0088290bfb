"""CLIP (vision + text) as pure functions over parameter pytrees.

Replaces the reference's external open_clip dependency (SURVEY.md §2.7): the
openai-architecture ViT-B/32 and ViT-L/14(-336) vision towers with QuickGELU,
and the 77-token causal text tower with argmax-EOT pooling, numerically
matching open_clip's `model.visual(normalize(x))` / `model.encode_text` so
published torch checkpoints import losslessly (see import_torch.py).

TPU-first design decisions:
- Transformer blocks are *stacked*: per-layer weights share one leading layer
  axis and the depth loop is a `jax.lax.scan` — O(1) compile time in depth and
  a single fused block kernel instance.
- The patch conv is a reshape + one big matmul (MXU), not a conv.
- Attention uses einsum with fp32 softmax; activations can run in bfloat16
  (`compute_dtype`) while LayerNorm statistics stay fp32.
- Optional `remat` wraps each block in `jax.checkpoint` so grad-wrt-pixels
  attack chains (10-100 sequential fwd+bwd) fit HBM at large batch.

Parameter tree (all leaves jnp arrays; L = n_layers, W = width):
  visual:
    patch_embed (3*p*p, W), class_embedding (W,), positional_embedding (N+1, W)
    ln_pre {g,b}, blocks {ln_1{g,b}(L,W), attn{qkv_w(L,W,3W), qkv_b(L,3W),
    out_w(L,W,W), out_b(L,W)}, ln_2{g,b}, mlp{fc_w(L,W,4W), fc_b(L,4W),
    proj_w(L,4W,W), proj_b(L,W)}}, ln_post {g,b}, proj (W, D)
  text:
    token_embedding (V, Wt), positional_embedding (77, Wt), blocks {...},
    ln_final {g,b}, text_projection (Wt, D)
  logit_scale: scalar (log of temperature; exp() ~ 100 for openai ckpts)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    width: int
    layers: int
    heads: int
    # open_clip mlp_ratio: hidden = int(width * mlp_ratio). 4.0 everywhere
    # except ViT-g-14's vision tower (4.3637 -> 6144); the forward reads
    # hidden from the param shapes, so this only steers init.
    mlp_ratio: float = 4.0


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    name: str
    embed_dim: int
    image_size: int
    patch_size: int
    vision: TransformerConfig
    text: TransformerConfig
    vocab_size: int = 49408
    context_length: int = 77
    quick_gelu: bool = True  # openai pretrained models use QuickGELU
    # vision tower architecture: "vit" (default) or "convnext"
    # (open_clip convnext_base_w family — the zoo's ConvNeXt-B backbones)
    vision_arch: str = "vit"
    convnext: Optional[Any] = None  # ConvNeXtConfig when vision_arch=="convnext"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_vision_tokens(self) -> int:
        return self.grid * self.grid + 1


CLIP_CONFIGS: Dict[str, CLIPConfig] = {
    "ViT-B-32": CLIPConfig(
        "ViT-B-32", 512, 224, 32,
        TransformerConfig(768, 12, 12), TransformerConfig(512, 12, 8),
    ),
    "ViT-B-16": CLIPConfig(
        "ViT-B-16", 512, 224, 16,
        TransformerConfig(768, 12, 12), TransformerConfig(512, 12, 8),
    ),
    "ViT-L-14": CLIPConfig(
        "ViT-L-14", 768, 224, 14,
        TransformerConfig(1024, 24, 16), TransformerConfig(768, 12, 12),
    ),
    "ViT-L-14-336": CLIPConfig(
        "ViT-L-14-336", 768, 336, 14,
        TransformerConfig(1024, 24, 16), TransformerConfig(768, 12, 12),
    ),
    # LAION-2B pretrains (the zoo's "ViT-B/32 LAION-2B" / "ViT-B/16
    # LAION-2B" TeCoA/FARE backbones, reference README.md:263-266): same
    # architecture, standard GELU instead of OpenAI's QuickGELU.
    "ViT-B-32-laion": CLIPConfig(
        "ViT-B-32-laion", 512, 224, 32,
        TransformerConfig(768, 12, 12), TransformerConfig(512, 12, 8),
        quick_gelu=False,
    ),
    "ViT-B-16-laion": CLIPConfig(
        "ViT-B-16-laion", 512, 224, 16,
        TransformerConfig(768, 12, 12), TransformerConfig(512, 12, 8),
        quick_gelu=False,
    ),
    # Larger LAION open_clip variants (reference CLIP_benchmark
    # model_collection.py:8-17 "openclip_base": ViT-B-16-plus-240/H-14/g-14
    # rows of the clean zero-shot suite). Standard GELU, import via the
    # same shape-driven open_clip state-dict path.
    "ViT-B-16-plus-240": CLIPConfig(
        "ViT-B-16-plus-240", 640, 240, 16,
        TransformerConfig(896, 12, 14), TransformerConfig(640, 12, 10),
        quick_gelu=False,
    ),
    "ViT-H-14": CLIPConfig(
        "ViT-H-14", 1024, 224, 14,
        TransformerConfig(1280, 32, 16), TransformerConfig(1024, 24, 16),
        quick_gelu=False,
    ),
    "ViT-g-14": CLIPConfig(
        "ViT-g-14", 1024, 224, 14,
        TransformerConfig(1408, 40, 16, mlp_ratio=4.3637),
        TransformerConfig(1024, 24, 16),
        quick_gelu=False,
    ),
    # tiny config for tests
    "test-tiny": CLIPConfig(
        "test-tiny", 64, 32, 8,
        TransformerConfig(64, 2, 4), TransformerConfig(64, 2, 4),
        vocab_size=512, context_length=16,
    ),
}


def _register_convnext_configs():
    # Deferred: convnext.py imports _maybe_remat from this module.
    from robustvlm_tpu.models.clip.convnext import ConvNeXtConfig

    # open_clip `convnext_base_w` (the zoo's ConvNeXt-B LAION-2B backbone,
    # reference README.md:267-268): 256px, embed 640, GELU text tower.
    CLIP_CONFIGS["convnext_base_w"] = CLIPConfig(
        "convnext_base_w", 640, 256, 4,
        TransformerConfig(1024, 0, 16),  # unused by the convnext tower
        TransformerConfig(640, 12, 10),
        quick_gelu=False, vision_arch="convnext",
        convnext=ConvNeXtConfig(),
    )
    CLIP_CONFIGS["test-tiny-convnext"] = CLIPConfig(
        "test-tiny-convnext", 64, 32, 4,
        TransformerConfig(64, 0, 4),
        TransformerConfig(64, 2, 4),
        vocab_size=512, context_length=16,
        quick_gelu=False, vision_arch="convnext",
        convnext=ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64)),
    )


# ----------------------------------------------------------------- primitives
def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with fp32 statistics regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _attention(
    x: jax.Array,
    p: Params,
    heads: int,
    attn_mask: Optional[jax.Array],
    flash: bool = False,
    softmax_dtype=jnp.float32,
) -> jax.Array:
    b, n, w = x.shape
    hd = w // heads
    cd = x.dtype
    qkv = x @ p["qkv_w"].astype(cd) + p["qkv_b"].astype(cd)  # (B, N, 3W)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    if flash:
        # fused Pallas kernels; attn_mask only ever encodes causality in
        # CLIP. Non-causal ViT attention uses the whole-sequence fused
        # kernel (ops/pallas/vit_attention.py — the attack hot path);
        # causal text attention uses the flash kernel.
        def heads_split(t):
            return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

        if attn_mask is None:
            from robustvlm_tpu.ops.pallas.vit_attention import vit_attention

            out = vit_attention(heads_split(q), heads_split(k), heads_split(v))
        else:
            from robustvlm_tpu.ops.pallas.flash_attention import flash_attention

            out = flash_attention(
                heads_split(q), heads_split(k), heads_split(v), causal=True,
            )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, w)
    else:
        # head axis stays in (B, N, H, hd) layout — no physical transposes;
        # the einsums batch over (b, h) and XLA picks the layouts
        q = q.reshape(b, n, heads, hd)
        k = k.reshape(b, n, heads, hd)
        v = v.reshape(b, n, heads, hd)
        if CLS_SPLIT_ATTENTION and attn_mask is None and n > 1 and (n - 1) % 8 == 0:
            out = _cls_split_attention(
                q * jnp.asarray(1.0 / float(hd) ** 0.5, cd), k, v,
                softmax_dtype,
            ).reshape(b, n, w)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
            if attn_mask is not None:
                scores = scores + attn_mask
            probs = jax.nn.softmax(scores.astype(softmax_dtype), axis=-1).astype(x.dtype)
            # named for the 'dots_probs' remat policy: saving probs removes
            # the scores-einsum + softmax recompute from the backward pass
            probs = checkpoint_name(probs, "attn_probs")
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, w)
    return out @ p["out_w"].astype(cd) + p["out_b"].astype(cd)


# Route no-mask ViT attention through the tile-aligned [cls; patches]
# decomposition below. Default OFF: measured on v5e at ViT-L b8 it LOSES
# to the dense einsum path (fwd-only 11.45 vs 10.65 ms/eval, full attack
# step 28.5 vs 26.3) — the per-layer token-dim slices/concat and their
# pad-transposes in the remat backward cost more than the MXU tile
# alignment saves (attention einsums are only ~1.7 ms of the 26.3 ms
# step; the 42 TF/s they run at is not the bottleneck). Kept as an
# explicitly-measured negative result and for shapes where the fringe
# amortizes better.
CLS_SPLIT_ATTENTION = False


def _cls_split_attention(q, k, v, softmax_dtype):
    """Exact attention for [cls; patches] sequences, tile-aligned on the MXU.

    ViT sequences are a class token plus a power-of-two patch grid (257 for
    L/14@224), and 257 pads the (N, N) score tiles on the 128x128 MXU.
    Splitting the cls token out runs the heavy einsums on the 256-aligned
    patch block (Q_p K_p^T and P_pp V_p tile perfectly), reduces the cls
    key to a rank-1 fringe folded in with the flash-attention two-block
    rescaling identity (exact: the row max and denominator include the cls
    score), and handles the single cls query as one cheap full-width row.

    q is PRE-SCALED by 1/sqrt(head_dim). Shapes (B, N, H, D) -> (B, N, H, D).
    """
    qc, qp = q[:, :1], q[:, 1:]
    kc, kp = k[:, :1], k[:, 1:]
    vc, vp = v[:, :1], v[:, 1:]
    cd = v.dtype
    s_pp = jnp.einsum("bqhd,bkhd->bhqk", qp, kp).astype(softmax_dtype)
    s_pc = jnp.einsum("bqhd,bkhd->bhqk", qp, kc).astype(softmax_dtype)
    m = jnp.maximum(jnp.max(s_pp, axis=-1, keepdims=True), s_pc)
    e_pp = jnp.exp(s_pp - m)
    e_pc = jnp.exp(s_pc - m)
    l = jnp.sum(e_pp, axis=-1, keepdims=True) + e_pc
    p_pp = checkpoint_name((e_pp / l).astype(cd), "attn_probs")
    p_pc = checkpoint_name((e_pc / l).astype(cd), "attn_probs")
    # cls-key contribution is a rank-1 update: broadcast multiply (VPU),
    # not a batched (P,1)x(1,D) matmul dispatch
    o_p = jnp.einsum("bhqk,bkhd->bqhd", p_pp, vp) + jnp.swapaxes(
        p_pc, 1, 2
    ) * vc
    s_c = jnp.einsum("bqhd,bkhd->bhqk", qc, k).astype(softmax_dtype)
    p_c = checkpoint_name(
        jax.nn.softmax(s_c, axis=-1).astype(cd), "attn_probs"
    )
    o_c = jnp.einsum("bhqk,bkhd->bqhd", p_c, v)
    return jnp.concatenate([o_c, o_p], axis=1)


def _block(x, bp, heads, act, attn_mask, flash=False, softmax_dtype=jnp.float32):
    x = x + _attention(
        layer_norm(x, bp["ln_1"]["g"], bp["ln_1"]["b"]), bp["attn"], heads,
        attn_mask, flash=flash, softmax_dtype=softmax_dtype,
    )
    cd = x.dtype
    h = layer_norm(x, bp["ln_2"]["g"], bp["ln_2"]["b"])
    h = act(h @ bp["mlp"]["fc_w"].astype(cd) + bp["mlp"]["fc_b"].astype(cd))
    return x + (h @ bp["mlp"]["proj_w"].astype(cd) + bp["mlp"]["proj_b"].astype(cd))


def use_flash_default() -> bool:
    """Whether to route attention through the Pallas flash kernel by default.

    Currently False everywhere: measured on v5e, XLA's fused einsum
    attention runs the ViT-L fwd+bwd ~2x faster than the current Pallas
    kernel (98 vs 191 ms fwd @ B=64; the kernel's per-(batch*head) grid
    leaves the MXU underfed at head_dim 64). The kernel remains available
    via flash=True and for shapes XLA fuses poorly; revisit after tiling
    head-packed q blocks."""
    return False


def _transformer(
    x: jax.Array,
    blocks: Params,
    heads: int,
    act,
    attn_mask: Optional[jax.Array] = None,
    remat: bool = False,
    n_skip_last: int = 0,
    flash: Optional[bool] = None,
    softmax_dtype=jnp.float32,
    unroll: int = 1,
) -> jax.Array:
    """Scan over stacked transformer blocks.

    n_skip_last: statically drop the last k blocks (the robust LLaVA vision
    tower uses the penultimate layer, reference clip_encoder.py:59).
    unroll: lax.scan unroll factor — >1 lets XLA software-pipeline across
    block boundaries at the cost of a proportionally larger program.
    """
    if flash is None:
        flash = use_flash_default()
    n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    n_run = n_layers - n_skip_last

    def body(h, bp):
        return _block(
            h, bp, heads, act, attn_mask, flash=flash,
            softmax_dtype=softmax_dtype,
        ), None

    body = _maybe_remat(body, remat)
    run_blocks = jax.tree.map(lambda a: a[:n_run], blocks) if n_skip_last else blocks
    x, _ = jax.lax.scan(body, x, run_blocks, unroll=unroll)
    return x


def _maybe_remat(body, remat):
    """Per-block rematerialization modes:

    - False: save everything (fastest bwd, most HBM — OOMs grad-wrt-pixels
      at ViT-L batch 64 on a 16 GB chip);
    - True / 'full': save nothing inside the block — bwd pays one full
      extra forward;
    - 'dots': save the param-matmul outputs (qkv/out/fc/proj projections)
      and recompute only the elementwise ops and the attention einsums
      (~5% of fwd FLOPs) — the throughput/memory sweet spot for the
      attack hot loop (bench.py);
    - 'dots_saveable': additionally save the attention einsum outputs
      (scores / probs@v) — no matmul recompute in bwd, more HBM.
    """
    if remat in (False, None, "none"):
        return body
    if remat in (True, "full"):
        return jax.checkpoint(body)
    if remat == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    if remat == "dots_saveable":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_saveable
        )
    if remat == "dots_probs":
        # 'dots' + keep the softmax probabilities: the backward pass then
        # needs no scores-einsum/softmax recompute (probs is everything the
        # attention backward consumes), at (B, H, N, N) bf16 of extra HBM
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("attn_probs"),
            ),
        )
    raise ValueError(f"unknown remat mode: {remat!r}")


# ----------------------------------------------------------------- vision
def vision_forward(
    params: Params,
    x: jax.Array,
    cfg: CLIPConfig,
    *,
    normalize: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
    tokens: bool = False,
    n_skip_last: int = 0,
    flash: Optional[bool] = None,
    softmax_dtype=jnp.float32,
    unroll: int = 1,
) -> jax.Array:
    """Image encoder: NCHW normalized pixels -> (B, embed_dim) embedding.

    `tokens=True` returns all patch-token features after the (partial)
    transformer without ln_post/proj — the LLaVA tower interface.
    Matches open_clip VisionTransformer semantics for openai checkpoints.
    Dispatches to the ConvNeXt tower when cfg.vision_arch == "convnext".
    """
    if cfg.vision_arch == "convnext":
        from robustvlm_tpu.models.clip.convnext import convnext_forward

        if tokens or n_skip_last:
            raise ValueError("tokens/n_skip_last are ViT-tower features")
        if flash or unroll != 1 or softmax_dtype is not jnp.float32:
            raise ValueError(
                "flash/unroll/softmax_dtype are ViT-tower knobs; the "
                "ConvNeXt tower has no attention"
            )
        return convnext_forward(
            params["visual"], x, cfg.convnext, cfg.embed_dim,
            normalize=normalize, compute_dtype=compute_dtype, remat=remat,
        )
    vp = params["visual"]
    b = x.shape[0]
    p = cfg.patch_size
    g = x.shape[-1] // p  # grid from actual input size

    x = x.astype(compute_dtype)
    # patch embed as matmul: (B,3,H,W) -> (B, g*g, 3*p*p) @ (3*p*p, W)
    x = x.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, 3 * p * p)
    x = x @ vp["patch_embed"].astype(compute_dtype)
    if "patch_bias" in vp:
        # fold_normalization trees: CLIP mean/std absorbed into patch_embed
        # rows plus this bias — the forward then takes RAW [0,1] pixels
        x = x + vp["patch_bias"].astype(compute_dtype)

    cls = jnp.broadcast_to(
        vp["class_embedding"].astype(compute_dtype), (b, 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["positional_embedding"].astype(compute_dtype)
    x = layer_norm(x, vp["ln_pre"]["g"], vp["ln_pre"]["b"])

    act = quick_gelu if cfg.quick_gelu else partial(jax.nn.gelu, approximate=False)
    x = _transformer(
        x, vp["blocks"], cfg.vision.heads, act, remat=remat,
        n_skip_last=n_skip_last, flash=flash, softmax_dtype=softmax_dtype,
        unroll=unroll,
    )

    if tokens:
        return x.astype(jnp.float32)

    x = layer_norm(x[:, 0], vp["ln_post"]["g"], vp["ln_post"]["b"])
    x = x @ vp["proj"].astype(compute_dtype)
    x = x.astype(jnp.float32)
    if normalize:
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    return x


def encode_image(
    params: Params,
    x: jax.Array,
    cfg: CLIPConfig,
    *,
    normalize: bool = False,
    **kw,
) -> jax.Array:
    return vision_forward(params, x, cfg, normalize=normalize, **kw)


def fold_normalization(
    visual: Params,
    patch_size: int,
    mean=None,
    std=None,
) -> Params:
    """Absorb the CLIP per-channel normalize into the patch-embed matmul.

    normalize is affine per channel, y_c = (x_c - m_c)/s_c, and the patch
    embed is a bias-free matmul over rows ordered (channel, py, px) — so
    W'row = Wrow/s_c(row) and bias b' = -(m/s) @ W make
    `vision_forward(folded, raw_x)` ≡ `vision_forward(orig,
    normalize_clip(raw_x))` exactly (one fewer (B,3,H,W) elementwise pass
    per attack evaluation, and one fewer recompute of it under remat).
    ViT towers only (the ConvNeXt stem is a strided conv; not folded)."""
    from robustvlm_tpu.ops.image import OPENAI_MEAN, OPENAI_STD

    if "patch_embed" not in visual:
        raise ValueError("fold_normalization: ViT visual tree required")
    mean = OPENAI_MEAN if mean is None else mean
    std = OPENAI_STD if std is None else std
    w = visual["patch_embed"]  # (3*p*p, W)
    pp = patch_size * patch_size
    m = jnp.repeat(jnp.asarray(mean, w.dtype), pp)
    s = jnp.repeat(jnp.asarray(std, w.dtype), pp)
    out = dict(visual)
    out["patch_embed"] = w / s[:, None]
    out["patch_bias"] = -(m / s) @ w
    return out


# ----------------------------------------------------------------- text
def encode_text(
    params: Params,
    tokens: jax.Array,
    cfg: CLIPConfig,
    *,
    normalize: bool = False,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Text encoder: (B, context_length) int tokens -> (B, embed_dim).

    Causal transformer; pooled at the argmax token id (EOT has the highest id),
    matching open_clip's encode_text.
    """
    tp = params["text"]
    x = tp["token_embedding"][tokens].astype(compute_dtype)  # (B, T, W)
    x = x + tp["positional_embedding"][: x.shape[1]].astype(compute_dtype)

    t = x.shape[1]
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, compute_dtype), k=1)

    act = quick_gelu if cfg.quick_gelu else partial(jax.nn.gelu, approximate=False)
    x = _transformer(x, tp["blocks"], cfg.text.heads, act, attn_mask=causal)

    x = layer_norm(x, tp["ln_final"]["g"], tp["ln_final"]["b"])
    eot = jnp.argmax(tokens, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    x = (x @ tp["text_projection"].astype(compute_dtype)).astype(jnp.float32)
    if normalize:
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
    return x


# ----------------------------------------------------------------- init
def _init_ln(l, w):
    return {"g": jnp.ones((l, w)), "b": jnp.zeros((l, w))}


def _init_blocks(rng, tcfg: TransformerConfig):
    l, w = tcfg.layers, tcfg.width
    h = int(w * tcfg.mlp_ratio)
    k = jax.random.split(rng, 4)
    s = w ** -0.5
    return {
        "ln_1": _init_ln(l, w),
        "attn": {
            "qkv_w": jax.random.normal(k[0], (l, w, 3 * w)) * s,
            "qkv_b": jnp.zeros((l, 3 * w)),
            "out_w": jax.random.normal(k[1], (l, w, w)) * s,
            "out_b": jnp.zeros((l, w)),
        },
        "ln_2": _init_ln(l, w),
        "mlp": {
            "fc_w": jax.random.normal(k[2], (l, w, h)) * s,
            "fc_b": jnp.zeros((l, h)),
            "proj_w": jax.random.normal(k[3], (l, h, w)) * s,
            "proj_b": jnp.zeros((l, w)),
        },
    }


def init_clip_params(rng: jax.Array, cfg: CLIPConfig) -> Params:
    """Random init (scaled-normal) — for tests and from-scratch experiments;
    real use imports pretrained torch checkpoints (import_torch.py)."""
    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(rng, 7)
    wv, wt = cfg.vision.width, cfg.text.width
    p = cfg.patch_size
    sv, st = wv ** -0.5, wt ** -0.5
    if cfg.vision_arch == "convnext":
        from robustvlm_tpu.models.clip.convnext import init_convnext_params

        visual = init_convnext_params(kv, cfg.convnext, cfg.embed_dim)
    else:
        visual = {
            "patch_embed": jax.random.normal(k1, (3 * p * p, wv)) * sv,
            "class_embedding": jax.random.normal(k2, (wv,)) * sv,
            "positional_embedding": jax.random.normal(k3, (cfg.n_vision_tokens, wv)) * sv,
            "ln_pre": {"g": jnp.ones(wv), "b": jnp.zeros(wv)},
            "blocks": _init_blocks(kv, cfg.vision),
            "ln_post": {"g": jnp.ones(wv), "b": jnp.zeros(wv)},
            "proj": jax.random.normal(k4, (wv, cfg.embed_dim)) * sv,
        }
    kt1, kt2, kt3 = jax.random.split(kt, 3)
    return {
        "visual": visual,
        "text": {
            "token_embedding": jax.random.normal(k5, (cfg.vocab_size, wt)) * 0.02,
            "positional_embedding": jax.random.normal(kt1, (cfg.context_length, wt)) * 0.01,
            "blocks": _init_blocks(kt2, cfg.text),
            "ln_final": {"g": jnp.ones(wt), "b": jnp.zeros(wt)},
            "text_projection": jax.random.normal(kt3, (wt, cfg.embed_dim)) * st,
        },
        "logit_scale": jnp.asarray(jnp.log(1 / 0.07), jnp.float32),
    }


_register_convnext_configs()
