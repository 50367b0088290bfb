"""BLIP-2: EVA-ViT vision tower -> Q-Former -> OPT decoder, as pure functions.

Covers the reference's BLIP-2 eval model (open_flamingo/eval/models/blip.py,
which wraps HF Blip2ForConditionalGeneration) as a first-class JAX model
family. Numerically matches HF `Blip2ForConditionalGeneration` semantics so
Salesforce checkpoints import losslessly (import_torch.py):

- Vision (Blip2VisionModel): conv patch embed WITH bias, [CLS|patches] +
  learned positions, pre-LN blocks whose qkv projection has no weight bias
  but a (q_bias, 0, v_bias) assembled bias vector, exact GELU, eps 1e-6,
  post-LayerNorm over all tokens (the Q-Former consumes every token).
- Q-Former (Blip2QFormerModel, query-only path): 32 learned query tokens,
  post-LN BERT-style layers — self-attention over queries, cross-attention
  to the image tokens every `xattn_every` layers (HF cross_attention_
  frequency), query feed-forward — with eps 1e-12.
- Glue (Blip2ForConditionalGeneration.get_image_features + forward): the
  projected query outputs are PREFIXED to the prompt's token embeddings and
  the OPT decoder runs causally over the concatenation.

Threat-model contract: `blip2_per_sample_loss` takes UNNORMALIZED [0,1]
pixels and applies the CLIP mean/std inside (the reference strips the
processor's Normalize and re-applies in-wrapper; BLIP-2 shares CLIP's
normalization constants).

TPU-first: stacked-layer scans throughout; the Q-Former's alternating
cross-attention layers scan over groups of `xattn_every` layers (group
leader carries the cross-attention weights).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from robustvlm_tpu.models.opt.model import (
    OPT_CONFIGS,
    OPTConfig,
    init_opt_params,
    opt_forward,
)
from robustvlm_tpu.ops.image import normalize_clip

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Blip2VisionConfig:
    width: int
    layers: int
    heads: int
    image_size: int
    patch_size: int
    intermediate: int
    norm_eps: float = 1e-6

    @property
    def n_tokens(self) -> int:
        g = self.image_size // self.patch_size
        return g * g + 1


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    width: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    xattn_every: int = 2  # HF cross_attention_frequency
    norm_eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class Blip2Config:
    name: str
    vision: Blip2VisionConfig
    qformer: QFormerConfig
    opt: OPTConfig
    num_query_tokens: int = 32


BLIP2_CONFIGS: Dict[str, Blip2Config] = {
    # Salesforce/blip2-opt-2.7b: EVA ViT-g/14 (39 layers kept by HF), OPT-2.7b
    "blip2-opt-2.7b": Blip2Config(
        "blip2-opt-2.7b",
        Blip2VisionConfig(1408, 39, 16, 224, 14, 6144),
        QFormerConfig(),
        OPT_CONFIGS["opt-2.7b"],
    ),
    "blip2-opt-6.7b": Blip2Config(
        "blip2-opt-6.7b",
        Blip2VisionConfig(1408, 39, 16, 224, 14, 6144),
        QFormerConfig(),
        OPT_CONFIGS["opt-6.7b"],
    ),
    "test-tiny": Blip2Config(
        "test-tiny",
        Blip2VisionConfig(32, 2, 2, 32, 8, 64),
        QFormerConfig(width=32, layers=2, heads=2, intermediate=64),
        OPT_CONFIGS["test-tiny"],
        num_query_tokens=4,
    ),
}


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(
        x.dtype
    )


def _mha(q, k, v, heads):
    """(B, Tq/Tk, W) inputs already projected; fp32 softmax."""
    b, tq, w = q.shape
    tk = k.shape[1]
    hd = w // heads
    q = q.reshape(b, tq, heads, hd)
    k = k.reshape(b, tk, heads, hd)
    v = v.reshape(b, tk, heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    s = s / jnp.sqrt(hd)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, tq, w)


# ----------------------------------------------------------------- vision
def blip2_vision_forward(
    params: Params,
    x: jax.Array,
    cfg: Blip2Config,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """NCHW normalized pixels -> (B, N+1, W) post-LayerNorm token features
    (HF Blip2VisionModel.last_hidden_state)."""
    vc = cfg.vision
    vp = params["visual"]
    b = x.shape[0]
    p = vc.patch_size
    g = x.shape[-1] // p
    eps = vc.norm_eps

    x = x.astype(compute_dtype)
    x = x.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5).reshape(
        b, g * g, 3 * p * p
    )
    x = x @ vp["patch_embed"].astype(compute_dtype) + vp["patch_bias"].astype(
        compute_dtype
    )
    cls = jnp.broadcast_to(
        vp["class_embedding"].astype(compute_dtype), (b, 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vp["positional_embedding"][: x.shape[1]].astype(compute_dtype)

    def body(h, bp):
        cd = h.dtype
        a = _ln(h, bp["ln_1"], eps)
        qkv = a @ bp["attn"]["qkv_w"].astype(cd) + bp["attn"]["qkv_b"].astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = _mha(q, k, v, vc.heads)
        h = h + (att @ bp["attn"]["out_w"].astype(cd)
                 + bp["attn"]["out_b"].astype(cd))
        m = _ln(h, bp["ln_2"], eps)
        m = jax.nn.gelu(
            m @ bp["mlp"]["fc_w"].astype(cd) + bp["mlp"]["fc_b"].astype(cd),
            approximate=False,
        )
        h = h + (m @ bp["mlp"]["proj_w"].astype(cd)
                 + bp["mlp"]["proj_b"].astype(cd))
        return h, None

    if remat:
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    x, _ = jax.lax.scan(body, x, vp["blocks"])
    return _ln(x, vp["ln_post"], eps).astype(jnp.float32)


# ----------------------------------------------------------------- qformer
def qformer_forward(
    params: Params,
    image_embeds: jax.Array,
    cfg: Blip2Config,
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Learned query tokens cross-attend to image tokens -> (B, Q, Wq).

    Query-only path of HF Blip2QFormerModel (query_length == seq): BERT-style
    post-LN sublayers; layers whose index % xattn_every == 0 carry
    cross-attention (grouped scan: each group's leader is the xattn layer).
    """
    qc = cfg.qformer
    qp = params["qformer"]
    eps = qc.norm_eps
    b = image_embeds.shape[0]
    img = image_embeds.astype(compute_dtype)

    h = jnp.broadcast_to(
        params["query_tokens"].astype(compute_dtype),
        (b, cfg.num_query_tokens, qc.width),
    )
    h = _ln(h, qp["ln_embed"], eps)

    def sub_self(h, sp):
        cd = h.dtype
        W = lambda a: a.astype(cd)
        q = h @ W(sp["q_w"]) + W(sp["q_b"])
        k = h @ W(sp["k_w"]) + W(sp["k_b"])
        v = h @ W(sp["v_w"]) + W(sp["v_b"])
        att = _mha(q, k, v, qc.heads)
        return _ln(
            att @ W(sp["out_w"]) + W(sp["out_b"]) + h,
            {"g": sp["ln_g"], "b": sp["ln_b"]},
            eps,
        )

    def sub_cross(h, xp):
        cd = h.dtype
        W = lambda a: a.astype(cd)
        q = h @ W(xp["q_w"]) + W(xp["q_b"])
        k = img.astype(cd) @ W(xp["k_w"]) + W(xp["k_b"])
        v = img.astype(cd) @ W(xp["v_w"]) + W(xp["v_b"])
        att = _mha(q, k, v, qc.heads)
        return _ln(
            att @ W(xp["out_w"]) + W(xp["out_b"]) + h,
            {"g": xp["ln_g"], "b": xp["ln_b"]},
            eps,
        )

    def sub_ffn(h, fp):
        cd = h.dtype
        W = lambda a: a.astype(cd)
        m = jax.nn.gelu(h @ W(fp["fc_w"]) + W(fp["fc_b"]), approximate=False)
        return _ln(
            m @ W(fp["proj_w"]) + W(fp["proj_b"]) + h,
            {"g": fp["ln_g"], "b": fp["ln_b"]},
            eps,
        )

    freq = qc.xattn_every

    def body(h, gp):
        # gp["self"]/gp["ffn"] leaves have a leading (freq,) sub-layer axis;
        # gp["cross"] belongs to the group leader (sub-layer 0) only
        for j in range(freq):
            sp = jax.tree.map(lambda a: a[j], gp["self"])
            h = sub_self(h, sp)
            if j == 0:
                h = sub_cross(h, gp["cross"])
            h = sub_ffn(h, jax.tree.map(lambda a: a[j], gp["ffn"]))
        return h, None

    h, _ = jax.lax.scan(body, h, qp["groups"])
    return h.astype(jnp.float32)


def _maybe_resize(pixels01: jax.Array, cfg: Blip2Config) -> jax.Array:
    """Resize inside the forward (threat-model contract: attacks operate at
    the raw input resolution, the model owns preprocessing — reference
    strips the processor resize+normalize and re-applies in-wrapper)."""
    if pixels01.shape[-2:] != (cfg.vision.image_size, cfg.vision.image_size):
        from robustvlm_tpu.ops.image import resize_bicubic

        return resize_bicubic(pixels01, cfg.vision.image_size)
    return pixels01


# ----------------------------------------------------------------- glue
def blip2_image_features(
    params: Params,
    pixels_norm: jax.Array,
    cfg: Blip2Config,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Normalized pixels -> (B, Q, W_opt) language-model input embeddings
    (HF get_image_features)."""
    img = blip2_vision_forward(
        params, pixels_norm, cfg, compute_dtype=compute_dtype, remat=remat
    )
    q = qformer_forward(params, img, cfg, compute_dtype=compute_dtype)
    return q @ params["language_projection"]["w"] + params[
        "language_projection"
    ]["b"]


def blip2_forward(
    params: Params,
    pixels01: jax.Array,
    tokens: jax.Array,
    cfg: Blip2Config,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Full forward: UNNORMALIZED [0,1] pixels + prompt tokens -> fp32
    logits (B, Q + T, V). Image query embeddings are prefixed to the text
    embeddings (HF concatenation order)."""
    lm_in = blip2_image_features(
        params, normalize_clip(_maybe_resize(pixels01, cfg)), cfg,
        compute_dtype=compute_dtype, remat=remat,
    )
    tok_emb = params["opt"]["tok_embedding"][tokens]
    embeds = jnp.concatenate([lm_in.astype(tok_emb.dtype), tok_emb], axis=1)
    return opt_forward(
        params["opt"], cfg=cfg.opt, inputs_embeds=embeds,
        compute_dtype=compute_dtype, remat=remat,
    )


def blip2_per_sample_loss(
    params: Params,
    pixels01: jax.Array,
    tokens: jax.Array,
    labels: jax.Array,
    label_mask: jax.Array,
    cfg: Blip2Config,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Teacher-forced per-sample CE (B,) — the adversarial attack target,
    mirroring the VLM eval-model protocol (mean CE over the masked answer
    span; labels/mask cover the TEXT positions only, image queries never
    contribute)."""
    logits = blip2_forward(
        params, pixels01, tokens, cfg,
        compute_dtype=compute_dtype, remat=remat,
    )
    nq = cfg.num_query_tokens
    # logits at text position t predict token t+1: standard shift within
    # the text span (the last image-query logit predicts text token 0, but
    # labels follow the HF convention of masking the first text position)
    text_logits = logits[:, nq - 1 : -1]  # aligned with labels (B, T)
    logp = jax.nn.log_softmax(text_logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    m = label_mask.astype(jnp.float32)
    return -jnp.sum(ll * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def make_blip2_decode_fns(
    params: Params,
    cfg: Blip2Config,
    pixels01: jax.Array,
    *,
    max_total_len: int,
    compute_dtype=jnp.float32,
):
    """(prefill_fn, decode_fn) for models/generation.py: prefill runs the
    vision tower + Q-Former once and feeds [image queries | prompt] embeds;
    decode steps run the OPT decoder only."""
    from robustvlm_tpu.models.opt.model import init_opt_cache

    lm_in = blip2_image_features(
        params, normalize_clip(_maybe_resize(pixels01, cfg)), cfg,
        compute_dtype=compute_dtype,
    )
    nq = cfg.num_query_tokens

    def prefill_fn(tokens, kv_valid, positions):
        b = tokens.shape[0]
        n_rep = b // lm_in.shape[0]
        img_r = jnp.repeat(lm_in, n_rep, axis=0) if n_rep > 1 else lm_in
        tok_emb = params["opt"]["tok_embedding"][tokens]
        embeds = jnp.concatenate([img_r.astype(tok_emb.dtype), tok_emb], axis=1)
        kv_valid_full = jnp.concatenate(
            [jnp.ones((b, nq), bool), kv_valid], axis=1
        )
        pos_full = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(nq)[None], (b, nq)),
                nq + positions,
            ],
            axis=1,
        )
        cache = init_opt_cache(
            cfg.opt, b, max_len=nq + max_total_len, dtype=compute_dtype
        )
        logits, cache = opt_forward(
            params["opt"], cfg=cfg.opt, inputs_embeds=embeds,
            positions=pos_full, compute_dtype=compute_dtype,
            cache=cache, cache_pos=0, kv_mask=kv_valid_full,
        )
        return logits[:, -1], cache

    def decode_fn(tok, cache, pos, kv_mask, qpos):
        b = tok.shape[0]
        kv_mask_full = jnp.concatenate(
            [jnp.ones((b, nq), bool), kv_mask], axis=1
        )
        logits, cache = opt_forward(
            params["opt"], tok, cfg=cfg.opt,
            positions=nq + qpos, compute_dtype=compute_dtype,
            cache=cache, cache_pos=nq + pos, kv_mask=kv_mask_full,
        )
        return logits, cache

    return prefill_fn, decode_fn


# ----------------------------------------------------------------- init
def init_blip2_params(rng: jax.Array, cfg: Blip2Config, dtype=jnp.float32) -> Params:
    """Random init for tests; real use imports HF checkpoints."""
    vc, qc = cfg.vision, cfg.qformer
    ks = iter(jax.random.split(rng, 40))
    nxt = lambda: next(ks)

    def nrm(shape, scale):
        return (jax.random.normal(nxt(), shape) * scale).astype(dtype)

    def ln(*shape):
        return {"g": jnp.ones(shape, dtype), "b": jnp.zeros(shape, dtype)}

    lv, wv, p = vc.layers, vc.width, vc.patch_size
    sv = wv ** -0.5
    visual = {
        "patch_embed": nrm((3 * p * p, wv), sv),
        "patch_bias": jnp.zeros((wv,), dtype),
        "class_embedding": nrm((wv,), sv),
        "positional_embedding": nrm((vc.n_tokens, wv), sv),
        "blocks": {
            "ln_1": ln(lv, wv),
            "attn": {
                "qkv_w": nrm((lv, wv, 3 * wv), sv),
                "qkv_b": jnp.zeros((lv, 3 * wv), dtype),
                "out_w": nrm((lv, wv, wv), sv),
                "out_b": jnp.zeros((lv, wv), dtype),
            },
            "ln_2": ln(lv, wv),
            "mlp": {
                "fc_w": nrm((lv, wv, vc.intermediate), sv),
                "fc_b": jnp.zeros((lv, vc.intermediate), dtype),
                "proj_w": nrm((lv, vc.intermediate, wv), sv),
                "proj_b": jnp.zeros((lv, wv), dtype),
            },
        },
        "ln_post": ln(wv),
    }

    wq, fq = qc.width, qc.intermediate
    sq = wq ** -0.5
    ng = qc.layers // qc.xattn_every
    fr = qc.xattn_every

    def attn_params(n, kv_in):
        return {
            "q_w": nrm((n, wq, wq), sq), "q_b": jnp.zeros((n, wq), dtype),
            "k_w": nrm((n, kv_in, wq), sq), "k_b": jnp.zeros((n, wq), dtype),
            "v_w": nrm((n, kv_in, wq), sq), "v_b": jnp.zeros((n, wq), dtype),
            "out_w": nrm((n, wq, wq), sq), "out_b": jnp.zeros((n, wq), dtype),
            "ln_g": jnp.ones((n, wq), dtype), "ln_b": jnp.zeros((n, wq), dtype),
        }

    groups = {
        "self": jax.tree.map(
            lambda a: a.reshape(ng, fr, *a.shape[1:]),
            attn_params(qc.layers, wq),
        ),
        "cross": jax.tree.map(lambda a: a, attn_params(ng, wv)),
        "ffn": jax.tree.map(
            lambda a: a.reshape(ng, fr, *a.shape[1:]),
            {
                "fc_w": nrm((qc.layers, wq, fq), sq),
                "fc_b": jnp.zeros((qc.layers, fq), dtype),
                "proj_w": nrm((qc.layers, fq, wq), sq),
                "proj_b": jnp.zeros((qc.layers, wq), dtype),
                "ln_g": jnp.ones((qc.layers, wq), dtype),
                "ln_b": jnp.zeros((qc.layers, wq), dtype),
            },
        ),
    }

    return {
        "visual": visual,
        "query_tokens": nrm((cfg.num_query_tokens, wq), 0.02),
        "qformer": {"ln_embed": ln(wq), "groups": groups},
        "language_projection": {
            "w": nrm((wq, cfg.opt.dim), sq),
            "b": jnp.zeros((cfg.opt.dim,), dtype),
        },
        "opt": init_opt_params(nxt(), cfg.opt, dtype),
    }
