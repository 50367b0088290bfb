"""OpenFlamingo: CLIP ViT -> PerceiverResampler -> gated cross-attention
conditioning of a frozen MPT decoder.

Functional equivalent of reference open_flamingo/src/:
- PerceiverResampler (helpers.py:68-132): 64 learned latents attend to
  [media; latents] per media slot, 6 layers, LN-free-residual + 4x GELU FF,
  final LN.
- MaskedCrossAttention (helpers.py:136-233): text queries attend media
  latents with media-location time masking — a text token attends ONLY the
  latents of its immediately preceding <image> (only_attend_immediate_media),
  and tokens before any media get their cross-attention zeroed.
- GatedCrossAttentionBlock (helpers.py:236-279): tanh(attn_gate)/tanh(ff_gate)
  scaling, initialized 0 (identity at init).
- Flamingo (flamingo.py:17-389): vision tokens gated into every Nth decoder
  layer (cross_attn_every_n_layers=4 for OpenFlamingo-9B); vision grads flow
  when attacking (the compute_all_grads hook, flamingo.py:216-217, is always
  'on' here — jax grads flow wherever differentiated).

TPU-first: media shapes are static (B, T_img, F, v, D); the resampler runs
all media slots batched; the xattn time-mask is a vectorized comparison of
cumsum(media_locations) with media indices.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from robustvlm_tpu.models.clip.model import CLIPConfig, CLIP_CONFIGS, vision_forward
from robustvlm_tpu.models.mpt.model import (
    MPT_CONFIGS,
    MPTConfig,
    init_mpt_cache,
    mpt_forward,
)
from robustvlm_tpu.ops.image import normalize_clip, resize_bicubic

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FlamingoConfig:
    name: str
    mpt: MPTConfig
    vision: CLIPConfig
    cross_attn_every_n_layers: int = 4
    resampler_depth: int = 6
    resampler_heads: int = 8
    resampler_dim_head: int = 64
    num_latents: int = 64
    media_token_id: int = -1   # set after tokenizer extension
    ff_mult: int = 4

    @property
    def n_xattn(self) -> int:
        return self.mpt.n_layers // self.cross_attn_every_n_layers


FLAMINGO_CONFIGS: Dict[str, FlamingoConfig] = {
    # OpenFlamingo-9B: ViT-L/14 + MPT-7B, xattn every 4 layers
    "openflamingo-9b": FlamingoConfig(
        "openflamingo-9b", MPT_CONFIGS["mpt-7b"], CLIP_CONFIGS["ViT-L-14"],
    ),
    "test-tiny": FlamingoConfig(
        "test-tiny", MPT_CONFIGS["test-tiny"], CLIP_CONFIGS["test-tiny"],
        cross_attn_every_n_layers=1, resampler_depth=2, resampler_heads=2,
        resampler_dim_head=16, num_latents=4,
    ),
}


def _ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return (
        ((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * g + b
    ).astype(x.dtype)


def _ff(x, p):
    """FeedForward: LN -> Linear(4x, no bias) -> GELU -> Linear (helpers.py:15-22)."""
    cd = x.dtype
    h = _ln(x, p["ln_g"], p["ln_b"])
    return jax.nn.gelu(h @ p["w1"].astype(cd), approximate=False) @ p["w2"].astype(cd)


# ----------------------------------------------------------------- resampler
def perceiver_attention(x, latents, p, heads: int):
    """x (B,T,n1,D) media, latents (B,T,n2,D) -> (B,T,n2,D)."""
    cd = x.dtype
    x = _ln(x, p["ln_media_g"], p["ln_media_b"])
    latents = _ln(latents, p["ln_lat_g"], p["ln_lat_b"])
    q = latents @ p["to_q"].astype(cd)
    kv_in = jnp.concatenate([x, latents], axis=-2)
    k, v = jnp.split(kv_in @ p["to_kv"].astype(cd), 2, axis=-1)
    b, t, n2, inner = q.shape
    hd = inner // heads

    def hs(a):
        return a.reshape(*a.shape[:3], heads, hd).transpose(0, 1, 3, 2, 4)

    q, k, v = hs(q), hs(k), hs(v)  # (B,T,H,n,hd)
    s = jnp.einsum("bthid,bthjd->bthij", q, k).astype(jnp.float32) * (hd ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum("bthij,bthjd->bthid", a, v)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, t, n2, inner)
    return out @ p["to_out"].astype(cd)


def perceiver_resampler(params: Params, x: jax.Array, cfg: FlamingoConfig) -> jax.Array:
    """media features (B, T, F, v, D) -> latents (B, T, num_latents, D)."""
    b, t, f, v, d = x.shape
    x = x.reshape(b, t, f * v, d)
    lat = jnp.broadcast_to(
        params["latents"].astype(x.dtype), (b, t, cfg.num_latents, d)
    )

    def body(lat, lp):
        lat = perceiver_attention(x, lat, lp["attn"], cfg.resampler_heads) + lat
        lat = _ff(lat, lp["ff"]) + lat
        return lat, None

    lat, _ = jax.lax.scan(body, lat, params["layers"])
    return _ln(lat, params["norm_g"], params["norm_b"])


# ------------------------------------------------------------ gated xattn
def masked_cross_attention(
    x: jax.Array,
    media: jax.Array,
    p: Params,
    heads: int,
    media_locations: Optional[jax.Array],
    use_cached_media: bool = False,
) -> jax.Array:
    """x (B,T_txt,D), media (B,T_img,n,Dv) with immediate-media time masking
    (helpers.py:160-233)."""
    b, t_txt, _ = x.shape
    t_img, n_lat = media.shape[1], media.shape[2]
    cd = x.dtype
    h = _ln(x, p["ln_g"], p["ln_b"])
    q = h @ p["to_q"].astype(cd)
    m = media.reshape(b, t_img * n_lat, media.shape[-1])
    k, v = jnp.split(m.astype(cd) @ p["to_kv"].astype(cd), 2, axis=-1)
    inner = q.shape[-1]
    hd = inner // heads

    def hs(a):
        return a.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = hs(q), hs(k), hs(v)
    s = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * (hd ** -0.5)

    if media_locations is not None:
        media_time = jnp.arange(t_img) + 1  # (T_img,)
        if use_cached_media:
            text_time = jnp.broadcast_to(
                jnp.sum(media_locations.astype(jnp.int32), axis=1)[:, None],
                (b, t_txt),
            )
        else:
            text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=1)
        mt = jnp.repeat(media_time, n_lat)  # (T_img*n,)
        mask = text_time[:, :, None] == mt[None, None, :]  # immediate media
        s = jnp.where(mask[:, None], s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        no_media = (text_time == 0)[:, None, :, None]
        a = jnp.where(no_media, 0.0, a).astype(q.dtype)
    else:
        a = jax.nn.softmax(s, axis=-1).astype(q.dtype)

    out = jnp.einsum("bhij,bhjd->bhid", a, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t_txt, inner)
    return out @ p["to_out"].astype(cd)


def gated_xattn_block(x, media, p, heads, media_locations, use_cached_media=False):
    att = masked_cross_attention(
        x, media, p["attn"], heads, media_locations, use_cached_media
    )
    x = x + jnp.tanh(p["attn_gate"]).astype(x.dtype) * att
    x = x + jnp.tanh(p["ff_gate"]).astype(x.dtype) * _ff(x, p["ff"])
    return x


# ------------------------------------------------------------------ flamingo
def encode_vision(
    params: Params, vision_x: jax.Array, cfg: FlamingoConfig,
    *, compute_dtype=jnp.bfloat16, remat: bool = False,
) -> jax.Array:
    """[0,1] pixels (B, T_img, F, C, H, W) -> resampled latents
    (B, T_img, num_latents, D_vis). Normalization + resize inside
    (threat-model contract; reference of_eval_model_adv.py:173)."""
    b, t, f = vision_x.shape[:3]
    x = vision_x.reshape(b * t * f, *vision_x.shape[3:])
    if x.shape[-2:] != (cfg.vision.image_size, cfg.vision.image_size):
        x = resize_bicubic(x, cfg.vision.image_size)
    tokens = vision_forward(
        {"visual": params["vision"]}, normalize_clip(x), cfg.vision,
        tokens=True, compute_dtype=compute_dtype, remat=remat,
    )  # (BTF, 1+v, W) — reference uses all patch tokens minus CLS
    tokens = tokens[:, 1:]
    v, d = tokens.shape[1], tokens.shape[2]
    tokens = tokens.reshape(b, t, f, v, d)
    return perceiver_resampler(params["perceiver"], tokens, cfg)


def flamingo_forward(
    params: Params,
    vision_x: jax.Array,
    lang_x: jax.Array,
    cfg: FlamingoConfig,
    *,
    media_locations: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    media_latents: Optional[jax.Array] = None,
) -> jax.Array:
    """Full VLM forward -> fp32 logits (B, T_txt, V).

    media_locations defaults to (lang_x == media_token_id)."""
    if media_latents is None:
        media_latents = encode_vision(
            params, vision_x, cfg, compute_dtype=compute_dtype, remat=remat
        )
    if media_locations is None:
        if cfg.media_token_id < 0:
            # the default -1 (pre-tokenizer-extension) matches no token:
            # all cross-attention would silently zero and the model would
            # caption from the LM prior while ignoring the images
            raise ValueError(
                "cfg.media_token_id is unset (<0); dataclasses.replace the "
                "config with the tokenizer's <image> id before the forward"
            )
        media_locations = lang_x == cfg.media_token_id

    xattn = params["xattn"]
    every = cfg.cross_attn_every_n_layers

    def hook(i, h):
        if i % every == 0:
            xp = jax.tree.map(lambda a: a[i // every], xattn)
            return gated_xattn_block(
                h, media_latents, xp, cfg.resampler_heads, media_locations
            )
        return h

    return mpt_forward(
        params["mpt"], lang_x, cfg=cfg.mpt, compute_dtype=compute_dtype,
        remat=remat, layer_hook=hook,
    )


def flamingo_per_sample_loss(
    params: Params,
    vision_x: jax.Array,
    lang_x: jax.Array,
    labels: jax.Array,
    label_mask: jax.Array,
    cfg: FlamingoConfig,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> jax.Array:
    """Per-sample SUMMED CE over unmasked next-token targets — the attack
    target (reference of_eval_model_adv.py compute_loss :245-254: shifted
    labels, sum over tokens)."""
    logits = flamingo_forward(
        params, vision_x, lang_x, cfg,
        compute_dtype=compute_dtype, remat=remat,
    )
    pred = logits[:, :-1]
    tgt = labels[:, 1:]
    msk = label_mask[:, 1:]
    lp = jax.nn.log_softmax(pred, axis=-1)
    tok_lp = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    return -jnp.sum(tok_lp * msk, axis=-1)


def make_flamingo_decode_fns(
    params: Params,
    cfg: FlamingoConfig,
    vision_x: jax.Array,
    *,
    max_total_len: int,
    compute_dtype=jnp.bfloat16,
):
    """(prefill_fn, decode_fn) for models/generation.py. Media latents are
    computed once and cached (reference condition_media/cached-media
    generation path, flamingo.py:365-388, flamingo_lm.py:128-157)."""
    if cfg.media_token_id < 0:
        raise ValueError(
            "cfg.media_token_id is unset (<0); dataclasses.replace the "
            "config with the tokenizer's <image> id before decoding"
        )
    media = encode_vision(params, vision_x, cfg, compute_dtype=compute_dtype)
    every = cfg.cross_attn_every_n_layers
    xattn = params["xattn"]

    def make_hook(media_r, media_locations, use_cached):
        def hook(i, h):
            if i % every == 0:
                xp = jax.tree.map(lambda a: a[i // every], xattn)
                return gated_xattn_block(
                    h, media_r, xp, cfg.resampler_heads, media_locations,
                    use_cached_media=use_cached,
                )
            return h
        return hook

    def prefill_fn(tokens, kv_valid, positions):
        b = tokens.shape[0]
        n_rep = b // media.shape[0]  # beam-expanded batches
        media_r = jnp.repeat(media, n_rep, axis=0) if n_rep > 1 else media
        media_locations = (tokens == cfg.media_token_id) & kv_valid
        cache = init_mpt_cache(cfg.mpt, b, max_len=max_total_len, dtype=compute_dtype)
        logits, cache = mpt_forward(
            params["mpt"], tokens, cfg=cfg.mpt, compute_dtype=compute_dtype,
            cache=cache, cache_pos=0, kv_mask=kv_valid, positions=positions,
            layer_hook=make_hook(media_r, media_locations, use_cached=False),
        )
        return logits[:, -1], (cache, media_locations)

    def decode_fn(tok, carry, pos, kv_mask, qpos):
        cache, media_locations = carry
        b = tok.shape[0]
        n_rep = b // media.shape[0]
        media_r = jnp.repeat(media, n_rep, axis=0) if n_rep > 1 else media
        logits, cache = mpt_forward(
            params["mpt"], tok, cfg=cfg.mpt, compute_dtype=compute_dtype,
            cache=cache, cache_pos=pos, kv_mask=kv_mask, positions=qpos,
            layer_hook=make_hook(media_r, media_locations, use_cached=True),
        )
        return logits, (cache, media_locations)

    def reorder_carry(carry, gather):
        # beam search: cache leaves are (L, B, H, N, hd) — batch on axis 1;
        # media_locations is (B, T) — batch on axis 0
        cache, media_locations = carry
        return (
            jax.tree.map(lambda a: jnp.take(a, gather, axis=1), cache),
            jnp.take(media_locations, gather, axis=0),
        )

    prefill_fn.reorder_carry = reorder_carry

    return prefill_fn, decode_fn


# ---------------------------------------------------------------------- init
def init_flamingo_params(rng: jax.Array, cfg: FlamingoConfig) -> Params:
    from robustvlm_tpu.models.clip.model import init_clip_params
    from robustvlm_tpu.models.mpt.model import init_mpt_params

    kv, km, kp, kx = jax.random.split(rng, 4)
    clip = init_clip_params(kv, cfg.vision)
    dv = cfg.vision.vision.width
    inner = cfg.resampler_heads * cfg.resampler_dim_head
    dl = cfg.mpt.d_model
    depth = cfg.resampler_depth
    nx = cfg.n_xattn

    def lin(k, shape, scale=None):
        scale = scale or shape[-2] ** -0.5
        return jax.random.normal(k, shape) * scale

    ks = jax.random.split(kp, 8)
    perceiver = {
        "latents": jax.random.normal(ks[0], (cfg.num_latents, dv)),
        "layers": {
            "attn": {
                "ln_media_g": jnp.ones((depth, dv)), "ln_media_b": jnp.zeros((depth, dv)),
                "ln_lat_g": jnp.ones((depth, dv)), "ln_lat_b": jnp.zeros((depth, dv)),
                "to_q": lin(ks[1], (depth, dv, inner)),
                "to_kv": lin(ks[2], (depth, dv, 2 * inner)),
                "to_out": lin(ks[3], (depth, inner, dv)),
            },
            "ff": {
                "ln_g": jnp.ones((depth, dv)), "ln_b": jnp.zeros((depth, dv)),
                "w1": lin(ks[4], (depth, dv, cfg.ff_mult * dv)),
                "w2": lin(ks[5], (depth, cfg.ff_mult * dv, dv)),
            },
        },
        "norm_g": jnp.ones((dv,)), "norm_b": jnp.zeros((dv,)),
    }
    kxs = jax.random.split(kx, 6)
    xattn = {
        "attn": {
            "ln_g": jnp.ones((nx, dl)), "ln_b": jnp.zeros((nx, dl)),
            "to_q": lin(kxs[0], (nx, dl, inner)),
            "to_kv": lin(kxs[1], (nx, dv, 2 * inner)),
            "to_out": lin(kxs[2], (nx, inner, dl)),
        },
        "ff": {
            "ln_g": jnp.ones((nx, dl)), "ln_b": jnp.zeros((nx, dl)),
            "w1": lin(kxs[3], (nx, dl, cfg.ff_mult * dl)),
            "w2": lin(kxs[4], (nx, cfg.ff_mult * dl, dl)),
        },
        "attn_gate": jnp.zeros((nx,)),
        "ff_gate": jnp.zeros((nx,)),
    }
    return {
        "vision": clip["visual"],
        "perceiver": perceiver,
        "xattn": xattn,
        "mpt": init_mpt_params(km, cfg.mpt),
    }
