"""LLaVA-1.5: CLIP vision tower -> MLP projector -> LLaMA token splice.

Functional equivalent of reference llava/model/llava_arch.py
(`encode_images` :90-93, `prepare_inputs_labels_for_multimodal` :95-212) and
the robustified vision tower llava/model/multimodal_encoder/clip_encoder.py
(:31-138): the robust path loads an open_clip ViT-L/14 visual tower, DROPS
ITS LAST TRANSFORMER BLOCK (penultimate-layer features, clip_encoder.py:59),
keeps all patch tokens, no projection; `feature_select` drops the CLS token
(:76-89). The HF-tower path (select_layer=-2) is the same computation.

TPU-first: the splice is static — prompts are tokenized host-side and split
at the <image> placeholder into (pre, post) token arrays, so the spliced
embedding sequence has a fixed length and the whole teacher-forced
loss-vs-pixels forward (the attack target) jits into one graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from robustvlm_tpu.models.clip.model import CLIPConfig, CLIP_CONFIGS, vision_forward
from robustvlm_tpu.models.llama.model import (
    LLAMA_CONFIGS,
    LlamaConfig,
    llama_forward,
)
from robustvlm_tpu.models.mpt.model import MPT_CONFIGS, MPTConfig, mpt_forward
from robustvlm_tpu.ops.image import normalize_clip, resize_bicubic

Params = Dict[str, Any]

IMAGE_TOKEN_INDEX = -200  # reference llava/constants.py
IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    name: str
    llama: Optional[LlamaConfig]
    vision: CLIPConfig
    projector_type: str = "mlp2x_gelu"  # or "linear"
    # robust open_clip tower: drop last vision block, use raw patch tokens
    drop_last_vision_block: bool = True
    # language-model family: "llama" (LLaVA-1.5/Vicuna) or "mpt"
    # (reference llava/model/language_model/llava_mpt.py)
    lm_family: str = "llama"
    mpt: Optional["MPTConfig"] = None

    @property
    def lm_dim(self) -> int:
        return self.llama.dim if self.lm_family == "llama" else self.mpt.d_model

    @property
    def n_image_tokens(self) -> int:
        return self.vision.grid * self.vision.grid  # CLS dropped


LLAVA_CONFIGS: Dict[str, LlavaConfig] = {
    # LLaVA-1.5-7B: ViT-L/14-336 tower (576 tokens) + Vicuna-7B
    "llava-1.5-7b": LlavaConfig(
        "llava-1.5-7b", LLAMA_CONFIGS["llama-7b"], CLIP_CONFIGS["ViT-L-14-336"],
    ),
    # robustified tower variant: 224px open_clip ViT-L/14 (256 tokens)
    "llava-1.5-7b-rob": LlavaConfig(
        "llava-1.5-7b-rob", LLAMA_CONFIGS["llama-7b"], CLIP_CONFIGS["ViT-L-14"],
    ),
    "test-tiny": LlavaConfig(
        "test-tiny", LLAMA_CONFIGS["test-tiny"], CLIP_CONFIGS["test-tiny"],
    ),
    # MPT-backed LLaVA (reference llava_mpt.py) — tiny config for tests;
    # full-size pairs a robust tower with MPT-7B via dataclasses.replace
    "test-tiny-mpt": LlavaConfig(
        "test-tiny-mpt", None, CLIP_CONFIGS["test-tiny"],
        lm_family="mpt", mpt=MPT_CONFIGS["test-tiny"],
    ),
}


def _lm_tree(params: Params, cfg: LlavaConfig) -> Params:
    return params["llama"] if cfg.lm_family == "llama" else params["mpt"]


def _lm_forward(params: Params, cfg: LlavaConfig, **kw):
    """Dispatch to the configured decoder family; uniform kwargs."""
    if cfg.lm_family == "llama":
        return llama_forward(params["llama"], cfg=cfg.llama, **kw)
    return mpt_forward(params["mpt"], cfg=cfg.mpt, **kw)


def encode_images(
    params: Params,
    pixels01: jax.Array,
    cfg: LlavaConfig,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
) -> jax.Array:
    """[0,1] NCHW pixels -> (B, n_image_tokens, llama_dim) projected patch
    features. CLIP normalization + resize live INSIDE (threat-model
    contract); CLS dropped (feature_select 'patch')."""
    x = pixels01
    if x.shape[-2:] != (cfg.vision.image_size, cfg.vision.image_size):
        x = resize_bicubic(x, cfg.vision.image_size)
    feats = vision_forward(
        {"visual": params["vision"]}, normalize_clip(x), cfg.vision,
        tokens=True,
        n_skip_last=1 if cfg.drop_last_vision_block else 0,
        compute_dtype=compute_dtype, remat=remat,
    )  # (B, 1+P, W)
    feats = feats[:, 1:]  # drop CLS
    p = params["projector"]
    if cfg.projector_type == "linear":
        return feats @ p["w1"] + p["b1"]
    h = jax.nn.gelu(feats @ p["w1"] + p["b1"], approximate=False)
    return h @ p["w2"] + p["b2"]


def splice_embeddings(
    params: Params,
    image_feats: jax.Array,
    pre_tokens: jax.Array,
    post_tokens: jax.Array,
    cfg: Optional[LlavaConfig] = None,
) -> jax.Array:
    """[embed(pre); image; embed(post)] — the reference splice at
    IMAGE_TOKEN_INDEX (llava_arch.py:130-160) with static shapes."""
    lm = params["llama"] if (cfg is None or cfg.lm_family == "llama") else params["mpt"]
    emb = lm["tok_embedding"]
    pre = emb[pre_tokens]
    post = emb[post_tokens]
    return jnp.concatenate(
        [pre, image_feats.astype(pre.dtype), post], axis=1
    )


def llava_forward(
    params: Params,
    pixels01: jax.Array,
    pre_tokens: jax.Array,
    post_tokens: jax.Array,
    cfg: LlavaConfig,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    flash: Optional[bool] = None,
    unroll_blocks: bool = False,
) -> jax.Array:
    """Full multimodal forward -> fp32 logits (B, T_pre+P+T_post, V)."""
    img = encode_images(
        params, pixels01, cfg, compute_dtype=compute_dtype, remat=remat
    )
    embeds = splice_embeddings(params, img, pre_tokens, post_tokens, cfg)
    kw = {"unroll_blocks": True} if unroll_blocks and cfg.lm_family == "llama" else {}
    return _lm_forward(
        params, cfg, inputs_embeds=embeds,
        compute_dtype=compute_dtype, remat=remat, flash=flash, **kw,
    )


def llava_per_sample_loss(
    params: Params,
    pixels01: jax.Array,
    pre_tokens: jax.Array,
    post_tokens: jax.Array,
    labels: jax.Array,
    label_mask: jax.Array,
    cfg: LlavaConfig,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    reduction_per_token: str = "mean",
    unroll_blocks: bool = False,
) -> jax.Array:
    """Teacher-forced per-sample CE over the answer span — the attack target
    (reference EvalModelLLAVA.__call__ returns HF-internal CE over labels
    masked up to 'ASSISTANT:', models/llava.py:98-133).

    labels/label_mask are (B, T_post): the loss is computed ONLY on post
    tokens (prompt prefix and image span always masked). `reduction_per_token`:
    'mean' matches HF CE (mean over unmasked tokens); 'sum' matches the
    Flamingo adapter's summed CE (of_eval_model_adv.py:245-254).
    """
    logits = llava_forward(
        params, pixels01, pre_tokens, post_tokens, cfg,
        compute_dtype=compute_dtype, remat=remat, unroll_blocks=unroll_blocks,
    )
    t_post = post_tokens.shape[1]
    # logits predicting post_tokens[t] live at absolute position (T-t_post+t-1)
    pred = logits[:, -t_post - 1 : -1]  # (B, T_post, V)
    lp = jax.nn.log_softmax(pred, axis=-1)
    tok_lp = jnp.take_along_axis(lp, labels[..., None], axis=-1)[..., 0]
    masked = tok_lp * label_mask
    if reduction_per_token == "mean":
        return -jnp.sum(masked, axis=-1) / jnp.maximum(
            jnp.sum(label_mask, axis=-1), 1.0
        )
    return -jnp.sum(masked, axis=-1)


# ------------------------------------------------------------------ generate
def make_llava_decode_fns_unstacked(
    params: Params,
    cfg: LlavaConfig,
    pixels01: jax.Array,
    pre_tokens: jax.Array,
    *,
    max_total_len: int,
    compute_dtype=jnp.bfloat16,
    kv_bits: int = 0,
):
    """(prefill_fn, decode_fn) with an UNSTACKED per-layer LM loop:
    params['layers'] is a tuple of per-layer block trees (the
    7B-fits-on-one-chip serving layout, scripts/bench_llava7b.py
    _init_bf16_on_device) — the stacked (32,4096,4096) scan relayout-copies
    +4.1 GiB of HLO temps and OOMs one 16 GiB v5e, so at real size the
    stack must never exist. Math-identical to the stacked
    make_llava_decode_fns (pinned by tests/test_bench_decode.py); llama
    family only. Block weights may be ops.quant Quantized/PackedQ4 leaves
    (the serving recipe — qmatmul inside _block is transparent)."""
    from robustvlm_tpu.models.llama.model import _block, rms_norm, rope_freqs
    from robustvlm_tpu.ops.quant import qmatmul

    lcfg = cfg.llama
    img = encode_images(params, pixels01, cfg, compute_dtype=compute_dtype)
    t_prefix = pre_tokens.shape[1] + cfg.n_image_tokens
    cache_len = t_prefix + max_total_len

    def lm(x, positions, caches, cache_pos, kv_mask):
        x = x.astype(compute_dtype)
        cos, sin = rope_freqs(lcfg, positions)
        new_caches = []
        for bp, c in zip(params["layers"], caches):
            x, nc = _block(
                x, bp, lcfg, cos, sin, flash=False,
                cache=c, pos=cache_pos, kv_mask=kv_mask,
            )
            new_caches.append(nc)
        h = rms_norm(x, params["llama"]["norm"], lcfg.norm_eps)
        logits = qmatmul(h, params["llama"]["lm_head"])
        return logits.astype(jnp.float32), tuple(new_caches)

    def init_caches(b):
        shape = (b, lcfg.n_kv_heads, cache_len, lcfg.head_dim)
        if kv_bits:  # int8 KV cache: halves the decode's cache-read bytes
            if kv_bits != 8:
                raise ValueError(f"kv_bits must be 0 or 8, got {kv_bits}")
            return tuple(
                {"k": jnp.zeros(shape, jnp.int8),
                 "v": jnp.zeros(shape, jnp.int8),
                 "ks": jnp.zeros(shape[:-1], jnp.float32),
                 "vs": jnp.zeros(shape[:-1], jnp.float32)}
                for _ in range(lcfg.n_layers)
            )
        return tuple(
            {"k": jnp.zeros(shape, compute_dtype),
             "v": jnp.zeros(shape, compute_dtype)}
            for _ in range(lcfg.n_layers)
        )

    def prefill_fn(tokens, kv_valid, positions):
        b = tokens.shape[0]
        n_rep = b // img.shape[0]
        img_r = jnp.repeat(img, n_rep, axis=0) if n_rep > 1 else img
        pre_r = (
            jnp.repeat(pre_tokens, n_rep, axis=0)
            if n_rep > 1 else pre_tokens
        )
        embeds = splice_embeddings(params, img_r, pre_r, tokens, cfg)
        kv_mask_full = jnp.concatenate(
            [jnp.ones((b, t_prefix), bool), kv_valid,
             jnp.zeros((b, cache_len - t_prefix - kv_valid.shape[1]), bool)],
            axis=1,
        )
        pos_full = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(t_prefix)[None], (b, t_prefix)),
             t_prefix + positions], axis=1,
        )
        logits, caches = lm(embeds, pos_full, init_caches(b), 0, kv_mask_full)
        return logits[:, -1], caches

    def decode_fn(tok, caches, pos, kv_mask, qpos):
        b = tok.shape[0]
        emb = params["llama"]["tok_embedding"][tok]
        kv_mask_full = jnp.concatenate(
            [jnp.ones((b, t_prefix), bool), kv_mask], axis=1
        )
        logits, caches = lm(
            emb, t_prefix + qpos, caches, t_prefix + pos, kv_mask_full
        )
        return logits, caches

    return prefill_fn, decode_fn


def make_llava_decode_fns(
    params: Params,
    cfg: LlavaConfig,
    pixels01: jax.Array,
    pre_tokens: jax.Array,
    *,
    max_total_len: int,
    compute_dtype=jnp.bfloat16,
    kv_bits: int = 0,
):
    """(prefill_fn, decode_fn) for models/generation.py: prefill runs the
    vision tower + splice once; decode steps run the LM only. Dispatches
    to the unstacked per-layer loop when the params carry the 'layers'
    serving layout (see make_llava_decode_fns_unstacked). kv_bits=8 uses
    an int8 KV cache (llama family; see llama.model._quantize_kv)."""
    if "layers" in params and cfg.lm_family == "llama":
        return make_llava_decode_fns_unstacked(
            params, cfg, pixels01, pre_tokens,
            max_total_len=max_total_len, compute_dtype=compute_dtype,
            kv_bits=kv_bits,
        )
    if kv_bits and cfg.lm_family != "llama":
        raise ValueError("kv_bits is llama-family only")
    from robustvlm_tpu.models.llama.model import init_cache
    from robustvlm_tpu.models.mpt.model import init_mpt_cache

    img = encode_images(params, pixels01, cfg, compute_dtype=compute_dtype)
    t_prefix = pre_tokens.shape[1] + cfg.n_image_tokens  # static
    # MPT's ALiBi bias depends on token DISTANCES; the splice places the
    # generation left-padding MID-sequence (between [pre|image] and the
    # post tokens), so slot distances overstate true distances by n_pad.
    # Carry a per-slot true-position table and thread it to the attention
    # (llama's RoPE takes explicit positions already and needs none).
    use_kvpos = cfg.lm_family == "mpt"

    def prefill_fn(tokens, kv_valid, positions):
        # tokens here are the POST tokens; full prompt = pre + image + post
        b = tokens.shape[0]
        n_rep = b // img.shape[0]
        img_r = jnp.repeat(img, n_rep, axis=0) if n_rep > 1 else img
        pre_r = jnp.repeat(pre_tokens, n_rep, axis=0) if n_rep > 1 else pre_tokens
        embeds = splice_embeddings(params, img_r, pre_r, tokens, cfg)
        kv_valid_full = jnp.concatenate(
            [jnp.ones((b, t_prefix), bool), kv_valid], axis=1
        )
        pos_full = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(t_prefix)[None], (b, t_prefix)),
                t_prefix + positions,
            ],
            axis=1,
        )
        if cfg.lm_family == "llama":
            cache = init_cache(
                cfg.llama, b, max_len=t_prefix + max_total_len,
                dtype=compute_dtype, kv_bits=kv_bits,
            )
        else:
            cache = init_mpt_cache(
                cfg.mpt, b, max_len=t_prefix + max_total_len,
                dtype=compute_dtype,
            )
        kw = {}
        if use_kvpos:
            fill = jnp.zeros(
                (b, max_total_len - tokens.shape[1]), jnp.int32
            )
            kv_pos = jnp.concatenate(
                [pos_full.astype(jnp.int32), fill], axis=1
            )
            kw["kv_positions"] = kv_pos
        logits, cache = _lm_forward(
            params, cfg, inputs_embeds=embeds,
            positions=pos_full, compute_dtype=compute_dtype,
            cache=cache, cache_pos=0, kv_mask=kv_valid_full, **kw,
        )
        if use_kvpos:
            return logits[:, -1], (cache, kv_pos)
        return logits[:, -1], cache

    def decode_fn(tok, carry, pos, kv_mask, qpos):
        b = tok.shape[0]
        kv_mask_full = jnp.concatenate(
            [jnp.ones((b, t_prefix), bool), kv_mask], axis=1
        )
        kw = {}
        if use_kvpos:
            cache, kv_pos = carry
            kv_pos = jax.lax.dynamic_update_slice(
                kv_pos, (t_prefix + qpos).astype(jnp.int32),
                (0, t_prefix + pos),
            )
            kw["kv_positions"] = kv_pos
        else:
            cache = carry
        logits, cache = _lm_forward(
            params, cfg, tokens=tok,
            positions=t_prefix + qpos, compute_dtype=compute_dtype,
            cache=cache, cache_pos=t_prefix + pos, kv_mask=kv_mask_full, **kw,
        )
        if use_kvpos:
            return logits, (cache, kv_pos)
        return logits, cache

    if use_kvpos:
        def reorder_carry(carry, gather):
            cache, kv_pos = carry
            return (
                jax.tree.map(lambda a: jnp.take(a, gather, axis=1), cache),
                jnp.take(kv_pos, gather, axis=0),
            )

        prefill_fn.reorder_carry = reorder_carry

    return prefill_fn, decode_fn


# ---------------------------------------------------------------------- init
def init_llava_params(rng: jax.Array, cfg: LlavaConfig) -> Params:
    from robustvlm_tpu.models.clip.model import init_clip_params
    from robustvlm_tpu.models.llama.model import init_llama_params
    from robustvlm_tpu.models.mpt.model import init_mpt_params

    kv, kl, kp = jax.random.split(rng, 3)
    clip = init_clip_params(kv, cfg.vision)
    wv, d = cfg.vision.vision.width, cfg.lm_dim
    s = wv ** -0.5
    if cfg.projector_type == "linear":
        proj = {
            "w1": jax.random.normal(kp, (wv, d)) * s,
            "b1": jnp.zeros((d,)),
        }
    else:
        k1, k2 = jax.random.split(kp)
        proj = {
            "w1": jax.random.normal(k1, (wv, d)) * s,
            "b1": jnp.zeros((d,)),
            "w2": jax.random.normal(k2, (d, d)) * d ** -0.5,
            "b2": jnp.zeros((d,)),
        }
    out = {"vision": clip["visual"], "projector": proj}
    if cfg.lm_family == "llama":
        out["llama"] = init_llama_params(kl, cfg.llama)
    else:
        out["mpt"] = init_mpt_params(kl, cfg.mpt)
    return out
