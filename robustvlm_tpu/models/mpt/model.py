"""MPT decoder (the OpenFlamingo-9B language backbone) as pure functions.

Functional equivalent of the reference's vendored MPT implementation
(llava/model/language_model/mpt/modeling_mpt.py, attention.py, blocks.py):
pre-LN blocks (LayerNorm, fp32 statistics, optionally bias-free — MPT-7B has
no_bias=True), fused Wqkv attention with ALiBi bias (no positional
embeddings), 4x GELU MLP, weight-tied LM head.

ALiBi (attention.py:283-300): slopes_i = 2^{-(i+1) * 8 / n'} over the next
power-of-two head count n' (interleaved back down to n heads); the causal
bias -slope*(i-j) is realized inside the Pallas flash kernel on TPU or as an
explicit bias in the XLA path. Same cache/kv_mask machinery as the LLaMA
module so generation is shared.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.ops.quant import qmatmul

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    name: str
    d_model: int
    n_layers: int
    n_heads: int
    vocab_size: int
    expansion_ratio: int = 4
    norm_eps: float = 1e-5
    alibi_bias_max: float = 8.0
    max_seq_len: int = 2048
    no_bias: bool = True

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


MPT_CONFIGS: Dict[str, MPTConfig] = {
    # mosaicml/mpt-7b as used by OpenFlamingo-9B (vocab grows by 2 for
    # <image>/<|endofchunk|> at Flamingo init)
    "mpt-7b": MPTConfig("mpt-7b", 4096, 32, 32, 50432),
    "mpt-1b": MPTConfig("mpt-1b", 2048, 24, 16, 50368),
    "test-tiny": MPTConfig("test-tiny", 64, 2, 4, 512, max_seq_len=128),
}


def alibi_slopes(n_heads: int, alibi_bias_max: float = 8.0) -> np.ndarray:
    """Reference gen_slopes (attention.py:283-290)."""
    n2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, n2 + 1, dtype=np.float32) * (alibi_bias_max / n2)
    slopes = 1.0 / np.power(2.0, m)
    if n2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes


def layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _attn_xla(q, k, v, slopes, *, q_positions, kv_mask, kv_positions=None):
    """ALiBi causal attention, XLA path. q (B,H,Tq,hd), k/v (B,H,Tk,hd);
    q_positions (Tq,) or (B,Tq) true positions; bias -slope*(i-j).
    kv_positions (B,Tk): true positions of the key slots — required when
    padding sits MID-sequence (the LLaVA [pre|image|left-padded post]
    splice), where slot distance overstates token distance by n_pad."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    tq, tk = q.shape[2], k.shape[2]
    if kv_positions is None:
        jj = jnp.arange(tk)[None, None, :]
    else:
        jj = kv_positions[:, None, :]
    if q_positions.ndim == 1:
        qpos = q_positions[None]  # (1, Tq)
    else:
        qpos = q_positions
    rel = qpos[:, :, None] - jj                         # (B?, Tq, Tk) = i - j
    bias = -slopes[None, :, None, None] * rel[:, None].astype(jnp.float32)
    s = s + bias
    mask = rel >= 0  # causal on true positions
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, :]
    s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _block(x, bp, cfg: MPTConfig, slopes, *, flash, cache=None, pos=None,
           kv_mask=None, positions=None, kv_positions=None):
    b, t, d = x.shape
    cd = x.dtype
    nb = cfg.no_bias
    # qmatmul: plain weights cast to cd (the historical convention);
    # QuantizedWeight leaves (ops/quant.py, decode serving) stream int8
    h = layer_norm(x, bp["norm_1"], None if nb else bp.get("norm_1_b"), cfg.norm_eps)
    qkv = qmatmul(h, bp["attn"]["wqkv"])
    if not nb:
        qkv = qkv + bp["attn"]["wqkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def hs(tn):
        return tn.reshape(b, t, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)

    q, k, v = hs(q), hs(k), hs(v)

    new_cache = None
    if cache is not None:
        ck = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, 0, pos, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, 0, pos, 0)
        )
        new_cache = {"k": ck, "v": cv}
        if kv_positions is not None:
            # true token positions for q and k: exact ALiBi distances even
            # with mid-sequence padding (LLaVA splice)
            att = _attn_xla(
                q, ck, cv, slopes,
                q_positions=(positions if positions is not None
                             else pos + jnp.arange(t)),
                kv_mask=kv_mask, kv_positions=kv_positions,
            )
        else:
            # uniform left-pad: slot distances == token distances
            slot_q = pos + jnp.arange(t)
            att = _attn_xla(q, ck, cv, slopes, q_positions=slot_q, kv_mask=kv_mask)
    elif flash and kv_mask is None and positions is None:
        # the fused kernel encodes plain 0..T-1 causality only — with a
        # kv_mask or shifted positions fall through to the masked XLA path
        from robustvlm_tpu.ops.pallas.flash_attention import flash_attention

        att = flash_attention(q, k, v, causal=True, alibi_slopes=jnp.asarray(slopes))
    else:
        att = _attn_xla(
            q, k, v, slopes,
            q_positions=positions if positions is not None else jnp.arange(t),
            kv_mask=kv_mask,
        )

    att = att.transpose(0, 2, 1, 3).reshape(b, t, d)
    o = qmatmul(att.astype(cd), bp["attn"]["out_w"])
    if not nb:
        o = o + bp["attn"]["out_b"]
    x = x + o

    h = layer_norm(x, bp["norm_2"], None if nb else bp.get("norm_2_b"), cfg.norm_eps)
    up = qmatmul(h, bp["mlp"]["up_w"])
    if not nb:
        up = up + bp["mlp"]["up_b"]
    dn = qmatmul(jax.nn.gelu(up, approximate=False), bp["mlp"]["down_w"])
    if not nb:
        dn = dn + bp["mlp"]["down_b"]
    return x + dn, new_cache


def mpt_forward(
    params: Params,
    tokens: Optional[jax.Array] = None,
    *,
    cfg: MPTConfig,
    inputs_embeds: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    flash: Optional[bool] = None,
    cache=None,
    cache_pos=None,
    kv_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    layer_hook=None,
    return_hidden: bool = False,
):
    """Causal MPT forward -> fp32 logits (LM head tied to tok embedding,
    reference modeling_mpt.py). `layer_hook(i, x) -> x` runs before each
    decoder block — the Flamingo gated-xattn insertion point."""
    if inputs_embeds is None:
        inputs_embeds = params["tok_embedding"][tokens]
    if flash is None:
        # shape-aware default, from v5e measurements: the Pallas kernel wins
        # at decoder shapes (head_dim 128, long seq, enough batch*head grid
        # rows) — e.g. 37 vs 44 ms fwd+bwd at (4,16,2048,128) causal+ALiBi —
        # while XLA's fused attention wins at small batch or short seq
        t_now = inputs_embeds.shape[1]
        flash = (
            jax.default_backend() == "tpu"
            and cfg.head_dim >= 128
            and t_now >= 1024
            and inputs_embeds.shape[0] * cfg.n_heads >= 64
        )
    x = inputs_embeds.astype(compute_dtype)
    slopes = alibi_slopes(cfg.n_heads, cfg.alibi_bias_max)
    blocks = params["blocks"]

    if cache is not None:
        cache_len = cache["k"].shape[3]
        if kv_mask is not None and kv_mask.shape[1] < cache_len:
            kv_mask = jnp.concatenate(
                [kv_mask, jnp.zeros((x.shape[0], cache_len - kv_mask.shape[1]), bool)],
                axis=1,
            )

        if layer_hook is None:
            def body(h, layer):
                bp, c = layer
                out, nc = _block(
                    h, bp, cfg, slopes, flash=False, cache=c, pos=cache_pos,
                    kv_mask=kv_mask, positions=positions,
                    kv_positions=kv_positions,
                )
                return out, nc

            x, new_cache = jax.lax.scan(body, x, (blocks, cache))
        else:  # python loop so the hook can index per-layer xattn params
            ncs = []
            for i in range(cfg.n_layers):
                bp = jax.tree.map(lambda a: a[i], blocks)
                ci = jax.tree.map(lambda a: a[i], cache)
                x = layer_hook(i, x)
                x, nc = _block(
                    x, bp, cfg, slopes, flash=False, cache=ci, pos=cache_pos,
                    kv_mask=kv_mask, positions=positions,
                    kv_positions=kv_positions,
                )
                ncs.append(nc)
            new_cache = jax.tree.map(lambda *a: jnp.stack(a), *ncs)
        h = layer_norm(x, params["norm_f"], None, cfg.norm_eps)
        logits = (
            h @ params["tok_embedding"].T.astype(compute_dtype)
        ).astype(jnp.float32)
        return logits, new_cache

    if layer_hook is None:
        def body(h, bp):
            out, _ = _block(h, bp, cfg, slopes, flash=flash, kv_mask=kv_mask,
                            positions=positions)
            return out, None

        if remat:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, blocks)
    else:
        blk = (jax.checkpoint(lambda h, bp: _block(
            h, bp, cfg, slopes, flash=flash, kv_mask=kv_mask,
            positions=positions)[0])
            if remat else
            lambda h, bp: _block(h, bp, cfg, slopes, flash=flash,
                                 kv_mask=kv_mask, positions=positions)[0])
        for i in range(cfg.n_layers):
            bp = jax.tree.map(lambda a: a[i], blocks)
            x = layer_hook(i, x)
            x = blk(x, bp)

    x = layer_norm(x, params["norm_f"], None, cfg.norm_eps)
    if return_hidden:
        return x
    return (x @ params["tok_embedding"].T.astype(compute_dtype)).astype(jnp.float32)


def init_mpt_cache(cfg: MPTConfig, batch: int, max_len: Optional[int] = None,
                   dtype=jnp.bfloat16):
    n = max_len or cfg.max_seq_len
    shape = (cfg.n_layers, batch, cfg.n_heads, n, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_mpt_params(rng: jax.Array, cfg: MPTConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 5)
    s = cfg.d_model ** -0.5
    l, d = cfg.n_layers, cfg.d_model
    f = cfg.expansion_ratio * d
    return {
        "tok_embedding": (jax.random.normal(ks[0], (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "blocks": {
            "norm_1": jnp.ones((l, d), dtype),
            "norm_2": jnp.ones((l, d), dtype),
            "attn": {
                "wqkv": (jax.random.normal(ks[1], (l, d, 3 * d)) * s).astype(dtype),
                "out_w": (jax.random.normal(ks[2], (l, d, d)) * s).astype(dtype),
            },
            "mlp": {
                "up_w": (jax.random.normal(ks[3], (l, d, f)) * s).astype(dtype),
                "down_w": (jax.random.normal(ks[4], (l, f, d)) * f ** -0.5).astype(dtype),
            },
        },
        "norm_f": jnp.ones((d,), dtype),
    }
