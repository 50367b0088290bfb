"""OPT decoder-only LM as pure functions over a stacked-layer pytree.

The language model of BLIP-2 (reference open_flamingo/eval/models/blip.py
wraps HF Blip2ForConditionalGeneration, whose text side is facebook/opt-*).
Numerically matches HF `OPTForCausalLM` (pre-LN `do_layer_norm_before`
layout, learned positional embeddings with the OPT +2 offset, ReLU FFN,
biases everywhere, tied LM head) so published checkpoints import losslessly
(import_torch.py).

TPU-first, same shape conventions as models/llama/model.py: per-layer
weights stacked on a leading axis, depth loop is `lax.scan`, decode path
carries stacked KV buffers, activations in `compute_dtype` with fp32
LayerNorm statistics and fp32 logits.

Parameter tree (L = layers, W = hidden, F = ffn_dim, V = vocab):
  tok_embedding (V, W), pos_embedding (max_pos + 2, W)
  blocks: ln1 {g,b} (L,W); attn {wq,wk,wv,wo (L,W,W), bq,bk,bv,bo (L,W)};
          ln2 {g,b}; mlp {fc1 (L,W,F), b1 (L,F), fc2 (L,F,W), b2 (L,W)}
  final_norm {g,b} (W,); lm_head (W, V) — tied to tok_embedding.T on import
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

POS_OFFSET = 2  # OPT embeds position i at row i+2 (HF modeling_opt.py offset)


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    name: str
    dim: int
    n_layers: int
    n_heads: int
    ffn_dim: int
    vocab_size: int = 50272
    max_seq_len: int = 2048
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


OPT_CONFIGS: Dict[str, OPTConfig] = {
    "opt-125m": OPTConfig("opt-125m", 768, 12, 12, 3072),
    "opt-2.7b": OPTConfig("opt-2.7b", 2560, 32, 32, 10240),
    "opt-6.7b": OPTConfig("opt-6.7b", 4096, 32, 32, 16384),
    "test-tiny": OPTConfig(
        "test-tiny", 64, 2, 4, 128, vocab_size=128, max_seq_len=64
    ),
}


def layer_norm(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _attn(q, k, v, *, q_positions=None, kv_mask=None):
    """Causal attention, fp32 softmax; see llama._attn for the cached-decode
    masking scheme (explicit position mask + valid-key mask)."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    tq, tk = q.shape[2], k.shape[2]
    if q_positions is None:
        qpos = jnp.arange(tq) + (tk - tq)
    else:
        qpos = q_positions
    jj = jnp.arange(tk)
    mask = (jj[None, :] <= qpos[:, None])[None]  # (1, Tq, Tk)
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, :]
    s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _block(x, bp, cfg: OPTConfig, *, cache=None, pos=None, kv_mask=None):
    b, t, _ = x.shape
    cd = x.dtype
    W = lambda a: a.astype(cd)
    hd, nh = cfg.head_dim, cfg.n_heads

    h = layer_norm(x, bp["ln1"]["g"], bp["ln1"]["b"], cfg.norm_eps)
    a = bp["attn"]
    q = (h @ W(a["wq"]) + W(a["bq"])).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    k = (h @ W(a["wk"]) + W(a["bk"])).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = (h @ W(a["wv"]) + W(a["bv"])).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

    new_cache = None
    if cache is not None:
        ck = jax.lax.dynamic_update_slice(
            cache["k"], k.astype(cache["k"].dtype), (0, 0, pos, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache["v"], v.astype(cache["v"].dtype), (0, 0, pos, 0)
        )
        new_cache = {"k": ck, "v": cv}
        att = _attn(
            q, ck.astype(cd), cv.astype(cd),
            q_positions=pos + jnp.arange(t), kv_mask=kv_mask,
        )
    else:
        att = _attn(q, k, v, kv_mask=kv_mask)

    att = att.transpose(0, 2, 1, 3).reshape(b, t, cfg.dim)
    x = x + (att @ W(a["wo"]) + W(a["bo"]))

    h = layer_norm(x, bp["ln2"]["g"], bp["ln2"]["b"], cfg.norm_eps)
    m = bp["mlp"]
    h = jax.nn.relu(h @ W(m["fc1"]) + W(m["b1"]))
    x = x + (h @ W(m["fc2"]) + W(m["b2"]))
    return x, new_cache


def opt_forward(
    params: Params,
    tokens: Optional[jax.Array] = None,
    *,
    cfg: OPTConfig,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    cache: Optional[Dict] = None,
    cache_pos: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    return_hidden: bool = False,
):
    """Causal LM forward -> fp32 logits (B, T, V). `inputs_embeds` is the
    BLIP-2 splice entry (query outputs prepended to token embeddings).
    With cache/cache_pos runs the decode path and returns (logits, cache)."""
    if inputs_embeds is None:
        inputs_embeds = params["tok_embedding"][tokens]
    x = inputs_embeds.astype(compute_dtype)
    b, t, _ = x.shape
    if positions is None:
        start = cache_pos if cache_pos is not None else 0
        positions = start + jnp.arange(t)
    x = x + params["pos_embedding"][positions + POS_OFFSET].astype(compute_dtype)

    blocks = params["blocks"]
    if cache is not None:
        cache_len = cache["k"].shape[3]
        if kv_mask is not None and kv_mask.shape[1] < cache_len:
            kv_mask = jnp.concatenate(
                [kv_mask, jnp.zeros((b, cache_len - kv_mask.shape[1]), bool)],
                axis=1,
            )

        def body(h, layer):
            bp, c = layer
            out, nc = _block(h, bp, cfg, cache=c, pos=cache_pos, kv_mask=kv_mask)
            return out, nc

        x, new_cache = jax.lax.scan(body, x, (blocks, cache))
        h = layer_norm(
            x, params["final_norm"]["g"], params["final_norm"]["b"], cfg.norm_eps
        )
        logits = (h @ params["lm_head"].astype(compute_dtype)).astype(jnp.float32)
        return logits, new_cache

    def body(h, bp):
        out, _ = _block(h, bp, cfg, kv_mask=kv_mask)
        return out, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, blocks)
    x = layer_norm(
        x, params["final_norm"]["g"], params["final_norm"]["b"], cfg.norm_eps
    )
    if return_hidden:
        return x
    return (x @ params["lm_head"].astype(compute_dtype)).astype(jnp.float32)


def init_opt_cache(cfg: OPTConfig, batch: int, max_len: Optional[int] = None,
                   dtype=jnp.bfloat16):
    n = max_len or cfg.max_seq_len
    shape = (cfg.n_layers, batch, cfg.n_heads, n, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_opt_params(rng: jax.Array, cfg: OPTConfig, dtype=jnp.float32) -> Params:
    """Random init for tests; real use imports HF checkpoints."""
    ks = jax.random.split(rng, 10)
    l, w, f = cfg.n_layers, cfg.dim, cfg.ffn_dim
    s = w ** -0.5

    def nrm(k, shape, scale=None):
        return (jax.random.normal(k, shape) * (scale or s)).astype(dtype)

    tok = nrm(ks[0], (cfg.vocab_size, w), 0.02)
    return {
        "tok_embedding": tok,
        "pos_embedding": nrm(ks[1], (cfg.max_seq_len + POS_OFFSET, w), 0.01),
        "blocks": {
            "ln1": {"g": jnp.ones((l, w), dtype), "b": jnp.zeros((l, w), dtype)},
            "attn": {
                "wq": nrm(ks[2], (l, w, w)), "bq": jnp.zeros((l, w), dtype),
                "wk": nrm(ks[3], (l, w, w)), "bk": jnp.zeros((l, w), dtype),
                "wv": nrm(ks[4], (l, w, w)), "bv": jnp.zeros((l, w), dtype),
                "wo": nrm(ks[5], (l, w, w)), "bo": jnp.zeros((l, w), dtype),
            },
            "ln2": {"g": jnp.ones((l, w), dtype), "b": jnp.zeros((l, w), dtype)},
            "mlp": {
                "fc1": nrm(ks[6], (l, w, f)), "b1": jnp.zeros((l, f), dtype),
                "fc2": nrm(ks[7], (l, f, w)), "b2": jnp.zeros((l, w), dtype),
            },
        },
        "final_norm": {"g": jnp.ones((w,), dtype), "b": jnp.zeros((w,), dtype)},
        "lm_head": tok.T,
    }
