"""LLaMA/Vicuna decoder as pure functions over parameter pytrees.

The language backbone for LLaVA-1.5 (reference llava/model/language_model/
llava_llama.py wraps HF LlamaForCausalLM; here the transformer is native):
RMSNorm, rotary position embeddings, SwiGLU MLP, causal multi-head attention
(optional grouped KV heads), untied LM head. HF `LlamaForCausalLM` weight
import in import_torch.py.

TPU-first:
- stacked-block scan (O(1) compile time in depth), bf16 activations with
  fp32 RMSNorm statistics and fp32 logits;
- causal attention through the Pallas flash kernel on TPU (XLA einsum
  elsewhere);
- `inputs_embeds` entry point for the multimodal splice (LLaVA inserts
  projected image patches into the token embedding sequence, reference
  llava_arch.py:95-212);
- decode path with a static-shape KV cache updated via dynamic_update_slice
  (generation in models/generation.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from robustvlm_tpu.ops.quant import qmatmul

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    name: str
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    ffn_dim: int
    vocab_size: int
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seq_len: int = 2048

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


LLAMA_CONFIGS: Dict[str, LlamaConfig] = {
    # Vicuna-7B-v1.5 (the LLaVA-1.5-7B LM) == LLaMA-2-7B geometry
    "llama-7b": LlamaConfig("llama-7b", 4096, 32, 32, 32, 11008, 32000,
                            max_seq_len=4096),
    "test-tiny": LlamaConfig("test-tiny", 64, 2, 4, 4, 128, 512,
                             max_seq_len=128),
    # tiny GQA variant for tests
    "test-tiny-gqa": LlamaConfig("test-tiny-gqa", 64, 2, 4, 2, 128, 512,
                                 max_seq_len=128),
}


def rms_norm(x: jax.Array, g: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * g.astype(x.dtype)


def rope_freqs(cfg: LlamaConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (B?, T, head_dim/2) for given integer positions."""
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    ang = positions.astype(jnp.float32)[..., None] * inv  # (..., T, hd/2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, H, T, hd); cos/sin (T, hd/2) or (B, T, hd/2). HF half-split
    convention: rotate_half(x) = (-x2, x1) with x1 = x[..., :hd/2]."""
    hd2 = x.shape[-1] // 2
    x1, x2 = x[..., :hd2], x[..., hd2:]
    if cos.ndim == 2:
        cos = cos[None, None]
        sin = sin[None, None]
    else:
        cos = cos[:, None]
        sin = sin[:, None]
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    b, h, t, d = x.shape
    return jnp.broadcast_to(
        x[:, :, None], (b, h, n_rep, t, d)
    ).reshape(b, h * n_rep, t, d)


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, head, token) absmax int8 quantization of new K/V rows:
    (B,H,T,hd) -> (int8 codes, fp32 scales (B,H,T)). Decode is HBM-bound
    and at batch >= 4 the KV cache's read share bites (bench_decode.py);
    int8 halves those bytes. The scale NEVER touches the per-element path:
    scores absorb k's scale per KEY column and probs absorb v's before the
    PV dot (see _attn), so XLA fuses the int8->bf16 convert into the dot's
    operand load exactly like the weight-quant recipe (ops/quant.py)."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, s


def _attn(q, k, v, *, causal: bool, flash: bool, q_positions=None,
          kv_mask=None, k_scale=None, v_scale=None):
    """q (B,Hq,Tq,hd), k/v (B,Hkv,Tk,hd). For cached decode (Tq < Tk) the
    causal structure is encoded by masking j > pos_q explicitly; kv_mask
    (B, Tk) additionally masks invalid (padding / unwritten) key slots.
    k_scale/v_scale (B,Hkv,Tk) dequantize an int8 KV cache: applied to the
    score columns / softmax probs, not the cached elements."""
    n_rep = q.shape[1] // k.shape[1]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    if k_scale is not None:
        b_, h_, t_ = k_scale.shape
        rep3 = lambda s: jnp.broadcast_to(
            s[:, :, None], (b_, h_, n_rep, t_)
        ).reshape(b_, h_ * n_rep, t_)
        k_scale, v_scale = rep3(k_scale), rep3(v_scale)
        k = k.astype(q.dtype)  # int8->bf16: fuses into the score dot's load
        v = v.astype(q.dtype)
    if flash and q.shape[2] == k.shape[2] and kv_mask is None:
        from robustvlm_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if k_scale is not None:
        s = s * k_scale[:, :, None, :]
    tq, tk = q.shape[2], k.shape[2]
    mask = None
    if causal:
        if q_positions is None:
            qpos = jnp.arange(tq) + (tk - tq)
        else:
            qpos = q_positions
        jj = jnp.arange(tk)
        if qpos.ndim == 1:
            mask = (jj[None, :] <= qpos[:, None])[None]  # (1, Tq, Tk)
        else:  # per-example positions (B, Tq)
            mask = jj[None, None, :] <= qpos[:, :, None]  # (B, Tq, Tk)
    if kv_mask is not None:
        km = kv_mask[:, None, :]  # (B, 1, Tk)
        mask = km if mask is None else (mask & km)
    if mask is not None:
        s = jnp.where(mask[:, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    if v_scale is not None:
        p = p * v_scale[:, :, None, :]
    p = p.astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _cache_write(buf, new, pos):
    """Write `new` into the static cache `buf` at token offset `pos`.

    pos scalar: one dynamic_update_slice shared by the batch (the classic
    lockstep decode). pos vector (B,): PER-SLOT offsets for continuous
    batching (serve/continuous.py) — each slot of a running decode batch
    sits at its own depth, so the write unrolls into B single-slot
    dynamic_update_slices (B is static and small; each lowers to an
    in-place update, unlike a gather/scatter rewrite of the whole cache,
    whose HBM traffic is exactly what the KV cache must not add).
    Handles both value buffers (B, H, N, hd) and quant-scale buffers
    (B, H, N)."""
    if getattr(pos, "ndim", 0) == 0:
        idx = (0, 0, pos) + (0,) * (buf.ndim - 3)
        return jax.lax.dynamic_update_slice(buf, new, idx)
    out = buf
    for i in range(buf.shape[0]):
        idx = (i, 0, pos[i]) + (0,) * (buf.ndim - 3)
        out = jax.lax.dynamic_update_slice(out, new[i : i + 1], idx)
    return out


def _block(x, bp, cfg: LlamaConfig, cos, sin, *, flash, cache=None, pos=None,
           kv_mask=None):
    """One decoder layer. cache: optional dict {k, v} with static (B, Hkv,
    max_seq, hd) buffers; pos: scalar write offset for decode — or a (B,)
    vector of PER-SLOT offsets (continuous batching; see _cache_write);
    kv_mask (B, cache_len) marks valid key slots (padding-aware
    generation)."""
    b, t, _ = x.shape
    cd = x.dtype
    # qmatmul: plain weights cast to cd (the historical W() convention);
    # QuantizedWeight leaves (ops/quant.py, decode serving) stream int8
    # from HBM and scale after the dot
    h = rms_norm(x, bp["attn_norm"], cfg.norm_eps)
    q = qmatmul(h, bp["attn"]["wq"]).reshape(b, t, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    k = qmatmul(h, bp["attn"]["wk"]).reshape(b, t, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    v = qmatmul(h, bp["attn"]["wv"]).reshape(b, t, cfg.n_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache is not None:
        if getattr(pos, "ndim", 0) == 1:  # per-slot offsets -> (B, Tq) qpos
            qpos = pos[:, None] + jnp.arange(t)[None, :]
        else:
            qpos = pos + jnp.arange(t)
        if "ks" in cache:  # int8 KV cache (see _quantize_kv)
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            new_cache = {
                "k": _cache_write(cache["k"], kq, pos),
                "v": _cache_write(cache["v"], vq, pos),
                "ks": _cache_write(cache["ks"], ks, pos),
                "vs": _cache_write(cache["vs"], vs, pos),
            }
            att = _attn(
                q, new_cache["k"], new_cache["v"], causal=True, flash=False,
                q_positions=qpos, kv_mask=kv_mask,
                k_scale=new_cache["ks"], v_scale=new_cache["vs"],
            )
        else:
            ck = _cache_write(cache["k"], k.astype(cache["k"].dtype), pos)
            cv = _cache_write(cache["v"], v.astype(cache["v"].dtype), pos)
            new_cache = {"k": ck, "v": cv}
            # mask not-yet-written cache slots via causal masking on position
            att = _attn(q, ck, cv, causal=True, flash=False,
                        q_positions=qpos, kv_mask=kv_mask)
    else:
        att = _attn(q, k, v, causal=True, flash=flash, kv_mask=kv_mask)

    att = att.transpose(0, 2, 1, 3).reshape(b, t, cfg.dim)
    x = x + qmatmul(att.astype(cd), bp["attn"]["wo"])

    h = rms_norm(x, bp["ffn_norm"], cfg.norm_eps)
    gate = jax.nn.silu(qmatmul(h, bp["mlp"]["w_gate"]))
    up = qmatmul(h, bp["mlp"]["w_up"])
    x = x + qmatmul(gate * up, bp["mlp"]["w_down"])
    return x, new_cache


def llama_forward(
    params: Params,
    tokens: Optional[jax.Array] = None,
    *,
    cfg: LlamaConfig,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    flash: Optional[bool] = None,
    cache: Optional[Dict] = None,
    cache_pos: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
    return_hidden: bool = False,
    unroll_blocks: bool = False,
):
    """Causal LM forward -> fp32 logits (B, T, V).

    Exactly one of `tokens` / `inputs_embeds` must be given; `inputs_embeds`
    is the LLaVA splice entry. With `cache`+`cache_pos`, runs the decode
    path (per-layer KV buffers, scanned over the stacked layer axis) and
    returns (logits, new_cache). `kv_mask` (B, Tk) marks valid key slots
    for left-padded batched generation.
    """
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
    b, t, _ = x.shape
    if positions is None:
        start = cache_pos if cache_pos is not None else 0
        positions = start + jnp.arange(t)
    cos, sin = rope_freqs(cfg, positions)

    blocks = params["blocks"]
    if cache is not None:
        cache_len = cache["k"].shape[3]
        if kv_mask is not None and kv_mask.shape[1] < cache_len:
            # pad to cache length: unwritten slots are invalid keys (also
            # excluded by the causal slot mask)
            kv_mask = jnp.concatenate(
                [
                    kv_mask,
                    jnp.zeros((b, cache_len - kv_mask.shape[1]), bool),
                ],
                axis=1,
            )

        def body(h, layer):
            bp, c = layer
            out, nc = _block(
                h, bp, cfg, cos, sin, flash=False,
                cache=c, pos=cache_pos, kv_mask=kv_mask,
            )
            return out, nc

        x, new_cache = jax.lax.scan(body, x, (blocks, cache))
        h = rms_norm(x, params["norm"], cfg.norm_eps)
        logits = qmatmul(h, params["lm_head"]).astype(jnp.float32)
        return logits, new_cache

    def body(h, bp):
        out, _ = _block(h, bp, cfg, cos, sin, flash=flash, kv_mask=kv_mask)
        return out, None

    if remat:
        body = jax.checkpoint(body)
    if unroll_blocks:
        # Python-unrolled block loop over the STACKED tree: identical math
        # to the scan. Measured on v5e with LLaMA-7B grad-wrt-pixels
        # (scripts/bench_llava7b.py HBM journey): the scan relayout-copies
        # the 4 stacked (32,4096,4096) attention weights (+4.1 GiB, compile
        # OOM at 17.3/15.75 GiB) and this unrolled-over-stacked path is
        # WORSE still (25.4 GiB — the copies remain, plus per-layer slice
        # fusions). Neither fits 7B grad-wrt-pixels on one 16 GiB chip; the
        # config that fits uses UNSTACKED per-layer weight trees so the
        # stack never exists (bench_llava7b._init_bf16_on_device +
        # _make_unstacked_loss). unroll_blocks stays useful only for small
        # models where layout experiments matter more than the O(L) program
        # size; keep the scan default everywhere else.
        for i in range(cfg.n_layers):
            x, _ = body(x, jax.tree.map(lambda a, i=i: a[i], blocks))
    else:
        x, _ = jax.lax.scan(body, x, blocks)
    x = rms_norm(x, params["norm"], cfg.norm_eps)
    if return_hidden:
        return x
    return qmatmul(x, params["lm_head"]).astype(jnp.float32)


def init_cache(cfg: LlamaConfig, batch: int, max_len: Optional[int] = None,
               dtype=jnp.bfloat16, kv_bits: int = 0):
    """Stacked per-layer KV buffers (L, B, Hkv, N, hd) — scanned jointly with
    the stacked blocks in the decode path. kv_bits=8 stores int8 codes with
    per-(layer, batch, head, token) fp32 scales (+3% bytes over the halved
    cache) — see _quantize_kv for the serving rationale."""
    n = max_len or cfg.max_seq_len
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, n, cfg.head_dim)
    if kv_bits:
        if kv_bits != 8:
            raise ValueError(f"kv_bits must be 0 or 8, got {kv_bits}")
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "ks": jnp.zeros(sshape, jnp.float32),
            "vs": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random init for tests; real use imports HF checkpoints."""
    ks = jax.random.split(rng, 9)
    s = cfg.dim ** -0.5
    l = cfg.n_layers

    def nrm(k, shape, scale):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    return {
        "tok_embedding": nrm(ks[0], (cfg.vocab_size, cfg.dim), 0.02),
        "blocks": {
            "attn_norm": jnp.ones((l, cfg.dim), dtype),
            "ffn_norm": jnp.ones((l, cfg.dim), dtype),
            "attn": {
                "wq": nrm(ks[1], (l, cfg.dim, cfg.dim), s),
                "wk": nrm(ks[2], (l, cfg.dim, cfg.n_kv_heads * cfg.head_dim), s),
                "wv": nrm(ks[3], (l, cfg.dim, cfg.n_kv_heads * cfg.head_dim), s),
                "wo": nrm(ks[4], (l, cfg.dim, cfg.dim), s),
            },
            "mlp": {
                "w_gate": nrm(ks[5], (l, cfg.dim, cfg.ffn_dim), s),
                "w_up": nrm(ks[6], (l, cfg.dim, cfg.ffn_dim), s),
                "w_down": nrm(ks[7], (l, cfg.ffn_dim, cfg.dim), cfg.ffn_dim ** -0.5),
            },
        },
        "norm": jnp.ones((cfg.dim,), dtype),
        "lm_head": nrm(ks[8], (cfg.dim, cfg.vocab_size), s),
    }
