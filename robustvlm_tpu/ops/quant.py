"""Weight-only int8 quantization for the autoregressive decode path.

Serving decode at small batch is HBM-BANDWIDTH-bound: every generated token
re-reads the full LM weight set (13.2 GB bf16 for LLaVA-1.5-7B) to execute
~13 GFLOP of matmul — arithmetic intensity ~1 FLOP/byte against the v5e's
~170 FLOP/byte balance point (scripts/bench_decode.py roofline). Halving
the weight bytes with int8 storage therefore halves the decode step time;
the MXU still computes in bf16 (the int8->bf16 convert is a fusion
producer of the dot — XLA streams int8 from HBM and widens in VMEM).

Scheme: symmetric per-output-channel int8 (the standard weight-only
serving recipe). For y = x @ W with W (K, N), each output column n stores
q[:, n] = round(W[:, n] / s[n]) with s[n] = max|W[:, n]| / 127, and the
matmul applies the scale AFTER the dot:

    y = (x @ q.astype(bf16)) * s

which is exact w.r.t. quantized weights (scale is per-column, so it
commutes with the contraction) and keeps the weight operand int8 all the
way to the MXU feed. Relative logits error on Gaussian weights is ~0.3%
(tests/test_quant.py pins it).

int4 (weight-only, group-wise) halves the bytes again. XLA's native `s4`
dtype stores one element PER BYTE on this backend (measured:
jnp.arange(8, dtype=jnp.int4).nbytes == 8), so the TPU-honest layout is
manual packing: two 4-bit codes per uint8 byte along the contraction
axis, with per-group fp32 scales (group_size rows of K share one scale —
per-column int4 alone is too coarse). The unpack (mask/shift/bias) and
the group scale are elementwise producers of the dot: XLA streams the
packed bytes from HBM and widens in VMEM, same fusion contract as int8.
Unlike int8's post-dot scale, a group-wise scale does NOT commute with
the contraction, so the scale multiplies the widened weight tile
pre-dot — still one big MXU dot per matmul.

This is a CAPABILITY BEYOND the reference (which serves fp16 via HF
llava/serve/model_worker.py): quantization only touches generation —
attacks and training always run the full-precision path (int8 storage is
not differentiable and the attack threat model is defined on the fp
model). Norms, embeddings and the vision tower stay bf16/fp32: they are
read once per sequence (prefill) or are O(dim) — quantizing them saves
nothing measurable.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Union

import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    """int8 weight + per-output-channel fp32 scale.

    A NamedTuple is automatically a pytree: q/s ride as ordinary jit
    arguments (bound-model protocol — never closure constants)."""

    q: jax.Array  # int8, same shape as the original weight (..., K, N)
    s: jax.Array  # fp32 (..., 1, N) per-output-channel scale


class PackedQ4Weight(NamedTuple):
    """Two int4 codes per uint8 byte, packed along the contraction axis,
    with per-group fp32 scales.

    p: uint8 (..., K//2, N) — byte b holds row b (low nibble) and row
       b + K//2 (high nibble), each a biased code in [1, 15]
       (code - 8 ∈ [-7, 7]). HALF-SPLIT pairing, not adjacent-row
       interleave, on purpose: the consuming matmul then decomposes into
       x_lo @ W_lo + x_hi @ W_hi where each half is a pure elementwise
       decode (mask/shift/bias/scale) of `p` — no stack, no interleaving
       reshape — so XLA fuses the decode into the dot's operand load and
       the HBM traffic is the packed bytes. (Measured on v5e: the
       adjacent-row interleave decode compiled to a gather-like monster,
       296 ms/step vs int8's 10.2 — the half-split form is what restores
       fusion.)
    s: fp32 (..., K//G, 1, N) — one scale per G contiguous rows of K per
       output column; K//2 is always a multiple of G so each half maps to
       whole groups. G is derived from shapes (K // s.shape[-3]), so the
       tuple stays a pure pytree of arrays (no static leaf to confuse jit).
    """

    p: jax.Array
    s: jax.Array


WeightLike = Union[jax.Array, QuantizedWeight, PackedQ4Weight]


def quantize_q8(w: jax.Array, *, contract_axis: int = -2) -> QuantizedWeight:
    """Symmetric per-output-channel int8: reduce max|w| over the
    CONTRACTION axis (default -2, the K of a (K, N) right-operand)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=contract_axis,
                   keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(
        jnp.int8
    )
    return QuantizedWeight(q=q, s=s)


def quantize_q4(
    w: jax.Array, *, group_size: int = 128, contract_axis: int = -2
) -> PackedQ4Weight:
    """Symmetric group-wise int4: G contiguous rows of the contraction
    axis share one per-output-column scale s = max|w| / 7; codes are
    clipped to [-7, 7] and stored biased (+8) two-per-byte. Packing is
    along K, so only contract_axis == -2 layouts are supported (every LM
    matmul weight in this repo is (..., K, N))."""
    if contract_axis not in (-2, w.ndim - 2):
        raise ValueError("quantize_q4 packs along axis -2 only")
    K, N = w.shape[-2], w.shape[-1]
    if K % 2:
        raise ValueError(f"contraction dim must be even to pack, got {K}")
    # each half must cover whole groups (the split-dot decode applies the
    # group scales per half): g divides K//2
    g = min(group_size, K // 2)
    if (K // 2) % g:
        raise ValueError(
            f"group_size {g} must divide K/2={K // 2} (half-split packing)"
        )
    wf = w.astype(jnp.float32)
    wg = wf.reshape(w.shape[:-2] + (K // g, g, N))
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 7.0  # (..., K//g, 1, N)
    q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8)
    b = (q.reshape(w.shape) + 8).astype(jnp.uint8)  # codes in [1, 15]
    lo, hi = b[..., : K // 2, :], b[..., K // 2:, :]
    return PackedQ4Weight(p=lo | (hi << 4), s=s)


def _decode_q4_halves(w: PackedQ4Weight, dtype):
    """Decode the two K-halves to (..., K//2, N) scaled weights. Each half
    is mask/shift/bias/group-scale — pure elementwise on w.p plus free
    row-major reshapes, i.e. a fusable producer of a dot operand."""
    p = w.p
    Kh, N = p.shape[-2], p.shape[-1]
    ng = w.s.shape[-3]
    ngh, g = ng // 2, (Kh * 2) // ng
    s_lo = w.s[..., :ngh, :, :]
    s_hi = w.s[..., ngh:, :, :]
    out = []
    for nib, s in ((p & jnp.uint8(0x0F), s_lo), (p >> jnp.uint8(4), s_hi)):
        q = nib.astype(jnp.int8) - 8
        qg = q.reshape(p.shape[:-2] + (ngh, g, N))
        out.append(
            (qg.astype(jnp.float32) * s)
            .reshape(p.shape[:-2] + (Kh, N)).astype(dtype)
        )
    return out[0], out[1]


def _unpack_q4(w: PackedQ4Weight, dtype) -> jax.Array:
    lo, hi = _decode_q4_halves(w, dtype)
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize(w, dtype=jnp.float32) -> jax.Array:
    if isinstance(w, PackedQ4Weight):
        return _unpack_q4(w, dtype)
    return (w.q.astype(jnp.float32) * w.s).astype(dtype)


def qmatmul(x: jax.Array, w: WeightLike) -> jax.Array:
    """x @ w for a plain array (cast to x.dtype, the existing _block
    convention), a QuantizedWeight (int8 HBM read, post-dot scale), or a
    PackedQ4Weight (packed-nibble HBM read, pre-dot group scale)."""
    if isinstance(w, QuantizedWeight):
        y = x @ w.q.astype(x.dtype)
        # scale in fp32 and cast ONCE: an s.astype(bf16) pre-cast adds a
        # second bf16 rounding on every output element (~0.4% — the same
        # order as int8's own ~0.3% quantization error, doubling logits
        # noise for free). Elementwise on (B, T, N): negligible cost on
        # the HBM-bound decode step.
        return (y.astype(jnp.float32) * w.s).astype(x.dtype)
    if isinstance(w, PackedQ4Weight):
        if jax.default_backend() == "tpu":
            # decode-shaped matvecs take the Pallas kernel: XLA refuses to
            # fuse the nibble decode into the dot and materializes the
            # bf16 weights in HBM every step (measured 50 ms vs the
            # kernel's streamed packed read; ops/pallas/q4_matmul.py)
            from robustvlm_tpu.ops.pallas.q4_matmul import q4_matmul

            y = q4_matmul(x, w.p, w.s)
            if y is not None:
                return y
        # XLA fallback (CPU, prefill-sized batches, odd shapes): split dot
        # x_lo @ W_lo + x_hi @ W_hi — each operand an elementwise decode
        # of the packed bytes (see PackedQ4Weight)
        lo, hi = _decode_q4_halves(w, x.dtype)
        kh = lo.shape[-2]
        return x[..., :kh] @ lo + x[..., kh:] @ hi
    return x @ w.astype(x.dtype)


def _is_leaf(x: Any) -> bool:
    return isinstance(x, (QuantizedWeight, PackedQ4Weight))


def _quantize_one(a: jax.Array, bits: int, group_size: int):
    if bits == 8:
        return quantize_q8(a, contract_axis=-2)
    if bits == 4:
        return quantize_q4(a, group_size=group_size, contract_axis=-2)
    raise ValueError(f"bits must be 8 or 4, got {bits}")


def quantize_lm_blocks(block_params, *, min_size: int = 1 << 16,
                       bits: int = 8, group_size: int = 128):
    """Quantize the matmul weights of a decoder block tree — the leaves
    under the 'attn' / 'mlp' groups (llama: wq/wk/wv/wo, w_gate/w_up/
    w_down; mpt: wqkv/out_w, up_w/down_w) — selected BY KEY, not by shape:
    on the stacked (L, ...) tree the norms are 2D and at 7B size would
    pass any size/ndim filter, and a quantized rms_norm gain is wrong.
    Bias leaves ('*_b', and anything non-matrix after stacking) pass
    through. Works on one per-layer tree, a tuple of them (the unstacked
    7B layout), or the stacked tree — the scale keeps its
    per-output-channel (last) axis either way."""
    if isinstance(block_params, (tuple, list)):
        return type(block_params)(
            quantize_lm_blocks(bp, min_size=min_size, bits=bits,
                               group_size=group_size)
            for bp in block_params
        )

    def one(name, a):
        if name.endswith("_b") or a.size < min_size:
            return a
        return _quantize_one(a, bits, group_size)

    out = dict(block_params)
    for grp in ("attn", "mlp"):
        if grp in out:
            out[grp] = {k: one(k, v) for k, v in out[grp].items()}
    return out


# backwards-compat alias (earlier name)
quantize_llama_blocks = quantize_lm_blocks


def quantize_llama_decode_params(
    params, *, quantize_lm_head: bool = True, min_size: int = 1 << 16,
    bits: int = 8, group_size: int = 128
):
    """The decode-serving layout: quantize the LM block weights (stacked
    'llama.blocks' / 'mpt.blocks' and/or unstacked 'layers') and
    optionally the llama lm_head (dim x vocab, 262 MB bf16 at 7B).
    tok_embedding stays fp (decode gathers one row per step; MPT's tied
    lm_head therefore also stays fp); the vision tower stays fp
    (prefill-only). bits=8 is the default serving recipe; bits=4 packs
    two codes per byte with `group_size`-row scales (halves HBM again at
    ~4x the int8 quantization error — tests/test_quant.py pins both)."""
    out = dict(params)
    for fam in ("llama", "mpt"):
        if fam not in out:
            continue
        lm = dict(out[fam])
        if "blocks" in lm:
            lm["blocks"] = quantize_lm_blocks(
                lm["blocks"], min_size=min_size, bits=bits,
                group_size=group_size)
        if fam == "llama" and quantize_lm_head and "lm_head" in lm:
            lm["lm_head"] = _quantize_one(lm["lm_head"], bits, group_size)
        out[fam] = lm
    if "layers" in out:
        out["layers"] = tuple(
            quantize_lm_blocks(bp, min_size=min_size, bits=bits,
                               group_size=group_size)
            for bp in out["layers"]
        )
    return out


@functools.lru_cache(maxsize=None)
def _jitted_quantizer(bits: int, group_size: int):
    # jitted so the fp32 intermediates FUSE: an eager quantize of a stacked
    # 7B mlp leaf (2.69 GiB bf16) would materialize a 5.4 GiB fp32 copy and
    # OOM the very serving path this exists to fit
    return jax.jit(
        functools.partial(_quantize_one, bits=bits, group_size=group_size)
    )


def quantize_decode_params_inplace(
    params, *, quantize_lm_head: bool = True, min_size: int = 1 << 16,
    bits: int = 8, group_size: int = 128
):
    """SERVING-ONLY progressive quantization: same leaf selection as
    quantize_llama_decode_params, but MUTATES `params` leaf by leaf,
    syncing after each replacement so every bf16 original is freed before
    the next leaf quantizes. Peak device memory ≈ the fp tree + ONE
    quantized leaf — vs the pure-functional path's fp + full quantized
    trees, which at LLaVA-7B is 19.8 GiB and OOMs a 16 GiB v5e (CLAUDE.md,
    measured; scripts/bench_decode.py uses the same per-layer discipline).

    The fp weights are GONE afterwards: attack/loss forwards on this tree
    now run quantized math, which violates the fp threat-model contract —
    callers must be serving-only processes (serve/model_worker.py
    --quantize-decode goes through LlavaEvalModel.quantize_for_serving,
    which also disables the loss path). Returns `params` for convenience.

    Only frees memory if the nested dicts in `params` hold the only device
    references to the fp leaves (true for all init/import layouts here).
    """
    qz = _jitted_quantizer(int(bits), int(group_size))

    def consume(grp: dict) -> None:
        for k in list(grp):
            v = grp[k]
            if k.endswith("_b") or v.size < min_size:
                continue
            q = qz(v)
            jax.block_until_ready(q)
            grp[k] = q  # drops the only bf16 ref -> freed on device

    for fam in ("llama", "mpt"):
        lm = params.get(fam)
        if not isinstance(lm, dict):
            continue
        blocks = lm.get("blocks")
        if isinstance(blocks, dict):
            for g in ("attn", "mlp"):
                if g in blocks:
                    consume(blocks[g])
        if fam == "llama" and quantize_lm_head and "lm_head" in lm:
            q = qz(lm["lm_head"])
            jax.block_until_ready(q)
            lm["lm_head"] = q
    for bp in params.get("layers") or ():
        for g in ("attn", "mlp"):
            if g in bp:
                consume(bp[g])
    return params
