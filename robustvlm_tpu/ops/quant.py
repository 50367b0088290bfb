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

This is a CAPABILITY BEYOND the reference (which serves fp16 via HF
llava/serve/model_worker.py): quantization only touches generation —
attacks and training always run the full-precision path (int8 storage is
not differentiable and the attack threat model is defined on the fp
model). Norms, embeddings and the vision tower stay bf16/fp32: they are
read once per sequence (prefill) or are O(dim) — quantizing them saves
nothing measurable.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Union

import jax
import jax.numpy as jnp


class QuantizedWeight(NamedTuple):
    """int8 weight + per-output-channel fp32 scale.

    A NamedTuple is automatically a pytree: q/s ride as ordinary jit
    arguments (bound-model protocol — never closure constants)."""

    q: jax.Array  # int8, same shape as the original weight (..., K, N)
    s: jax.Array  # fp32 (..., 1, N) per-output-channel scale


WeightLike = Union[jax.Array, QuantizedWeight]


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


def dequantize(w: QuantizedWeight, dtype=jnp.float32) -> jax.Array:
    return (w.q.astype(jnp.float32) * w.s).astype(dtype)


def qmatmul(x: jax.Array, w: WeightLike) -> jax.Array:
    """x @ w for a plain array (cast to x.dtype, the existing _block
    convention) or a QuantizedWeight (int8 HBM read, post-dot scale)."""
    if isinstance(w, QuantizedWeight):
        y = x @ w.q.astype(x.dtype)
        return y * w.s.astype(x.dtype)
    return x @ w.astype(x.dtype)


def _is_leaf(x: Any) -> bool:
    return isinstance(x, QuantizedWeight)


def quantize_lm_blocks(block_params, *, min_size: int = 1 << 16):
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
            quantize_lm_blocks(bp, min_size=min_size)
            for bp in block_params
        )

    def one(name, a):
        if name.endswith("_b") or a.size < min_size:
            return a
        return quantize_q8(a, contract_axis=-2)

    out = dict(block_params)
    for grp in ("attn", "mlp"):
        if grp in out:
            out[grp] = {k: one(k, v) for k, v in out[grp].items()}
    return out


# backwards-compat alias (earlier name)
quantize_llama_blocks = quantize_lm_blocks


def quantize_llama_decode_params(
    params, *, quantize_lm_head: bool = True, min_size: int = 1 << 16
):
    """The decode-serving layout: quantize the LM block weights (stacked
    'llama.blocks' / 'mpt.blocks' and/or unstacked 'layers') and
    optionally the llama lm_head (dim x vocab, 262 MB bf16 at 7B).
    tok_embedding stays fp (decode gathers one row per step; MPT's tied
    lm_head therefore also stays fp); the vision tower stays fp
    (prefill-only)."""
    out = dict(params)
    for fam in ("llama", "mpt"):
        if fam not in out:
            continue
        lm = dict(out[fam])
        if "blocks" in lm:
            lm["blocks"] = quantize_lm_blocks(lm["blocks"], min_size=min_size)
        if fam == "llama" and quantize_lm_head and "lm_head" in lm:
            lm["lm_head"] = quantize_q8(lm["lm_head"])
        out[fam] = lm
    if "layers" in out:
        out["layers"] = tuple(
            quantize_lm_blocks(bp, min_size=min_size)
            for bp in out["layers"]
        )
    return out
