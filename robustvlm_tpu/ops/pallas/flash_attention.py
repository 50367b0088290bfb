"""Fused flash attention (forward + backward) as Pallas TPU kernels.

TPU-native equivalent of the reference's single piece of native kernel code —
the Triton flash attention at
llava/model/language_model/mpt/flash_attn_triton.py (fwd :51, bwd :306).
Serves both workloads:
  * ViT self-attention (non-causal, 577 tokens @ head_dim 64/80) — the inner
    fwd+bwd of every attack step (SURVEY.md §3.2 hot loop),
  * MPT/LLaMA decoder attention (causal, optional ALiBi slopes).

Design:
- Forward: grid (batch*heads, q_blocks); K/V for the (b,h) row live in VMEM
  and are walked in `bk`-sized blocks with the online-softmax recurrence
  (fp32 running max/denominator, bf16 matmuls on the MXU).
- Backward: TWO deterministic kernels — a dQ kernel (grid over q blocks,
  loop over kv) and a dKV kernel (grid over kv blocks, loop over q). The
  reference's Triton backward parallelizes dq accumulation across k-blocks
  with atomics and its docstring warns of race conditions
  (flash_attn_triton.py:27-35); splitting by output eliminates shared-write
  races entirely and is the natural TPU formulation.
- Sequence padding: lengths are padded to the block size; masking uses the
  STATIC true length (shapes are static under jit), so the mask compiles to
  a constant and costs nothing.
- `jax.custom_vjp` stitches fwd/bwd together; residuals are (q, k, v, o, lse).

On non-TPU backends the public entry falls back to a numerically identical
XLA einsum implementation (also the oracle for kernel unit tests).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ----------------------------------------------------------------- reference
def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    alibi_slopes: Optional[jax.Array] = None,
    seq_len_k: Optional[int] = None,
) -> jax.Array:
    """XLA oracle: (B, H, Nq, D) x (B, H, Nk, D) -> (B, H, Nq, D).

    fp32 softmax regardless of input dtype; supports causal masking, ALiBi
    bias (slopes (H,)), and key padding (positions >= seq_len_k masked out).
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    nq, nk = q.shape[-2], k.shape[-2]
    if alibi_slopes is not None:
        i = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        # standard ALiBi: bias_ij = -slope * (i - j), applied pre-mask
        bias = -(i - j).astype(jnp.float32)[None] * alibi_slopes.astype(
            jnp.float32
        )[:, None, None]
        s = s + bias[None]
    mask = None
    if causal:
        i = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        mask = j <= i + (nk - nq)
    if seq_len_k is not None and seq_len_k < nk:
        j = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1)
        kmask = j < seq_len_k
        mask = kmask if mask is None else (mask & kmask)
    if mask is not None:
        s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


# ------------------------------------------------------------------- forward
def _fwd_kernel(
    slope_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, bk: int, seq_k: int, causal: bool, q_offset_blocks: int, scale: float,
    use_alibi: bool,
):
    bq, d = q_ref.shape[-2], q_ref.shape[-1]
    nk = k_ref.shape[-2]
    qi = pl.program_id(1)
    slope = slope_ref[pl.program_id(0)] if use_alibi else None
    q = q_ref[0] * scale  # (bq, d) in input dtype; matmul accums fp32

    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qi * bq

    def body(ki, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(ki * bk, bk), :]
        v_blk = v_ref[0, pl.ds(ki * bk, bk), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
        if use_alibi:
            s = s - slope * (row + q_offset_blocks * bq - col).astype(jnp.float32)
        valid = col < seq_k
        if causal:
            valid = valid & (col <= row + q_offset_blocks * bq)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    if causal:
        # dynamic trip count: only kv blocks not fully above the diagonal
        hi = jnp.minimum(
            pl.cdiv(seq_k, bk),
            pl.cdiv((qi + 1) * bq + q_offset_blocks * bq, bk),
        )
        m, l, acc = jax.lax.fori_loop(0, hi, body, (m, l, acc))
    else:
        m, l, acc = jax.lax.fori_loop(0, nk // bk, body, (m, l, acc))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # (bq, 1)


def _flash_fwd(q, k, v, slopes, *, bq, bk, seq_k, causal, scale, interpret):
    bh, nq, d = q.shape
    nk = k.shape[1]
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((bh,), jnp.float32)
    grid = (bh, nq // bq)
    kernel = functools.partial(
        _fwd_kernel, bk=bk, seq_k=seq_k, causal=causal,
        q_offset_blocks=0, scale=scale, use_alibi=use_alibi,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(slopes, q, k, v)
    return o, lse


# ------------------------------------------------------------------ backward
def _bwd_dq_kernel(
    slope_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, bk: int, seq_k: int, causal: bool, scale: float, use_alibi: bool,
):
    bq, d = q_ref.shape[-2], q_ref.shape[-1]
    qi = pl.program_id(1)
    slope = slope_ref[pl.program_id(0)] if use_alibi else None
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]    # (bq, 1)
    delta = delta_ref[0]  # (bq, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qi * bq

    def body(ki, dq):
        k_blk = k_ref[0, pl.ds(ki * bk, bk), :]
        v_blk = v_ref[0, pl.ds(ki * bk, bk), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
        if use_alibi:
            s = s - slope * (row - col).astype(jnp.float32)
        valid = col < seq_k
        if causal:
            valid = valid & (col <= row)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jnp.dot(
            ds.astype(k_blk.dtype), k_blk, preferred_element_type=jnp.float32
        )

    if causal:
        hi = jnp.minimum(pl.cdiv(seq_k, bk), pl.cdiv((qi + 1) * bq, bk))
    else:
        hi = pl.cdiv(seq_k, bk)
    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    slope_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, bq: int, seq_q: int, seq_k: int, causal: bool, scale: float,
    use_alibi: bool,
):
    bk, d = k_ref.shape[-2], k_ref.shape[-1]
    ki = pl.program_id(1)
    slope = slope_ref[pl.program_id(0)] if use_alibi else None
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * bq, bq), :]
        do = do_ref[0, pl.ds(qi * bq, bq), :]
        lse = lse_ref[0, pl.ds(qi * bq, bq), :]    # (bq, 1)
        delta = delta_ref[0, pl.ds(qi * bq, bq), :]  # (bq, 1)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + qi * bq
        if use_alibi:
            s = s - slope * (row - col).astype(jnp.float32)
        valid = (col < seq_k) & (row < seq_q)
        if causal:
            valid = valid & (col <= row)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv = dv + jnp.dot(
            p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
        )
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jnp.dot(
            ds.astype(q.dtype).T, q, preferred_element_type=jnp.float32
        )
        return dk, dv

    if causal:
        # q blocks strictly below the diagonal never touch this kv block
        lo = (ki * bk) // bq
    else:
        lo = 0
    n_q = q_ref.shape[-2] // bq
    dk, dv = jax.lax.fori_loop(
        lo, n_q, body,
        (jnp.zeros((bk, d), jnp.float32), jnp.zeros((bk, d), jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(res, g, *, bq, bk, seq_q, seq_k, causal, scale, interpret):
    q, k, v, o, lse, slopes = res
    bh, nq, d = q.shape
    nk = k.shape[1]
    use_alibi = slopes is not None
    slopes_arr = slopes if use_alibi else jnp.zeros((bh,), jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, bk=bk, seq_k=seq_k, causal=causal, scale=scale,
            use_alibi=use_alibi,
        ),
        grid=(bh, nq // bq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        interpret=interpret,
    )(slopes_arr, q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, bq=bq, seq_q=seq_q, seq_k=seq_k, causal=causal,
            scale=scale, use_alibi=use_alibi,
        ),
        grid=(bh, nk // bk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nq, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), v.dtype),
        ],
        interpret=interpret,
    )(slopes_arr, q, k, v, g, lse, delta)
    return dq, dk, dv


# ------------------------------------------------------------------- public
def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_with_res(qkv_s, k, v, causal, bq, bk, use_alibi, interpret):
    if use_alibi:
        q, slopes = qkv_s
    else:
        q, slopes = qkv_s, None
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    nq_p, nk_p = _cdiv(nq, bq) * bq, _cdiv(nk, bk) * bk
    qp = _pad_to(q, nq_p, 1)
    kp = _pad_to(k, nk_p, 1)
    vp = _pad_to(v, nk_p, 1)
    o, lse = _flash_fwd(
        qp, kp, vp, slopes, bq=bq, bk=bk, seq_k=nk, causal=causal,
        scale=scale, interpret=interpret,
    )
    return o[:, :nq], (qp, kp, vp, o, lse, slopes)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    alibi_slopes: Optional[jax.Array] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
    force_reference: bool = False,
) -> jax.Array:
    """Flash attention over (B, H, N, D); returns (B, H, Nq, D).

    Dispatches to the Pallas kernels on TPU (or interpret mode when
    `interpret=True`), and to the XLA reference elsewhere. Differentiable in
    (q, k, v) via the custom VJP; ALiBi slopes get zero gradient.
    """
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        # non-TPU backends take the XLA reference; interpret-mode Pallas is
        # orders of magnitude slower at model shapes and is for TESTS that
        # pass interpret=True explicitly (same pattern as vit_attention.py)
        interpret = False
    if force_reference or not (on_tpu or interpret):
        return attention_reference(
            q, k, v, causal=causal, alibi_slopes=alibi_slopes
        )
    if causal and q.shape[2] != k.shape[2]:
        # the kernels hardcode a zero query offset: the causal diagonal for
        # nq != nk (decode-style queries against a longer KV) would mask
        # every past key — route to the reference, which offsets by nk - nq
        return attention_reference(
            q, k, v, causal=causal, alibi_slopes=alibi_slopes
        )

    b, h, nq, d = q.shape
    nk = k.shape[2]
    bq = min(block_q, _cdiv(nq, 8) * 8 if nq < block_q else block_q)
    bk = min(block_k, _cdiv(nk, 8) * 8 if nk < block_k else block_k)
    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)
    if alibi_slopes is not None:
        slopes = jnp.tile(alibi_slopes.astype(jnp.float32), b)
        out = _fa_call(
            (qf, slopes), kf, vf, causal, bq, bk, True, interpret
        )
    else:
        out = _fa_call(qf, kf, vf, causal, bq, bk, False, interpret)
    return out.reshape(b, h, nq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fa_call(qs, k, v, causal, bq, bk, use_alibi, interpret):
    return _fwd_with_res(qs, k, v, causal, bq, bk, use_alibi, interpret)[0]


def _fa_fwd(qs, k, v, causal, bq, bk, use_alibi, interpret):
    out, res = _fwd_with_res(qs, k, v, causal, bq, bk, use_alibi, interpret)
    nk = k.shape[1]
    return out, res + (nk,)


def _fa_bwd(causal, bq, bk, use_alibi, interpret, res, g):
    qp, kp, vp, o, lse, slopes, nk_true = res
    nq = g.shape[1]
    gp = _pad_to(g.astype(qp.dtype), qp.shape[1], 1)
    dq, dk, dv = _flash_bwd(
        (qp, kp, vp, o, lse, slopes), gp,
        bq=bq, bk=bk, seq_q=nq, seq_k=nk_true, causal=causal,
        scale=1.0 / math.sqrt(qp.shape[-1]), interpret=interpret,
    )
    dq = dq[:, :nq]
    dk = dk[:, :nk_true]
    dv = dv[:, :nk_true]
    if use_alibi:
        return ((dq, jnp.zeros_like(slopes)), dk, dv)
    return (dq, dk, dv)


_fa_call.defvjp(_fa_fwd, _fa_bwd)
