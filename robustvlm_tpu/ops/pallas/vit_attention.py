"""Fused whole-sequence ViT attention (fwd + bwd) as Pallas TPU kernels.

Why a second attention kernel: the ViT attack hot loop (SURVEY.md §3.2 —
fwd + grad-wrt-pixels through ViT-L/14 every APGD step) runs attention at
tiny shapes: seq 257 (50 for ViT-B/32, 577 for -336), head_dim 64. Measured
on v5e, XLA's batched einsum attention runs these at ~19 TFLOP/s, and a
flash-style kernel (ops/pallas/flash_attention.py, grid over (b·h,
q-blocks)) is far worse: per-program work is ~6 µs against ~25 µs of fixed
pipeline overhead. At these sequence lengths the WHOLE (N×N) score matrix
fits in VMEM, so flash-style streaming buys nothing and costs everything.

Design:
- One grid program computes `hp` complete heads VECTORIZED along the head
  axis (batched `dot_general`, not an unrolled per-head loop — unrolling
  keeps every head's temporaries live simultaneously and OOMs VMEM), with a
  direct fp32 softmax (exact, not online) and O = PV entirely in VMEM —
  zero HBM traffic for S or P.
- Padding: K/V/dO are zero-padded and pad COLUMNS are masked to -1e30
  before the softmax max (one fused `where` pass per kernel) — anchoring
  the max at the pads' zero scores instead looks free but NaNs any row
  whose true scores all sit below exp's underflow point, a regime
  adversarial optimization can reach. Pad ROWS need no handling: garbage
  there is sliced away by the caller and zero-padded dO rows contribute
  nothing to dK/dV.
- Backward is ONE kernel per program computing dQ, dK, dV together from the
  saved (q, k, v, o, lse): P is recomputed as exp(S − lse) (cheaper than
  round-tripping the (BH, N, N) probabilities through HBM), delta =
  rowsum(dO ∘ O) on the VPU, then five MXU matmuls. Writing dq/dk/dv from
  the program that owns the head removes the shared-write races the
  reference's Triton backward warns about (flash_attn_triton.py:27-35) by
  construction.

Numerics match `flash_attention.attention_reference` (fp32 softmax, bf16
matmul operands) — the unit-test oracle. Non-causal, no bias: decoder LMs
(causal/ALiBi, long seq) keep using the flash kernel.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_BATCH_DOT = (((2,), (2,)), ((0,), (0,)))      # (hp,n,d) x (hp,m,d) -> (hp,n,m)
_BATCH_DOT_T = (((1,), (1,)), ((0,), (0,)))    # (hp,n,m) x (hp,n,d) -> (hp,m,d)
_BATCH_MM = (((2,), (1,)), ((0,), (0,)))       # (hp,n,m) x (hp,m,d) -> (hp,n,d)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, seq: int, scale: float):
    hp, n, d = q_ref.shape
    q = q_ref[:] * jnp.asarray(scale, q_ref.dtype)
    s = jax.lax.dot_general(
        q, k_ref[:], _BATCH_DOT, preferred_element_type=jnp.float32
    )  # (hp, n, n)
    if seq != n:
        # mask pad columns BEFORE the max: anchoring the max at the pads'
        # zero scores instead would underflow rows whose true scores are
        # all <= ~-88 to l == 0 -> 0/0 NaN (the regime adversarial inputs
        # can reach); with the mask the true row max keeps exp in range
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        s = jnp.where(col < seq, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)  # pad cols exp(NEG_INF - m) == 0
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], _BATCH_MM,
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (o / l).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(l)


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, seq: int, scale: float,
):
    hp, n, d = q_ref.shape
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    lse = lse_ref[:]  # (hp, n, 1) fp32
    s = jax.lax.dot_general(
        q, k, _BATCH_DOT, preferred_element_type=jnp.float32
    ) * scale
    if seq != n:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        s = jnp.where(col < seq, s, NEG_INF)
    p = jnp.exp(s - lse)  # pad cols exactly 0 (lse finite for real rows)
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[:].astype(jnp.float32),
        axis=-1, keepdims=True,
    )  # (hp, n, 1); zero in padded rows (dO zero-padded)
    dp = jax.lax.dot_general(
        do, v, _BATCH_DOT, preferred_element_type=jnp.float32
    )  # do @ v^T
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    # dk/dv garbage lands only in padded ROWS, sliced away by the caller
    dq_ref[:] = jax.lax.dot_general(
        ds, k, _BATCH_MM, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[:] = jax.lax.dot_general(
        ds, q, _BATCH_DOT_T, preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)  # ds^T @ q
    dv_ref[:] = jax.lax.dot_general(
        p.astype(do.dtype), do, _BATCH_DOT_T, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)  # p^T @ do


def _pick_hp(bh: int, n_pad: int, d: int, itemsize: int, n_bufs: int) -> int:
    """Heads per grid program, sized to a ~10 MB VMEM working set: the
    dominant consumers are the fp32 (hp, n, n) score/probability temporaries
    (2 fwd / 3 bwd) plus the double-buffered head blocks."""
    budget = 10 * 1024 * 1024
    per_head = 3 * (n_pad * n_pad * 4) + n_bufs * n_pad * d * itemsize * 2
    hp = max(1, min(bh, budget // max(per_head, 1)))
    while bh % hp:
        hp -= 1
    return hp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _vit_attn(q, k, v, seq, hp, interpret):
    return _vit_attn_fwd(q, k, v, seq, hp, interpret)[0]


def _head_specs(hp, n, d, count):
    return [
        pl.BlockSpec((hp, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def _lse_spec(hp, n):
    return pl.BlockSpec((hp, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _vit_attn_fwd(q, k, v, seq, hp, interpret):
    bh, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    hp = hp or _pick_hp(bh, n, d, q.dtype.itemsize, n_bufs=5)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, seq=seq, scale=scale),
        grid=(bh // hp,),
        in_specs=_head_specs(hp, n, d, 3),
        out_specs=[*_head_specs(hp, n, d, 1), _lse_spec(hp, n)],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * n * n * d,
            bytes_accessed=5 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(q, k, v)
    return o, (q, k, v, o, lse)


def _vit_attn_bwd(seq, hp, interpret, res, g):
    q, k, v, o, lse = res
    bh, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    hp = hp or _pick_hp(bh, n, d, q.dtype.itemsize, n_bufs=9)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, seq=seq, scale=scale),
        grid=(bh // hp,),
        in_specs=[*_head_specs(hp, n, d, 4), _lse_spec(hp, n),
                  *_head_specs(hp, n, d, 1)],
        out_specs=_head_specs(hp, n, d, 3),
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bh * n * n * d,
            bytes_accessed=9 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
        interpret=interpret,
    )(q, k, v, o, lse, g.astype(q.dtype))
    return dq, dk, dv


_vit_attn.defvjp(_vit_attn_fwd, _vit_attn_bwd)


def vit_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    interpret: bool | None = None,
    heads_per_program: int | None = None,
) -> jax.Array:
    """Fused non-causal self-attention over (B, H, N, D) -> (B, H, N, D).

    Differentiable in (q, k, v). On non-TPU backends falls back to the XLA
    reference unless `interpret=True` (tests)."""
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = False
    if not on_tpu and not interpret:
        from robustvlm_tpu.ops.pallas.flash_attention import attention_reference

        return attention_reference(q, k, v, causal=False)

    b, h, n, d = q.shape
    n_pad = _round_up(n, 16)
    bh = b * h

    def flat_pad(t):
        t = t.reshape(bh, n, d)
        if n_pad != n:
            t = jnp.pad(t, ((0, 0), (0, n_pad - n), (0, 0)))
        return t

    hp = heads_per_program
    if hp is None and os.environ.get("VIT_ATTN_HP"):
        # perf-sweep hook: override the VMEM-budget heuristic from the
        # environment (scripts/perf_sweep.py hp ablations). Sweeps pass
        # round numbers that needn't divide B*H — snap DOWN to the nearest
        # divisor so a sweep never crashes mid-grid (explicit
        # heads_per_program args still get the strict divisor check below)
        want = int(os.environ["VIT_ATTN_HP"])
        if want < 1:
            raise ValueError(f"VIT_ATTN_HP must be >= 1, got {want}")
        hp = max(k for k in range(1, min(want, bh) + 1) if bh % k == 0)
    if hp is not None and bh % hp:
        raise ValueError(f"heads_per_program {hp} must divide B*H {bh}")
    out = _vit_attn(flat_pad(q), flat_pad(k), flat_pad(v), n, hp, interpret)
    return out[:, :n].reshape(b, h, n, d)
