"""Packed-int4 weight matmul as a Pallas TPU kernel — the decode hot op.

Why a kernel: weight-only int4 decode (ops/quant.py PackedQ4Weight) is
HBM-bandwidth-bound — the step should cost (packed bytes)/(stream rate).
XLA fuses a plain int8→bf16 convert into a dot's operand load (measured:
the int8 path streams 684 GB/s), but it will NOT fuse the int4 decode
chain (mask/shift/bias/group-scale): it materializes the decoded bf16
halves in HBM every step. Measured on v5e LLaVA-7B decode b1: 50.2 ms/step
for the XLA half-split form (~35 GB moved ≈ packed read + decoded write +
decoded read) vs int8's 10.2 ms — the 4-bit storage win inverted into a
2.8x slowdown. This kernel restores the roofline: packed bytes stream
HBM→VMEM once, the VPU unpacks and scales in VMEM, the MXU consumes the
decoded tile directly.

Design (shapes follow ops/quant.PackedQ4Weight's half-split layout):
- Grid over output-column strips only: (N // bn,). The activation is a
  decode-sized (B≤32, K) matvec — it rides whole in VMEM across all grid
  steps (two (B, K/2) halves, ≤ a few hundred KB), so K needs no blocking
  and there is no accumulation carry.
- Each program loads the packed strip p (K/2, bn) uint8 — the only
  HBM-proportional traffic — plus the two (K/(2G), bn) scale strips,
  decodes each half (nibble → int8-8 → bf16, × group scale broadcast over
  G rows) and issues two MXU dots into an fp32 accumulator.
- bn is chosen per shape: the largest of 512/384/256/128 dividing N that
  keeps the TWO decoded bf16 halves (2 × K/2 rows × bn cols × 2 B — the
  worst case has both live across the two dots) under an 8 MB VMEM
  budget; the packed strip's double-buffered DMA and the activation add
  a few MB more, still well under the ~16 MB/core VMEM.
- Scales multiply in bf16 inside the kernel (the XLA path keeps them
  fp32): two extra bf16 roundings ≈ 0.2-0.4% rel — far under int4's ~7%
  inherent quantization error; tests pin the kernel against the XLA
  decode path at 1e-2 rel.

Used automatically by ops.quant.qmatmul for decode-shaped operands on TPU
(matvec-like x, 2-D weight, N divisible by a supported strip); everything
else keeps the XLA path. CPU tests run interpret mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_BN_CANDIDATES = (512, 384, 256, 128)
# bytes of decoded bf16 weight tiles per program: the kernel materializes
# TWO (kh, bn) decoded halves (worst case both live across the two dots);
# the packed uint8 strip (kh*bn/2, double-buffered against the next grid
# step's DMA), the (B, K) activation halves and the fp32 accumulator add
# at most ~3 MB more at the production shapes — total well under the
# ~16 MB/core VMEM.
_DECODED_VMEM_BUDGET = 8 * 2**20


def _pick_bn(kh: int, n: int) -> Optional[int]:
    for bn in _BN_CANDIDATES:
        if n % bn == 0 and 2 * (kh * bn * 2) <= _DECODED_VMEM_BUDGET:
            return bn
    return None


def _kernel(xl_ref, xh_ref, p_ref, sl_ref, sh_ref, o_ref):
    kh, bn = p_ref.shape
    ngh = sl_ref.shape[0]
    g = kh // ngh

    def half(nib_i32, s_ref):
        q = (nib_i32 - 8).astype(jnp.bfloat16)
        s = s_ref[:].astype(jnp.bfloat16)          # (ngh, bn)
        qg = q.reshape(ngh, g, bn) * s[:, None, :]
        return qg.reshape(kh, bn)

    # decode in int32, the native VPU lane width: mosaic has no
    # uint8->bfloat16 cast, and the uint8 mask/shift -> int8 -> bf16
    # route CRASHES the TPU compiler outright (tpu_compile_helper exit 1
    # through the axon tunnel — measured r5, every production shape).
    # uint8 codes are non-negative, so int32 & / >> match the packed
    # semantics exactly.
    pi = p_ref[:].astype(jnp.int32)                # (Kh, bn)
    acc = jnp.dot(
        xl_ref[:], half(pi & 0x0F, sl_ref),
        preferred_element_type=jnp.float32,
    )
    acc = acc + jnp.dot(
        xh_ref[:], half(pi >> 4, sh_ref),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = acc.astype(o_ref.dtype)


# fp32 magic-number constants: OR-ing a nibble q into the mantissa of
# 2^23 gives the EXACT fp32 value 2^23 + q (bitcast, no convert op);
# subtracting (2^23 + 8) is exact (operands within a factor of 2 —
# Sterbenz), leaving q - 8 with zero rounding error.
_MAGIC_BITS = 0x4B000000       # fp32 2^23
_MAGIC_F = 8388616.0           # 2^23 + 8


def _kernel_group(xl_ref, xh_ref, p_ref, sl_ref, sh_ref, o_ref):
    """Group-dot variant: the b1 decode step is VPU-UNPACK-bound (measured
    12.48 ms = 310 GB/s effective vs the ~700 GB/s stream), so this form
    cuts VPU work per decoded element from ~5 ops (i32 sub, i32->f32,
    f32->bf16, bf16 scale-mul) to ~3 (OR, exact magic fsub, f32->bf16):

      - magic-number dequant replaces the int->float convert chain with a
        mantissa-OR + bitcast (free) + one exact fp32 subtract;
      - the per-element group-scale multiply moves OUT of the decode: the
        MXU dots run per quantization group on the UNSCALED (q-8) tiles,
        and the (ngh, B, bn) fp32 partials are scaled and summed after —
        ngh*B*bn multiplies instead of kh*bn.

    The batched per-group dot serializes on the MXU (CLAUDE.md), but at
    decode batch <= 32 the MXU is idle either way — the kernel trades MXU
    slack for VPU relief. Same math as _kernel up to fp32 summation order
    (scale applied to fp32 partials here is STRICTLY more precise than
    _kernel's bf16 scale multiply)."""
    kh, bn = p_ref.shape
    ngh = sl_ref.shape[0]
    g = kh // ngh
    b = xl_ref.shape[0]

    def half(nib_i32, s_ref, x_ref):
        f = jax.lax.bitcast_convert_type(
            nib_i32 | _MAGIC_BITS, jnp.float32
        )                                           # 2^23 + q, exact
        qg = (f - _MAGIC_F).astype(jnp.bfloat16).reshape(ngh, g, bn)
        xg = x_ref[:].reshape(b, ngh, g).transpose(1, 0, 2)  # (ngh, B, g)
        part = jax.lax.dot_general(
            xg, qg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                           # (ngh, B, bn)
        return jnp.sum(part * s_ref[:][:, None, :], axis=0)

    pi = p_ref[:].astype(jnp.int32)
    acc = half(pi & 0x0F, sl_ref, xl_ref) + half(pi >> 4, sh_ref, xh_ref)
    o_ref[:] = acc.astype(o_ref.dtype)


def _use_group_kernel() -> bool:
    """Variant switch: the magic-dequant group-dot form (_kernel_group) is
    the DEFAULT — the on-chip head-to-head (one session, LLaVA-7B decode)
    measured it ahead at every batch point: 88.4/167.9/271.4 tok/s at
    b1/b2/b4 vs the shift kernel's 74.5/143/238.8. Q4_KERNEL=shift opts
    back into the classic form."""
    import os

    return os.environ.get("Q4_KERNEL", "group") == "group"


@functools.partial(jax.jit, static_argnames=("bn", "interpret", "group"))
def _q4_matmul_2d(x, p, s, *, bn: int, interpret: bool = False,
                  group: bool = False):
    """x (B, K) @ packed (K/2, N) -> (B, N) in x.dtype. B must be a
    multiple of 8 (callers pad)."""
    b, k = x.shape
    kh, n = p.shape
    ng = s.shape[0]
    ngh = ng // 2
    xl = x[:, : k // 2].astype(jnp.bfloat16)
    xh = x[:, k // 2:].astype(jnp.bfloat16)
    s2 = s.reshape(ng, n)  # (ng, 1, N) -> (ng, N)
    sl, sh = s2[:ngh], s2[ngh:]
    grid = (n // bn,)
    out = pl.pallas_call(
        _kernel_group if group else _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, kh), lambda i: (0, 0)),
            pl.BlockSpec((b, kh), lambda i: (0, 0)),
            pl.BlockSpec((kh, bn), lambda i: (0, i)),
            pl.BlockSpec((ngh, bn), lambda i: (0, i)),
            pl.BlockSpec((ngh, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        interpret=interpret,
    )(xl, xh, p, sl, sh)
    return out


def q4_matmul(x: jax.Array, p: jax.Array, s: jax.Array,
              *, interpret: bool = False) -> Optional[jax.Array]:
    """Kernel-path x @ W for a half-split PackedQ4Weight's (p, s) arrays.

    Accepts x (..., K) with a small flattened batch (decode shapes) and a
    2-D packed weight. Returns None when the shape isn't kernel-eligible
    (callers fall back to the XLA decode path): weights with stacked
    leading dims, N without a supported strip size, or a batch too large
    to hold the activation resident in VMEM.
    """
    if p.ndim != 2:
        return None
    kh, n = p.shape
    k = kh * 2
    if x.shape[-1] != k or k % 2:
        return None
    lead = x.shape[:-1]
    b = 1
    for d in lead:
        b *= d
    if b > 32:  # prefill-sized batches: XLA's materialized path amortizes
        return None
    bn = _pick_bn(kh, n)
    if bn is None:
        return None
    xb = x.reshape(b, k)
    pad = (-b) % 8
    if pad:
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
    out = _q4_matmul_2d(
        xb, p, s, bn=bn, interpret=interpret, group=_use_group_kernel()
    )
    if pad:
        out = out[:b]
    return out.reshape(lead + (n,))
