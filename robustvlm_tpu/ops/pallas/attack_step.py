"""Fused Pallas kernel for the APGD/PGD Linf inner update.

The deepest elementwise chain of the attack loop — sign-gradient step,
eps-ball clamp, [0,1] clamp, momentum-through-iterates blend, second clamp
(reference autopgd_base.py:335-341 / train/apgd_train.py:213-229) — executed
as a single VMEM-resident Pallas kernel: one read of each operand from HBM,
one write of the result, zero intermediate HBM traffic.

Inputs are flattened to (B, F); F must be a multiple of 128 (true for
3x224x224 = 1176*128, 3x336x336, and 3x32x32 images). Per-example step sizes
ride along as a (B, 1) column broadcast inside the kernel.

The pure-jnp fallback (`_linf_step_jnp`) is the reference semantics and is used
on non-TPU backends and for odd shapes; tests assert bit-level agreement in
interpret mode.

Default: OFF (auto resolves to the jnp path). Measured on v5e inside the
whole-attack scan, XLA's own fusion of this chain is slightly faster than
the kernel at every batch tried (b8: 296.5 vs 290.1 steps/s; b32: 238.4 vs
236.2) — the extra pallas_call dispatch per scan iteration costs more than
the fusion saves. The kernel remains available via use_pallas=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_B = 8
_BLOCK_F = 512


def _linf_step_jnp(x_adv, x_adv_old, grad, x, step_size, eps, a):
    """Reference semantics in plain jnp (XLA-fused)."""
    step = step_size.reshape(-1, *([1] * (x.ndim - 1)))
    z = x_adv + step * jnp.sign(grad)
    z = jnp.clip(jnp.minimum(jnp.maximum(z, x - eps), x + eps), 0.0, 1.0)
    xn = x_adv + (z - x_adv) * a + (x_adv - x_adv_old) * (1.0 - a)
    return jnp.clip(jnp.minimum(jnp.maximum(xn, x - eps), x + eps), 0.0, 1.0)


def _kernel(scalars_ref, x_adv_ref, x_old_ref, grad_ref, x_ref, step_ref, out_ref):
    eps = scalars_ref[0]
    a = scalars_ref[1]
    x = x_ref[:]
    x_adv = x_adv_ref[:]
    lo = jnp.maximum(x - eps, 0.0)
    hi = jnp.minimum(x + eps, 1.0)
    z = x_adv + step_ref[:] * jnp.sign(grad_ref[:])
    z = jnp.minimum(jnp.maximum(z, lo), hi)
    xn = x_adv + (z - x_adv) * a + (x_adv - x_old_ref[:]) * (1.0 - a)
    out_ref[:] = jnp.minimum(jnp.maximum(xn, lo), hi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_linf_step(x_adv2, x_old2, grad2, x2, step_col, scalars, interpret=False):
    b, f = x_adv2.shape
    grid = (pl.cdiv(b, _BLOCK_B), pl.cdiv(f, _BLOCK_F))
    # index maps receive (grid indices..., scalar-prefetch refs...) under
    # PrefetchScalarGridSpec — swallow the trailing ref args
    data_spec = pl.BlockSpec(
        (_BLOCK_B, _BLOCK_F), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    step_spec = pl.BlockSpec(
        (_BLOCK_B, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[data_spec, data_spec, data_spec, data_spec, step_spec],
            out_specs=data_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, f), x_adv2.dtype),
        interpret=interpret,
    )(scalars, x_adv2, x_old2, grad2, x2, step_col)


def fused_linf_apgd_step(
    x_adv: jax.Array,
    x_adv_old: jax.Array,
    grad: jax.Array,
    x: jax.Array,
    step_size: jax.Array,
    eps,
    a,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """One Linf APGD iterate update; see module docstring.

    Args:
      x_adv, x_adv_old, grad, x: (B, ...) image-shaped arrays.
      step_size: (B,) per-example step sizes.
      eps: scalar Linf radius.
      a: momentum blend (1.0 on the first iteration, 0.75 after); may be traced.
      use_pallas: force the kernel (True) or the jnp path (False). Default
        None keeps the kernel OFF on hardware — measured slower than XLA's
        fusion inside the attack scan on v5e (module docstring) — and only
        auto-selects it under interpret=True for kernel tests.
    """
    b = x_adv.shape[0]
    f = 1
    for s in x_adv.shape[1:]:
        f *= s
    aligned = (f % 128 == 0) and (b % _BLOCK_B == 0)
    if use_pallas is None:
        # measured slower than XLA's fusion inside the attack scan on v5e
        # at every batch size tried (see module docstring) — opt-in only
        use_pallas = bool(interpret) and aligned
    if not use_pallas:
        return _linf_step_jnp(x_adv, x_adv_old, grad, x, step_size, eps, a)

    shape = x_adv.shape
    dt = x_adv.dtype
    scalars = jnp.stack(
        [jnp.asarray(eps, dt), jnp.asarray(a, dt)]
    )
    out = _pallas_linf_step(
        x_adv.reshape(b, f),
        x_adv_old.reshape(b, f),
        grad.reshape(b, f),
        x.reshape(b, f),
        step_size.reshape(b, 1).astype(dt),
        scalars,
        interpret=interpret,
    )
    return out.reshape(shape)
