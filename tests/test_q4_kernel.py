"""Pallas packed-int4 matmul kernel (ops/pallas/q4_matmul.py).

CPU interpret-mode parity against the XLA decode path (the kernel's only
numerical difference is bf16 group scales vs fp32 — pinned at 1e-2 rel),
plus the eligibility gate that routes prefill/odd shapes back to XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.ops.pallas.q4_matmul import q4_matmul
from robustvlm_tpu.ops.quant import dequantize, quantize_q4


def _mk(k, n, g, seed=0):
    w = jax.random.normal(jax.random.PRNGKey(seed), (k, n)) * 0.05
    return quantize_q4(w, group_size=g)


@pytest.mark.parametrize("b,k,n,g", [
    (1, 512, 512, 128),   # matvec + batch-padding path
    (8, 512, 384, 64),    # bn=384 strip
    (3, 256, 128, 128),   # group clamps to K/2, pad 3 -> 8
])
def test_kernel_matches_xla_decode(b, k, n, g):
    qw = _mk(k, n, g)
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, k)) * 0.5).astype(
        jnp.bfloat16
    )
    y = q4_matmul(x, qw.p, qw.s, interpret=True)
    assert y is not None and y.shape == (b, n) and y.dtype == x.dtype
    ref = x.astype(jnp.float32) @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref), rtol=1e-2, atol=1e-2
    )


def test_leading_dims_flatten():
    qw = _mk(256, 256, 128)
    x = (jax.random.normal(jax.random.PRNGKey(2), (2, 1, 256)) * 0.5).astype(
        jnp.bfloat16
    )
    y = q4_matmul(x, qw.p, qw.s, interpret=True)
    assert y.shape == (2, 1, 256)
    y2 = q4_matmul(x.reshape(2, 256), qw.p, qw.s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y.reshape(2, 256), np.float32),
        np.asarray(y2, np.float32),
    )


def test_ineligible_shapes_return_none():
    qw = _mk(256, 256, 128)
    x = jnp.zeros((1, 256), jnp.bfloat16)
    # stacked weight
    p3 = jnp.broadcast_to(qw.p, (2,) + qw.p.shape)
    assert q4_matmul(x, p3, qw.s, interpret=True) is None
    # N without a supported strip
    qw_odd = _mk(256, 192, 128, seed=3)
    assert q4_matmul(
        jnp.zeros((1, 256), jnp.bfloat16), qw_odd.p, qw_odd.s,
        interpret=True,
    ) is None
    # prefill-sized batch
    xb = jnp.zeros((64, 256), jnp.bfloat16)
    assert q4_matmul(xb, qw.p, qw.s, interpret=True) is None
    # K mismatch
    assert q4_matmul(
        jnp.zeros((1, 128), jnp.bfloat16), qw.p, qw.s, interpret=True
    ) is None


@pytest.mark.parametrize("b,k,n,g", [
    (1, 512, 512, 128),
    (8, 512, 384, 64),
    (3, 256, 128, 128),
])
def test_group_kernel_matches_xla_decode(b, k, n, g, monkeypatch):
    """The magic-dequant group-dot variant (Q4_KERNEL=group) must match the
    XLA decode path like the classic kernel does — its fp32 magic subtract
    is exact and its scale applies to fp32 partials, so if anything it is
    CLOSER to the fp32 reference than the bf16-scale classic form."""
    monkeypatch.setenv("Q4_KERNEL", "group")
    qw = _mk(k, n, g)
    x = (jax.random.normal(jax.random.PRNGKey(1), (b, k)) * 0.5).astype(
        jnp.bfloat16
    )
    y = q4_matmul(x, qw.p, qw.s, interpret=True)
    assert y is not None and y.shape == (b, n) and y.dtype == x.dtype
    ref = x.astype(jnp.float32) @ dequantize(qw, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref), rtol=1e-2, atol=1e-2
    )


def test_group_kernel_matches_classic_closely(monkeypatch):
    """Variant agreement on the same inputs: both decode the same (q-8)*s
    weights; only fp32 summation order differs."""
    qw = _mk(512, 256, 128, seed=5)
    x = (jax.random.normal(jax.random.PRNGKey(4), (8, 512)) * 0.5).astype(
        jnp.bfloat16
    )
    monkeypatch.delenv("Q4_KERNEL", raising=False)
    y_classic = q4_matmul(x, qw.p, qw.s, interpret=True)
    monkeypatch.setenv("Q4_KERNEL", "group")
    y_group = q4_matmul(x, qw.p, qw.s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_classic, np.float32), np.asarray(y_group, np.float32),
        rtol=2e-2, atol=2e-2,
    )
