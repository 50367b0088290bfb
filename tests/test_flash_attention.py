"""Flash-attention kernel vs XLA oracle (interpret mode on CPU).

The backward is the race-prone part in the reference's Triton kernel
(flash_attn_triton.py:27-35 discusses its race-condition testing); ours is a
deterministic two-kernel split, verified here against jax.grad of the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.ops.pallas.flash_attention import (
    attention_reference,
    flash_attention,
)


def _rand_qkv(rng, b, h, n, d, nk=None):
    nk = nk or n
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(b, h, nk, d).astype(np.float32)) * 0.3
    return q, k, v


class TestForward:
    @pytest.mark.parametrize("n,d", [(64, 32), (80, 64), (130, 64)])
    def test_noncausal_matches_reference(self, n, d):
        rng = np.random.RandomState(0)
        q, k, v = _rand_qkv(rng, 2, 3, n, d)
        out = flash_attention(q, k, v, interpret=True, block_q=64, block_k=64)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_causal_matches_reference(self):
        rng = np.random.RandomState(1)
        q, k, v = _rand_qkv(rng, 1, 2, 96, 32)
        out = flash_attention(
            q, k, v, causal=True, interpret=True, block_q=32, block_k=32
        )
        ref = attention_reference(q, k, v, causal=True)
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def test_alibi_matches_reference(self):
        rng = np.random.RandomState(2)
        h = 4
        q, k, v = _rand_qkv(rng, 1, h, 64, 32)
        slopes = jnp.asarray([2.0 ** -(i + 1) for i in range(h)], jnp.float32)
        out = flash_attention(
            q, k, v, causal=True, alibi_slopes=slopes,
            interpret=True, block_q=32, block_k=32,
        )
        ref = attention_reference(q, k, v, causal=True, alibi_slopes=slopes)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    def test_vit_shape_577(self):
        """ViT-L/14 @224: 577 tokens, head_dim 64 — the production shape
        (padded internally to 640)."""
        rng = np.random.RandomState(3)
        q, k, v = _rand_qkv(rng, 1, 2, 577, 64)
        out = flash_attention(q, k, v, interpret=True)
        ref = attention_reference(q, k, v)
        assert out.shape == (1, 2, 577, 64)
        np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)


class TestBackward:
    def _check_grads(self, causal, slopes, n=96, d=32, atol=3e-4):
        rng = np.random.RandomState(4)
        q, k, v = _rand_qkv(rng, 1, 2 if slopes is None else 4, n, d)

        def f_flash(q, k, v):
            return jnp.sum(
                flash_attention(
                    q, k, v, causal=causal, alibi_slopes=slopes,
                    interpret=True, block_q=32, block_k=32,
                ) ** 2
            )

        def f_ref(q, k, v):
            return jnp.sum(
                attention_reference(
                    q, k, v, causal=causal, alibi_slopes=slopes
                ) ** 2
            )

        g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g1, g2, "qkv"):
            np.testing.assert_allclose(
                a, b, atol=atol, rtol=1e-3,
                err_msg=f"grad d{name} mismatch (causal={causal})",
            )

    def test_noncausal_grads(self):
        self._check_grads(False, None)

    def test_causal_grads(self):
        self._check_grads(True, None)

    def test_alibi_grads(self):
        slopes = jnp.asarray([0.5, 0.25, 0.125, 0.0625], jnp.float32)
        self._check_grads(True, slopes)

    def test_padded_seq_grads(self):
        """Grads through internal padding (577 -> 640) stay exact on the
        valid region."""
        rng = np.random.RandomState(5)
        q, k, v = _rand_qkv(rng, 1, 1, 150, 32)

        def f(impl):
            def g(q, k, v):
                out = (
                    flash_attention(q, k, v, interpret=True, block_q=64, block_k=64)
                    if impl == "flash"
                    else attention_reference(q, k, v)
                )
                return jnp.sum(out * out)
            return g

        g1 = jax.grad(f("flash"), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f("ref"), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=3e-4, rtol=1e-3)
