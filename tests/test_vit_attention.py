"""Fused whole-sequence ViT attention kernel vs XLA oracle (interpret mode).

The kernel (ops/pallas/vit_attention.py) is the attack-hot-path attention for
the CLIP vision towers (non-causal, short seq); the oracle is
flash_attention.attention_reference — the same fp32-softmax math the
reference computes with torch SDPA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.ops.pallas.flash_attention import attention_reference
from robustvlm_tpu.ops.pallas.vit_attention import vit_attention


def _qkv(rng, b, h, n, d, dtype=np.float32):
    return [
        jnp.asarray(rng.randn(b, h, n, d).astype(dtype) * 0.5) for _ in range(3)
    ]


class TestVitAttention:
    @pytest.mark.parametrize(
        "b,h,n,d",
        [
            (2, 4, 57, 64),   # padded seq (57 -> 64)
            (1, 2, 64, 32),   # already aligned
            (2, 2, 50, 64),   # ViT-B/32 token count
            (1, 4, 130, 64),  # two-plus sublane tiles
        ],
    )
    def test_matches_reference(self, b, h, n, d):
        rng = np.random.RandomState(0)
        q, k, v = _qkv(rng, b, h, n, d)
        out = vit_attention(q, k, v, interpret=True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-5)

    def test_grads_match_reference(self):
        rng = np.random.RandomState(1)
        q, k, v = _qkv(rng, 2, 3, 57, 64)

        def f_kernel(q, k, v):
            return jnp.sum(jnp.sin(vit_attention(q, k, v, interpret=True)))

        def f_ref(q, k, v):
            return jnp.sum(jnp.sin(attention_reference(q, k, v)))

        gk = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gk, gr):
            np.testing.assert_allclose(a, b_, atol=2e-6, rtol=2e-5)

    def test_heads_per_program_grouping(self):
        """Grouping heads into grid programs must not change results."""
        rng = np.random.RandomState(2)
        q, k, v = _qkv(rng, 2, 4, 33, 32)
        ref = attention_reference(q, k, v)
        for hp in (1, 2, 4, 8):
            out = vit_attention(q, k, v, interpret=True, heads_per_program=hp)
            np.testing.assert_allclose(out, ref, atol=2e-6, rtol=2e-5)

    def test_bad_heads_per_program_raises(self):
        rng = np.random.RandomState(3)
        q, k, v = _qkv(rng, 1, 3, 16, 32)
        with pytest.raises(ValueError):
            vit_attention(q, k, v, interpret=True, heads_per_program=2)

    def test_bf16_inputs(self):
        """bf16 operands (the bench configuration) stay within bf16 tolerance."""
        rng = np.random.RandomState(4)
        q, k, v = [t.astype(jnp.bfloat16) for t in _qkv(rng, 1, 2, 57, 64)]
        out = vit_attention(q, k, v, interpret=True).astype(jnp.float32)
        ref = attention_reference(q, k, v).astype(jnp.float32)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)

    def test_padding_gradient_is_zero_outside(self):
        """Gradient must not leak into (or out of) padded positions."""
        rng = np.random.RandomState(5)
        b, h, n, d = 1, 2, 57, 64
        q, k, v = _qkv(rng, b, h, n, d)

        def f(q, k, v):
            out = vit_attention(q, k, v, interpret=True)
            return jnp.sum(out * out)

        gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        assert gq.shape == (b, h, n, d)
        assert np.all(np.isfinite(np.asarray(gq)))
        assert np.all(np.isfinite(np.asarray(gk)))
        assert np.all(np.isfinite(np.asarray(gv)))


class TestModelDispatch:
    def test_clip_flash_path_uses_vit_kernel(self):
        """encode_image(flash=True) (non-causal) routes through vit_attention
        and matches the einsum path."""
        from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
        from robustvlm_tpu.models.clip.model import vision_forward

        cfg = CLIP_CONFIGS["test-tiny"]
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
        )
        ref = vision_forward(params, x, cfg, flash=False)
        # CPU fallback inside vit_attention is attention_reference; this
        # asserts the dispatch wiring, numerical parity is covered above
        out = vision_forward(params, x, cfg, flash=True)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


class TestExtremeScores:
    def test_all_negative_scores_padded_no_nan(self):
        """Rows whose true scores sit far below exp's underflow range must
        stay finite under padding (regression: anchoring the softmax max at
        the zero-scoring pad columns NaN'd such rows)."""
        b, h, n, d = 1, 1, 57, 64  # 57 -> padded 64
        q = jnp.full((b, h, n, d), 10.0, jnp.float32)
        k = jnp.full((b, h, n, d), -10.0, jnp.float32)  # s_scaled = -800
        v = jnp.asarray(
            np.random.RandomState(0).randn(b, h, n, d).astype(np.float32)
        )
        out = vit_attention(q, k, v, interpret=True)
        ref = attention_reference(q, k, v)
        assert np.all(np.isfinite(np.asarray(out)))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-4)

        def f(q, k, v):
            return jnp.sum(vit_attention(q, k, v, interpret=True) ** 2)

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        for t in g:
            assert np.all(np.isfinite(np.asarray(t)))
