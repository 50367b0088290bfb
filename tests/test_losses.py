import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from robustvlm_tpu.ops.losses import (
    ce_loss,
    ce_loss_targeted,
    dlr_loss,
    dlr_loss_targeted,
    l2_embedding_loss,
    make_loss_fn,
)


def _logits(seed=0, b=16, c=10):
    rng = np.random.RandomState(seed)
    return rng.randn(b, c).astype(np.float32) * 3.0


class TestCE:
    def test_matches_torch(self):
        z = _logits()
        y = np.arange(16) % 10
        ours = np.asarray(ce_loss(jnp.asarray(z), jnp.asarray(y), reduction="none"))
        ref = F.cross_entropy(
            torch.from_numpy(z), torch.from_numpy(y), reduction="none"
        ).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            float(ce_loss(jnp.asarray(z), jnp.asarray(y), reduction="mean")),
            ref.mean(),
            rtol=1e-4,
        )

    def test_targeted_is_negated(self):
        z, yt = _logits(1), np.arange(16) % 10
        np.testing.assert_allclose(
            np.asarray(ce_loss_targeted(jnp.asarray(z), jnp.asarray(yt))),
            -np.asarray(ce_loss(jnp.asarray(z), jnp.asarray(yt), reduction="none")),
            rtol=1e-6,
        )


class TestL2Embedding:
    def test_sum_over_dim_semantics(self):
        # per reference: squared error summed over embedding dim, no /dim
        e = jnp.asarray(_logits(2, 8, 512))
        eo = jnp.asarray(_logits(3, 8, 512))
        per = np.asarray(l2_embedding_loss(e, eo, reduction="none"))
        expect = np.sum((np.asarray(e) - np.asarray(eo)) ** 2, axis=1)
        np.testing.assert_allclose(per, expect, rtol=1e-5)
        np.testing.assert_allclose(
            float(l2_embedding_loss(e, eo, reduction="mean")), expect.mean(), rtol=1e-5
        )


def _dlr_reference(x, y):
    """Reference DLR formula, computed naively with numpy full sort."""
    xs = np.sort(x, axis=1)
    amax = x.argmax(axis=1)
    ind = (amax == y).astype(np.float32)
    num = x[np.arange(len(y)), y] - xs[:, -2] * ind - xs[:, -1] * (1 - ind)
    return -num / (xs[:, -1] - xs[:, -3] + 1e-12)


def _dlr_targeted_reference(x, y, yt):
    xs = np.sort(x, axis=1)
    u = np.arange(len(y))
    return -(x[u, y] - x[u, yt]) / (xs[:, -1] - 0.5 * (xs[:, -3] + xs[:, -4]) + 1e-12)


class TestDLR:
    def test_untargeted(self):
        z = _logits(4, 32, 100)
        y = np.arange(32) % 100
        # include some correctly-classified rows
        z[:8, :] = -5.0
        z[np.arange(8), y[:8]] = 5.0
        ours = np.asarray(dlr_loss(jnp.asarray(z), jnp.asarray(y)))
        np.testing.assert_allclose(ours, _dlr_reference(z, y), rtol=1e-4)

    def test_targeted(self):
        z = _logits(5, 32, 100)
        y = np.arange(32) % 100
        yt = (y + 7) % 100
        ours = np.asarray(
            dlr_loss_targeted(jnp.asarray(z), jnp.asarray(y), jnp.asarray(yt))
        )
        np.testing.assert_allclose(ours, _dlr_targeted_reference(z, y, yt), rtol=1e-4)


class TestLossRegistry:
    def test_names(self):
        z = jnp.asarray(_logits(6))
        y = jnp.arange(16) % 10
        for name in ["ce", "ce-targeted-cfts", "dlr"]:
            out = make_loss_fn(name)(z, y)
            assert out.shape == (16,)
        out = make_loss_fn("dlr-targeted", y_target=(y + 1) % 10)(z, y)
        assert out.shape == (16,)
        eo = jnp.asarray(_logits(7))
        out = make_loss_fn("l2", embedding_orig=eo)(z, None)
        assert out.shape == (16,)
