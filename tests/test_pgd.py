import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.attacks.pgd import pgd_attack
from robustvlm_tpu.ops.projections import l2_norm, linf_norm


def quad_loss(target):
    # maximize -> move x toward target
    def fn(x):
        return -jnp.sum((x - target) ** 2)
    return fn


class TestPGD:
    def setup_method(self):
        k = jax.random.PRNGKey(0)
        self.x = jax.random.uniform(k, (8, 3, 8, 8))
        self.target = jnp.clip(self.x + 0.3, 0, 1)

    def test_linf_ball_and_box(self):
        adv = pgd_attack(
            quad_loss(self.target), self.x, eps=8 / 255, stepsize=2 / 255,
            iterations=10, norm="linf", mode="max",
        )
        assert float(linf_norm(adv - self.x).max()) <= 8 / 255 + 1e-6
        assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0

    def test_l2_ball(self):
        adv = pgd_attack(
            quad_loss(self.target), self.x, eps=0.5, stepsize=0.1,
            iterations=10, norm="l2", mode="max",
        )
        assert float(l2_norm(adv - self.x).max()) <= 0.5 + 1e-5

    def test_maximize_increases_loss(self):
        fn = quad_loss(self.target)
        adv = pgd_attack(fn, self.x, eps=8 / 255, stepsize=2 / 255,
                         iterations=10, norm="linf", mode="max")
        assert float(fn(adv)) > float(fn(self.x))

    def test_minimize_decreases_loss(self):
        fn = quad_loss(self.target)
        adv = pgd_attack(fn, self.x, eps=8 / 255, stepsize=2 / 255,
                         iterations=10, norm="linf", mode="min")
        assert float(fn(adv)) < float(fn(self.x))

    def test_linf_saturates_to_corner(self):
        # linear loss: optimum is the ball corner (clipped to the box)
        w = jax.random.normal(jax.random.PRNGKey(1), self.x.shape)
        fn = lambda x: jnp.sum(w * x)
        eps = 8 / 255
        adv = pgd_attack(fn, self.x, eps=eps, stepsize=2 * eps,
                         iterations=5, norm="linf", mode="max")
        expect = jnp.clip(self.x + eps * jnp.sign(w), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(adv), np.asarray(expect), atol=1e-6)

    def test_random_start_within_ball(self):
        adv = pgd_attack(
            quad_loss(self.target), self.x, eps=8 / 255, stepsize=1 / 255,
            iterations=1, norm="linf", random_start=True,
            rng=jax.random.PRNGKey(3),
        )
        assert float(linf_norm(adv - self.x).max()) <= 8 / 255 + 1e-6

    def test_mask_freezes_masked_region(self):
        mask = jnp.zeros_like(self.x).at[:, :, :4].set(1.0)
        adv = pgd_attack(
            quad_loss(self.target), self.x, eps=8 / 255, stepsize=2 / 255,
            iterations=10, norm="linf", mode="max", mask=mask,
        )
        delta = np.asarray(adv - self.x)
        assert np.abs(delta[:, :, 4:]).max() == 0.0
        assert np.abs(delta[:, :, :4]).max() > 0.0

    def test_jit_compatible(self):
        fn = quad_loss(self.target)
        jitted = jax.jit(
            lambda x: pgd_attack(fn, x, eps=8 / 255, stepsize=2 / 255,
                                 iterations=5, norm="linf")
        )
        adv = jitted(self.x)
        assert adv.shape == self.x.shape


class TestThreatModelGuard:
    def test_mis_scaled_input_rejected(self):
        """0-255-scaled inputs must error loudly (the reference's range
        asserts, SURVEY.md §4.1) — eps would be relatively microscopic."""
        from robustvlm_tpu.attacks.apgd import apgd_attack
        from robustvlm_tpu.attacks.pgd import pgd_attack

        x255 = jnp.asarray(
            np.random.RandomState(0).rand(2, 3, 8, 8).astype(np.float32) * 255
        )
        with pytest.raises(ValueError, match="255"):
            pgd_attack(lambda t: jnp.sum(t), x255, eps=8 / 255,
                       stepsize=2 / 255, iterations=2)
        with pytest.raises(ValueError, match="255"):
            apgd_attack(
                lambda t: jnp.sum(t, axis=(1, 2, 3)), x255, None,
                criterion=lambda o, y: o, eps=8 / 255, n_iter=2,
            )
