"""FAB attack: bisection projections and minimal-norm search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.attacks.fab import fab_attack, projection_hyperplane_box


def _linear_problem(seed=0, b=8, d=20):
    rng = np.random.RandomState(seed)
    u = jnp.asarray(rng.rand(b, d).astype(np.float32))
    w = jnp.asarray(rng.randn(b, d).astype(np.float32))
    bb = jnp.sum(w * u, 1) - 0.5  # violated by 0.5
    return u, w, bb


class TestProjections:
    @pytest.mark.parametrize("norm", ["linf", "l2"])
    def test_constraint_and_box(self, norm):
        u, w, b = _linear_problem()
        z = projection_hyperplane_box(u, w, b, norm)
        viol = np.asarray(jnp.sum(w * z, 1) - b)
        assert viol.max() < 1e-3
        assert (np.asarray(z) >= -1e-6).all() and (np.asarray(z) <= 1 + 1e-6).all()

    def test_satisfied_returns_input(self):
        u, w, _ = _linear_problem()
        b_ok = jnp.sum(w * u, 1) + 1.0  # already satisfied
        z = projection_hyperplane_box(u, w, b_ok, "linf")
        np.testing.assert_allclose(z, u)

    def test_l2_tiny_weight_coordinate_feasible(self):
        """Regression: when small-|w| coordinates need lambda far beyond
        1/max|w| the bisection upper bound must still be feasible."""
        u = jnp.asarray([[1.0, 1.0]], jnp.float32)
        w = jnp.asarray([[1.0, 1e-4]], jnp.float32)
        b = jnp.asarray([0.0], jnp.float32)  # needs lam ~ 1e4
        z = projection_hyperplane_box(u, w, b, "l2")
        assert float(jnp.sum(w * z, 1)[0]) <= 1e-4
        assert (np.asarray(z) >= -1e-6).all() and (np.asarray(z) <= 1 + 1e-6).all()

    def test_l1_projection_tight_and_in_box(self):
        """Regression: the L1 partial-move correction must land w.z == b
        exactly (not overshoot) and never leave the box; infeasible rows
        saturate at the box instead of escaping it."""
        u, w, b = _linear_problem(seed=3)
        z = projection_hyperplane_box(u, w, b, "l1")
        zn = np.asarray(z)
        assert (zn >= -1e-5).all() and (zn <= 1 + 1e-5).all()
        wz = np.asarray(jnp.sum(w * z, 1))
        bn = np.asarray(b)
        # satisfiable rows must be tight (minimal L1 move => w.z == b)
        assert np.abs(wz - bn).max() < 1e-3
        # infeasible row: b below the attainable minimum
        u1 = jnp.asarray([[0.9, 0.1]], jnp.float32)
        w1 = jnp.asarray([[1.0, -1.0]], jnp.float32)
        b1 = jnp.asarray([-5.0], jnp.float32)  # min w.z = -1
        z1 = np.asarray(projection_hyperplane_box(u1, w1, b1, "l1"))
        assert (z1 >= -1e-6).all() and (z1 <= 1 + 1e-6).all()
        np.testing.assert_allclose(z1, [[0.0, 1.0]], atol=1e-5)

    def test_l2_projection_is_kkt_optimal(self):
        """L2 projection must equal clip(u - lam*w) with the bisection lam —
        compare against a dense scipy-free check: no strictly better point on
        a random line within the feasible set."""
        u, w, b = _linear_problem(b=4)
        z = projection_hyperplane_box(u, w, b, "l2")
        base = np.asarray(jnp.sum((z - u) ** 2, 1))
        rng = np.random.RandomState(1)
        for _ in range(20):
            z2 = jnp.clip(z + jnp.asarray(rng.randn(*z.shape).astype(np.float32)) * 0.01, 0, 1)
            feasible = np.asarray(jnp.sum(w * z2, 1) <= b + 1e-4)
            better = np.asarray(jnp.sum((z2 - u) ** 2, 1)) < base - 1e-5
            assert not (feasible & better).any()


class TestFAB:
    def _setup(self, seed=0):
        rng = np.random.RandomState(seed)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 5).astype(np.float32)) * 0.3
        fn = lambda x: x.reshape(x.shape[0], -1) @ W
        x = jnp.asarray(rng.rand(6, 3, 8, 8).astype(np.float32))
        y = jnp.argmax(fn(x), -1)
        return fn, x, y

    @pytest.mark.parametrize("norm", ["linf", "l2"])
    def test_finds_minimal_norm_adversarials(self, norm):
        fn, x, y = self._setup()
        res = fab_attack(fn, x, y, norm=norm, n_iter=20, n_restarts=2)
        assert bool(res.adv_found.all())
        assert bool((jnp.argmax(fn(res.x_adv), -1) != y).all())
        # minimal-norm: perturbations are small relative to the box
        assert float(res.norms.max()) < (0.5 if norm == "linf" else 3.0)

    def test_targeted_variant(self):
        fn, x, y = self._setup(1)
        res = fab_attack(
            fn, x, y, norm="linf", n_iter=15, targeted=True,
            n_target_classes=3,
        )
        assert bool(res.adv_found.all())

    def test_eps_gating(self):
        """With eps, adv_found only flags perturbations inside the ball."""
        fn, x, y = self._setup(2)
        res = fab_attack(fn, x, y, norm="linf", n_iter=20, eps=1e-6)
        # essentially nothing should fit in a 1e-6 ball
        assert not bool(res.adv_found.any())
        np.testing.assert_allclose(res.x_adv, x)


class TestBoundaryReselection:
    def test_untargeted_picks_closest_boundary_not_runner_up(self):
        """Clean runner-up (class 1) is a constant logit: its boundary has
        zero gradient and is unreachable. The closest boundary belongs to
        class 2. Per-iteration |f|/||w||_dual selection (reference fab_pt)
        must find it; the round-1 fixed-runner-up variant could not."""
        import jax.numpy as jnp
        import numpy as np

        from robustvlm_tpu.attacks.fab import fab_attack

        def fn(x):
            f = x.reshape(x.shape[0], -1)
            f0 = jnp.ones((x.shape[0],))
            f1 = 0.95 * jnp.ones((x.shape[0],))
            f2 = 4.0 * (f[:, 0] - 0.5) + 0.5
            return jnp.stack([f0, f1, f2], axis=1)

        x = jnp.full((4, 1, 2, 2), 0.5, jnp.float32)
        y = jnp.zeros((4,), jnp.int32)
        assert bool(jnp.all(jnp.argmax(fn(x), -1) == 0))
        res = fab_attack(fn, x, y, norm="linf", n_iter=20, n_restarts=1)
        assert bool(jnp.all(res.adv_found))
        assert bool(jnp.all(jnp.argmax(fn(res.x_adv), -1) == 2))
        # minimal-norm: boundary at x0 where 1 = 4(x0-.5)+.5 -> delta=0.125
        assert float(res.norms.max()) < 0.2
