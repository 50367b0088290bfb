import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.ops.projections import (
    l0_norm,
    l1_ball_projection,
    l1_norm,
    l2_norm,
    linf_norm,
    lp_normalize,
    normalize_grad,
    project_perturbation,
)


def rand(key, shape, lo=-1.0, hi=1.0):
    return jax.random.uniform(jax.random.PRNGKey(key), shape, minval=lo, maxval=hi)


class TestNorms:
    def test_values(self):
        x = jnp.array([[3.0, -4.0], [0.0, 0.0]])
        np.testing.assert_allclose(l2_norm(x), [5.0, 0.0])
        np.testing.assert_allclose(l1_norm(x), [7.0, 0.0])
        np.testing.assert_allclose(linf_norm(x), [4.0, 0.0])
        np.testing.assert_allclose(l0_norm(x), [2.0, 0.0])

    def test_keepdims_broadcast(self):
        x = rand(0, (4, 3, 8, 8))
        assert l2_norm(x, keepdims=True).shape == (4, 1, 1, 1)

    def test_lp_normalize(self):
        x = rand(1, (5, 3, 4, 4))
        np.testing.assert_allclose(
            l2_norm(lp_normalize(x, "l2")), np.ones(5), rtol=1e-5
        )
        np.testing.assert_allclose(
            linf_norm(lp_normalize(x, "linf")), np.ones(5), rtol=1e-5
        )


class TestProjections:
    def test_linf_clamp(self):
        d = rand(2, (6, 3, 8, 8), -0.5, 0.5)
        p = project_perturbation(d, 0.1, "linf")
        assert float(jnp.max(jnp.abs(p))) <= 0.1 + 1e-6
        # inside-ball perturbations untouched
        d_small = jnp.clip(d, -0.05, 0.05)
        np.testing.assert_array_equal(
            project_perturbation(d_small, 0.1, "linf"), d_small
        )

    def test_l2_renorm(self):
        d = rand(3, (6, 3, 8, 8), -0.5, 0.5)
        p = project_perturbation(d, 0.2, "l2")
        assert float(jnp.max(l2_norm(p))) <= 0.2 + 1e-5
        d_small = d * 0.2 / (l2_norm(d, keepdims=True) + 1e-12) * 0.5
        np.testing.assert_allclose(
            project_perturbation(d_small, 0.2, "l2"), d_small, rtol=1e-6
        )

    def test_normalize_grad(self):
        g = jnp.array([[0.3, -2.0], [5.0, 0.0]])
        np.testing.assert_array_equal(
            normalize_grad(g, "linf"), jnp.sign(g)
        )
        np.testing.assert_allclose(l2_norm(normalize_grad(g, "l2")), [1.0, 1.0], rtol=1e-6)

    @pytest.mark.parametrize("accept", ["Linf", "linf", "L2", "l2"])
    def test_norm_aliases(self, accept):
        d = rand(4, (2, 4))
        project_perturbation(d, 0.1, accept)


class TestL1BallProjection:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("eps", [0.5, 5.0, 50.0])
    def test_feasibility(self, seed, eps):
        x = rand(seed, (8, 3, 8, 8), 0.0, 1.0)
        y = rand(seed + 100, (8, 3, 8, 8), -0.3, 0.3)
        d = l1_ball_projection(x, y, eps)
        z = y + d
        # inside the l1 ball (small numerical slack)
        assert float(jnp.max(l1_norm(z))) <= eps * (1 + 1e-4) + 1e-4
        # inside the [0,1] box
        pt = x + z
        assert float(jnp.min(pt)) >= -1e-5
        assert float(jnp.max(pt)) <= 1.0 + 1e-5

    def test_inside_ball_untouched(self):
        x = jnp.full((2, 4), 0.5)
        y = jnp.array([[0.01, -0.01, 0.0, 0.02], [0.0, 0.0, 0.0, 0.0]])
        d = l1_ball_projection(x, y, 1.0)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-7)

    def test_projection_tightness(self):
        # a point far outside should land (approximately) on the sphere
        x = jnp.full((4, 16), 0.5)
        y = rand(7, (4, 16), -0.4, 0.4)
        eps = 0.5
        assert float(jnp.min(l1_norm(y))) > eps  # precondition: outside
        d = l1_ball_projection(x, y, eps)
        np.testing.assert_allclose(l1_norm(y + d), eps, rtol=1e-3)
