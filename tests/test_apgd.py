"""APGD tests: a numpy spec-simulator cross-check plus property tests.

The simulator re-derives the AutoPGD Linf recurrence (step-size schedule,
momentum-through-iterates, best tracking, oscillation-triggered halving with
best-restore) independently in numpy; the scan implementation must reproduce
it to float tolerance on a differentiable toy loss.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.attacks.apgd import apgd_attack
from robustvlm_tpu.ops.projections import l2_norm, linf_norm


# ---------------------------------------------------------------- spec simulator
def spec_apgd_linf(loss_grad, x, eps, n_iter, alpha=2.0):
    """Independent numpy implementation of the AutoPGD-Linf recurrence.

    loss_grad: fn(x) -> (loss_per_example (B,), grad like x)
    Returns dict with final state for cross-checking.
    """
    b = x.shape[0]
    exp = lambda v: v.reshape(b, *([1] * (x.ndim - 1)))

    n2 = max(int(0.22 * n_iter), 1)
    nmin = max(int(0.06 * n_iter), 1)
    sdecr = max(int(0.03 * n_iter), 1)

    x_adv = x.copy()
    loss, grad = loss_grad(x_adv)
    x_best = x_adv.copy()
    loss_best = loss.copy()
    grad_best = grad.copy()
    step = np.full(b, alpha * eps)
    hist = np.zeros((n_iter, b))
    x_old = x_adv.copy()
    lb_last = loss_best.copy()
    red_last = np.ones(b)
    k = n2
    counter3 = 0
    step_trace = []

    for i in range(n_iter):
        a = 0.75 if i > 0 else 1.0
        mom = x_adv - x_old
        x_old = x_adv.copy()
        z = x_adv + exp(step) * np.sign(grad)
        z = np.clip(np.clip(z, x - eps, x + eps), 0.0, 1.0)
        z = x_adv + (z - x_adv) * a + mom * (1 - a)
        x_adv = np.clip(np.clip(z, x - eps, x + eps), 0.0, 1.0)

        loss, grad = loss_grad(x_adv)
        hist[i] = loss
        imp = loss > loss_best
        x_best[imp] = x_adv[imp]
        grad_best[imp] = grad[imp]
        loss_best[imp] = loss[imp]

        counter3 += 1
        if counter3 == k:
            t = np.zeros(b)
            for c in range(k):
                t += (hist[i - c] > hist[i - c - 1]).astype(float)  # wraps at -1
            fl = (t <= k * 0.75).astype(float)
            fl = np.maximum(fl, (1 - red_last) * (lb_last >= loss_best))
            red_last = fl.copy()
            lb_last = loss_best.copy()
            sel = fl > 0
            step[sel] /= 2.0
            x_adv[sel] = x_best[sel]
            grad[sel] = grad_best[sel]
            counter3 = 0
            k = max(k - sdecr, nmin)
        step_trace.append(step.copy())

    return dict(x_best=x_best, loss_best=loss_best, step=step, x_adv=x_adv)


def make_toy(b=4, f=16, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.uniform(0.2, 0.8, (b, f)).astype(np.float32)
    t = np.clip(x + rng.uniform(-0.1, 0.1, (b, f)), 0, 1).astype(np.float32)

    def loss_grad_np(xa):
        # maximize -> approach t, with curvature so the loss oscillates
        loss = -np.sum((xa - t) ** 2, axis=1)
        grad = -2 * (xa - t)
        return loss, grad

    def model_fn(xa):  # jax side: "logits" = xa - t offsets
        return xa - jnp.asarray(t)

    def criterion(out, y):
        return -jnp.sum(out ** 2, axis=1)

    return x, loss_grad_np, model_fn, criterion


class TestAPGDSpecParity:
    @pytest.mark.parametrize("n_iter", [5, 10, 23, 50])
    def test_matches_numpy_spec(self, n_iter):
        x, loss_grad_np, model_fn, criterion = make_toy()
        eps = 0.05
        res = apgd_attack(
            model_fn, jnp.asarray(x), None, criterion=criterion, eps=eps,
            n_iter=n_iter, norm="linf", use_fused_kernel=False,
        )
        spec = spec_apgd_linf(loss_grad_np, x.astype(np.float64), eps, n_iter)
        np.testing.assert_allclose(
            np.asarray(res.loss_best), spec["loss_best"], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(res.x_best), spec["x_best"], rtol=1e-4, atol=1e-5
        )

    def test_fused_kernel_matches_fallback(self):
        # shapes aligned for the pallas kernel (B%8==0, F%128==0)
        rng = np.random.RandomState(1)
        x = rng.uniform(0.1, 0.9, (8, 256)).astype(np.float32)
        t = np.clip(x + 0.05, 0, 1).astype(np.float32)
        model_fn = lambda xa: xa - jnp.asarray(t)
        criterion = lambda out, y: -jnp.sum(out ** 2, axis=1)
        kw = dict(criterion=criterion, eps=0.03, n_iter=10, norm="linf")
        r_plain = apgd_attack(model_fn, jnp.asarray(x), None,
                              use_fused_kernel=False, **kw)
        # interpret-mode pallas on CPU
        from robustvlm_tpu.ops.pallas import attack_step as mod
        r_fused_step = mod.fused_linf_apgd_step(
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(x), jnp.full((8,), 0.06), 0.03, 1.0, interpret=True,
        )
        r_jnp_step = mod._linf_step_jnp(
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(x), jnp.full((8,), 0.06), 0.03, 1.0,
        )
        np.testing.assert_allclose(
            np.asarray(r_fused_step), np.asarray(r_jnp_step), atol=1e-6
        )
        assert r_plain.x_best.shape == x.shape


class TestAPGDProperties:
    def setup_method(self):
        self.x, _, self.model_fn, self.criterion = make_toy(b=8, f=32, seed=3)

    def run(self, **kw):
        args = dict(criterion=self.criterion, eps=0.05, n_iter=20, norm="linf",
                    use_fused_kernel=False)
        args.update(kw)
        return apgd_attack(self.model_fn, jnp.asarray(self.x), None, **args)

    def test_ball_and_box(self):
        res = self.run()
        for arr in [res.x_best, res.x_best_adv]:
            assert float(linf_norm(arr - jnp.asarray(self.x)).max()) <= 0.05 + 1e-6
            assert float(arr.min()) >= 0.0 and float(arr.max()) <= 1.0

    def test_l2_ball(self):
        res = self.run(norm="l2", eps=0.3)
        assert float(l2_norm(res.x_best - jnp.asarray(self.x)).max()) <= 0.3 + 1e-5

    def test_l1_ball(self):
        res = self.run(norm="l1", eps=1.0)
        d = np.abs(np.asarray(res.x_best) - self.x).reshape(8, -1).sum(-1)
        assert d.max() <= 1.0 * (1 + 1e-3) + 1e-4

    def test_loss_best_not_below_init(self):
        init_loss = np.asarray(self.criterion(self.model_fn(jnp.asarray(self.x)), None))
        res = self.run()
        assert np.all(np.asarray(res.loss_best) >= init_loss - 1e-6)

    def test_random_start_in_ball(self):
        res = self.run(use_rs=True, rng=jax.random.PRNGKey(0))
        assert float(linf_norm(res.x_best_adv - jnp.asarray(self.x)).max()) <= 0.05 + 1e-6

    def test_warm_start(self):
        x0 = jnp.clip(jnp.asarray(self.x) + 0.05, 0, 1)
        res = self.run(x_init=x0)
        assert res.x_best.shape == self.x.shape

    def test_acc_tracking_with_labels(self):
        # classification toy: logits = fixed random matrix * x
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(32, 10).astype(np.float32))
        model_fn = lambda xa: xa @ w
        y = jnp.asarray(np.argmax(np.asarray(jnp.asarray(self.x) @ w), axis=1))
        from robustvlm_tpu.ops.losses import ce_loss
        res = apgd_attack(
            model_fn, jnp.asarray(self.x), y,
            criterion=lambda out, yy: ce_loss(out, yy, reduction="none"),
            eps=0.1, n_iter=20, norm="linf", use_fused_kernel=False,
        )
        assert res.acc.dtype == jnp.bool_
        # attack at eps=0.1 on a random linear model should fool most examples
        assert int(res.acc.sum()) < 8

    def test_jit_compatible(self):
        f = jax.jit(lambda x: apgd_attack(
            self.model_fn, x, None, criterion=self.criterion, eps=0.05,
            n_iter=10, norm="linf", use_fused_kernel=False).x_best)
        out = f(jnp.asarray(self.x))
        assert out.shape == self.x.shape


class TestHostLoopParity:
    def test_host_loop_matches_scan(self):
        """host_loop=True must reproduce the scan path bit-for-bit."""
        from robustvlm_tpu.attacks.apgd import apgd_attack
        from robustvlm_tpu.ops.losses import ce_loss

        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 5).astype(np.float32)) * 0.1
        fn = lambda x: x.reshape(x.shape[0], -1) @ W
        x = jnp.asarray(rng.rand(4, 3, 8, 8).astype(np.float32))
        y = jnp.argmax(fn(x), -1)
        kw = dict(
            criterion=lambda o, yy: ce_loss(o, yy, reduction="none"),
            eps=8 / 255, n_iter=12, norm="linf",
        )
        a = apgd_attack(fn, x, y, **kw)
        b = apgd_attack(fn, x, y, host_loop=True, **kw)
        np.testing.assert_allclose(a.x_best_adv, b.x_best_adv, atol=1e-6)
        np.testing.assert_allclose(a.loss_best, b.loss_best, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.acc), np.asarray(b.acc))


class TestRestartsAndDecrEps:
    """Canonical perturb-level features (reference autopgd_base.py:453-582)."""

    def _problem(self):
        from robustvlm_tpu.ops.losses import ce_loss

        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 5).astype(np.float32)) * 0.05
        fn = lambda x: x.reshape(x.shape[0], -1) @ W
        x = jnp.asarray(rng.rand(12, 3, 8, 8).astype(np.float32))
        y = jnp.argmax(fn(x), -1)
        crit = lambda o, t: ce_loss(o, t, reduction="none")
        return fn, x, y, crit

    def test_restarts_monotone_improvement(self):
        from robustvlm_tpu.attacks.apgd import apgd_restarts

        fn, x, y, crit = self._problem()
        base = jax.random.PRNGKey(7)
        r1 = apgd_restarts(fn, x, y, criterion=crit, eps=4 / 255,
                           n_iter=5, norm="linf", n_restarts=1, rng=base)
        r3 = apgd_restarts(fn, x, y, criterion=crit, eps=4 / 255,
                           n_iter=5, norm="linf", n_restarts=3, rng=base)
        # restart 0 of the 3-run uses the same rng as the 1-run: per-example
        # best loss can only improve, fooled set can only grow
        assert np.all(np.asarray(r3.loss_best) >= np.asarray(r1.loss_best) - 1e-6)
        assert not np.any(~np.asarray(r1.acc) & np.asarray(r3.acc))
        # first-success semantics: every fooled example is actually fooled
        fooled = ~np.asarray(r3.acc)
        preds = np.asarray(jnp.argmax(fn(r3.x_best_adv), -1))
        assert np.all(preds[fooled] != np.asarray(y)[fooled])
        # eps ball respected
        assert float(jnp.abs(r3.x_best_adv - x).max()) <= 4 / 255 + 1e-6

    def test_decr_eps_final_ball_l1(self):
        from robustvlm_tpu.attacks.apgd import apgd_decr_eps

        fn, x, y, crit = self._problem()
        eps = 12.0
        res = apgd_decr_eps(fn, x, y, criterion=crit, eps=eps, n_iter=10,
                            norm="l1", rng=jax.random.PRNGKey(3))
        # the final stage guarantees the TARGET ball even though earlier
        # stages ran at 3x/2x eps
        l1 = np.abs(np.asarray(res.x_best_adv - x)).reshape(12, -1).sum(-1)
        assert float(l1.max()) <= eps * (1 + 1e-4)
        l1b = np.abs(np.asarray(res.x_best - x)).reshape(12, -1).sum(-1)
        assert float(l1b.max()) <= eps * (1 + 1e-4)
        assert np.all(np.isfinite(np.asarray(res.loss_best)))
        # [0,1] clamp
        assert float(res.x_best_adv.min()) >= 0.0
        assert float(res.x_best_adv.max()) <= 1.0

    def test_decr_eps_segments_sum(self):
        # iteration split .3/.3/.4 covers exactly n_iter
        import math
        n = 10
        iters = [math.ceil(0.3 * n), math.ceil(0.3 * n)]
        iters.append(n - sum(iters))
        assert sum(iters) == n and all(i > 0 for i in iters)

    def test_restarts_largereps_linf(self):
        from robustvlm_tpu.attacks.apgd import apgd_restarts

        fn, x, y, crit = self._problem()
        res = apgd_restarts(fn, x, y, criterion=crit, eps=8 / 255, n_iter=10,
                            norm="linf", n_restarts=2, use_largereps=True,
                            rng=jax.random.PRNGKey(1))
        assert float(jnp.abs(res.x_best_adv - x).max()) <= 8 / 255 + 1e-6
        fooled = ~np.asarray(res.acc)
        assert fooled.any()
