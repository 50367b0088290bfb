import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.attacks.square import (
    _p_schedule,
    margin_loss,
    square_attack_linf,
)
from robustvlm_tpu.eval import checks
from robustvlm_tpu.eval.autoattack import AutoAttackTPU
from robustvlm_tpu.eval.state import EvaluationState


@pytest.fixture(scope="module")
def toy_classifier():
    """Linear 10-class model on 3x16x16 'images' with moderate margin."""
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3 * 16 * 16, 10).astype(np.float32) * 0.6)
    fn = jax.jit(lambda x: x.reshape(x.shape[0], -1) @ w)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (24, 3, 16, 16)).astype(np.float32))
    y = jnp.argmax(fn(x), -1)
    return fn, x, y


class TestMarginAndSchedule:
    def test_margin_sign(self):
        z = jnp.asarray([[5.0, 1.0, 0.0], [1.0, 5.0, 0.0]])
        y = jnp.asarray([0, 0])
        m = np.asarray(margin_loss(z, y))
        assert m[0] > 0 and m[1] < 0

    def test_p_schedule_monotone(self):
        ps = [_p_schedule(i, 5000, 0.8, False) for i in [0, 30, 100, 300, 700,
                                                         1500, 3000, 5000, 7000, 9000, 20000]]
        assert all(a >= b for a, b in zip(ps, ps[1:]))
        assert ps[0] == 0.8 and ps[-1] == 0.8 / 512


class TestSquareAttack:
    def test_fools_and_stays_in_ball(self, toy_classifier):
        fn, x, y = toy_classifier
        res = square_attack_linf(fn, x, y, eps=0.15, n_queries=300,
                                 rng=jax.random.PRNGKey(0), chunk=100)
        d = np.abs(np.asarray(res.x_adv) - np.asarray(x)).max()
        assert d <= 0.15 + 1e-6
        assert float(res.x_adv.min()) >= 0 and float(res.x_adv.max()) <= 1
        racc = float(jnp.mean(jnp.argmax(fn(res.x_adv), -1) == y))
        assert racc < 0.5  # random search on a linear model should fool most

    def test_query_counter_stops_at_success(self, toy_classifier):
        fn, x, y = toy_classifier
        res = square_attack_linf(fn, x, y, eps=0.15, n_queries=200,
                                 rng=jax.random.PRNGKey(1), chunk=50)
        fooled = np.asarray(res.margin) < 0
        assert np.all(np.asarray(res.n_queries)[fooled] <= 200)


class TestAutoAttackOrchestrator:
    def test_cascade_reduces_accuracy(self, toy_classifier, tmp_path):
        fn, x, y = toy_classifier
        aa = AutoAttackTPU(
            fn, norm="linf", eps=0.1, version="custom",
            attacks_to_run=["apgd-ce", "apgd-t"], n_iter=20, verbose=False,
        )
        x_adv, y_adv = aa.run_standard_evaluation(
            x, y, bs=16, return_labels=True,
            state_path=tmp_path / "state.json",
        )
        racc = aa.robust_accuracy_dict
        assert racc["clean"] == 1.0
        # cascade stops early when an attack fools everything (reference
        # autoattack.py:160-161), so apgd-t may be absent
        final = racc.get("apgd-t", racc["apgd-ce"])
        assert final <= racc["apgd-ce"] <= 1.0
        assert final < 0.5
        # perturbations in ball
        d = np.abs(np.asarray(x_adv) - np.asarray(x)).max()
        assert d <= 0.1 + 1e-5
        # labels consistent: fooled fraction matches final robust accuracy
        fooled = np.asarray(y_adv) != np.asarray(y)
        assert fooled.mean() == pytest.approx(1 - final, abs=1e-6)

    def test_state_resume_skips_finished_attack(self, toy_classifier, tmp_path):
        fn, x, y = toy_classifier
        sp = tmp_path / "state.json"
        aa1 = AutoAttackTPU(fn, norm="linf", eps=0.1, version="custom",
                            attacks_to_run=["apgd-ce"], n_iter=10, verbose=False)
        aa1.run_standard_evaluation(x, y, bs=16, state_path=sp)
        st = EvaluationState.from_disk(sp)
        assert st.run_attacks == {"apgd-ce"}
        flags_after = st.robust_flags.copy()
        # resume: apgd-ce must not rerun (robust flags unchanged without attacks)
        aa2 = AutoAttackTPU(fn, norm="linf", eps=0.1, version="custom",
                            attacks_to_run=["apgd-ce"], n_iter=10, verbose=False)
        aa2.run_standard_evaluation(x, y, bs=16, state_path=sp)
        assert np.array_equal(
            EvaluationState.from_disk(sp).robust_flags, flags_after
        )

    def test_mismatched_state_attack_set_raises(self, toy_classifier, tmp_path):
        fn, x, y = toy_classifier
        sp = tmp_path / "state.json"
        EvaluationState({"square"}, path=sp).to_disk(force=True)
        aa = AutoAttackTPU(fn, norm="linf", eps=0.1, version="custom",
                           attacks_to_run=["apgd-ce"], n_iter=5, verbose=False)
        with pytest.raises(ValueError):
            aa.run_standard_evaluation(x, y, bs=16, state_path=sp)

    def test_standard_version_attack_list(self, toy_classifier):
        fn, _, _ = toy_classifier
        aa = AutoAttackTPU(fn, norm="linf", eps=0.1, version="standard")
        assert aa.attacks_to_run == ["apgd-ce", "apgd-t", "fab-t", "square"]
        with pytest.raises(ValueError):
            AutoAttackTPU(fn, norm="linf", eps=0.1, version="standard",
                          attacks_to_run=["apgd-ce"])


class TestChecks:
    def test_randomized_detection(self, caplog):
        calls = {"n": 0}

        def noisy(x):
            calls["n"] += 1
            return jnp.ones((x.shape[0], 4)) * calls["n"]

        assert checks.check_randomized(noisy, jnp.ones((2, 3, 4, 4)))
        det = lambda x: jnp.ones((x.shape[0], 4))
        assert not checks.check_randomized(det, jnp.ones((2, 3, 4, 4)))

    def test_softmax_detection(self):
        probs_fn = lambda x: jax.nn.softmax(jnp.ones((x.shape[0], 5)), -1)
        with_logits = lambda x: jnp.ones((x.shape[0], 5)) * 3.7
        assert checks.check_range_output(probs_fn, jnp.ones((2, 3, 4, 4))) == 5
        assert checks.check_range_output(with_logits, jnp.ones((2, 3, 4, 4))) == 5

    def test_zero_grad_detection(self):
        g = jnp.zeros((4, 3, 8, 8))
        assert checks.check_zero_gradients(g)
        g2 = jnp.ones((4, 3, 8, 8))
        assert not checks.check_zero_gradients(g2)


class TestSquareL2:
    def test_fools_and_stays_in_ball(self):
        from robustvlm_tpu.attacks.square import square_attack_l2

        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 16 * 16, 5).astype(np.float32)) * 0.05
        fn = lambda x: x.reshape(x.shape[0], -1) @ W
        x = jnp.asarray(rng.rand(4, 3, 16, 16).astype(np.float32))
        y = jnp.argmax(fn(x), -1)
        res = square_attack_l2(fn, x, y, eps=2.0, n_queries=300)
        d = res.x_adv - x
        norms = jnp.sqrt(jnp.sum(d * d, axis=(1, 2, 3)))
        assert float(norms.max()) <= 2.0 + 1e-4
        racc = float(jnp.mean((jnp.argmax(fn(res.x_adv), -1) == y)))
        assert racc < 1.0


class TestEOT:
    def test_eot_averages_stochastic_grads(self):
        from robustvlm_tpu.attacks.apgd import apgd_attack
        from robustvlm_tpu.ops.losses import ce_loss

        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 4).astype(np.float32)) * 0.1
        x = jnp.asarray(rng.rand(4, 3, 8, 8).astype(np.float32))

        def noisy_model(xa, key):
            noise = 0.3 * jax.random.normal(key, xa.shape, xa.dtype)
            return (xa + noise).reshape(xa.shape[0], -1) @ W

        y = jnp.argmax(x.reshape(4, -1) @ W, -1)
        res = apgd_attack(
            noisy_model, x, y,
            criterion=lambda o, yy: ce_loss(o, yy, reduction="none"),
            eps=16 / 255, n_iter=10, norm="linf", eot_iter=4,
            rng=jax.random.PRNGKey(1), model_rng_fn=noisy_model,
        )
        clean_fn = lambda xa: xa.reshape(xa.shape[0], -1) @ W
        racc = float(jnp.mean(jnp.argmax(clean_fn(res.x_best_adv), -1) == y))
        assert racc < 1.0
        assert float(jnp.abs(res.x_best_adv - x).max()) <= 16 / 255 + 1e-5

    def test_fresh_randomness_each_iteration(self):
        """Regression: the stochastic-model key must change per attack
        iteration (reference draws fresh noise every forward); a fixed key
        would make loss_best equal the single init draw."""
        from robustvlm_tpu.attacks.apgd import apgd_attack

        x = jnp.zeros((4, 3, 4, 4), jnp.float32)

        def rng_model(xa, key):
            # logits ignore x entirely: the loss IS the random draw
            return jnp.broadcast_to(
                jax.random.uniform(key, (1, 2)), (xa.shape[0], 2)
            )

        res = apgd_attack(
            rng_model, x, None, criterion=lambda o, yy: o[:, 0],
            eps=8 / 255, n_iter=20, norm="linf",
            rng=jax.random.PRNGKey(1), model_rng_fn=rng_model,
        )
        init_loss = float(
            rng_model(x, jax.random.PRNGKey(1))[0, 0]
        )
        # with per-iteration keys, the best over 21 draws beats the init draw
        assert float(res.loss_best[0]) > init_loss


class TestSquareL1:
    def test_fools_and_stays_in_ball(self):
        from robustvlm_tpu.attacks.square import square_attack_l1

        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 16 * 16, 5).astype(np.float32)) * 0.05
        fn = lambda x: x.reshape(x.shape[0], -1) @ W
        x = jnp.asarray(rng.rand(4, 3, 16, 16).astype(np.float32))
        y = jnp.argmax(fn(x), -1)
        res = square_attack_l1(fn, x, y, eps=20.0, n_queries=300)
        d = res.x_adv - x
        assert float(jnp.sum(jnp.abs(d), axis=(1, 2, 3)).max()) <= 20.0 + 1e-3
        assert float(jnp.mean(jnp.argmax(fn(res.x_adv), -1) == y)) < 1.0
        # box constraint via L1 projection
        assert float(res.x_adv.min()) >= -1e-6 and float(res.x_adv.max()) <= 1 + 1e-6


class TestDynamicCheck:
    def test_static_vs_dynamic(self):
        f = jax.jit(lambda x: x.reshape(x.shape[0], -1) @ jnp.ones((48, 4)))
        assert not checks.check_dynamic(f, jnp.ones((2, 3, 4, 4)), verbose=False)

        def dyn(x):
            g = jax.jit(lambda xx: xx.reshape(xx.shape[0], -1) @ jnp.ones((48, 4)))
            return g(x)

        assert checks.check_dynamic(dyn, jnp.ones((2, 3, 4, 4)), verbose=False)


class TestModelZoo:
    def test_zoo_runner_with_tiny_ckpt(self, tmp_path, monkeypatch):
        """Zoo path end-to-end on a tiny random checkpoint + synthetic data
        (the reference --full_benchmark robustbench path,
        clip_robustbench.py:264-296)."""
        import torch

        from robustvlm_tpu.eval import model_zoo
        from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
        from robustvlm_tpu.models.clip.import_torch import (
            export_visual_state_dict,
        )

        cfg = CLIP_CONFIGS["test-tiny"]
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        sd = {
            k: torch.from_numpy(np.asarray(v).copy())
            for k, v in export_visual_state_dict(params["visual"], cfg).items()
        }
        (tmp_path / "zoo").mkdir()
        torch.save(sd, tmp_path / "zoo" / "tiny-test.pt")
        monkeypatch.setattr(
            model_zoo, "ZOO",
            [model_zoo.ZooEntry("tiny-test", "test-tiny", "openai",
                                (50.0, 40.0, 30.0, 20.0))],
        )
        res = model_zoo.main([
            "--ckpt_dir", str(tmp_path / "zoo"),
            "--dataset", "synthetic", "--n_ex", "8",
            "--batch_size", "8", "--n_iter", "2", "--eps", "2",
            "--output_dir", str(tmp_path / "out"),
        ])
        assert "tiny-test" in res
        assert 0.0 <= res["tiny-test"]["robust_acc"] <= res["tiny-test"]["clean_acc"] + 1e-9
        table = (tmp_path / "out" / "zoo_table.txt").read_text()
        assert "tiny-test" in table and "50.0" in table
