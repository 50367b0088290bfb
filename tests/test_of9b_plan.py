"""OF-9B scale close-out artifacts (scripts/bench_of9b.py): the HBM plan
arithmetic, the FLOP projection's scaling behavior, and (heavy tier) the
real-dims fsdp-sharded APGD compile check on a virtual mesh."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import bench_of9b  # noqa: E402


class TestPlan:
    def test_param_accounting(self, capsys):
        out = bench_of9b.plan()
        capsys.readouterr()
        # OpenFlamingo-9B: MPT-7B + ViT-L/14 + perceiver + 8 xattn blocks
        assert 8.0 <= out["n_params_b"] <= 8.3
        assert out["params_by_component_b"]["mpt"] > 6.0
        assert out["params_by_component_b"]["xattn"] > 1.0
        # the whole point: params alone ~fill one v5e -> multi-chip verdict
        assert out["params_gib_bf16"] > 15.0
        assert out["min_chips_fsdp"] >= 2
        assert "fsdp" in out["verdict"]

    def test_flops_scale_linearly_in_batch(self, capsys):
        from robustvlm_tpu.models.flamingo import FLAMINGO_CONFIGS

        cfg = FLAMINGO_CONFIGS["openflamingo-9b"]
        f1 = bench_of9b.attack_step_matmul_flops(cfg, 1, 1, 1, 44)
        f8 = bench_of9b.attack_step_matmul_flops(cfg, 8, 1, 1, 44)
        assert f8 == pytest.approx(8 * f1)
        # few-shot (5 media, 5x text) must cost more than 0-shot
        f_few = bench_of9b.attack_step_matmul_flops(cfg, 1, 5, 1, 220)
        assert f_few > 4 * f1

    def test_projection_points(self, capsys):
        out = bench_of9b.flops_projection()
        capsys.readouterr()
        assert "PROJECTION" in out["label"]
        for p in out["points"]:
            assert p["analytic_tflop_per_step"] > 0
            # projected < ceiling, both finite and positive
            assert 0 < p["projected_steps_per_sec_at_measured_rate"]
            assert (
                p["projected_steps_per_sec_at_measured_rate"]
                < p["ceiling_steps_per_sec_at_matmul_calibration"]
            )


@pytest.mark.heavy
class TestCompileCheckRealDims:
    def test_fsdp_sharded_apgd_compiles_at_9b_dims(self):
        """The production-shape existence proof (VERDICT r4 #5): the
        fsdp-8 sharded whole-VLM APGD step at REAL OF-9B dims must lower
        and AOT-compile on a virtual mesh. ~6 min of XLA:CPU compile."""
        bench_of9b.compile_check(n_devices=8, batch=8, t_txt=44)
