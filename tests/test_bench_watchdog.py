"""Bench watchdog behavior (bench.py) under a simulated wedged TPU pool.

The watchdog is the driver's scoreboard fallback: a wedged pool claim must
become an honest error JSON (citing the latest driver-captured value and a
pool probe), and — critically — the watchdog must hard-exit ONLY while the
process is still queued for the claim. Once a device is granted, killing
the process mid-TPU-step is exactly the pool-wedging failure the watchdog
exists to report (CLAUDE.md), so a merely-slow run prints the error line
and keeps going; the real measurement then prints last.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_child(code: str):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, env=env, cwd=REPO,
    )


_PRELUDE = """
import json, sys, time
sys.path.insert(0, {repo!r})
import bench
bench._probe_pool = lambda *a, **k: {{"tpu_ok": False, "error": "simulated"}}
"""


class TestWatchdog:
    def test_wedged_claim_exits_with_error_json(self):
        """Stage 'init' (device never granted) at expiry: one error JSON
        line, probe result attached, latest BENCH value cited, exit 3."""
        code = _PRELUDE.format(repo=REPO) + """
bench._watchdog(0.2)
time.sleep(30)  # simulate blocking forever in the pool claim
"""
        out = _run_child(code)
        assert out.returncode == 3, (out.stdout, out.stderr)
        line = json.loads(out.stdout.strip().splitlines()[-1])
        assert line["value"] is None
        assert "never granted" in line["error"]
        assert line["tpu_probe"] == {"tpu_ok": False, "error": "simulated"}
        # BENCH_r02.json in this repo carries 308.22 — the fallback must
        # cite the NEWEST non-null capture, never a hardcoded constant
        assert "previous_measured" in line

    def test_slow_run_is_not_killed(self):
        """Stage 'device_ok' at expiry: error JSON printed, process left to
        finish; the real (later) line supersedes it for last-line parsers."""
        code = _PRELUDE.format(repo=REPO) + """
bench._mark_device_ok()
bench._watchdog(0.2)
time.sleep(2)  # a slow-but-alive measurement
print(json.dumps({"metric": "m", "value": 123.0}), flush=True)
"""
        out = _run_child(code)
        assert out.returncode == 0, (out.stdout, out.stderr)
        lines = [json.loads(x) for x in out.stdout.strip().splitlines()]
        assert lines[0]["value"] is None
        assert "leaving it to finish" in lines[0]["error"]
        assert lines[-1]["value"] == 123.0

    def test_latest_bench_value_prefers_newest_non_null(self, tmp_path,
                                                        monkeypatch):
        import bench

        (tmp_path / "BENCH_r01.json").write_text(
            json.dumps({"parsed": {"value": 100.0}})
        )
        (tmp_path / "BENCH_r02.json").write_text(
            json.dumps({"parsed": {"value": 200.5}})
        )
        (tmp_path / "BENCH_r03.json").write_text(
            json.dumps({"parsed": {"value": None}})  # the wedged round
        )
        (tmp_path / "BENCH_r04.json").write_text("not json{")
        monkeypatch.setattr(bench, "_REPO", str(tmp_path))
        assert bench._latest_bench_value() == "200.5 (BENCH_r02.json)"

    def test_latest_bench_value_none_when_no_captures(self, tmp_path,
                                                      monkeypatch):
        import bench

        monkeypatch.setattr(bench, "_REPO", str(tmp_path))
        assert bench._latest_bench_value() is None


class TestStageMemoryRelease:
    def test_stage_releases_device_memory(self):
        """A returned stage's arrays must not stay resident: the attack
        engine's module-level compiled-core cache and jax's jit caches
        retain the stage's operands (measured on the TPU: the LLaVA stage's
        13.16 GiB params survived the stage and OOMed the next stage's
        first allocation). _stage must drop live arrays to zero."""
        import gc

        import jax
        import jax.numpy as jnp
        import numpy as np

        import bench
        from robustvlm_tpu.attacks.apgd import apgd_attack
        from robustvlm_tpu.ops import ce_loss

        def tiny_attack_stage():
            rng = np.random.RandomState(0)
            w = jnp.asarray(rng.randn(48, 4).astype(np.float32)) * 0.05
            x = jnp.asarray(rng.rand(2, 3, 4, 4).astype(np.float32))
            y = jnp.asarray(rng.randint(0, 4, 2))

            def model_fn(xa):
                return xa.reshape(xa.shape[0], -1) @ w

            model_fn.pure = lambda wa, xa: xa.reshape(xa.shape[0], -1) @ wa
            model_fn.bound_args = (w,)
            res = apgd_attack(
                model_fn, x, y,
                criterion=lambda o, t: ce_loss(o, t, reduction="none"),
                eps=4 / 255.0, n_iter=2, norm="linf",
            )
            assert res.x_best.shape == x.shape

        # delta-based: under xdist, fixtures of OTHER not-yet-finalized test
        # modules in this worker may legitimately hold live arrays (observed
        # as a full-suite-only flake); the production claim is that the
        # stage releases ITS OWN arrays, so pin live-bytes(after) <=
        # live-bytes(before), not == 0
        gc.collect()
        # hold strong refs so these ids cannot be recycled by new arrays
        before_arrays = [a for a in jax.live_arrays() if not a.is_deleted()]
        before = {id(a) for a in before_arrays}
        bench._stage("tiny", tiny_attack_stage)
        gc.collect()
        leaked = [
            a for a in jax.live_arrays()
            if not a.is_deleted() and id(a) not in before
        ]
        total = sum(a.size * a.dtype.itemsize for a in leaked)
        del before_arrays
        assert total == 0, (
            f"{len(leaked)} arrays / {total} bytes newly live after _stage: "
            f"{[(a.shape, str(a.dtype)) for a in leaked][:10]}"
        )
