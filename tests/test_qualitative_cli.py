"""run_evaluation_qualitative CLI: targeted long-run attack driver
(reference vlm_eval/run_evaluation_qualitative.py). Focus: the --host_loop
flag (remote-TPU compile cost is O(n_iter) on the scan path; the 10k-iter
production run needs the O(1)-compile host loop) and its bit-parity with
the scan path."""

import json

import numpy as np
import pytest


class TestResolveHostLoop:
    def test_auto_threshold(self):
        from robustvlm_tpu.vlm_eval.run_evaluation_qualitative import (
            resolve_host_loop,
        )

        assert resolve_host_loop("auto", 10000) is True
        assert resolve_host_loop("auto", 500) is True
        assert resolve_host_loop("auto", 100) is False
        assert resolve_host_loop("on", 2) is True
        assert resolve_host_loop("off", 10000) is False


class TestQualitativeCLI:
    def _images(self, tmp_path, n=2):
        from PIL import Image

        rng = np.random.RandomState(0)
        paths = []
        for i in range(n):
            p = tmp_path / f"img{i}.png"
            Image.fromarray(
                rng.randint(0, 255, (32, 32, 3), np.uint8)
            ).save(p)
            paths.append(str(p))
        return paths

    def _run(self, tmp_path, out, host_loop):
        from robustvlm_tpu.vlm_eval.run_evaluation_qualitative import main

        return main([
            "--model", "llava", "--model_size", "test-tiny",
            "--images", *self._images(tmp_path),
            "--target_str", "buy this product",
            "--eps", "8", "--n_iter", "3", "--max_new_tokens", "4",
            "--out_base_path", str(tmp_path / out),
            "--seed", "0", "--host_loop", host_loop,
        ])

    def test_host_loop_matches_scan(self, tmp_path):
        """Host loop == scan math. NOT bit-guaranteed in general (the two
        compiled forms can round differently and the attack amplifies it —
        see attacks/apgd.py), so the gate is: losses track closely and the
        adversarial images stay inside the SAME eps ball; under this
        config + conftest precision the programs currently coincide."""
        r_scan = self._run(tmp_path, "scan", "off")
        r_host = self._run(tmp_path, "host", "on")
        assert len(r_scan["results"]) == 2
        for a, b in zip(r_scan["results"], r_host["results"]):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=0.02)
        for i in range(2):
            adv_s = np.load(tmp_path / "scan" / "adv" / f"img{i}.npy")
            adv_h = np.load(tmp_path / "host" / "adv" / f"img{i}.npy")
            # equally valid trajectories in the same ball
            np.testing.assert_allclose(adv_s, adv_h, atol=2 * 8 / 255)
        assert (tmp_path / "scan" / "report.json").exists()
        rep = json.loads((tmp_path / "scan" / "report.json").read_text())
        assert rep["target_str"] == "buy this product"
