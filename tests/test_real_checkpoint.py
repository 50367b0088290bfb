"""Real-checkpoint integration gate (skip-if-absent).

Runs ONLY when $CLIP_CKPT points at a real published checkpoint (openai /
FARE / TeCoA). Without it the whole module skips — the recording workflow
and the comparison logic stay covered by synthetic round-trips.
"""

import json
import os
import sys
import subprocess
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
HAVE_CKPT = bool(os.environ.get("CLIP_CKPT"))


class TestParityScriptMechanics:
    """The gate's record/compare machinery, exercised without real weights."""

    def test_record_then_check_roundtrip(self, tmp_path):
        """A checkpoint fingerprint recorded and re-checked must PASS; a
        perturbed checkpoint must FAIL — the gate actually discriminates."""
        import torch

        from robustvlm_tpu.models.clip import CLIP_CONFIGS, init_clip_params
        from robustvlm_tpu.models.clip.import_torch import (
            export_visual_state_dict,
        )
        sys.path.insert(0, str(REPO / "scripts"))
        import real_ckpt_parity as rp

        cfg = CLIP_CONFIGS["test-tiny"]
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        sd = {
            k: torch.from_numpy(np.asarray(v))
            for k, v in export_visual_state_dict(params["visual"], cfg).items()
        }
        ckpt = tmp_path / "visual.pt"
        torch.save(sd, ckpt)

        rc = rp.main([
            "--ckpt", str(ckpt), "--model", "test-tiny", "--visual_only",
            "--record", str(tmp_path / "expected.json"),
        ])
        assert rc == 0
        rc = rp.main([
            "--ckpt", str(ckpt), "--model", "test-tiny", "--visual_only",
            "--expected", str(tmp_path / "expected.json"),
        ])
        assert rc == 0
        # perturb one weight -> gate must fail. NOTE: the perturbation must
        # be non-uniform — adding a CONSTANT to every conv1 element only
        # shifts all channels of a token equally, which ln_pre removes
        # exactly (LayerNorm null space), leaving the model unchanged.
        sd2 = dict(sd)
        k0 = next(k for k in sd2 if sd2[k].ndim >= 2)
        g = torch.Generator().manual_seed(0)
        sd2[k0] = sd2[k0] + 1e-2 * torch.randn(sd2[k0].shape, generator=g)
        torch.save(sd2, tmp_path / "visual2.pt")
        rc = rp.main([
            "--ckpt", str(tmp_path / "visual2.pt"), "--model", "test-tiny",
            "--visual_only",
            "--expected", str(tmp_path / "expected.json"),
        ])
        assert rc == 1

    def test_skip_without_ckpt(self, monkeypatch):
        sys.path.insert(0, str(REPO / "scripts"))
        import real_ckpt_parity as rp

        monkeypatch.delenv("CLIP_CKPT", raising=False)
        assert rp.main([]) == 0  # prints SKIP, exits clean


@pytest.mark.skipif(not HAVE_CKPT, reason="$CLIP_CKPT not set")
class TestRealCheckpoint:
    """The actual gate — runs only when real weights are provided."""

    def test_real_import_and_fingerprint(self, tmp_path):
        sys.path.insert(0, str(REPO / "scripts"))
        import real_ckpt_parity as rp

        model = os.environ.get("CLIP_MODEL", "ViT-L-14")
        argv = ["--ckpt", os.environ["CLIP_CKPT"], "--model", model]
        expected = os.environ.get("CLIP_EXPECTED", "")
        if expected:
            argv += ["--expected", expected]
        else:
            argv += ["--record", str(tmp_path / "fp.json")]
        assert rp.main(argv) == 0
