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
        monkeypatch.delenv("LLAVA_CKPT", raising=False)
        assert rp.main([]) == 0  # prints SKIP, exits clean


class TestQuantQualityMechanics:
    """The serving-quantization quality gate's scoring machinery
    (real_ckpt_parity.quant_quality), exercised on a tiny model — the
    real-checkpoint invocation stays env-gated ($LLAVA_CKPT)."""

    @staticmethod
    def _factory():
        import jax.numpy as jnp

        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS, init_llava_params,
        )
        from robustvlm_tpu.vlm_eval.eval_models import (
            LlavaEvalModel, WordTokenizer,
        )

        cfg = LLAVA_CONFIGS["test-tiny"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        return LlavaEvalModel(
            params, cfg, WordTokenizer(cfg.llama.vocab_size),
            compute_dtype=jnp.float32, max_post_len=16,
        )

    def test_scores_fp_vs_quantized(self):
        import jax.numpy as jnp

        sys.path.insert(0, str(REPO / "scripts"))
        import real_ckpt_parity as rp

        size = self._factory().cfg.vision.image_size
        x = jnp.asarray(
            np.random.RandomState(0).rand(2, 3, size, size).astype(np.float32)
        )
        res = rp.quant_quality(self._factory, x, widths=(8,), max_new=4)
        assert set(res) == {"int8"}
        m = res["int8"]
        assert 0.0 <= m["token_agreement"] <= 1.0
        assert 0.0 <= m["exact_match_rate"] <= m["token_agreement"] + 1e-9
        assert m["n_images"] == 2
        assert "cider_vs_fp" in m
        # int8 per-channel on a tiny fp32 model is near-lossless: the gate
        # must report PERFECT agreement when trajectories coincide (the
        # discrimination test below covers the opposite direction)
        assert m["token_agreement"] == 1.0

    def test_agreement_discriminates(self):
        """Identical rows -> 1.0; rows diverging after fp's eos are NOT
        penalized (agreement is scored over fp's generated span only)."""
        import jax.numpy as jnp

        sys.path.insert(0, str(REPO / "scripts"))
        import real_ckpt_parity as rp

        calls = {"n": 0}
        base = self._factory()

        class _Shim:
            """Second build returns a model whose decode diverges: reuse
            the fp model but perturb one LM weight leaf enough to change
            greedy argmax."""

            pass

        def factory():
            m = self._factory()
            if calls["n"] > 0:
                blocks = m.params["llama"]["blocks"]["attn"]
                blocks["wq"] = blocks["wq"] + 0.5
            calls["n"] += 1
            return m

        size = base.cfg.vision.image_size
        x = jnp.asarray(
            np.random.RandomState(1).rand(1, 3, size, size).astype(np.float32)
        )
        # widths=() -> only fp runs; use monkey width 8 with the perturbed
        # factory so the 'quantized' trajectory genuinely differs
        res = rp.quant_quality(factory, x, widths=(8,), max_new=6)
        assert res["int8"]["token_agreement"] < 1.0

    def test_synthetic_image_loader_deterministic(self):
        sys.path.insert(0, str(REPO / "scripts"))
        import real_ckpt_parity as rp

        a = rp._load_quality_images("", 16, 3)
        b = rp._load_quality_images("", 16, 3)
        assert a.shape == (3, 3, 16, 16)
        assert np.allclose(np.asarray(a), np.asarray(b))
        assert float(np.min(np.asarray(a))) >= 0.0
        assert float(np.max(np.asarray(a))) <= 1.0


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
