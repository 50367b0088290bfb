"""pycocoevalcap oracle for the CIDEr-D implementation (skip-if-absent).

Same pattern as the torch oracles in test_reference_parity.py: when the
reference's actual metric package is importable, run it side-by-side and
compare numbers. Not installable in the build environment (documented in
metrics/cider.py), so these skip here — but they activate wherever
pycocoevalcap exists, pinning:

1. the SCORER math (TF-IDF vectors, count clipping, gaussian length
   penalty, corpus IDF) on identically-tokenized input — should match to
   float precision;
2. the TOKENIZER approximation: our regex tokenize() vs the Java
   PTBTokenizer on punctuation-heavy captions (additionally requires a JVM;
   skipped when `java` is missing). Known approximation gaps are asserted
   as score-level agreement, not token-level identity.

Reference: open_flamingo/eval/coco_metric.py:7-46 (Cider + PTBTokenizer
usage the ensemble harness mirrors).
"""

import shutil

import numpy as np
import pytest

pycocoevalcap = pytest.importorskip("pycocoevalcap")


# punctuation-heavy fixtures — the cases where a regex tokenizer can drift
# from PTBTokenizer
CANDS = {
    1: ["a man, wearing a red-striped shirt, rides a horse."],
    2: ["it's a dog; isn't it?!"],
    3: ["the U.S. flag (large) waves -- proudly."],
    4: ["two cats... one black, one white: both sleeping."],
}
REFS = {
    1: [
        "a man in a red striped shirt is riding a horse",
        "a person rides a horse down the road.",
        "the man, on horseback, wears red!",
    ],
    2: [
        "a dog is standing there",
        "it is a small dog, isn't it?",
        "that's a dog.",
    ],
    3: [
        "a large U.S. flag waving in the wind",
        "the american flag waves proudly",
        "a flag -- red, white and blue.",
    ],
    4: [
        "two cats are sleeping together",
        "a black cat and a white cat sleep.",
        "cats: black & white, asleep.",
    ],
}


def _our_tokenize_join(strings):
    from robustvlm_tpu.vlm_eval.metrics.cider import tokenize

    return [" ".join(tokenize(s)) for s in strings]


class TestScorerMathOracle:
    """Tier 1: identical tokens in, scores must match pycocoevalcap's
    Cider (CIDEr-D: clipping + length penalty + corpus IDF, x10 scale)."""

    def test_per_image_scores_match(self):
        from pycocoevalcap.cider.cider import Cider

        from robustvlm_tpu.vlm_eval.metrics.cider import CiderScorer

        gts = {i: _our_tokenize_join(rs) for i, rs in REFS.items()}
        res = {i: _our_tokenize_join(cs) for i, cs in CANDS.items()}
        _, ref_scores = Cider().compute_score(gts, res)

        ids = list(CANDS.keys())
        ours = CiderScorer(
            [res[i][0] for i in ids], [gts[i] for i in ids]
        ).per_image()
        np.testing.assert_allclose(ours, ref_scores, rtol=1e-6, atol=1e-8)

    def test_perfect_match_scores_ten(self):
        from pycocoevalcap.cider.cider import Cider

        gts = {i: _our_tokenize_join(rs) for i, rs in REFS.items()}
        res = {i: [gts[i][0]] for i in gts}
        _, ref_scores = Cider().compute_score(gts, res)

        from robustvlm_tpu.vlm_eval.metrics.cider import CiderScorer

        ids = list(gts.keys())
        ours = CiderScorer(
            [res[i][0] for i in ids], [gts[i] for i in ids]
        ).per_image()
        np.testing.assert_allclose(ours, ref_scores, rtol=1e-6)


@pytest.mark.skipif(shutil.which("java") is None, reason="PTBTokenizer needs a JVM")
class TestTokenizerOracle:
    """Tier 2: the full reference path (PTBTokenizer -> Cider) vs our
    regex-tokenized path on the same raw strings. The tokenizers are NOT
    expected to be identical (metrics/cider.py documents the
    approximation); the gate is score-level agreement tight enough that
    the harness's cider<10 (x100 scale) early-stop decisions match."""

    def _ptb(self, table):
        from pycocoevalcap.tokenizer.ptbtokenizer import PTBTokenizer

        shaped = {
            i: [{"caption": c} for c in cs] for i, cs in table.items()
        }
        return PTBTokenizer().tokenize(shaped)

    def test_scores_track_reference_pipeline(self):
        from pycocoevalcap.cider.cider import Cider

        from robustvlm_tpu.vlm_eval.metrics.cider import CiderScorer

        gts = self._ptb(REFS)
        res = self._ptb(CANDS)
        _, ref_scores = Cider().compute_score(gts, res)

        ids = list(CANDS.keys())
        ours = CiderScorer(
            [CANDS[i][0] for i in ids], [REFS[i] for i in ids]
        ).per_image()
        # x100 scale (the harness's threshold scale): within 5 points
        np.testing.assert_allclose(
            np.asarray(ours) * 100.0, np.asarray(ref_scores) * 100.0, atol=5.0
        )

    def test_tokenizer_drift_is_bounded(self):
        """Document where the regex tokenizer drifts from PTB: on these
        fixtures the token sequences agree except for possessive/period
        handling; record the mismatch rate so a regression (e.g. a regex
        change) is caught."""
        from robustvlm_tpu.vlm_eval.metrics.cider import tokenize

        ptb = self._ptb({i: cs for i, cs in CANDS.items()})
        n_same = sum(
            1
            for i, cs in CANDS.items()
            if ptb[i][0].split() == tokenize(cs[0])
        )
        assert n_same >= len(CANDS) // 2
