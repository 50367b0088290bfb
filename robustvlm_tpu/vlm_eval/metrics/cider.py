"""CIDEr-D metric, implemented from the published algorithm.

Replaces the reference's pycocoevalcap dependency
(open_flamingo/eval/coco_metric.py:1-20 `compute_cider`, :22-46
`compute_cider_all_scores`): TF-IDF-weighted n-gram (n=1..4) cosine
similarity between candidate and references, with CIDEr-D's count clipping
and gaussian length penalty (sigma=6), corpus-level IDF, final score x10.

Tokenization approximates PTBTokenizer: lowercase, punctuation stripped,
whitespace split (scores track pycocoevalcap within noise for typical
captions; the relative per-image ordering the ensemble harness needs is
preserved).
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

_PUNCT = re.compile(r"[^\w\s']")
SIGMA = 6.0
N_MAX = 4


def tokenize(s: str) -> List[str]:
    s = _PUNCT.sub(" ", s.lower().strip())
    return s.split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def _counts(sent: str) -> List[Counter]:
    toks = tokenize(sent)
    return [_ngrams(toks, n) for n in range(1, N_MAX + 1)]


class CiderScorer:
    """Corpus-IDF CIDEr-D. `refs[i]` is the reference list for image i,
    `cands[i]` the candidate caption."""

    def __init__(self, cands: Sequence[str], refs: Sequence[Sequence[str]]):
        assert len(cands) == len(refs) and len(cands) > 0
        self.cands = [_counts(c) for c in cands]
        self.refs = [[_counts(r) for r in rs] for rs in refs]
        self.cand_lens = [len(tokenize(c)) for c in cands]
        self.ref_lens = [[len(tokenize(r)) for r in rs] for rs in refs]
        self.doc_freq: List[Dict] = [defaultdict(int) for _ in range(N_MAX)]
        for rs in self.refs:
            for n in range(N_MAX):
                seen = set()
                for r in rs:
                    seen.update(r[n].keys())
                for g in seen:
                    self.doc_freq[n][g] += 1
        self.log_n_images = math.log(max(len(refs), 1))

    def _vec(self, counts: Counter, n: int):
        """TF-IDF vector + norm. tf is the raw count (pycocoevalcap
        convention); idf = log(N) - log(df)."""
        vec = {}
        norm = 0.0
        for g, c in counts.items():
            df = math.log(max(self.doc_freq[n][g], 1.0))
            w = c * (self.log_n_images - df)
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    def _sim(self, cvec, cnorm, rvec, rnorm, len_c, len_r):
        """CIDEr-D pair similarity for one n: clipped dot / norms with the
        gaussian length penalty."""
        if cnorm == 0.0 or rnorm == 0.0:
            return 0.0
        num = 0.0
        for g, w in cvec.items():
            if g in rvec:
                num += min(w, rvec[g]) * rvec[g]
        delta = float(len_c - len_r)
        return (
            (num / (cnorm * rnorm))
            * math.exp(-(delta ** 2) / (2 * SIGMA ** 2))
        )

    def per_image(self) -> List[float]:
        scores = []
        for i, cand in enumerate(self.cands):
            score_ns = []
            for n in range(N_MAX):
                cvec, cnorm = self._vec(cand[n], n)
                s = 0.0
                for j, ref in enumerate(self.refs[i]):
                    rvec, rnorm = self._vec(ref[n], n)
                    s += self._sim(
                        cvec, cnorm, rvec, rnorm,
                        self.cand_lens[i], self.ref_lens[i][j],
                    )
                score_ns.append(s / max(len(self.refs[i]), 1))
            # pycocoevalcap scale: mean over n, x10 (perfect match = 10.0);
            # the harness multiplies by a further 100 like the reference
            # (run_evaluation.py:1130, coco_metric.py:41)
            scores.append(10.0 * sum(score_ns) / N_MAX)
        return scores

    def corpus(self) -> float:
        p = self.per_image()
        return sum(p) / len(p)


def compute_cider(
    result_captions: Dict, annotations: Dict
) -> float:
    """reference coco_metric.compute_cider equivalent: results maps
    image_id -> caption; annotations maps image_id -> [ref captions]."""
    ids = list(result_captions.keys())
    cands = [result_captions[i] for i in ids]
    refs = [annotations[i] for i in ids]
    return CiderScorer(cands, refs).corpus()


def compute_cider_all_scores(
    result_captions: Dict, annotations: Dict
) -> Dict:
    """Per-image CIDEr-D x100 (the harness thresholds at cider<10,
    reference run_evaluation.py:1073-1092 use the x100 scale)."""
    ids = list(result_captions.keys())
    cands = [result_captions[i] for i in ids]
    refs = [annotations[i] for i in ids]
    per = CiderScorer(cands, refs).per_image()
    return {i: 100.0 * s for i, s in zip(ids, per)}
