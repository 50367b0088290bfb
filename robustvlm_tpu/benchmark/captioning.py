"""Captioning metrics for the benchmark suite.

Equivalent of reference CLIP_benchmark/clip_benchmark/metrics/captioning.py,
which scores generated captions with pycocoevalcap's Bleu/Rouge/Cider (plus
java-based METEOR/SPICE, which have no native equivalent here and are
omitted). BLEU and ROUGE-L are implemented from the published algorithms:

- BLEU-n: corpus-level clipped n-gram precision with geometric mean over
  orders 1..n and the brevity penalty using the closest reference length
  (Papineni et al. 2002; pycocoevalcap's default "closest" option).
- ROUGE-L: per-image LCS F-beta (beta=1.2) taking the max precision/recall
  over references, averaged over images (Lin 2004; pycocoevalcap rouge.py).
- CIDEr-D: robustvlm_tpu.vlm_eval.metrics.cider (corpus IDF).

Tokenization mirrors the CIDEr module's PTB approximation so all metrics
see the same token streams.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Callable, Dict, Iterable, List, Sequence, Tuple

from robustvlm_tpu.vlm_eval.metrics.cider import (
    CiderScorer,
    _ngrams,
    tokenize,
)

ROUGE_BETA = 1.2


def bleu_scores(
    cands: Sequence[str], refs: Sequence[Sequence[str]], n_max: int = 4
) -> List[float]:
    """Corpus BLEU-1..n_max."""
    assert len(cands) == len(refs) and cands
    total_match = [0] * n_max
    total_cand = [0] * n_max
    cand_len_sum = 0
    ref_len_sum = 0
    for cand, rs in zip(cands, refs):
        ct = tokenize(cand)
        rts = [tokenize(r) for r in rs]
        cand_len_sum += len(ct)
        # closest reference length (ties -> shorter)
        ref_len_sum += min(
            (abs(len(rt) - len(ct)), len(rt)) for rt in rts
        )[1]
        for n in range(1, n_max + 1):
            cg = _ngrams(ct, n)
            if not cg:
                continue
            max_ref = Counter()
            for rt in rts:
                rg = _ngrams(rt, n)
                for g, c in rg.items():
                    max_ref[g] = max(max_ref[g], c)
            total_match[n - 1] += sum(
                min(c, max_ref.get(g, 0)) for g, c in cg.items()
            )
            total_cand[n - 1] += sum(cg.values())
    bp = (
        1.0
        if cand_len_sum > ref_len_sum
        else math.exp(1.0 - ref_len_sum / max(cand_len_sum, 1))
    )
    out = []
    log_p = []
    for n in range(n_max):
        p = total_match[n] / total_cand[n] if total_cand[n] else 0.0
        log_p.append(math.log(p) if p > 0 else -math.inf)
        gm = sum(log_p) / (n + 1)
        out.append(bp * math.exp(gm) if gm > -math.inf else 0.0)
    return out


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l_score(cand: str, refs: Sequence[str]) -> float:
    """Per-image ROUGE-L: max precision/recall over refs, F-beta 1.2
    (pycocoevalcap rouge.py calc_score)."""
    ct = tokenize(cand)
    precs, recs = [], []
    for r in refs:
        rt = tokenize(r)
        lcs = _lcs_len(rt, ct)
        precs.append(lcs / len(ct) if ct else 0.0)
        recs.append(lcs / len(rt) if rt else 0.0)
    p, r = max(precs, default=0.0), max(recs, default=0.0)
    if p == 0.0 or r == 0.0:
        return 0.0
    b2 = ROUGE_BETA ** 2
    return (1 + b2) * p * r / (r + b2 * p)


def score_captions(
    cands: Sequence[str], refs: Sequence[Sequence[str]]
) -> Dict[str, float]:
    """All native caption metrics over a corpus (reference COCOEvalCap
    metric dict shape, minus java-based METEOR/SPICE)."""
    bleu = bleu_scores(cands, refs)
    metrics = {f"Bleu_{i + 1}": b for i, b in enumerate(bleu)}
    metrics["ROUGE_L"] = sum(
        rouge_l_score(c, r) for c, r in zip(cands, refs)
    ) / len(cands)
    # pycocoevalcap scale: perfect >=4-token match = 10.0
    metrics["CIDEr"] = CiderScorer(cands, refs).corpus()
    return metrics


def evaluate_captioning(
    generate_fn: Callable[[object], List[str]],
    data: Iterable[Tuple[object, Sequence[Sequence[str]]]],
) -> Dict[str, float]:
    """Generate + score (reference metrics/captioning.py evaluate: model
    generates per batch, captions accumulate, one corpus-level scoring).
    `data` yields (image_batch, per_image_ref_lists)."""
    cands: List[str] = []
    refs: List[Sequence[str]] = []
    for images, ref_lists in data:
        outs = generate_fn(images)
        cands.extend(outs)
        refs.extend(ref_lists)
    return score_captions(cands, refs)
