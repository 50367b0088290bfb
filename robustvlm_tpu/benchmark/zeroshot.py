"""Zero-shot classification evaluation (clean + adversarial).

Equivalent of reference
CLIP_benchmark/clip_benchmark/metrics/zeroshot_classification.py:
template-averaged classifier (:16-58), batched clean evaluation and
AutoAttack adversarial evaluation over an accumulated sample set (:86-182),
acc1/acc5/mean-per-class recall (:289-304) and multilabel mAP (:184-222).

TPU-first: the clean pass is one jitted batched forward; the adversarial
pass reuses the shape-static AutoAttack cascade (eval/autoattack.py) over
fixed-size padded batches instead of torch dynamic batching.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.eval.autoattack import AutoAttackTPU
from robustvlm_tpu.eval.classifier import build_text_classifier
from robustvlm_tpu.models.clip.model import CLIPConfig

from .templates import format_prompts


def zero_shot_classifier(
    params,
    cfg: CLIPConfig,
    tokenize: Callable[[Sequence[str]], jax.Array],
    classnames: Sequence[str],
    templates: Sequence[str],
) -> jax.Array:
    """(D, C) column-normalized template-ensemble classifier."""
    return build_text_classifier(
        params, cfg, tokenize, classnames, templates=templates
    )


def accuracy_topk(
    logits: np.ndarray, target: np.ndarray, topk: Sequence[int] = (1, 5)
) -> Tuple[float, ...]:
    order = np.argsort(-logits, axis=-1)
    return tuple(
        float(np.mean((order[:, :k] == target[:, None]).any(axis=1)))
        for k in topk
    )


def mean_per_class_recall(logits: np.ndarray, target: np.ndarray) -> float:
    pred = logits.argmax(-1)
    recalls = []
    for c in np.unique(target):
        m = target == c
        recalls.append(float((pred[m] == c).mean()))
    return float(np.mean(recalls))


def multilabel_average_precision(
    scores: np.ndarray, target: np.ndarray
) -> float:
    """Macro mAP over classes; target is a (N, C) multi-hot matrix
    (reference zeroshot_classification.py:184-222)."""
    aps = []
    for c in range(scores.shape[1]):
        y = target[:, c]
        if y.sum() == 0:
            continue
        order = np.argsort(-scores[:, c])
        y_sorted = y[order]
        cum_pos = np.cumsum(y_sorted)
        precision = cum_pos / (np.arange(len(y_sorted)) + 1)
        aps.append(float((precision * y_sorted).sum() / y_sorted.sum()))
    return float(np.mean(aps)) if aps else 0.0


def run_classification(
    logits_fn: Callable[[jax.Array], jax.Array],
    data: Iterable[Tuple[np.ndarray, np.ndarray]],
    *,
    attack: Optional[str] = None,
    eps: float = 4.0 / 255.0,
    norm: str = "linf",
    n_iter: int = 100,
    n_samples: Optional[int] = None,
    batch_size: int = 128,
    attack_batch: int = 8,
    verbose: bool = False,
) -> Dict[str, float]:
    """Evaluate a pixel-space logits closure over a dataset iterator.

    attack=None: clean batched pass. attack='aa': accumulate up to n_samples
    and run the APGD-CE + targeted-APGD cascade (reference cli.py:59-62,
    zeroshot_classification.py:128-160); also reports clean metrics.
    """
    xs, ys, logits_clean = [], [], []
    seen = 0
    for xb, yb in data:
        if attack is not None and np.asarray(yb).ndim == 2:
            # fail fast (first batch) instead of after the full clean pass
            raise NotImplementedError(
                "adversarial evaluation of multilabel datasets is not "
                "supported (the reference cascade needs int labels)"
            )
        if n_samples is not None and seen >= n_samples:
            break
        if n_samples is not None:
            keep = min(len(xb), n_samples - seen)
            xb, yb = xb[:keep], yb[:keep]
        seen += len(xb)
        logits_clean.append(np.asarray(logits_fn(jnp.asarray(xb))))
        if attack is not None:
            xs.append(np.asarray(xb))
        ys.append(np.asarray(yb))

    logits_clean = np.concatenate(logits_clean)
    y = np.concatenate(ys)
    if y.ndim == 2:
        # (N, C) multi-hot labels (e.g. voc2007_multilabel): macro mAP is
        # THE metric (reference zeroshot_classification.py:184-222)
        metrics = {
            "mean_average_precision": multilabel_average_precision(
                logits_clean, y
            ),
        }
        if attack is not None:
            raise NotImplementedError(
                "adversarial evaluation of multilabel datasets is not "
                "supported (the reference cascade needs int labels)"
            )
        return metrics
    acc1, acc5 = accuracy_topk(logits_clean, y)
    metrics = {
        "acc1": acc1,
        "acc5": acc5,
        "mean_per_class_recall": mean_per_class_recall(logits_clean, y),
    }

    if attack == "aa":
        x = np.concatenate(xs)
        aa = AutoAttackTPU(
            logits_fn, eps=eps, norm=norm, n_iter=n_iter,
            attacks_to_run=["apgd-ce", "apgd-t"], verbose=verbose,
        )
        # attack chunks of 8: per-example APGD throughput peaks there on
        # v5e (bench.py batch curve); clean forwards stay at batch_size
        x_adv = aa.run_standard_evaluation(
            jnp.asarray(x), jnp.asarray(y), bs=attack_batch
        )
        logits_adv = []
        for i in range(0, len(x), batch_size):
            logits_adv.append(np.asarray(logits_fn(x_adv[i : i + batch_size])))
        logits_adv = np.concatenate(logits_adv)
        r1, r5 = accuracy_topk(logits_adv, y)
        metrics.update({
            "adv_acc1": r1,
            "adv_acc5": r5,
            "adv_mean_per_class_recall": mean_per_class_recall(logits_adv, y),
        })
    elif attack is not None:
        raise ValueError(f"unknown attack mode: {attack}")
    return metrics


def evaluate(
    params,
    cfg: CLIPConfig,
    tokenize,
    classnames: Sequence[str],
    templates: Sequence[str],
    data,
    *,
    make_logits_fn,
    attack: Optional[str] = None,
    **kw,
) -> Dict[str, float]:
    """End-to-end zero-shot eval: build the template-ensemble classifier,
    wrap it as a pixel-space logits closure, run clean/adversarial metrics
    (reference zeroshot_classification.evaluate :225-304)."""
    classifier = zero_shot_classifier(params, cfg, tokenize, classnames, templates)
    logits_fn = make_logits_fn(classifier)
    return run_classification(logits_fn, data, attack=attack, **kw)
