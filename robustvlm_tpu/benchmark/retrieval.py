"""Zero-shot image/text retrieval metrics.

Equivalent of reference CLIP_benchmark/clip_benchmark/metrics/
zeroshot_retrieval.py: encode all images and all captions, compute the
similarity matrix on device, report recall@k in both directions with the
"positive pair" semantics (an image is correct if ANY of its captions is
retrieved in the top k, and vice versa).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _normalize(a: np.ndarray) -> np.ndarray:
    return a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)


def recall_at_k(
    scores: np.ndarray, positive_pairs: np.ndarray, k: int
) -> np.ndarray:
    """scores (Nq, Nc), positive_pairs (Nq, Nc) bool -> per-query recall@k:
    1 if any positive candidate is in the top-k."""
    topk = np.argsort(-scores, axis=-1)[:, :k]
    hit = np.take_along_axis(positive_pairs, topk, axis=1).any(axis=1)
    return hit.astype(np.float32)


def evaluate_retrieval(
    image_embs: np.ndarray,
    text_embs: np.ndarray,
    text_to_image: Sequence[int],
    recall_ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, float]:
    """image_embs (Ni, D), text_embs (Nt, D), text_to_image[j] = image index
    of caption j. Returns image_retrieval_recall@k (text query -> image) and
    text_retrieval_recall@k (image query -> text)."""
    im = _normalize(image_embs.astype(np.float32))
    tx = _normalize(text_embs.astype(np.float32))
    t2i = np.asarray(text_to_image)
    scores_t = tx @ im.T                       # (Nt, Ni): text -> image
    pos_t = np.zeros_like(scores_t, dtype=bool)
    pos_t[np.arange(len(t2i)), t2i] = True
    scores_i = scores_t.T                      # (Ni, Nt): image -> text
    pos_i = pos_t.T
    out = {}
    for k in recall_ks:
        out[f"image_retrieval_recall@{k}"] = float(
            recall_at_k(scores_t, pos_t, k).mean()
        )
        out[f"text_retrieval_recall@{k}"] = float(
            recall_at_k(scores_i, pos_i, k).mean()
        )
    return out


def encode_corpus(
    image_fn: Callable,
    text_fn: Callable,
    data: Iterable[Tuple[np.ndarray, List[List[str]]]],
    tokenize,
    batch_size: int = 128,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """Stream (images, per-image caption lists) -> stacked embeddings +
    caption->image index map."""
    im_embs, tx_embs, t2i = [], [], []
    img_idx = 0
    for images, caption_lists in data:
        im_embs.append(np.asarray(image_fn(jnp.asarray(images))))
        flat = []
        for caps in caption_lists:
            for c in caps:
                flat.append(c)
                t2i.append(img_idx)
            img_idx += 1
        for i in range(0, len(flat), batch_size):
            toks = tokenize(flat[i : i + batch_size])
            tx_embs.append(np.asarray(text_fn(jnp.asarray(toks))))
    return np.concatenate(im_embs), np.concatenate(tx_embs), t2i


def evaluate_image_caption_selection(
    image_fn: Callable,
    text_fn: Callable,
    data: Iterable[Tuple[np.ndarray, List[List[str]]]],
    tokenize,
) -> Dict[str, float]:
    """SugarCrepe-style forced choice: per image, captions[0] is correct and
    the rest are hard negatives; accuracy = P(correct caption scores highest)
    (reference metrics/image_caption_selection.py)."""
    correct, total = 0, 0
    for images, caption_lists in data:
        embs = _normalize(np.asarray(image_fn(jnp.asarray(images))))
        for i, caps in enumerate(caption_lists):
            t = _normalize(np.asarray(text_fn(jnp.asarray(tokenize(caps)))))
            scores = t @ embs[i]
            correct += int(np.argmax(scores) == 0)
            total += 1
    return {"acc": correct / max(total, 1)}
