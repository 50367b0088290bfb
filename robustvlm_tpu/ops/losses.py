"""Attack and training losses.

Behavioral parity targets:
- reference train/adversarial_training_clip.py:495-528 (compute_loss: 'l2'
  embedding distance summed over dim, 'ce' at logit_scale 100)
- reference train/apgd_train.py:95-108 (dlr_loss, dlr_loss_targeted)
- reference autoattack/autopgd_base.py:195-201, 616-624 (canonical dlr losses,
  ce-targeted)

TPU-first notes: the DLR losses only need the top-4 logits and two gathers, so
they use `jax.lax.top_k` instead of a full sort — O(C) instead of O(C log C)
per example and MXU/VPU friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS_DIV = 1e-12


def _reduce(loss_vec: jax.Array, reduction: str) -> jax.Array:
    if reduction == "none":
        return loss_vec
    if reduction == "mean":
        return jnp.mean(loss_vec)
    if reduction == "sum":
        return jnp.sum(loss_vec)
    raise ValueError(f"unknown reduction: {reduction}")


def ce_loss(logits: jax.Array, targets: jax.Array, reduction: str = "mean") -> jax.Array:
    """Cross-entropy on integer targets (reference adversarial_training_clip.py:523-528)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return _reduce(nll, reduction)


def ce_loss_targeted(logits: jax.Array, y_target: jax.Array, reduction: str = "none") -> jax.Array:
    """-CE against the target class (reference autopgd_base.py:623-624)."""
    return _reduce(-ce_loss(logits, y_target, reduction="none"), reduction)


def l2_embedding_loss(
    embedding: jax.Array, embedding_orig: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """Squared-L2 distance summed over the embedding dim — the FARE loss.

    Per reference adversarial_training_clip.py:509-521: per-example sum of
    squared errors over the feature axis (no division by dim); 'mean' averages
    the per-example sums over the batch.
    """
    assert embedding.shape == embedding_orig.shape, (
        embedding.shape,
        embedding_orig.shape,
    )
    per_example = jnp.sum(jnp.square(embedding - embedding_orig), axis=-1)
    return _reduce(per_example, reduction)


def _top4_and_gather(logits: jax.Array, *idx: jax.Array):
    topv, topi = jax.lax.top_k(logits, 4)  # descending: topv[:,0] is the max
    gathered = [
        jnp.take_along_axis(logits, i[:, None], axis=-1)[:, 0] for i in idx
    ]
    return topv, topi, gathered


def dlr_loss(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Difference-of-logits-ratio loss (reference autopgd_base.py:195-201).

    -(z_y - z_(1) * 1[argmax==y] - z_(0) * 1[argmax!=y]) / (z_(0) - z_(2) + 1e-12)
    where z_(k) is the (k+1)-th largest logit.
    """
    topv, topi, (z_y,) = _top4_and_gather(logits, y)
    is_correct = (topi[:, 0] == y).astype(logits.dtype)
    num = z_y - topv[:, 1] * is_correct - topv[:, 0] * (1.0 - is_correct)
    den = topv[:, 0] - topv[:, 2] + _EPS_DIV
    return -num / den


def dlr_loss_targeted(logits: jax.Array, y: jax.Array, y_target: jax.Array) -> jax.Array:
    """Targeted DLR (reference autopgd_base.py:616-621).

    -(z_y - z_t) / (z_(0) - 0.5*(z_(2) + z_(3)) + 1e-12)
    """
    topv, _, (z_y, z_t) = _top4_and_gather(logits, y, y_target)
    den = topv[:, 0] - 0.5 * (topv[:, 2] + topv[:, 3]) + _EPS_DIV
    return -(z_y - z_t) / den


def make_loss_fn(loss: str, **kw):
    """Per-example criterion factory mirroring the reference loss registry.

    Returns fn(logits_or_embedding, y) -> (B,) loss vector. Recognized names:
      'ce'                : cross-entropy (maximize to attack)
      'ce-targeted-cfts'  : -CE(logits, y) (minimizing CE toward y)
      'ce-targeted'       : -CE(logits, y_target); requires y_target kwarg
      'dlr'               : DLR
      'dlr-targeted'      : targeted DLR; requires y_target kwarg
      'l2'                : FARE embedding distance; requires embedding_orig kwarg
    """
    if loss == "ce":
        return lambda out, y: ce_loss(out, y, reduction="none")
    if loss == "ce-targeted-cfts":
        return lambda out, y: -ce_loss(out, y, reduction="none")
    if loss == "ce-targeted":
        y_target = kw["y_target"]
        return lambda out, y: ce_loss_targeted(out, y_target, reduction="none")
    if loss == "dlr":
        return dlr_loss
    if loss == "dlr-targeted":
        y_target = kw["y_target"]
        return lambda out, y: dlr_loss_targeted(out, y, y_target)
    if loss == "l2":
        embedding_orig = kw["embedding_orig"]
        return lambda out, y: l2_embedding_loss(out, embedding_orig, reduction="none")
    raise ValueError(f"unknown loss: {loss}")
