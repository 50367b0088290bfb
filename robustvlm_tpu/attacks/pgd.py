"""Momentum PGD as a `jax.lax.scan` over a jitted value-and-grad.

Behavioral parity target: reference train/pgd_train.py:5-68 and
vlm_eval/attacks/pgd.py:5-87 —
  per iteration: grad of loss wrt the perturbation; NaN grads zeroed;
  grad direction normalized (sign / unit-l2); momentum accumulation with the
  *velocity itself re-normalized* each step; signed step (min or max mode);
  eps-ball projection; [0,1] image-space clamp.

TPU-first: the whole loop is one `lax.scan`; each iteration is a single
XLA-compiled fwd+bwd of the model plus a fused elementwise update. Per-example
state (perturbation, velocity) lives with its example, so the batch axis shards
trivially over the device mesh.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from robustvlm_tpu.ops.projections import (
    normalize_grad,
    project_perturbation,
)


def pgd_attack(
    loss_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    *,
    eps: float,
    stepsize: float,
    iterations: int,
    norm: str = "linf",
    mode: str = "max",
    momentum: float = 0.9,
    perturbation: Optional[jax.Array] = None,
    random_start: bool = False,
    rng: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Run momentum-PGD and return the adversarial images `x + delta`.

    Args:
      loss_fn: pure fn(x_adv) -> scalar loss. The model wrapper (with its
        internal normalization) and the targets are closed over; use
        `lax.stop_gradient` on parameters inside if needed.
      x: clean images in [0,1], shape (B, ...).
      eps: ball radius (image-space units, i.e. already divided by 255).
      stepsize: step length per iteration.
      iterations: number of steps (static).
      norm: 'linf' or 'l2'.
      mode: 'max' to maximize the loss (standard attack), 'min' to minimize
        (e.g. targeted attacks minimizing distance losses).
      momentum: velocity decay (reference default 0.9).
      perturbation: optional explicit init; overrides random_start.
      random_start: uniform(-eps, eps) init (the training driver's choice,
        reference adversarial_training_clip.py:318).
      rng: PRNG key, required when random_start and perturbation is None.
      mask: optional broadcastable multiplier on the gradient (the VLM
        context-frame mask of reference vlm_eval/attacks/pgd.py:75-87).

    Returns:
      x_adv with the perturbation inside the ball and x_adv in [0,1].
    """
    from robustvlm_tpu.attacks._validate import check_image_range

    check_image_range(x)
    if mode not in ("min", "max"):
        raise ValueError(f"unknown mode: {mode}")
    sign = -1.0 if mode == "min" else 1.0

    if perturbation is None:
        if random_start:
            if rng is None:
                raise ValueError("random_start=True requires rng")
            perturbation = jax.random.uniform(
                rng, x.shape, x.dtype, minval=-eps, maxval=eps
            )
        else:
            perturbation = jnp.zeros_like(x)

    grad_of = jax.grad(loss_fn)

    def body(carry, _):
        pert, velocity = carry
        g = grad_of(x + pert)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        if mask is not None:
            g = g * mask
        g = normalize_grad(g, norm)
        velocity = momentum * velocity + g
        velocity = normalize_grad(velocity, norm)
        pert = pert + sign * stepsize * velocity
        pert = project_perturbation(pert, eps, norm)
        pert = jnp.clip(x + pert, 0.0, 1.0) - x
        return (pert, velocity), None

    (pert, _), _ = jax.lax.scan(
        body, (perturbation, jnp.zeros_like(x)), None, length=iterations
    )
    return x + jax.lax.stop_gradient(pert)
