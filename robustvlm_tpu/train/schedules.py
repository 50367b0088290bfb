"""LR schedules.

cosine_warmup_lr reproduces the open_clip `cosine_lr` the reference trains
with (reference adversarial_training_clip.py:18,211; in-repo copy at
CLIP_benchmark/.../linear_probe.py:19-33): linear warmup ramping as
(step+1)/warmup, then cosine decay to 0 over the remaining steps.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warmup_lr(base_lr: float, warmup: int, total_steps: int):
    """Returns schedule fn(step) -> lr (jit-safe)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1.0) / max(warmup, 1)
        progress = (step - warmup) / jnp.maximum(total_steps - warmup, 1)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress)) * base_lr
        return jnp.where(step < warmup, warm, cos)

    return schedule
