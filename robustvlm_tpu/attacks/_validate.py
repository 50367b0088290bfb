"""Threat-model input validation shared by the attack entry points.

The reference guards its attacks with range asserts (SURVEY.md §4.1:
train/pgd_train.py:24, vlm_eval/attacks/pgd.py:24, models/llava.py:102-103)
— a 0-255-scaled input silently turns eps=2/255 into a relatively
microscopic perturbation and reports near-clean "robust" accuracy. The
check runs host-side on concrete inputs only (a traced x inside an outer
jit skips it; the cost on concrete inputs is one scalar readback).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def check_image_range(x, *, what: str = "attack input") -> None:
    if isinstance(x, jax.core.Tracer):
        return
    mx = float(jnp.max(x))
    mn = float(jnp.min(x))
    if mx > 1.0 + 1e-5 or mn < -1e-5:
        raise ValueError(
            f"{what} must be unnormalized pixels in [0,1] (threat-model "
            f"contract; eps is in the same units) — got range "
            f"[{mn:.4g}, {mx:.4g}]. Divide by 255?"
        )
