"""Defense sanity checks run before an AutoAttack evaluation.

JAX-native equivalents of reference autoattack/checks.py:18-135:
- randomized defense: two identical forward passes disagreeing,
- probabilities-instead-of-logits: rows in [0,1] summing to ~1,
- zero gradients of the DLR loss at the clean points,
- class count vs targeted-attack requirements.
The reference's `sys.settrace` dynamic-defense counter (checks.py:90-115) has
no analog here: models are pure jitted functions and cannot mutate state
between calls — the property the tracer tried to detect is excluded by
construction, which we note in the log instead of tracing.
"""

from __future__ import annotations

import logging
from typing import Callable

import jax
import jax.numpy as jnp

from robustvlm_tpu.ops.losses import dlr_loss

log = logging.getLogger("robustvlm_tpu.autoattack")


def check_randomized(logits_fn, x, atol: float = 1e-6) -> bool:
    a = logits_fn(x)
    b = logits_fn(x)
    randomized = not bool(jnp.allclose(a, b, atol=atol))
    if randomized:
        log.warning(
            "Model output differs across identical calls — randomized defense? "
            "Use rand-version attacks (EOT)."
        )
    return randomized


def check_range_output(logits_fn, x) -> int:
    out = logits_fn(x)
    n_cls = out.shape[-1]
    row_sums = jnp.sum(out, axis=-1)
    looks_softmax = bool(
        jnp.all(out >= 0.0)
        and jnp.all(out <= 1.0)
        and jnp.allclose(row_sums, 1.0, atol=1e-4)
    )
    if looks_softmax:
        log.warning(
            "Output rows lie in [0,1] and sum to 1 — the model seems to return "
            "probabilities, not logits; attacks expect logits."
        )
    return n_cls


def check_zero_gradients(grad: jax.Array) -> bool:
    flat = grad.reshape(grad.shape[0], -1)
    zero = jnp.sum(jnp.abs(flat), axis=-1) == 0.0
    n_zero = int(jnp.sum(zero))
    if n_zero > 0:
        log.warning(
            "%d of %d examples have exactly zero gradient — possible gradient "
            "masking; consider different losses/attacks.",
            n_zero,
            flat.shape[0],
        )
    return n_zero > 0


def check_zero_gradients_fn(logits_fn: Callable, x, y) -> bool:
    g = jax.grad(lambda xx: jnp.sum(dlr_loss(logits_fn(xx), y)))(x)
    return check_zero_gradients(g)


def check_n_classes(n_cls: int, attacks_to_run, n_target_classes: int) -> None:
    # targeted attacks index order[:, -tc] for tc in 2..n_target_classes+1,
    # so n_cls == n_target_classes + 1 is exactly sufficient (reference
    # checks.py:117-134 warns only when n_target_classes + 1 > n_cls)
    if any(a in attacks_to_run for a in ("apgd-t", "fab-t")):
        if n_cls < n_target_classes + 1:
            log.warning(
                "%d classes < n_target_classes+1=%d — targeted attacks will "
                "cycle through fewer targets.",
                n_cls,
                n_target_classes + 1,
            )


def check_square_sr(robust_accuracy_dict: dict) -> None:
    """Flag when the black-box Square attack outperforms the white-box cascade
    (gradient-masking symptom), reference checks.py:73-89."""
    if "square" not in robust_accuracy_dict:
        return
    others = [v for k, v in robust_accuracy_dict.items() if k not in ("clean", "square")]
    if others and robust_accuracy_dict["square"] < min(others) - 0.0001:
        log.warning(
            "Square attack is stronger than the white-box attacks — possible "
            "gradient masking."
        )


def check_dynamic(logits_fn, x, verbose: bool = True) -> bool:
    """Detect dynamic defenses: models whose host-side control flow differs
    across identical inference calls (reference checks.py:95-115 counts
    Python function calls via sys.settrace). Under jit a cached executable
    makes the second call nearly call-free; a defense that re-traces,
    mutates state, or branches per call shows a growing call count."""
    import sys

    counts = []
    for _ in range(2):
        n = [0]

        def tracer(frame, event, arg):
            if event == "call":
                n[0] += 1
            return None

        old = sys.gettrace()
        sys.settrace(tracer)
        try:
            out = logits_fn(x)
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
        finally:
            sys.settrace(old)
        counts.append(n[0])
    # a pure jitted model hits the executable cache on the 2nd call: count
    # drops or stays flat. Dynamic defenses keep doing host work.
    dynamic = counts[1] > max(100, counts[0] // 2) and counts[1] > 1000
    if dynamic and verbose:
        log.warning(
            "the model appears to do per-call host work (%d -> %d python "
            "calls); attacks may be evaluated against a dynamic defense",
            counts[0], counts[1],
        )
    return dynamic
