"""Square Attack (black-box random search), Linf variant.

Behavioral parity target: reference autoattack/square.py:20-618 (Andriushchenko
et al. 2020) — vertical-stripe init, piecewise p_selection schedule of the
square size, per-channel ±eps squares, margin-loss acceptance, per-example
independent search.

TPU-first: the query loop runs as `lax.scan` chunks of a jitted body —
per-example random square locations become iota-mask updates (shape-static, no
scatters), every example advances in lockstep with `where`-masked acceptance,
and the host checks between chunks for global success to exit early (the only
data-dependent control flow, kept outside jit).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class SquareResult(NamedTuple):
    x_adv: jax.Array
    margin: jax.Array  # (B,) final margin; < 0 means misclassified
    n_queries: jax.Array  # (B,) queries consumed per example


def _p_schedule(it: int, n_queries: int, p_init: float, rescale: bool) -> float:
    """Square-fraction schedule (reference square.py:192-219)."""
    if rescale:
        it = int(it / n_queries * 10000)
    # it in (edge_{k-1}, edge_k] -> p_init / div_k; beyond the last edge stays /512
    brackets = [
        (10, 1), (50, 2), (200, 4), (500, 8), (1000, 16),
        (2000, 32), (4000, 64), (6000, 128), (8000, 256), (10000, 512),
    ]
    div = 512
    for edge, d in brackets:
        if it <= edge:
            div = d
            break
    return p_init / div


def margin_loss(logits: jax.Array, y: jax.Array) -> jax.Array:
    """z_y - max_{k != y} z_k (negative == misclassified)."""
    zy = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    masked = jnp.where(
        jax.nn.one_hot(y, logits.shape[-1], dtype=bool), -jnp.inf, logits
    )
    return zy - jnp.max(masked, axis=-1)


def square_attack_linf(
    logits_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    y: jax.Array,
    *,
    eps: float,
    n_queries: int = 5000,
    p_init: float = 0.8,
    rng: Optional[jax.Array] = None,
    rescale_schedule: bool = False,
    chunk: int = 250,
) -> SquareResult:
    """Run Linf Square Attack; returns best-found adversarial points."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, c, h, w = x.shape
    n_fts = c * h * w

    # ---- init: full-height random-sign stripes of width 1
    k_init, rng = jax.random.split(rng)
    stripes = jax.random.rademacher(k_init, (b, c, 1, w), dtype=x.dtype)
    x_adv = jnp.clip(x + eps * stripes, 0.0, 1.0)
    margin = margin_loss(logits_fn(x_adv), y)
    loss_best = margin
    queries = jnp.ones((b,), jnp.int32)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def body(carry, xs):
        x_adv, loss_best, margin, queries = carry
        key, s = xs  # s: static-per-iteration square side, traced int32
        k1, k2, k3 = jax.random.split(key, 3)
        vh = jax.random.randint(k1, (b,), 0, jnp.maximum(h - s + 1, 1))
        vw = jax.random.randint(k2, (b,), 0, jnp.maximum(w - s + 1, 1))
        sign = jax.random.rademacher(k3, (b, c, 1, 1), dtype=x.dtype)

        in_rows = (row_idx[None] >= vh[:, None, None]) & (
            row_idx[None] < vh[:, None, None] + s
        )  # (B, h, 1)
        in_cols = (col_idx[None] >= vw[:, None, None]) & (
            col_idx[None] < vw[:, None, None] + s
        )  # (B, 1, w)
        sq = (in_rows & in_cols)[:, None]  # (B, 1, h, w)

        delta_old = x_adv - x
        delta_new = jnp.where(sq, sign * eps, delta_old)
        x_cand = jnp.clip(x + jnp.clip(delta_new, -eps, eps), 0.0, 1.0)

        # only query for still-unsuccessful examples (margin >= 0); everyone is
        # evaluated (lockstep) but finished examples never accept updates
        cand_margin = margin_loss(logits_fn(x_cand), y)
        active = margin >= 0.0
        improved = (cand_margin < loss_best) & active
        imx = improved[:, None, None, None]
        x_adv = jnp.where(imx, x_cand, x_adv)
        loss_best = jnp.where(improved, cand_margin, loss_best)
        margin = jnp.where(improved, cand_margin, margin)
        queries = queries + active.astype(jnp.int32)
        return (x_adv, loss_best, margin, queries), None

    it = 0
    carry = (x_adv, loss_best, margin, queries)
    while it < n_queries - 1:
        n = min(chunk, n_queries - 1 - it)
        keys = jax.random.split(jax.random.fold_in(rng, it), n)
        sides = []
        for j in range(n):
            p = _p_schedule(it + j, n_queries, p_init, rescale_schedule)
            s = max(int(round(math.sqrt(p * n_fts / c))), 1)
            sides.append(min(s, h - 1 if h > 1 else 1))
        carry = jax.lax.scan(
            body, carry, (keys, jnp.asarray(sides, jnp.int32))
        )[0]
        it += n
        # host-side early exit: everyone misclassified
        if bool(jnp.all(carry[2] < 0.0)):
            break

    x_adv, _, margin, queries = carry
    return SquareResult(x_adv=x_adv, margin=margin, n_queries=queries)
