"""Square Attack (black-box random search), Linf / L2 / L1 variants.

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
    rescale_schedule: bool = True,
    chunk: int = 250,
) -> SquareResult:
    """Run Linf Square Attack; returns best-found adversarial points.

    rescale_schedule=True matches the reference default (square.py
    resc_schedule=True, used by AutoAttack): the p-schedule brackets are
    expressed on a 10k-query scale and rescaled to n_queries, so the
    smaller-square phases still execute at n_queries != 10000."""
    from robustvlm_tpu.attacks._validate import check_image_range

    check_image_range(x)
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


# ---------------------------------------------------------------------- L2
def _eta_rectangles(x: int, y: int) -> "np.ndarray":
    """Concentric-ring pattern (reference square.py:143-170, L2 branch)."""
    import numpy as np

    delta = np.zeros((x, y), np.float32)
    x_c, y_c = x // 2 + 1, y // 2 + 1
    c2 = [x_c - 1, y_c - 1]
    for counter in range(0, max(x_c, y_c)):
        delta[
            max(c2[0], 0): min(c2[0] + 2 * counter + 1, x),
            max(0, c2[1]): min(c2[1] + 2 * counter + 1, y),
        ] += 1.0 / (counter + 1) ** 2
        c2[0] -= 1
        c2[1] -= 1
    return delta / np.sqrt((delta ** 2).sum())


def _eta(s: int) -> "np.ndarray":
    """Bipolar pseudo-gaussian square (reference square.py:172-190; the
    random transpose is applied at the call site)."""
    import numpy as np

    delta = np.zeros((s, s), np.float32)
    delta[: s // 2] = _eta_rectangles(s // 2, s)
    delta[s // 2:] = -_eta_rectangles(s - s // 2, s)
    return delta / np.sqrt((delta ** 2).sum())


def _tiled_init_delta(k_init, b, c, h, w, s0, sp, e0, dtype):
    """Initial delta: the eta tile repeated over an (h, w) grid with an
    INDEPENDENT random sign per (example, channel, tile) — the reference
    samples random_choice([b, c, 1, 1]) inside the tile loop
    (square.py:306-319, :423-438), giving 2^(n_tiles) distinct init
    patterns per channel; a single shared sign would collapse that
    randomized-restart diversity to 2."""
    import numpy as np

    canvas = np.zeros((h, w), np.float32)
    tile_i = np.full((h, w), -1, np.int64)
    tile_j = np.full((h, w), -1, np.int64)
    vh = max(sp, 0)
    n_ti = max(h // s0, 1)
    n_tj = max(w // s0, 1)
    for i in range(n_ti):
        vw = max(sp, 0)
        for j in range(n_tj):
            if vh + s0 <= h and vw + s0 <= w:
                canvas[vh: vh + s0, vw: vw + s0] += e0
                tile_i[vh: vh + s0, vw: vw + s0] = i
                tile_j[vh: vh + s0, vw: vw + s0] = j
            vw += s0
        vh += s0
    signs = jax.random.rademacher(k_init, (b, c, n_ti, n_tj), dtype=dtype)
    sign_grid = signs[:, :, jnp.asarray(np.maximum(tile_i, 0)),
                      jnp.asarray(np.maximum(tile_j, 0))]
    return jnp.asarray(canvas)[None, None] * sign_grid  # (B, C, h, w)


def _l2_sides(n_queries: int, n_fts: int, c: int, h: int, w: int,
              p_init: float, rescale: bool):
    """Static per-iteration square sides for the L2 schedule (odd, >=3)."""
    sides = []
    for it in range(n_queries - 1):
        p = _p_schedule(it, n_queries, p_init, rescale)
        s = max(int(round(math.sqrt(p * n_fts / c))), 3)
        if s % 2 == 0:
            s += 1
        sides.append(min(s, min(h, w)))
    return sides


def square_attack_l2(
    logits_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    y: jax.Array,
    *,
    eps: float,
    n_queries: int = 5000,
    p_init: float = 0.8,
    rng: Optional[jax.Array] = None,
    rescale_schedule: bool = True,
) -> SquareResult:
    """L2 Square Attack (reference square.py:305-380): bipolar eta squares
    with norm-budget redistribution between two windows, full-delta
    renormalization to the eps sphere. Iterations with equal square size are
    scanned together (the eta pattern is static per segment)."""
    import numpy as np

    from robustvlm_tpu.attacks._validate import check_image_range

    check_image_range(x)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, c, h, w = x.shape
    n_fts = c * h * w

    def l2n(t, axes, keepdims=True):
        return jnp.sqrt(jnp.sum(t * t, axis=axes, keepdims=keepdims))

    def normalize_full(t):
        return t / (l2n(t, (1, 2, 3)) + 1e-12)

    # ---- init: tiled eta(h//5) grid with random per-(b,c,tile) signs
    k_init, rng = jax.random.split(rng)
    s0 = max(h // 5, 1)
    sp = (h - s0 * 5) // 2 if h >= 5 * s0 else 0
    delta = _tiled_init_delta(k_init, b, c, h, w, s0, sp, _eta(s0), x.dtype)
    x_adv = jnp.clip(x + normalize_full(delta) * eps, 0.0, 1.0)
    margin = margin_loss(logits_fn(x_adv), y)
    loss_best = margin
    queries = jnp.ones((b,), jnp.int32)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def window_mask(vh, vw, s):
        in_rows = (row_idx[None] >= vh[:, None, None]) & (
            row_idx[None] < vh[:, None, None] + s
        )
        in_cols = (col_idx[None] >= vw[:, None, None]) & (
            col_idx[None] < vw[:, None, None] + s
        )
        return (in_rows & in_cols)[:, None].astype(x.dtype)  # (B,1,h,w)

    def make_body(s: int, eta_np):
        # eta embedded at the top-left of an (h, w) canvas; rolled into place
        eta_canvas = jnp.zeros((h, w), x.dtype).at[:s, :s].set(jnp.asarray(eta_np, x.dtype))

        def body(carry, key):
            x_adv, loss_best, margin, queries = carry
            k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
            vh = jax.random.randint(k1, (b,), 0, h - s + 1)
            vw = jax.random.randint(k2, (b,), 0, w - s + 1)
            vh2 = jax.random.randint(k3, (b,), 0, h - s + 1)
            vw2 = jax.random.randint(k4, (b,), 0, w - s + 1)
            sign = jax.random.rademacher(k5, (b, c, 1, 1), dtype=x.dtype)
            transpose = jax.random.bernoulli(k6, 0.5)
            eta_c = jnp.where(transpose, eta_canvas.T, eta_canvas)

            m1 = window_mask(vh, vw, s)
            m2 = window_mask(vh2, vw2, s)
            delta_curr = x_adv - x
            norms_w1 = l2n(delta_curr * m1, (2, 3))          # (B,C,1,1)
            norms_image = l2n(delta_curr, (1, 2, 3))         # (B,1,1,1)
            mask_image = jnp.maximum(m1, m2)
            norms_windows = l2n(delta_curr * mask_image, (2, 3))

            # eta placed at (vh, vw) via per-example roll
            eta_placed = jax.vmap(
                lambda dh, dw: jnp.roll(eta_c, (dh, dw), axis=(0, 1))
            )(vh, vw)[:, None]                               # (B,1,h,w)
            new_d = eta_placed * sign + delta_curr * m1 / (norms_w1 + 1e-12)
            new_d = new_d * m1
            avail = jnp.sqrt(
                jnp.maximum(eps ** 2 - norms_image ** 2, 0.0) / c
                + norms_windows ** 2
            )                                                 # (B,C,1,1)
            new_d = new_d / (l2n(new_d * m1, (2, 3)) + 1e-12) * avail
            delta_new = delta_curr * (1 - m2)
            delta_new = delta_new * (1 - m1) + new_d * m1
            x_cand = jnp.clip(x + normalize_full(delta_new) * eps, 0.0, 1.0)

            cand_margin = margin_loss(logits_fn(x_cand), y)
            active = margin >= 0.0
            improved = (cand_margin < loss_best) & active
            imx = improved[:, None, None, None]
            x_adv = jnp.where(imx, x_cand, x_adv)
            loss_best = jnp.where(improved, cand_margin, loss_best)
            margin = jnp.where(improved, cand_margin, margin)
            queries = queries + active.astype(jnp.int32)
            return (x_adv, loss_best, margin, queries), None

        return body

    sides = _l2_sides(n_queries, n_fts, c, h, w, p_init, rescale_schedule)
    carry = (x_adv, loss_best, margin, queries)
    it = 0
    while it < len(sides):
        s = sides[it]
        seg_end = it
        while seg_end < len(sides) and sides[seg_end] == s:
            seg_end += 1
        keys = jax.random.split(jax.random.fold_in(rng, it), seg_end - it)
        carry = jax.lax.scan(make_body(s, _eta(s)), carry, keys)[0]
        it = seg_end
        if bool(jnp.all(carry[2] < 0.0)):
            break

    x_adv, _, margin, queries = carry
    return SquareResult(x_adv=x_adv, margin=margin, n_queries=queries)


def _eta_l1_rectangles(x: int, y: int) -> "np.ndarray":
    """L1 ring pattern: 1/(counter+1)^4 rings, L1-normalized
    (reference square.py:160-168)."""
    import numpy as np

    delta = np.zeros((x, y), np.float32)
    x_c, y_c = x // 2 + 1, y // 2 + 1
    c2 = [x_c - 1, y_c - 1]
    for counter in range(0, max(x_c, y_c)):
        delta[
            max(c2[0], 0): min(c2[0] + 2 * counter + 1, x),
            max(0, c2[1]): min(c2[1] + 2 * counter + 1, y),
        ] += 1.0 / (counter + 1) ** 4
        c2[0] -= 1
        c2[1] -= 1
    return delta / np.abs(delta).sum()


def _eta_l1(s: int) -> "np.ndarray":
    import numpy as np

    delta = np.zeros((s, s), np.float32)
    delta[: s // 2] = _eta_l1_rectangles(s // 2, s)
    delta[s // 2:] = -_eta_l1_rectangles(s - s // 2, s)
    return delta / np.abs(delta).sum()


def square_attack_l1(
    logits_fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    y: jax.Array,
    *,
    eps: float,
    n_queries: int = 5000,
    p_init: float = 0.8,
    rng: Optional[jax.Array] = None,
    rescale_schedule: bool = True,
) -> SquareResult:
    """L1 Square Attack (reference square.py:422-527): bipolar L1 eta squares
    with mass-budget redistribution and sorted-cumsum L1-ball projection."""
    import numpy as np

    from robustvlm_tpu.ops.projections import l1_ball_projection

    from robustvlm_tpu.attacks._validate import check_image_range

    check_image_range(x)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b, c, h, w = x.shape
    n_fts = c * h * w
    eps_eff = eps * (1.0 - 1e-6)

    def l1n(t, axes, keepdims=True):
        return jnp.sum(jnp.abs(t), axis=axes, keepdims=keepdims)

    # ---- init: tiled eta grid with per-(b,c,tile) signs, L1-ball projected
    k_init, rng = jax.random.split(rng)
    s0 = max(h // 5, 1)
    sp = (h - s0 * 5) // 2 if h >= 5 * s0 else 0
    delta = _tiled_init_delta(k_init, b, c, h, w, s0, sp, _eta_l1(s0), x.dtype)
    x_adv = x + delta + l1_ball_projection(x, delta, eps_eff)
    margin = margin_loss(logits_fn(x_adv), y)
    loss_best = margin
    queries = jnp.ones((b,), jnp.int32)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def window_mask(vh, vw, s):
        in_rows = (row_idx[None] >= vh[:, None, None]) & (
            row_idx[None] < vh[:, None, None] + s
        )
        in_cols = (col_idx[None] >= vw[:, None, None]) & (
            col_idx[None] < vw[:, None, None] + s
        )
        return (in_rows & in_cols)[:, None].astype(x.dtype)

    def make_body(s: int, eta_np):
        eta_canvas = jnp.zeros((h, w), x.dtype).at[:s, :s].set(
            jnp.asarray(eta_np, x.dtype)
        )

        def body(carry, key):
            x_adv, loss_best, margin, queries = carry
            k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
            vh = jax.random.randint(k1, (b,), 0, h - s + 1)
            vw = jax.random.randint(k2, (b,), 0, w - s + 1)
            vh2 = jax.random.randint(k3, (b,), 0, h - s + 1)
            vw2 = jax.random.randint(k4, (b,), 0, w - s + 1)
            sign = jax.random.rademacher(k5, (b, c, 1, 1), dtype=x.dtype)
            transpose = jax.random.bernoulli(k6, 0.5)
            eta_c = jnp.where(transpose, eta_canvas.T, eta_canvas)

            m1 = window_mask(vh, vw, s)
            m2 = window_mask(vh2, vw2, s)
            delta_curr = x_adv - x
            norms_w1 = l1n(delta_curr * m1, (2, 3))
            norms_image = l1n(delta_curr, (1, 2, 3))
            mask_image = jnp.maximum(m1, m2)
            norms_windows = l1n(delta_curr * mask_image, (2, 3))

            eta_placed = jax.vmap(
                lambda dh, dw: jnp.roll(eta_c, (dh, dw), axis=(0, 1))
            )(vh, vw)[:, None]
            new_d = eta_placed * sign + delta_curr * m1 / (norms_w1 + 1e-12)
            new_d = new_d * m1
            avail = (
                jnp.maximum(eps - norms_image, 0.0) / c + norms_windows
            ) * c
            new_d = new_d / (l1n(new_d * m1, (2, 3)) + 1e-12) * avail
            delta_new = delta_curr * (1 - m2)
            delta_new = delta_new * (1 - m1) + new_d * m1
            x_cand = x + delta_new + l1_ball_projection(x, delta_new, eps_eff)

            cand_margin = margin_loss(logits_fn(x_cand), y)
            active = margin >= 0.0
            improved = (cand_margin < loss_best) & active
            imx = improved[:, None, None, None]
            x_adv = jnp.where(imx, x_cand, x_adv)
            loss_best = jnp.where(improved, cand_margin, loss_best)
            margin = jnp.where(improved, cand_margin, margin)
            queries = queries + active.astype(jnp.int32)
            return (x_adv, loss_best, margin, queries), None

        return body

    sides = _l2_sides(n_queries, n_fts, c, h, w, p_init, rescale_schedule)
    carry = (x_adv, loss_best, margin, queries)
    it = 0
    while it < len(sides):
        s = sides[it]
        seg_end = it
        while seg_end < len(sides) and sides[seg_end] == s:
            seg_end += 1
        keys = jax.random.split(jax.random.fold_in(rng, 700 + it), seg_end - it)
        carry = jax.lax.scan(make_body(s, _eta_l1(s)), carry, keys)[0]
        it = seg_end
        if bool(jnp.all(carry[2] < 0.0)):
            break

    x_adv, _, margin, queries = carry
    return SquareResult(x_adv=x_adv, margin=margin, n_queries=queries)
