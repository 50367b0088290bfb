"""Linear probe evaluation: frozen features + logistic-regression head.

Equivalent of reference CLIP_benchmark/clip_benchmark/metrics/linear_probe.py
(feature caching + torch logistic head with cosine schedule). TPU-first: the
whole probe train loop is one jitted optax step over cached features; feature
extraction is a batched jitted forward.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robustvlm_tpu.train.schedules import cosine_warmup_lr


def extract_features(
    embed_fn: Callable[[jax.Array], jax.Array],
    data: Iterable[Tuple[np.ndarray, np.ndarray]],
    cache_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the frozen encoder over a dataset; optionally cache to .npz
    (the reference caches per-split feature tensors on disk)."""
    if cache_path:
        try:
            z = np.load(cache_path)
            return z["features"], z["labels"]
        except (FileNotFoundError, OSError):
            pass
    feats, labels = [], []
    for xb, yb in data:
        feats.append(np.asarray(embed_fn(jnp.asarray(xb))))
        labels.append(np.asarray(yb))
    f, y = np.concatenate(feats), np.concatenate(labels)
    if cache_path:
        np.savez(cache_path, features=f, labels=y)
    return f, y


def train_linear_probe(
    features: np.ndarray,
    labels: np.ndarray,
    n_classes: int,
    *,
    lr: float = 0.1,
    epochs: int = 10,
    batch_size: int = 256,
    wd: float = 0.0,
    seed: int = 0,
) -> Dict:
    """AdamW logistic regression on (N, D) features; returns {'w','b'}."""
    d = features.shape[1]
    n = features.shape[0]
    steps_per_epoch = max(n // batch_size, 1)
    total = epochs * steps_per_epoch
    params = {
        "w": jnp.zeros((d, n_classes), jnp.float32),
        "b": jnp.zeros((n_classes,), jnp.float32),
    }
    opt = optax.adamw(cosine_warmup_lr(lr, min(total // 20, 100), total), weight_decay=wd)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = xb @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    f = jnp.asarray(features, jnp.float32)
    y = jnp.asarray(labels)
    for _ in range(epochs):
        order = rng.permutation(n)
        for b in range(steps_per_epoch):
            idx = order[b * batch_size : (b + 1) * batch_size]
            params, opt_state, _ = step(params, opt_state, f[idx], y[idx])
    return params


def evaluate_linear_probe(
    embed_fn: Callable,
    train_data,
    test_data,
    n_classes: int,
    *,
    cache_dir: Optional[str] = None,
    **train_kw,
) -> Dict[str, float]:
    f_tr, y_tr = extract_features(
        embed_fn, train_data,
        cache_path=f"{cache_dir}/train.npz" if cache_dir else None,
    )
    f_te, y_te = extract_features(
        embed_fn, test_data,
        cache_path=f"{cache_dir}/test.npz" if cache_dir else None,
    )
    probe = train_linear_probe(f_tr, y_tr, n_classes, **train_kw)
    logits = np.asarray(jnp.asarray(f_te) @ probe["w"] + probe["b"])
    acc1 = float((logits.argmax(-1) == y_te).mean())
    return {"lp_acc1": acc1}
