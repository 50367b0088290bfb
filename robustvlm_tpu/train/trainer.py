"""Adversarial fine-tuning of the CLIP vision encoder (TeCoA / FARE).

Behavioral parity target: reference train/adversarial_training_clip.py —
  per step: frozen-original embedding (no grad) -> inner PGD/APGD attack on the
  current model (FARE: squared-L2 to the frozen embedding; TeCoA: CE against
  the precomputed normalized text-label embeddings at logit scale 100) ->
  clean + adversarial outer forward -> loss (with optional clean-loss mixing
  `clean_weight` and TRADES variant) -> AdamW/SGD + cosine-warmup schedule.

TPU-first: the ENTIRE training step — frozen fwd, 10-iteration attack scan
(each iteration a fused fwd+bwd), two outer fwds, one outer bwd, optimizer —
is a single jitted function. Data parallelism is NamedSharding on the batch
axis (per-example attack state shards with it); parameters replicate across
'data' and can shard over 'fsdp'/'model' (parallel/mesh.py). The reference's
DataParallel scatter/gather per forward disappears entirely.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from robustvlm_tpu.attacks.apgd import apgd_attack
from robustvlm_tpu.attacks.pgd import pgd_attack
from robustvlm_tpu.models.clip.model import CLIPConfig, encode_image
from robustvlm_tpu.ops.image import normalize_clip
from robustvlm_tpu.ops.losses import ce_loss, l2_embedding_loss
from robustvlm_tpu.train.schedules import cosine_warmup_lr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirror of the reference training flag set
    (adversarial_training_clip.py:31-64), eps already in image-space units."""

    loss: str = "l2"            # outer loss: 'l2' (FARE) or 'ce' (TeCoA)
    inner_loss: str = "l2"      # attack loss
    loss_clean: str = "none"
    clean_weight: float = 0.0
    trades: bool = False
    attack: str = "apgd"        # 'pgd' | 'apgd' | 'none'
    norm: str = "linf"
    eps: float = 4.0 / 255.0
    iterations_adv: int = 10
    stepsize_adv: float = 1.0 / 255.0  # pgd only
    opt: str = "adamw"
    lr: float = 1e-5
    wd: float = 1e-4
    momentum_sgd: float = 0.9
    warmup: int = 1400
    steps: int = 20000
    output_normalize: bool = False
    compute_dtype: str = "float32"   # 'bfloat16' for throughput
    remat: bool = False
    # micro-batching: split the batch into `grad_accum` chunks, run the
    # inner attack + backward per chunk in a lax.scan and average the
    # gradients before ONE optimizer update. Numerically equivalent to the
    # full-batch step for equal chunks (all losses are batch means), it
    # trades nothing for (a) an HBM ceiling independent of global batch and
    # (b) throughput: measured on v5e, per-example fwd+bwd cost RISES with
    # batch (b8 302 vs b128 ~190 example-steps/s — see bench.py), so small
    # chunks are faster even before memory pressure.
    grad_accum: int = 1


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = cosine_warmup_lr(cfg.lr, cfg.warmup, cfg.steps)
    if cfg.opt == "adamw":
        return optax.adamw(schedule, weight_decay=cfg.wd)
    if cfg.opt == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.wd),
            optax.sgd(schedule, momentum=cfg.momentum_sgd),
        )
    raise ValueError(f"unknown optimizer: {cfg.opt}")


def _compute_loss(
    loss_str: str,
    embedding: jax.Array,
    targets: Optional[jax.Array],
    embedding_orig: Optional[jax.Array],
    text_embedding: Optional[jax.Array],
    reduction: str = "mean",
    logit_scale: float = 100.0,
) -> jax.Array:
    """Reference compute_loss (adversarial_training_clip.py:495-507)."""
    if loss_str == "l2":
        return l2_embedding_loss(embedding, embedding_orig, reduction=reduction)
    if loss_str == "ce":
        return ce_loss(
            embedding @ (logit_scale * text_embedding), targets, reduction=reduction
        )
    raise ValueError(f"loss {loss_str} not supported")


def make_train_step(
    cfg: TrainConfig,
    clip_cfg: CLIPConfig,
    text_embedding: Optional[jax.Array] = None,
) -> Callable:
    """Build the jitted train step.

    Returns step_fn(params, params_orig, opt_state, x, y, rng, step) ->
    (params, opt_state, metrics). `text_embedding` is the (D, n_classes)
    normalized class-text matrix (required for TeCoA / eval metrics).
    """
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    optimizer = make_optimizer(cfg)

    def embed(params, x01, output_normalize):
        return encode_image(
            params,
            normalize_clip(x01),
            clip_cfg,
            normalize=output_normalize,
            compute_dtype=compute_dtype,
            remat=cfg.remat,
        )

    def inner_attack(params, x, y, emb_orig, rng):
        """The reference's ComputeLossWrapper + pgd/apgd dispatch
        (adversarial_training_clip.py:299-336)."""
        frozen = jax.lax.stop_gradient(params)

        if cfg.attack == "none":
            return x

        if cfg.attack == "pgd":
            def loss_fn(xa):
                emb = embed(frozen, xa, cfg.output_normalize)
                return _compute_loss(
                    cfg.inner_loss, emb, y, emb_orig, text_embedding,
                    reduction="mean",
                )

            init = jax.random.uniform(
                rng, x.shape, x.dtype, minval=-cfg.eps, maxval=cfg.eps
            )
            return pgd_attack(
                loss_fn, x, eps=cfg.eps, stepsize=cfg.stepsize_adv,
                iterations=cfg.iterations_adv, norm=cfg.norm, mode="max",
                perturbation=init,
            )

        if cfg.attack == "apgd":
            # apgd always applies output normalization in the inner forward
            # (reference adversarial_training_clip.py:322-333, apgd_train.py:181)
            def model_fn(xa):
                return embed(frozen, xa, True)

            def criterion(out, yy):
                return _compute_loss(
                    cfg.inner_loss, out, yy, emb_orig, text_embedding,
                    reduction="none",
                )

            res = apgd_attack(
                model_fn, x, y if cfg.inner_loss == "ce" else None,
                criterion=criterion, eps=cfg.eps, n_iter=cfg.iterations_adv,
                norm=cfg.norm,
            )
            return res.x_best_adv

        raise ValueError(f"unknown attack: {cfg.attack}")

    def chunk_grads(params, params_orig, x, y, rng):
        """Attack + backward for one (micro-)batch -> (grads, metrics)."""
        emb_orig = jax.lax.stop_gradient(
            embed(params_orig, x, cfg.output_normalize)
        )
        x_adv = jax.lax.stop_gradient(inner_attack(params, x, y, emb_orig, rng))

        def outer_loss(p):
            emb_clean = embed(p, x, cfg.output_normalize)
            emb_adv = embed(p, x_adv, cfg.output_normalize)
            if cfg.clean_weight > 0.0:
                l_clean = _compute_loss(
                    cfg.loss_clean, emb_clean, y, emb_orig, None
                )
            else:
                l_clean = 0.0
            # TRADES: regress adv embedding to the *clean* embedding of the
            # current model instead of the frozen original (:352-358)
            anchor = (
                jax.lax.stop_gradient(emb_clean) if cfg.trades else emb_orig
            )
            l_adv = _compute_loss(cfg.loss, emb_adv, y, anchor, text_embedding)
            total = cfg.clean_weight * l_clean + (1.0 - cfg.clean_weight) * l_adv
            return total, (emb_clean, emb_adv, l_adv)

        (loss_total, (emb_clean, emb_adv, l_adv)), grads = jax.value_and_grad(
            outer_loss, has_aux=True
        )(params)

        def cos(a, b):
            an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-12)
            bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-12)
            return jnp.mean(jnp.sum(an * bn, axis=-1))

        metrics = {
            "loss": l_adv,
            "loss_total": loss_total,
            "cos_sim": cos(emb_adv, emb_orig),
            "cos_sim_clean": cos(emb_clean, emb_orig),
        }
        if text_embedding is not None and y is not None:
            emb_adv_n = emb_adv / (
                jnp.linalg.norm(emb_adv, axis=-1, keepdims=True) + 1e-12
            )
            emb_clean_n = emb_clean / (
                jnp.linalg.norm(emb_clean, axis=-1, keepdims=True) + 1e-12
            )
            metrics["racc"] = jnp.mean(
                (jnp.argmax(emb_adv_n @ text_embedding, -1) == y).astype(jnp.float32)
            )
            metrics["acc"] = jnp.mean(
                (jnp.argmax(emb_clean_n @ text_embedding, -1) == y).astype(jnp.float32)
            )
        return grads, metrics

    def train_step(params, params_orig, opt_state, x, y, rng, step):
        k = cfg.grad_accum
        if k <= 1:
            grads, metrics = chunk_grads(params, params_orig, x, y, rng)
        else:
            b = x.shape[0]
            if b % k:
                raise ValueError(f"batch {b} not divisible by grad_accum {k}")
            xs = dict(
                x=x.reshape(k, b // k, *x.shape[1:]),
                y=None if y is None else y.reshape(k, b // k),
                rng=jax.random.split(rng, k),
            )

            def body(acc, ch):
                g, m = chunk_grads(params, params_orig, ch["x"], ch["y"],
                                   ch["rng"])
                return jax.tree.map(jnp.add, acc, (g, m)), None

            g0 = jax.tree.map(jnp.zeros_like, params)
            m0 = jax.eval_shape(
                lambda: chunk_grads(
                    params, params_orig, xs["x"][0], None if y is None else
                    xs["y"][0], xs["rng"][0],
                )[1]
            )
            m0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m0)
            if xs["y"] is None:
                xs.pop("y")

                def body(acc, ch):  # noqa: F811 - y-less variant
                    g, m = chunk_grads(
                        params, params_orig, ch["x"], None, ch["rng"]
                    )
                    return jax.tree.map(jnp.add, acc, (g, m)), None

            (grads, metrics), _ = jax.lax.scan(body, (g0, m0), xs)
            # equal chunks: mean-of-chunk-means == batch mean for every
            # metric and for the gradients of the mean losses
            grads, metrics = jax.tree.map(lambda a: a / k, (grads, metrics))

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def make_eval_step(
    cfg: TrainConfig, clip_cfg: CLIPConfig, text_embedding: jax.Array,
    n_iter: int = 50, initial_stepsize: Optional[float] = None,
):
    """Periodic supervised APGD-50 validation (reference
    adversarial_training_clip.py:390-425): racc/acc/cos-sim on a val batch."""

    def eval_step(params, x, y):
        def model_fn(xa):
            e = encode_image(
                params, normalize_clip(xa), clip_cfg, normalize=True
            )
            return e @ (100.0 * text_embedding)

        res = apgd_attack(
            model_fn, x, y,
            criterion=lambda o, yy: ce_loss(o, yy, reduction="none"),
            eps=cfg.eps, n_iter=n_iter, norm=cfg.norm,
            initial_stepsize=initial_stepsize,
        )
        emb_adv = encode_image(
            params, normalize_clip(res.x_best_adv), clip_cfg, normalize=True
        )
        emb = encode_image(params, normalize_clip(x), clip_cfg, normalize=True)
        racc = jnp.mean(
            (jnp.argmax(emb_adv @ text_embedding, -1) == y).astype(jnp.float32)
        )
        acc = jnp.mean(
            (jnp.argmax(emb @ text_embedding, -1) == y).astype(jnp.float32)
        )
        cos = jnp.mean(jnp.sum(emb_adv * emb, axis=-1))
        return {"eval/racc": racc, "eval/acc": acc, "eval/cos_sim": cos}

    return eval_step
