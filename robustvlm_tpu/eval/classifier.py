"""Zero-shot classification wrappers (the threat-model adapter layer, L2).

Equivalent of reference CLIP_eval/clip_robustbench.py:50-69 (ClassificationModel)
and the text-classifier builders (:184-227): logits are
`logit_scale * normalize(encode_image(normalize_clip(resize(x)))) @ T` with the
(optionally template-ensembled) class text embedding matrix T of shape (D, C).

Everything returns *pure jitted closures over [0,1] pixel inputs*, preserving
the reference invariant that attacks see raw pixels and differentiation flows
through resize + normalization.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from robustvlm_tpu.models.clip.model import CLIPConfig, encode_image, encode_text
from robustvlm_tpu.ops.image import normalize_clip, resize_bicubic

STD_TEMPLATE = "This is a photo of a {}"


def build_text_classifier(
    params,
    cfg: CLIPConfig,
    tokenize: Callable[[Sequence[str]], jax.Array],
    classnames: Sequence[str],
    templates: Optional[Sequence[str]] = None,
    chunk_size: int = 500,
) -> jax.Array:
    """(D, C) column-normalized class embedding matrix.

    templates=None -> the std single template; otherwise the 80-template
    ensemble: per class, encode all templates, mean of normalized embeddings,
    re-normalized (reference clip_robustbench.py:209-222).
    """
    # params passed as jit ARGUMENTS (closure-captured trees become HLO
    # constants: huge compiles + cache misses on remote backends)
    enc = jax.jit(
        lambda p, t: encode_text(p, t, cfg, normalize=True)
    )
    if templates is None:
        texts = [STD_TEMPLATE.format(c) for c in classnames]
        embs = []
        for i in range(0, len(texts), chunk_size):
            chunk = texts[i : i + chunk_size]
            if len(chunk) < chunk_size and len(texts) > chunk_size:
                pad = chunk_size - len(chunk)
                toks = tokenize(chunk + [chunk[-1]] * pad)
                embs.append(enc(params, toks)[: len(chunk)])
            else:
                embs.append(enc(params, tokenize(chunk)))
        mat = jnp.concatenate(embs, axis=0).T  # (D, C)
    else:
        from robustvlm_tpu.benchmark.templates import format_prompts

        cols = []
        for c in classnames:
            toks = tokenize(format_prompts(templates, c))
            e = enc(params, toks).mean(axis=0)
            cols.append(e / jnp.linalg.norm(e))
        mat = jnp.stack(cols, axis=1)
    return mat


def make_zero_shot_classifier(
    params,
    cfg: CLIPConfig,
    text_embedding: jax.Array,
    *,
    logit_scale: Optional[float] = 100.0,
    resize_to: Optional[int] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    jit: bool = True,
) -> Callable[[jax.Array], jax.Array]:
    """fn(x01 NCHW) -> (B, C) logits; normalization/resize inside the closure.

    logit_scale=None multiplies by exp(params['logit_scale']) like the
    reference's `logit_scale=True` path; a float multiplies the logits
    directly (1.0 leaves them unscaled; 0 would ZERO them, so it is
    rejected).
    """
    if logit_scale == 0:
        raise ValueError("logit_scale=0 zeroes all logits; use 1.0 for unscaled")
    if logit_scale is None:
        scale = jnp.exp(params["logit_scale"])
    else:
        scale = jnp.asarray(logit_scale, jnp.float32)

    def logits_inner(p, temb, sc, x):
        if resize_to is not None:
            x = resize_bicubic(x, resize_to)
        e = encode_image(
            p,
            normalize_clip(x),
            cfg,
            normalize=True,
            compute_dtype=compute_dtype,
            remat=remat,
        )
        return (e @ temb) * sc

    # params/text matrix are jit ARGUMENTS bound at call time — closures
    # over param trees embed them as HLO constants (slow compiles, cache
    # misses); the public interface stays a pixels-only closure, with the
    # unjitted pure fn + bound tree exposed for the attacks' bound-model
    # protocol (attacks/apgd.py)
    inner = jax.jit(logits_inner) if jit else logits_inner

    def fn(x):
        return inner(params, text_embedding, scale, x)

    fn.pure = logits_inner
    fn.bound_args = (params, text_embedding, scale)
    return fn


def make_embedding_fn(
    params,
    cfg: CLIPConfig,
    *,
    output_normalize: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """fn(x01) -> (B, D) embedding — the ClipVisionModel wrapper (reference
    adversarial_training_clip.py:246-257) used by FARE/TeCoA training.

    Exposes the bound-model protocol (.pure/.bound_args) and jits with
    params as ARGUMENTS — do NOT wrap the returned fn in jax.jit yourself:
    that would bake the param tree into the program as HLO constants
    (CLAUDE.md: hundred-MB programs, remote-compile rejections)."""

    def pure(p, x):
        return encode_image(
            p,
            normalize_clip(x),
            cfg,
            normalize=output_normalize,
            compute_dtype=compute_dtype,
            remat=remat,
        )

    jitted = jax.jit(pure)

    def fn(x):
        return jitted(params, x)

    fn.pure = pure
    fn.bound_args = (params,)
    return fn


def accuracy(logits_fn, x, y, batch_size: int = 256) -> float:
    """Batched top-1 accuracy (reference eval_utils.py:88-112)."""
    n = x.shape[0]
    correct = 0
    for i in range(0, n, batch_size):
        out = logits_fn(x[i : i + batch_size])
        correct += int(jnp.sum(jnp.argmax(out, -1) == y[i : i + batch_size]))
    return correct / n
