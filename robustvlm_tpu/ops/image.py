"""On-device image preprocessing: CLIP normalization and bicubic resize.

Threat-model contract (reference train/adversarial_training_clip.py:106-116,
CLIP_eval/clip_robustbench.py:60-69): attacks operate on raw [0,1] pixels; the
CLIP mean/std normalize — and for CIFAR the 32->224 bicubic resize
(clip_robustbench.py:105-114, antialias=False) — happen *inside* the model
forward so they are differentiated through.

TPU-first: resize is expressed as two small dense matmuls (separable cubic
interpolation weights precomputed at trace time), which XLA maps straight onto
the MXU — no gather ops in the hot attack loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization constants
OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_clip(x: jax.Array, mean=OPENAI_MEAN, std=OPENAI_STD) -> jax.Array:
    """(x - mean) / std over the channel axis; x is NCHW in [0,1]."""
    m = jnp.asarray(mean, x.dtype).reshape(1, -1, 1, 1)
    s = jnp.asarray(std, x.dtype).reshape(1, -1, 1, 1)
    return (x - m) / s


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (a=-0.75, the torch/OpenCV convention)."""
    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    out[m1] = ((a + 2) * t[m1] - (a + 3)) * t[m1] * t[m1] + 1
    m2 = (t > 1) & (t < 2)
    out[m2] = a * (((t[m2] - 5) * t[m2] + 8) * t[m2] - 4)
    return out


@functools.lru_cache(maxsize=32)
def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """(src, dst) interpolation weights for 1-D bicubic resize, antialias=False,
    half-pixel centers (matches torchvision tensor-path InterpolationMode.BICUBIC
    with antialias=False, which the reference uses for the CIFAR resizer)."""
    scale = src / dst
    # half-pixel sample positions in source coordinates
    pos = (np.arange(dst) + 0.5) * scale - 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    mat = np.zeros((src, dst), dtype=np.float32)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, src - 1)
        w = _cubic_kernel(frac - tap)
        np.add.at(mat, (idx, np.arange(dst)), w.astype(np.float32))
    # kernel taps already sum to 1 for the cubic family; no renorm (antialias off)
    return mat


def resize_bicubic(x: jax.Array, size: int) -> jax.Array:
    """Bicubic resize of NCHW images to (size, size) via two matmuls.

    Differentiable, MXU-friendly, and numerically matching torchvision's
    non-antialiased tensor bicubic (the reference CIFAR eval path,
    clip_robustbench.py:109-114) to float tolerance.
    """
    b, c, h, w = x.shape
    if h == size and w == size:
        return x
    mh = jnp.asarray(_resize_matrix(h, size), x.dtype)  # (h, size)
    mw = jnp.asarray(_resize_matrix(w, size), x.dtype)  # (w, size)
    # rows: (b,c,h,w) x (h,size) -> (b,c,size,w); cols likewise
    y = jnp.einsum("bchw,hs->bcsw", x, mh)
    return jnp.einsum("bcsw,wt->bcst", y, mw)


def center_crop(x: jax.Array, size: int) -> jax.Array:
    """Center crop NCHW to (size, size) (host-side preprocessing helper)."""
    h, w = x.shape[-2:]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top : top + size, left : left + size]
