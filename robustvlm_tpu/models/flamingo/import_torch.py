"""OpenFlamingo checkpoint import.

The published OpenFlamingo-9B checkpoint stores only the TRAINED modules
(reference factory.py:95-104 freeze policy): the perceiver, the gated
cross-attention layers, and the extended token embeddings; the frozen CLIP
visual tower and MPT decoder load from their own upstream checkpoints
(reference of_eval_model_adv.py:54-87 assembles all three, optionally
overlaying a robustified visual ckpt).

Key layouts handled:
- perceiver.latents / perceiver.layers.{d}.0.* (attention) /
  perceiver.layers.{d}.1.* (feed-forward) / perceiver.norm.*
- lang_encoder.gated_cross_attn_layers.{j}.{attn,ff,attn_gate,ff_gate}
  (one entry per xattn layer, j = layer_idx // every)
- lang_encoder.transformer.wte.weight — extended vocab embedding
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.import_torch import _to_np, import_visual_state_dict
from robustvlm_tpu.models.flamingo.model import FlamingoConfig
from robustvlm_tpu.models.mpt.import_torch import import_mpt_state_dict


def import_perceiver(sd: Mapping[str, Any], cfg: FlamingoConfig,
                     prefix: str = "perceiver.") -> Dict:
    g = lambda k: _to_np(sd[prefix + k])
    d = cfg.resampler_depth

    def stacked(fmt, transpose=True):
        return jnp.asarray(
            np.stack(
                [
                    _to_np(sd[prefix + fmt.format(i=i)]).T
                    if transpose
                    else _to_np(sd[prefix + fmt.format(i=i)])
                    for i in range(d)
                ]
            )
        )

    return {
        "latents": jnp.asarray(g("latents")),
        "layers": {
            "attn": {
                "ln_media_g": stacked("layers.{i}.0.norm_media.weight", False),
                "ln_media_b": stacked("layers.{i}.0.norm_media.bias", False),
                "ln_lat_g": stacked("layers.{i}.0.norm_latents.weight", False),
                "ln_lat_b": stacked("layers.{i}.0.norm_latents.bias", False),
                "to_q": stacked("layers.{i}.0.to_q.weight"),
                "to_kv": stacked("layers.{i}.0.to_kv.weight"),
                "to_out": stacked("layers.{i}.0.to_out.weight"),
            },
            "ff": {
                "ln_g": stacked("layers.{i}.1.0.weight", False),
                "ln_b": stacked("layers.{i}.1.0.bias", False),
                "w1": stacked("layers.{i}.1.1.weight"),
                "w2": stacked("layers.{i}.1.3.weight"),
            },
        },
        "norm_g": jnp.asarray(g("norm.weight")),
        "norm_b": jnp.asarray(g("norm.bias")),
    }


def import_xattn(sd: Mapping[str, Any], cfg: FlamingoConfig,
                 prefix: str = "lang_encoder.gated_cross_attn_layers.") -> Dict:
    n = cfg.n_xattn

    def stacked(fmt, transpose=True, squeeze=False):
        arrs = []
        for i in range(n):
            a = _to_np(sd[prefix + fmt.format(i=i)])
            if squeeze:
                a = a.reshape(())
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs))

    return {
        "attn": {
            "ln_g": stacked("{i}.attn.norm.weight", False),
            "ln_b": stacked("{i}.attn.norm.bias", False),
            "to_q": stacked("{i}.attn.to_q.weight"),
            "to_kv": stacked("{i}.attn.to_kv.weight"),
            "to_out": stacked("{i}.attn.to_out.weight"),
        },
        "ff": {
            "ln_g": stacked("{i}.ff.0.weight", False),
            "ln_b": stacked("{i}.ff.0.bias", False),
            "w1": stacked("{i}.ff.1.weight"),
            "w2": stacked("{i}.ff.3.weight"),
        },
        "attn_gate": stacked("{i}.attn_gate", False, squeeze=True),
        "ff_gate": stacked("{i}.ff_gate", False, squeeze=True),
    }


def import_flamingo_checkpoint(
    of_sd: Mapping[str, Any],
    cfg: FlamingoConfig,
    *,
    mpt_sd: Mapping[str, Any],
    visual_sd: Mapping[str, Any],
) -> Dict:
    """Assemble the full param tree from the three source checkpoints."""
    mpt = import_mpt_state_dict(mpt_sd, cfg.mpt)
    # extended embedding (vocab + <image>/<|endofchunk|>) from the OF ckpt
    wte_key = next(
        (k for k in of_sd if k.endswith("transformer.wte.weight")), None
    )
    if wte_key is not None:
        wte = jnp.asarray(_to_np(of_sd[wte_key]))
        mpt = dict(mpt, tok_embedding=wte)
    visual = import_visual_state_dict(visual_sd, cfg.vision)
    return {
        "vision": visual,
        "perceiver": import_perceiver(of_sd, cfg),
        "xattn": import_xattn(of_sd, cfg),
        "mpt": mpt,
    }


def load_flamingo_checkpoint(
    of_path: str, cfg: FlamingoConfig, *, mpt_path: str, visual_path: str,
    robust_visual_path: Optional[str] = None,
) -> Dict:
    from robustvlm_tpu.models.llama.import_torch import _load_any

    of_sd = _load_any(of_path)
    visual = _load_any(robust_visual_path or visual_path)
    if "vision_encoder_state_dict" in visual:
        visual = visual["vision_encoder_state_dict"]
    # full open_clip CLIP ckpt -> take the visual subtree
    if any(k.startswith("visual.") for k in visual):
        visual = {k[len("visual."):]: v for k, v in visual.items()
                  if k.startswith("visual.")}
    return import_flamingo_checkpoint(
        of_sd, cfg, mpt_sd=_load_any(mpt_path), visual_sd=visual
    )
