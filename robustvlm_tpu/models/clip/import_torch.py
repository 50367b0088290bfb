"""PyTorch <-> JAX CLIP weight conversion.

Imports the published checkpoint families the reference consumes
(SURVEY.md §5 "Checkpoint / resume", reference CLIP_eval/eval_utils.py:30-61):
  - full open_clip/openai CLIP state dicts ("visual.conv1.weight", ...),
  - visual-only fine-tuned checkpoints (FARE: `model.visual.state_dict()`,
    keys like "conv1.weight"),
  - TeCoA-style dicts nested under "vision_encoder_state_dict",
and exports visual-only state dicts in the same layout so checkpoints remain
interchangeable with the reference ecosystem. Also supports beta-interpolation
of two checkpoints (reference eval_utils.py:18-27).

Linear weights are transposed once at import (torch stores (out, in); we store
(in, out) for `x @ w`), and per-layer block tensors are stacked along a leading
layer axis for the `lax.scan` transformer.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.model import CLIPConfig, Params


def _to_np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().cpu().float().numpy()
    except ImportError:
        pass
    return np.asarray(v)


def _stack_blocks(sd: Mapping[str, np.ndarray], prefix: str, n_layers: int) -> Dict:
    def stacked(fmt, transpose=False):
        arrs = []
        for i in range(n_layers):
            a = _to_np(sd[fmt.format(i=i)])
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs))

    rb = prefix + "transformer.resblocks.{i}."
    return {
        "ln_1": {
            "g": stacked(rb + "ln_1.weight"),
            "b": stacked(rb + "ln_1.bias"),
        },
        "attn": {
            "qkv_w": stacked(rb + "attn.in_proj_weight", transpose=True),
            "qkv_b": stacked(rb + "attn.in_proj_bias"),
            "out_w": stacked(rb + "attn.out_proj.weight", transpose=True),
            "out_b": stacked(rb + "attn.out_proj.bias"),
        },
        "ln_2": {
            "g": stacked(rb + "ln_2.weight"),
            "b": stacked(rb + "ln_2.bias"),
        },
        "mlp": {
            "fc_w": stacked(rb + "mlp.c_fc.weight", transpose=True),
            "fc_b": stacked(rb + "mlp.c_fc.bias"),
            "proj_w": stacked(rb + "mlp.c_proj.weight", transpose=True),
            "proj_b": stacked(rb + "mlp.c_proj.bias"),
        },
    }


def import_visual_state_dict(
    sd: Mapping[str, Any], cfg: CLIPConfig, prefix: str = ""
) -> Dict:
    """Convert a torch visual-tower state dict (keys like `conv1.weight`)."""
    if cfg.vision_arch == "convnext":
        from robustvlm_tpu.models.clip.convnext import (
            import_convnext_state_dict,
        )

        return import_convnext_state_dict(sd, cfg.convnext, prefix)
    g = lambda k: _to_np(sd[prefix + k])
    conv = g("conv1.weight")  # (W, 3, p, p)
    w = conv.shape[0]
    return {
        "patch_embed": jnp.asarray(conv.reshape(w, -1).T),
        "class_embedding": jnp.asarray(g("class_embedding")),
        "positional_embedding": jnp.asarray(g("positional_embedding")),
        "ln_pre": {
            "g": jnp.asarray(g("ln_pre.weight")),
            "b": jnp.asarray(g("ln_pre.bias")),
        },
        "blocks": _stack_blocks(sd, prefix, cfg.vision.layers),
        "ln_post": {
            "g": jnp.asarray(g("ln_post.weight")),
            "b": jnp.asarray(g("ln_post.bias")),
        },
        "proj": jnp.asarray(g("proj")),
    }


def import_clip_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig) -> Params:
    """Convert a full open_clip/openai CLIP state dict to our param tree."""
    g = lambda k: _to_np(sd[k])
    return {
        "visual": import_visual_state_dict(sd, cfg, prefix="visual."),
        "text": {
            "token_embedding": jnp.asarray(g("token_embedding.weight")),
            "positional_embedding": jnp.asarray(g("positional_embedding")),
            "blocks": _stack_blocks(sd, "", cfg.text.layers),
            "ln_final": {
                "g": jnp.asarray(g("ln_final.weight")),
                "b": jnp.asarray(g("ln_final.bias")),
            },
            "text_projection": jnp.asarray(g("text_projection")),
        },
        "logit_scale": jnp.asarray(g("logit_scale")),
    }


def export_visual_state_dict(visual: Dict, cfg: CLIPConfig) -> Dict[str, np.ndarray]:
    """Inverse of import_visual_state_dict: produce a torch-layout state dict
    (numpy values) loadable by reference `model.visual.load_state_dict`."""
    if cfg.vision_arch == "convnext":
        from robustvlm_tpu.models.clip.convnext import (
            export_convnext_state_dict,
        )

        return export_convnext_state_dict(visual, cfg.convnext)
    p = cfg.patch_size
    w = cfg.vision.width
    out: Dict[str, np.ndarray] = {}
    out["conv1.weight"] = (
        np.asarray(visual["patch_embed"]).T.reshape(w, 3, p, p)
    )
    out["class_embedding"] = np.asarray(visual["class_embedding"])
    out["positional_embedding"] = np.asarray(visual["positional_embedding"])
    out["ln_pre.weight"] = np.asarray(visual["ln_pre"]["g"])
    out["ln_pre.bias"] = np.asarray(visual["ln_pre"]["b"])
    bl = visual["blocks"]
    for i in range(cfg.vision.layers):
        rb = f"transformer.resblocks.{i}."
        out[rb + "ln_1.weight"] = np.asarray(bl["ln_1"]["g"][i])
        out[rb + "ln_1.bias"] = np.asarray(bl["ln_1"]["b"][i])
        out[rb + "attn.in_proj_weight"] = np.asarray(bl["attn"]["qkv_w"][i]).T
        out[rb + "attn.in_proj_bias"] = np.asarray(bl["attn"]["qkv_b"][i])
        out[rb + "attn.out_proj.weight"] = np.asarray(bl["attn"]["out_w"][i]).T
        out[rb + "attn.out_proj.bias"] = np.asarray(bl["attn"]["out_b"][i])
        out[rb + "ln_2.weight"] = np.asarray(bl["ln_2"]["g"][i])
        out[rb + "ln_2.bias"] = np.asarray(bl["ln_2"]["b"][i])
        out[rb + "mlp.c_fc.weight"] = np.asarray(bl["mlp"]["fc_w"][i]).T
        out[rb + "mlp.c_fc.bias"] = np.asarray(bl["mlp"]["fc_b"][i])
        out[rb + "mlp.c_proj.weight"] = np.asarray(bl["mlp"]["proj_w"][i]).T
        out[rb + "mlp.c_proj.bias"] = np.asarray(bl["mlp"]["proj_b"][i])
    out["ln_post.weight"] = np.asarray(visual["ln_post"]["g"])
    out["ln_post.bias"] = np.asarray(visual["ln_post"]["b"])
    out["proj"] = np.asarray(visual["proj"])
    return out


def _interpolate(sd1: Mapping, sd2: Mapping, beta: float) -> Dict:
    """beta * sd1 + (1-beta) * sd2 elementwise (reference eval_utils.py:18-27)."""
    return {k: beta * _to_np(sd1[k]) + (1.0 - beta) * _to_np(sd2[k]) for k in sd1}


def load_clip_checkpoint(
    path_or_sd,
    cfg: CLIPConfig,
    base_params: Optional[Params] = None,
    beta: Optional[float] = None,
    interpolate_with=None,
) -> Params:
    """Load any reference-ecosystem checkpoint into a param tree.

    Mirrors the dispatch of reference CLIP_eval/eval_utils.py:30-61:
    - full CLIP state dicts load standalone;
    - visual-only / TeCoA dicts overlay the visual tower of `base_params`
      (typically the imported openai weights, which provide the text tower);
    - `beta` + `interpolate_with` linearly interpolates two checkpoints.
    """
    if isinstance(path_or_sd, (str,)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=False)
    else:
        sd = path_or_sd
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "vision_encoder_state_dict" in sd:  # TeCoA layout
        sd = sd["vision_encoder_state_dict"]

    if beta is not None and interpolate_with is not None:
        if isinstance(interpolate_with, str):
            import torch

            interpolate_with = torch.load(
                interpolate_with, map_location="cpu", weights_only=False
            )
            if hasattr(interpolate_with, "state_dict"):
                interpolate_with = interpolate_with.state_dict()
            if "vision_encoder_state_dict" in interpolate_with:
                interpolate_with = interpolate_with["vision_encoder_state_dict"]
        sd = _interpolate(sd, interpolate_with, beta)

    if "visual.conv1.weight" in sd or "visual.trunk.stem.0.weight" in sd:
        return import_clip_state_dict(sd, cfg)
    if "conv1.weight" in sd or "trunk.stem.0.weight" in sd:
        if base_params is None:
            raise ValueError(
                "visual-only checkpoint needs base_params for the text tower"
            )
        out = dict(base_params)
        out["visual"] = import_visual_state_dict(sd, cfg)
        return out
    raise ValueError(f"unrecognized checkpoint keys: {list(sd)[:5]} ...")
