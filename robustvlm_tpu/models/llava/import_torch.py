"""LLaVA checkpoint import: HF llava-1.5 weights -> JAX param tree.

Handles the three tower sources of reference llava/model/builder.py
(:84-218):
- the LLaMA/Vicuna LM (HF `model.*` keys) -> llama import;
- the mm projector (`model.mm_projector.{0,2}.{weight,bias}`);
- the vision tower: HF CLIPVisionModel keys
  (`...vision_model.encoder.layers.{i}...`) OR, for the robustified path
  (`pretrained_rob_path`, builder.py:205-211), an open_clip visual state
  dict loaded over the tower with its last block dropped at forward time
  (clip_encoder.py:59 — we keep all weights and skip the block statically).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.import_torch import _to_np, import_visual_state_dict
from robustvlm_tpu.models.clip.model import CLIPConfig
from robustvlm_tpu.models.llama.import_torch import _load_any, import_llama_state_dict
from robustvlm_tpu.models.llava.model import LlavaConfig


def import_hf_clip_vision(sd: Mapping[str, Any], cfg: CLIPConfig, prefix: str) -> Dict:
    """HF CLIPVisionModel state dict -> our visual tree. HF fuses nothing:
    q/k/v are separate (out, in) Linears; we fuse to qkv (in, 3*out)."""
    g = lambda k: _to_np(sd[prefix + k])
    lay = prefix + "vision_model.encoder.layers.{i}."

    def blk(fmt):
        return [_to_np(sd[fmt.format(i=i)]) for i in range(cfg.vision.layers)]

    qs = blk(lay + "self_attn.q_proj.weight")
    ks = blk(lay + "self_attn.k_proj.weight")
    vs = blk(lay + "self_attn.v_proj.weight")
    qb = blk(lay + "self_attn.q_proj.bias")
    kb = blk(lay + "self_attn.k_proj.bias")
    vb = blk(lay + "self_attn.v_proj.bias")
    qkv_w = jnp.asarray(
        np.stack([np.concatenate([q, k, v], axis=0).T for q, k, v in zip(qs, ks, vs)])
    )
    qkv_b = jnp.asarray(
        np.stack([np.concatenate([q, k, v]) for q, k, v in zip(qb, kb, vb)])
    )
    conv = g("vision_model.embeddings.patch_embedding.weight")  # (W,3,p,p)
    w = conv.shape[0]
    st = lambda fmt, tr=False: jnp.asarray(
        np.stack([a.T if tr else a for a in blk(fmt)])
    )
    return {
        "patch_embed": jnp.asarray(conv.reshape(w, -1).T),
        "class_embedding": jnp.asarray(g("vision_model.embeddings.class_embedding")),
        "positional_embedding": jnp.asarray(
            g("vision_model.embeddings.position_embedding.weight")
        ),
        "ln_pre": {
            "g": jnp.asarray(g("vision_model.pre_layrnorm.weight")),
            "b": jnp.asarray(g("vision_model.pre_layrnorm.bias")),
        },
        "blocks": {
            "ln_1": {
                "g": st(lay + "layer_norm1.weight"),
                "b": st(lay + "layer_norm1.bias"),
            },
            "attn": {
                "qkv_w": qkv_w,
                "qkv_b": qkv_b,
                "out_w": st(lay + "self_attn.out_proj.weight", tr=True),
                "out_b": st(lay + "self_attn.out_proj.bias"),
            },
            "ln_2": {
                "g": st(lay + "layer_norm2.weight"),
                "b": st(lay + "layer_norm2.bias"),
            },
            "mlp": {
                "fc_w": st(lay + "mlp.fc1.weight", tr=True),
                "fc_b": st(lay + "mlp.fc1.bias"),
                "proj_w": st(lay + "mlp.fc2.weight", tr=True),
                "proj_b": st(lay + "mlp.fc2.bias"),
            },
        },
        "ln_post": {
            "g": jnp.asarray(g("vision_model.post_layernorm.weight")),
            "b": jnp.asarray(g("vision_model.post_layernorm.bias")),
        },
        # HF CLIPVisionModel has no projection; LLaVA never uses it
        "proj": jnp.zeros((w, cfg.embed_dim), jnp.float32),
    }


def import_llava_state_dict(
    sd: Mapping[str, Any],
    cfg: LlavaConfig,
    robust_vision_sd: Mapping[str, Any] = None,
) -> Dict:
    """Full llava state dict -> {vision, projector, llama|mpt}.

    LLaMA-family checkpoints root the tree at `model.` (LlavaLlamaForCausalLM);
    MPT-family at `transformer.` (reference llava_mpt.py:54 wraps everything —
    decoder, vision tower, mm_projector — inside LlavaMPTModel).

    robust_vision_sd: optional open_clip visual state dict replacing the HF
    tower (the reference's pretrained_rob_path mechanism)."""
    base = "model." if cfg.lm_family == "llama" else "transformer."
    proj = {
        "w1": jnp.asarray(_to_np(sd[base + "mm_projector.0.weight"]).T),
        "b1": jnp.asarray(_to_np(sd[base + "mm_projector.0.bias"])),
    }
    if cfg.projector_type != "linear":
        proj["w2"] = jnp.asarray(_to_np(sd[base + "mm_projector.2.weight"]).T)
        proj["b2"] = jnp.asarray(_to_np(sd[base + "mm_projector.2.bias"]))

    if robust_vision_sd is not None:
        vision = import_visual_state_dict(robust_vision_sd, cfg.vision)
    else:
        # find the vision tower prefix (varies across llava releases)
        prefix = None
        for cand in (
            base + "vision_tower.vision_tower.",
            base + "vision_tower.",
        ):
            if cand + "vision_model.embeddings.class_embedding" in sd:
                prefix = cand
                break
        if prefix is None:
            raise ValueError("no vision tower found in LLaVA state dict")
        vision = import_hf_clip_vision(sd, cfg.vision, prefix)

    out = {"vision": vision, "projector": proj}
    if cfg.lm_family == "llama":
        out["llama"] = import_llama_state_dict(sd, cfg.llama)
    else:
        from robustvlm_tpu.models.mpt.import_torch import import_mpt_state_dict

        # MPT key paths already carry the `transformer.` root that
        # LlavaMPTForCausalLM's state dict uses (import_mpt_state_dict
        # formats keys as `transformer.blocks.{i}...`)
        out["mpt"] = import_mpt_state_dict(sd, cfg.mpt)
    return out


def load_llava_checkpoint(
    path, cfg: LlavaConfig, robust_vision_path: str = None
) -> Dict:
    sd = _load_any(path)
    rob = None
    if robust_vision_path:
        rob = _load_any(robust_vision_path)
        if "vision_encoder_state_dict" in rob:
            rob = rob["vision_encoder_state_dict"]
    return import_llava_state_dict(sd, cfg, robust_vision_sd=rob)
