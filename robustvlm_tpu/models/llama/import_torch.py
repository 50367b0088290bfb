"""HF LlamaForCausalLM -> JAX param tree import.

The reference loads Vicuna/LLaMA through transformers
(llava/model/builder.py:84-218); here the HF state dict maps onto the
stacked-block functional tree in model.py. HF's rotary convention (half-split
rotate_half with permuted q/k rows baked into the checkpoint) matches
apply_rope, so weights import without re-permutation.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.import_torch import _to_np
from robustvlm_tpu.models.llama.model import LlamaConfig


def import_llama_state_dict(
    sd: Mapping[str, Any], cfg: LlamaConfig, prefix: str = ""
) -> Dict:
    """Keys like `model.embed_tokens.weight`, `model.layers.{i}.self_attn.
    q_proj.weight`, `lm_head.weight`. Linear weights transpose to (in, out)."""
    g = lambda k: _to_np(sd[prefix + k])

    def stacked(fmt, transpose=True):
        return jnp.asarray(
            np.stack(
                [
                    _to_np(sd[prefix + fmt.format(i=i)]).T
                    if transpose
                    else _to_np(sd[prefix + fmt.format(i=i)])
                    for i in range(cfg.n_layers)
                ]
            )
        )

    lay = "model.layers.{i}."
    return {
        "tok_embedding": jnp.asarray(g("model.embed_tokens.weight")),
        "blocks": {
            "attn_norm": stacked(lay + "input_layernorm.weight", transpose=False),
            "ffn_norm": stacked(lay + "post_attention_layernorm.weight", transpose=False),
            "attn": {
                "wq": stacked(lay + "self_attn.q_proj.weight"),
                "wk": stacked(lay + "self_attn.k_proj.weight"),
                "wv": stacked(lay + "self_attn.v_proj.weight"),
                "wo": stacked(lay + "self_attn.o_proj.weight"),
            },
            "mlp": {
                "w_gate": stacked(lay + "mlp.gate_proj.weight"),
                "w_up": stacked(lay + "mlp.up_proj.weight"),
                "w_down": stacked(lay + "mlp.down_proj.weight"),
            },
        },
        "norm": jnp.asarray(g("model.norm.weight")),
        "lm_head": jnp.asarray(
            g("lm_head.weight").T
            if prefix + "lm_head.weight" in sd
            else g("model.embed_tokens.weight").T  # tied embeddings fallback
        ),
    }


def load_llama_checkpoint(path_or_sd, cfg: LlamaConfig, prefix: str = "") -> Dict:
    """Load from a torch .pt/.bin/safetensors file or HF model directory."""
    sd = _load_any(path_or_sd)
    return import_llama_state_dict(sd, cfg, prefix=prefix)


def _load_any(path_or_sd) -> Mapping[str, Any]:
    if not isinstance(path_or_sd, str):
        sd = path_or_sd
        return sd.state_dict() if hasattr(sd, "state_dict") else sd
    import os

    path = path_or_sd
    if os.path.isdir(path):
        # HF directory: merge all weight shards
        sd: Dict[str, Any] = {}
        names = sorted(os.listdir(path))
        st = [n for n in names if n.endswith(".safetensors")]
        bins = [n for n in names if n.endswith(".bin") or n.endswith(".pt")]
        if st:
            from safetensors import safe_open

            for n in st:
                with safe_open(os.path.join(path, n), framework="np") as f:
                    for k in f.keys():
                        sd[k] = f.get_tensor(k)
            return sd
        import torch

        for n in bins:
            sd.update(torch.load(os.path.join(path, n), map_location="cpu",
                                 weights_only=False))
        return sd
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return sd.state_dict() if hasattr(sd, "state_dict") else sd
