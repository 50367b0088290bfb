"""Torch-checkpoint importers for the ja_clip family.

Two layouts:

1. `import_hf_roberta` — a bare `transformers.RobertaModel`/`BertModel`
   state dict -> the stacked text tree. This is the OFFLINE-VERIFIABLE
   mapping (tests/test_jaclip.py builds a random tiny RobertaModel and
   pins bit-parity), and it is the text half of layout 2.

2. `import_rinna_jaclip` — the composite rinna japanese-clip checkpoint
   (reference CLIP_benchmark/clip_benchmark/models/japanese_clip.py loads
   it via the `japanese_clip` package). Expected keys: the text encoder
   under a `text_model.`-style prefix in HF-BERT layout, a
   `text_projection` linear, and an openai-CLIP-layout `visual.` tower
   (rinna's image tower is ViT-B/16). Prefixes are PROBED from the state
   dict rather than hard-coded, and an unrecognized layout raises with a
   key summary — the environment has no egress to verify rinna's exact
   naming, so the importer is deliberately diagnostic.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.jaclip.model import BertTextConfig, JaCLIPConfig


def _np(t):
    try:
        return np.asarray(t.detach().cpu().float().numpy())
    except AttributeError:
        return np.asarray(t, np.float32)


def import_hf_roberta(sd: Dict[str, Any], cfg: BertTextConfig,
                      prefix: str = "") -> Dict[str, Any]:
    """HF RobertaModel/BertModel state dict -> stacked text tree.

    HF stores Linear weights as (out, in); the JAX tree uses (in, out), so
    every dense weight transposes. Per-layer tensors stack on axis 0 to
    feed the `lax.scan` over blocks.
    """
    g = lambda k: _np(sd[prefix + k])
    l = cfg.layers

    def stack(fmt, transpose=False):
        ts = [g(fmt.format(i)) for i in range(l)]
        if transpose:
            ts = [t.T for t in ts]
        return jnp.asarray(np.stack(ts))

    enc = "encoder.layer.{}."
    return {
        "word_emb": jnp.asarray(g("embeddings.word_embeddings.weight")),
        "pos_emb": jnp.asarray(g("embeddings.position_embeddings.weight")),
        "type_emb": jnp.asarray(g("embeddings.token_type_embeddings.weight")),
        "emb_ln_w": jnp.asarray(g("embeddings.LayerNorm.weight")),
        "emb_ln_b": jnp.asarray(g("embeddings.LayerNorm.bias")),
        "blocks": {
            "q_w": stack(enc + "attention.self.query.weight", True),
            "q_b": stack(enc + "attention.self.query.bias"),
            "k_w": stack(enc + "attention.self.key.weight", True),
            "k_b": stack(enc + "attention.self.key.bias"),
            "v_w": stack(enc + "attention.self.value.weight", True),
            "v_b": stack(enc + "attention.self.value.bias"),
            "o_w": stack(enc + "attention.output.dense.weight", True),
            "o_b": stack(enc + "attention.output.dense.bias"),
            "ln1_w": stack(enc + "attention.output.LayerNorm.weight"),
            "ln1_b": stack(enc + "attention.output.LayerNorm.bias"),
            "ff1_w": stack(enc + "intermediate.dense.weight", True),
            "ff1_b": stack(enc + "intermediate.dense.bias"),
            "ff2_w": stack(enc + "output.dense.weight", True),
            "ff2_b": stack(enc + "output.dense.bias"),
            "ln2_w": stack(enc + "output.LayerNorm.weight"),
            "ln2_b": stack(enc + "output.LayerNorm.bias"),
        },
    }


def _find_prefix(keys, probe: str):
    """Shortest prefix p such that p+probe is a key (''-prefix included)."""
    cands = [k[: -len(probe)] for k in keys if k.endswith(probe)]
    if not cands:
        return None
    return min(cands, key=len)


def import_rinna_jaclip(path: str, cfg: JaCLIPConfig) -> Dict[str, Any]:
    import torch

    from robustvlm_tpu.models.clip.import_torch import import_visual_state_dict

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        sd = sd["state_dict"]  # training-checkpoint wrapper
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    text_prefix = _find_prefix(sd, "embeddings.word_embeddings.weight")
    if text_prefix is None:
        raise ValueError(
            "ja_clip checkpoint: no HF-BERT text tower found (missing "
            "*embeddings.word_embeddings.weight). First keys: "
            f"{sorted(sd)[:10]}"
        )
    text = import_hf_roberta(sd, cfg.text, prefix=text_prefix)

    proj_key = next(
        (k for k in sd if k.endswith("text_projection.weight")
         or k == "text_projection"),
        None,
    )
    if proj_key is None:
        raise ValueError(
            "ja_clip checkpoint: no text_projection found. Keys near misses: "
            f"{[k for k in sd if 'proj' in k][:10]}"
        )
    proj = _np(sd[proj_key])
    if proj.shape[0] == cfg.embed_dim:  # HF Linear (out, in) -> (in, out)
        proj = proj.T

    # NOT `or`: '' is a legitimate unprefixed tower (same as the mclip
    # importer) — only substitute 'visual.' when no prefix matched at all
    vis_prefix = _find_prefix(sd, "conv1.weight")
    if vis_prefix is None:
        vis_prefix = "visual."
    visual = import_visual_state_dict(sd, cfg.vision, prefix=vis_prefix)

    out = {
        "text": text,
        "text_projection": jnp.asarray(proj),
        "visual": visual,
        "logit_scale": jnp.asarray(
            _np(sd["logit_scale"]) if "logit_scale" in sd
            else 2.659260036932778
        ),
    }
    return out
