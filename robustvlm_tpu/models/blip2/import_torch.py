"""HF Blip2ForConditionalGeneration -> JAX weight conversion.

Imports the Salesforce/blip2-opt-* checkpoint layout (and any HF state dict
with the same key structure, including tiny random configs used as parity
oracles in tests). Covers the model the reference's BLIP eval wrapper loads
via `Blip2ForConditionalGeneration.from_pretrained`
(reference open_flamingo/eval/models/blip.py:33-35).

Conventions follow models/clip/import_torch.py: linear weights transposed
once to (in, out); per-layer tensors stacked on a leading layer axis; the
Q-Former's alternating layers regrouped into (n_groups, xattn_every, ...)
stacks matching the grouped scan in model.qformer_forward.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.blip2.model import Blip2Config, Params
from robustvlm_tpu.models.opt.model import OPTConfig


from robustvlm_tpu.models.clip.import_torch import _to_np


def _stack(sd, fmt, idxs, transpose=False):
    arrs = []
    for i in idxs:
        a = _to_np(sd[fmt.format(i=i)])
        arrs.append(a.T if transpose else a)
    return jnp.asarray(np.stack(arrs))


def _import_vision(sd: Mapping[str, Any], cfg: Blip2Config) -> Dict:
    vc = cfg.vision
    g = lambda k: _to_np(sd["vision_model." + k])
    conv = g("embeddings.patch_embedding.weight")  # (W, 3, p, p)
    w = conv.shape[0]
    rng = range(vc.layers)
    pre = "vision_model.encoder.layers.{i}."
    return {
        "patch_embed": jnp.asarray(conv.reshape(w, -1).T),
        "patch_bias": jnp.asarray(g("embeddings.patch_embedding.bias")),
        "class_embedding": jnp.asarray(
            g("embeddings.class_embedding").reshape(-1)
        ),
        "positional_embedding": jnp.asarray(
            g("embeddings.position_embedding").reshape(vc.n_tokens, w)
        ),
        "blocks": {
            "ln_1": {
                "g": _stack(sd, pre + "layer_norm1.weight", rng),
                "b": _stack(sd, pre + "layer_norm1.bias", rng),
            },
            "attn": {
                "qkv_w": _stack(sd, pre + "self_attn.qkv.weight", rng, True),
                "qkv_b": _stack(sd, pre + "self_attn.qkv.bias", rng),
                "out_w": _stack(
                    sd, pre + "self_attn.projection.weight", rng, True
                ),
                "out_b": _stack(sd, pre + "self_attn.projection.bias", rng),
            },
            "ln_2": {
                "g": _stack(sd, pre + "layer_norm2.weight", rng),
                "b": _stack(sd, pre + "layer_norm2.bias", rng),
            },
            "mlp": {
                "fc_w": _stack(sd, pre + "mlp.fc1.weight", rng, True),
                "fc_b": _stack(sd, pre + "mlp.fc1.bias", rng),
                "proj_w": _stack(sd, pre + "mlp.fc2.weight", rng, True),
                "proj_b": _stack(sd, pre + "mlp.fc2.bias", rng),
            },
        },
        "ln_post": {
            "g": jnp.asarray(g("post_layernorm.weight")),
            "b": jnp.asarray(g("post_layernorm.bias")),
        },
    }


def _qformer_attn(sd, base: str, idxs, regroup=None):
    """One attention sublayer stack (query/key/value/output.dense +
    output.LayerNorm). `regroup`: reshape leading axis to (n_groups, freq)."""
    out = {
        "q_w": _stack(sd, base + "attention.query.weight", idxs, True),
        "q_b": _stack(sd, base + "attention.query.bias", idxs),
        "k_w": _stack(sd, base + "attention.key.weight", idxs, True),
        "k_b": _stack(sd, base + "attention.key.bias", idxs),
        "v_w": _stack(sd, base + "attention.value.weight", idxs, True),
        "v_b": _stack(sd, base + "attention.value.bias", idxs),
        "out_w": _stack(sd, base + "output.dense.weight", idxs, True),
        "out_b": _stack(sd, base + "output.dense.bias", idxs),
        "ln_g": _stack(sd, base + "output.LayerNorm.weight", idxs),
        "ln_b": _stack(sd, base + "output.LayerNorm.bias", idxs),
    }
    if regroup:
        out = jax.tree.map(
            lambda a: a.reshape(regroup[0], regroup[1], *a.shape[1:]), out
        )
    return out


def _import_qformer(sd: Mapping[str, Any], cfg: Blip2Config) -> Dict:
    qc = cfg.qformer
    assert qc.layers % qc.xattn_every == 0
    ng, fr = qc.layers // qc.xattn_every, qc.xattn_every
    all_layers = range(qc.layers)
    x_layers = range(0, qc.layers, fr)
    pre = "qformer.encoder.layer.{i}."
    ffn = {
        "fc_w": _stack(sd, pre + "intermediate_query.dense.weight", all_layers, True),
        "fc_b": _stack(sd, pre + "intermediate_query.dense.bias", all_layers),
        "proj_w": _stack(sd, pre + "output_query.dense.weight", all_layers, True),
        "proj_b": _stack(sd, pre + "output_query.dense.bias", all_layers),
        "ln_g": _stack(sd, pre + "output_query.LayerNorm.weight", all_layers),
        "ln_b": _stack(sd, pre + "output_query.LayerNorm.bias", all_layers),
    }
    return {
        "ln_embed": {
            "g": jnp.asarray(_to_np(sd["qformer.layernorm.weight"])),
            "b": jnp.asarray(_to_np(sd["qformer.layernorm.bias"])),
        },
        "groups": {
            "self": _qformer_attn(
                sd, pre + "attention.", all_layers, regroup=(ng, fr)
            ),
            "cross": _qformer_attn(sd, pre + "crossattention.", x_layers),
            "ffn": jax.tree.map(
                lambda a: a.reshape(ng, fr, *a.shape[1:]), ffn
            ),
        },
    }


def _import_opt(sd: Mapping[str, Any], cfg: OPTConfig,
                prefix: str = "language_model.") -> Dict:
    g = lambda k: _to_np(sd[prefix + k])
    dec = prefix + "model.decoder.layers.{i}."
    rng = range(cfg.n_layers)
    tok = g("model.decoder.embed_tokens.weight")
    return {
        "tok_embedding": jnp.asarray(tok),
        "pos_embedding": jnp.asarray(g("model.decoder.embed_positions.weight")),
        "blocks": {
            "ln1": {
                "g": _stack(sd, dec + "self_attn_layer_norm.weight", rng),
                "b": _stack(sd, dec + "self_attn_layer_norm.bias", rng),
            },
            "attn": {
                "wq": _stack(sd, dec + "self_attn.q_proj.weight", rng, True),
                "bq": _stack(sd, dec + "self_attn.q_proj.bias", rng),
                "wk": _stack(sd, dec + "self_attn.k_proj.weight", rng, True),
                "bk": _stack(sd, dec + "self_attn.k_proj.bias", rng),
                "wv": _stack(sd, dec + "self_attn.v_proj.weight", rng, True),
                "bv": _stack(sd, dec + "self_attn.v_proj.bias", rng),
                "wo": _stack(sd, dec + "self_attn.out_proj.weight", rng, True),
                "bo": _stack(sd, dec + "self_attn.out_proj.bias", rng),
            },
            # HF names the pre-FFN norm `final_layer_norm` inside each layer
            "ln2": {
                "g": _stack(sd, dec + "final_layer_norm.weight", rng),
                "b": _stack(sd, dec + "final_layer_norm.bias", rng),
            },
            "mlp": {
                "fc1": _stack(sd, dec + "fc1.weight", rng, True),
                "b1": _stack(sd, dec + "fc1.bias", rng),
                "fc2": _stack(sd, dec + "fc2.weight", rng, True),
                "b2": _stack(sd, dec + "fc2.bias", rng),
            },
        },
        "final_norm": {
            "g": jnp.asarray(g("model.decoder.final_layer_norm.weight")),
            "b": jnp.asarray(g("model.decoder.final_layer_norm.bias")),
        },
        # lm_head is tied to the embedding in every OPT/BLIP-2 release
        "lm_head": jnp.asarray(tok.T),
    }


def import_blip2_state_dict(sd: Mapping[str, Any], cfg: Blip2Config) -> Params:
    """Full Blip2ForConditionalGeneration state dict -> JAX param tree."""
    qw = _to_np(sd["query_tokens"])
    return {
        "visual": _import_vision(sd, cfg),
        "query_tokens": jnp.asarray(
            qw.reshape(cfg.num_query_tokens, cfg.qformer.width)
        ),
        "qformer": _import_qformer(sd, cfg),
        "language_projection": {
            "w": jnp.asarray(_to_np(sd["language_projection.weight"]).T),
            "b": jnp.asarray(_to_np(sd["language_projection.bias"])),
        },
        "opt": _import_opt(sd, cfg.opt),
    }


def import_blip2_torch_model(model, cfg: Blip2Config) -> Params:
    """Convert a live HF Blip2ForConditionalGeneration module."""
    return import_blip2_state_dict(
        {k: v for k, v in model.state_dict().items()}, cfg
    )


def load_blip2_checkpoint(path_or_sd, cfg: Blip2Config) -> Params:
    """Load a Salesforce/blip2-opt-* checkpoint (HF directory of shards, a
    single .pt/.bin/.safetensors file, or an in-memory state dict)."""
    from robustvlm_tpu.models.llama.import_torch import _load_any

    return import_blip2_state_dict(_load_any(path_or_sd), cfg)
