"""Multilingual open_clip models: XLM-RoBERTa text tower + CLIP ViT vision.

The reference benchmarks two multilingual rows (CLIP_benchmark
model_collection.py:19-22 "openclip_multilingual":
xlm-roberta-base-ViT-B-32 / laion5b_s13b_b90k and
xlm-roberta-large-ViT-H-14 / frozen_laion5b_s13b_b90k), loaded through the
external open_clip package's HFTextEncoder (hf_model.py): a HF
XLM-RoBERTa encoder, `mean_pooler` (attention-masked mean of the last
hidden state), and `proj='mlp'` — two bias-free linears with an exact
GELU between, hidden = (width + embed_dim) // 2.

Natively here: the text tower IS the repo's stacked-blocks RoBERTa encoder
(models/jaclip/model.py — XLM-R is architecturally RoBERTa with a 250k
vocab; HF-RobertaModel bit-parity is pinned in tests/test_jaclip.py and
re-pinned for XLMRobertaModel in tests/test_mclip.py), pooled with
`pool='mean'` and projected with `proj_arch='mlp'`. The image tower is the
repo's CLIP ViT, so zero-shot classification — including the adversarial
attack path — and the multilingual classname/template tables
(benchmark/data, --language) apply unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.model import CLIP_CONFIGS
from robustvlm_tpu.models.jaclip.model import (
    BertTextConfig,
    JaCLIPConfig,
    build_ja_text_classifier as build_mclip_text_classifier,  # noqa: F401
    encode_image,  # noqa: F401  (CLIP visual tower delegation)
    encode_text,  # noqa: F401
    init_jaclip_params as init_mclip_params,  # noqa: F401
)

Params = Dict[str, Any]

# HF xlm-roberta-base / -large configs (RoBERTa arch, vocab 250002,
# max_positions 514, pad=1, offset=2). Vision towers are the standard-GELU
# open_clip ViTs from the CLIP registry.
_XLMR_BASE = BertTextConfig(
    vocab_size=250002, hidden=768, layers=12, heads=12, intermediate=3072,
    max_positions=514, pool="mean",
)
_XLMR_LARGE = BertTextConfig(
    vocab_size=250002, hidden=1024, layers=24, heads=16, intermediate=4096,
    max_positions=514, pool="mean",
)

MCLIP_CONFIGS: Dict[str, JaCLIPConfig] = {
    "xlm-roberta-base-ViT-B-32": JaCLIPConfig(
        "xlm-roberta-base-ViT-B-32", _XLMR_BASE,
        CLIP_CONFIGS["ViT-B-32-laion"], embed_dim=512, proj_arch="mlp",
    ),
    "xlm-roberta-large-ViT-H-14": JaCLIPConfig(
        "xlm-roberta-large-ViT-H-14", _XLMR_LARGE,
        CLIP_CONFIGS["ViT-H-14"], embed_dim=1024, proj_arch="mlp",
    ),
    "test-tiny-mclip": JaCLIPConfig(
        "test-tiny-mclip",
        BertTextConfig(
            vocab_size=128, hidden=32, layers=2, heads=2, intermediate=64,
            max_positions=64, pool="mean",
        ),
        CLIP_CONFIGS["test-tiny"],
        embed_dim=CLIP_CONFIGS["test-tiny"].embed_dim, proj_arch="mlp",
    ),
}


def import_open_clip_mclip(path: str, cfg: JaCLIPConfig) -> Params:
    """open_clip multilingual checkpoint -> param tree.

    open_clip stores the HF text tower under `text.transformer.` (HF-BERT
    key layout), the MLP projection as `text.proj.0.weight` /
    `text.proj.2.weight` (Sequential indices; GELU at 1 holds no params),
    and the ViT under `visual.` in the standard open_clip layout.
    """
    import torch

    from robustvlm_tpu.models.clip.import_torch import import_visual_state_dict
    from robustvlm_tpu.models.jaclip.import_torch import (
        _find_prefix,
        _np,
        import_hf_roberta,
    )

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and isinstance(sd.get("state_dict"), dict):
        # open_clip training checkpoints wrap the weights:
        # {'epoch': ..., 'state_dict': {'module.visual...': ...}}
        sd = sd["state_dict"]
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    text_prefix = _find_prefix(sd, "embeddings.word_embeddings.weight")
    if text_prefix is None:
        raise ValueError(
            "mclip checkpoint: no HF text tower found (missing "
            "*embeddings.word_embeddings.weight). First keys: "
            f"{sorted(sd)[:10]}"
        )
    text = import_hf_roberta(sd, cfg.text, prefix=text_prefix)

    proj_prefix = _find_prefix(sd, "proj.0.weight")
    if proj_prefix is None:
        raise ValueError(
            "mclip checkpoint: no MLP text projection (*proj.0.weight / "
            f"*proj.2.weight). Near misses: "
            f"{[k for k in sd if 'proj' in k][:10]}"
        )
    proj = {
        # torch Linear stores (out, in); we store (in, out)
        "fc_w": jnp.asarray(_np(sd[proj_prefix + "proj.0.weight"]).T),
        "out_w": jnp.asarray(_np(sd[proj_prefix + "proj.2.weight"]).T),
    }

    vis_prefix = _find_prefix(sd, "conv1.weight")
    if vis_prefix is None:  # NOT `or`: '' is a legitimate unprefixed tower
        raise ValueError(
            "mclip checkpoint: no ViT vision tower found (*conv1.weight). "
            f"First keys: {sorted(sd)[:10]}"
        )
    visual = import_visual_state_dict(sd, cfg.vision, prefix=vis_prefix)

    return {
        "text": text,
        "text_projection": proj,
        "visual": visual,
        "logit_scale": jnp.asarray(
            _np(sd["logit_scale"]) if "logit_scale" in sd
            else 2.659260036932778
        ),
    }


def get_mclip_tokenizer(path: Optional[str], cfg: JaCLIPConfig,
                        max_len: int = 77):
    """tokenize(texts) -> (input_ids, attention_mask) int32 arrays.

    With a local HF tokenizer dir (xlm-roberta-base layout) this follows
    open_clip's HFTokenizer exactly: tokenizer(texts, padding='max_length',
    truncation=True, max_length=context_length) WITH special tokens (<s>
    ... </s>) — unlike rinna's hand-prepended-CLS protocol. Without one,
    a deterministic hash tokenizer keeps the pipeline runnable on random
    weights (mean pooling needs no special CLS slot)."""
    if path:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path)

        def tokenize(texts):
            out = tok(
                list(texts), padding="max_length", truncation=True,
                max_length=max_len, return_tensors="np",
            )
            return (
                jnp.asarray(np.asarray(out["input_ids"], np.int32)),
                jnp.asarray(np.asarray(out["attention_mask"], np.int32)),
            )

        return tokenize

    import zlib

    v = cfg.text.vocab_size

    def tokenize(texts):
        ids = np.full((len(texts), max_len), cfg.text.pad_token_id, np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for i, t in enumerate(texts):
            # crc32, not hash(): PYTHONHASHSEED-independent, so runs are
            # reproducible across processes
            toks = [0] + [
                3 + (zlib.crc32(w.encode()) % (v - 4))
                for w in str(t).split()
            ][: max_len - 2] + [2]  # <s> ... </s>
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    return tokenize
