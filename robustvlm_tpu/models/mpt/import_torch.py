"""MPT (mosaicml HF format) -> JAX param tree import.

Keys: transformer.wte.weight, transformer.blocks.{i}.{norm_1.weight,
attn.Wqkv.weight, attn.out_proj.weight, norm_2.weight, ffn.up_proj.weight,
ffn.down_proj.weight}, transformer.norm_f.weight (reference vendored MPT,
llava/model/language_model/mpt/modeling_mpt.py). MPT-7B is bias-free.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.import_torch import _to_np
from robustvlm_tpu.models.mpt.model import MPTConfig


def import_mpt_state_dict(
    sd: Mapping[str, Any], cfg: MPTConfig, prefix: str = ""
) -> Dict:
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

    blk = "transformer.blocks.{i}."
    return {
        "tok_embedding": jnp.asarray(g("transformer.wte.weight")),
        "blocks": {
            "norm_1": stacked(blk + "norm_1.weight", transpose=False),
            "norm_2": stacked(blk + "norm_2.weight", transpose=False),
            "attn": {
                "wqkv": stacked(blk + "attn.Wqkv.weight"),
                "out_w": stacked(blk + "attn.out_proj.weight"),
            },
            "mlp": {
                "up_w": stacked(blk + "ffn.up_proj.weight"),
                "down_w": stacked(blk + "ffn.down_proj.weight"),
            },
        },
        "norm_f": jnp.asarray(g("transformer.norm_f.weight")),
    }


def load_mpt_checkpoint(path_or_sd, cfg: MPTConfig, prefix: str = "") -> Dict:
    from robustvlm_tpu.models.llama.import_torch import _load_any

    return import_mpt_state_dict(_load_any(path_or_sd), cfg, prefix=prefix)
