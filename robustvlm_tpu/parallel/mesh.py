"""Device mesh and sharding layer — the entire distributed-communication story.

Replaces the reference's torch DataParallel / DDP / FSDP plumbing
(SURVEY.md §2.6; reference adversarial_training_clip.py:184-191,
open_flamingo/src/flamingo.py:252-351) with one declarative module:

- mesh axes: ("data", "fsdp", "model").
  * data  — batch/data parallel over ICI; per-example attack state (x_adv,
    step sizes, best-tracking) lives with its example and shards trivially.
  * fsdp  — ZeRO-3-style parameter sharding: weights sharded at rest,
    all-gathered by XLA on use (only needed for the 7B VLM language models).
  * model — Megatron-style tensor parallelism inside attention/MLP blocks.
- no explicit collectives anywhere: shardings are declared with
  NamedSharding/PartitionSpec and XLA inserts all-gather/psum/reduce-scatter
  over ICI. (Pipeline and expert parallelism have no workload here: the
  reference's models are dense and fit a pod slice; documented, not built.)

All functions degrade gracefully to a single device.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "model")


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("data", "fsdp", "model") mesh. data=-1 uses all remaining
    devices. Axis order puts `model` innermost so TP collectives ride the
    fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // (fsdp * model)
    if data * fsdp * model != n:
        raise ValueError(f"mesh {data}x{fsdp}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, fsdp, model)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading batch axis over ("data", "fsdp") — fsdp doubles as a
    second data axis for activations, the standard FSDP recipe."""
    spec = P(("data", "fsdp"), *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


# Param-path regex -> PartitionSpec builder. Stacked-block tensors carry a
# leading layer axis (never sharded); TP shards the head/ffn dimension, FSDP
# shards the other large dimension. Covers every model family: CLIP ViT
# (qkv_w/fc_w/...), LLaMA (wq/wk/wv/wo, w_gate/w_up/w_down), MPT
# (wqkv/out_w/up_w/down_w), the Flamingo resampler + gated xattn
# (to_q/to_kv/to_out, ff w1/w2), and the LLaVA mm-projector — the FSDP scope
# of reference open_flamingo/src/flamingo.py:252-351 (manual wrap of
# perceiver/xattn/decoder blocks/embeddings), expressed declaratively.
_RULES: Tuple[Tuple[str, P], ...] = (
    # --- CLIP ViT / text tower ---
    # attention: qkv columns (heads) on model, rows on fsdp
    (r".*blocks.*attn.*qkv_w$", P(None, "fsdp", "model")),
    (r".*blocks.*attn.*qkv_b$", P(None, "model")),
    (r".*blocks.*attn.*out_w$", P(None, "model", "fsdp")),
    (r".*blocks.*attn.*out_b$", P(None)),
    # mlp: fc columns on model, proj rows on model
    (r".*blocks.*mlp.*fc_w$", P(None, "fsdp", "model")),
    (r".*blocks.*mlp.*fc_b$", P(None, "model")),
    (r".*blocks.*mlp.*proj_w$", P(None, "model", "fsdp")),
    (r".*blocks.*mlp.*proj_b$", P(None)),
    # --- LLaMA (models/llama/model.py:273-301) ---
    (r".*blocks.*attn.*w[qkv]$", P(None, "fsdp", "model")),
    (r".*blocks.*attn.*wo$", P(None, "model", "fsdp")),
    (r".*blocks.*mlp.*w_(gate|up)$", P(None, "fsdp", "model")),
    (r".*blocks.*mlp.*w_down$", P(None, "model", "fsdp")),
    # --- MPT (models/mpt/model.py:262-282; out_w matched above) ---
    (r".*blocks.*attn.*wqkv$", P(None, "fsdp", "model")),
    (r".*blocks.*mlp.*up_w$", P(None, "fsdp", "model")),
    (r".*blocks.*mlp.*down_w$", P(None, "model", "fsdp")),
    # --- Flamingo perceiver resampler + gated cross-attention ---
    # (to_q/to_kv/to_out and ff/w1|w2 names exist only in those modules)
    (r".*to_(q|kv)$", P(None, "fsdp", "model")),
    (r".*to_out$", P(None, "model", "fsdp")),
    (r".*ff/w1$", P(None, "fsdp", "model")),
    (r".*ff/w2$", P(None, "model", "fsdp")),
    # --- LLaVA mm-projector (2D, no layer axis) ---
    (r".*projector/w1$", P("fsdp", "model")),
    (r".*projector/w2$", P("model", "fsdp")),
    # --- OPT decoder (models/opt/model.py) ---
    (r".*blocks.*mlp.*fc1$", P(None, "fsdp", "model")),
    (r".*blocks.*mlp.*b1$", P(None, "model")),
    (r".*blocks.*mlp.*fc2$", P(None, "model", "fsdp")),
    # --- BLIP-2 Q-Former (grouped stacks: specs anchor to TRAILING dims,
    # leading group/sublayer axes are padded with None by _spec_for) ---
    (r".*groups/(self|cross)/[qkv]_w$", P("fsdp", "model")),
    (r".*groups/(self|cross)/out_w$", P("model", "fsdp")),
    (r".*groups/ffn/fc_w$", P("fsdp", "model")),
    (r".*groups/ffn/proj_w$", P("model", "fsdp")),
    (r".*language_projection/w$", P("fsdp", "model")),
    # --- ConvNeXt tower (models/clip/convnext.py): the 4x channel MLP
    # dominates bytes; convs/norms stay replicated (small) ---
    (r".*stages.*blocks.*fc1_w$", P(None, "fsdp", "model")),
    (r".*stages.*blocks.*fc1_b$", P(None, "model")),
    (r".*stages.*blocks.*fc2_w$", P(None, "model", "fsdp")),
    # --- BERT/XLM-R text towers (models/jaclip, models/mclip): stacked
    # (L, D, D) attention, (L, D, I) ffn, bias/LN replicated by default ---
    (r".*blocks/[qkv]_w$", P(None, "fsdp", "model")),
    (r".*blocks/[qkv]_b$", P(None, "model")),
    (r".*blocks/o_w$", P(None, "model", "fsdp")),
    (r".*blocks/ff1_w$", P(None, "fsdp", "model")),
    (r".*blocks/ff1_b$", P(None, "model")),
    (r".*blocks/ff2_w$", P(None, "model", "fsdp")),
    (r".*word_emb$", P("fsdp", None)),
    # open_clip mlp text projection (mclip): two bias-free linears
    (r".*text_projection/fc_w$", P("fsdp", "model")),
    (r".*text_projection/out_w$", P("model", "fsdp")),
    # --- embeddings / heads: shard the wide axis on fsdp ---
    (r".*patch_embed$", P("fsdp", None)),
    (r".*tok(en)?_embedding$", P("fsdp", None)),
    (r".*lm_head$", P("fsdp", "model")),
    (r".*positional_embedding$", P(None)),
    (r".*(proj|text_projection)$", P("fsdp", None)),
)


def _spec_for(path: str, ndim: Optional[int] = None) -> P:
    for pat, spec in _RULES:
        if re.match(pat, path):
            # specs anchor to TRAILING dims: extra leading axes (layer
            # stacks, Q-Former group/sublayer axes) stay unsharded, and an
            # UNSTACKED per-layer param drops the rule's leading entries
            # (which must be None — a named axis can't silently vanish)
            if ndim is not None and ndim > len(spec):
                spec = P(*([None] * (ndim - len(spec)) + list(spec)))
            elif ndim is not None and ndim < len(spec):
                dropped = list(spec)[: len(spec) - ndim]
                if any(d is not None for d in dropped):
                    raise ValueError(
                        f"sharding rule {spec} for {path!r} names axes "
                        f"beyond the param's {ndim} dims"
                    )
                spec = P(*list(spec)[len(spec) - ndim:])
            return spec
    return P()  # replicate (layernorms, scalars, class embedding)


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop spec axes that don't divide the param's dims evenly — a named
    mesh axis can only tile a dimension it divides. Real checkpoints hit
    this (ViT-L/14 patch_embed has 3*14*14=588 rows: indivisible by an
    8-way fsdp axis); the correct degradation is replicating THAT dim, not
    failing the whole placement."""
    out = []
    for i, entry in enumerate(spec):
        if entry is None or i >= len(shape):
            out.append(entry)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        n = int(np.prod([mesh.shape[a] for a in axes]))
        out.append(entry if shape[i] % n == 0 else None)
    return P(*out)


def param_sharding_rules(params, mesh: Mesh):
    """Pytree of NamedShardings for a CLIP param tree (TP over 'model', ZeRO-3
    over 'fsdp', replicated across 'data')."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    leaves = {
        path_str(kp): NamedSharding(
            mesh,
            _fit_spec(
                _spec_for(path_str(kp), getattr(leaf, "ndim", None)),
                getattr(leaf, "shape", ()),
                mesh,
            ),
        )
        for kp, leaf in flat
    }
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [leaves[path_str(kp)] for kp, _ in flat]
    )


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh according to the TP/FSDP rules."""
    shardings = param_sharding_rules(params, mesh)
    return jax.device_put(params, shardings)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_attack(attack_fn, mesh: Mesh, *, params=None):
    """Data-parallel attack wrapper: shard (x, y) over the mesh's batch axes
    and run the jitted attack under those shardings — per-example APGD state
    (step sizes, best-tracking, loss history) lives with its example and
    shards with the batch (SURVEY.md §2.6: the reference's DataParallel
    scatter/gather disappears; XLA inserts any needed collectives).

    attack_fn signature: attack_fn(params, x, y) when `params` is given
    (the tree rides as a jit ARGUMENT, replicated/sharded per the rule
    table — never a closure constant, per the CLAUDE.md jit rule), else
    attack_fn(x, y) for param-free callables. Returns wrapped(x, y).
    """
    bsh_y = batch_sharding(mesh, 1)
    jitted = jax.jit(attack_fn)
    if params is not None:
        params = shard_params(params, mesh)

    def wrapped(x, y=None):
        x = jax.device_put(x, batch_sharding(mesh, x.ndim))
        lead = (params,) if params is not None else ()
        if y is not None:
            y = jax.device_put(y, bsh_y)
            return jitted(*lead, x, y)
        return jitted(*lead, x)

    return wrapped
