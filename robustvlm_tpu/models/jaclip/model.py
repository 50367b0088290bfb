"""rinna Japanese CLIP (ja_clip) — native text tower + CLIP ViT vision.

Reference: CLIP_benchmark/clip_benchmark/models/japanese_clip.py loads
rinna's model via the external `japanese_clip` pip package (BERT-family
text encoder + ViT-B/16 image tower; the wrapper's own remark: "you must
input not only input_ids but also attention_masks and position_ids").
Here the text tower is implemented natively: a post-LayerNorm BERT/RoBERTa
encoder in the repo's stacked-blocks + `lax.scan` idiom, CLS pooling, and
a linear projection into the shared embedding space. The image tower IS
the repo's CLIP ViT (`models/clip`), so the attack path, zero-shot
classifier, and benchmark plumbing all apply unchanged.

Verifiable parity: the encoder matches `transformers.RobertaModel`
(constructible offline) bit-for-bit on random weights via the importer in
`import_torch.py` (tests/test_jaclip.py). The rinna-checkpoint key layout
is documented there. rinna's tokenize/position protocol (CLS prepended by
hand with add_special_tokens=False, explicit position_ids=arange — the
wrapper's "you must input ... position_ids" warning) is reproduced by
`wrap_hf_ja_tokenizer` + `position_convention='arange'` on the b-16
config; the 'roberta' convention remains for the HF parity oracle.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.clip.model import CLIP_CONFIGS, CLIPConfig

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertTextConfig:
    vocab_size: int = 32000
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 514
    type_vocab: int = 1
    layer_norm_eps: float = 1e-5
    # RoBERTa pads positions: pad_token_id=1, real tokens start at 2
    pad_token_id: int = 1
    position_offset: int = 2
    # 'roberta': HF create_position_ids_from_input_ids (cumsum + offset,
    #   pads get pad_token_id) — what RobertaModel does when no position_ids
    #   are passed; the parity oracle convention.
    # 'arange': rinna's ja_clip protocol — tokenize() hands the model
    #   explicit position_ids = arange(seq_len) for every row (pads
    #   included); the wrapper's "you must input ... position_ids" warning
    #   exists because the HF default above would silently differ.
    position_convention: str = "roberta"
    pool: str = "cls"  # 'cls' | 'mean'


@dataclasses.dataclass(frozen=True)
class JaCLIPConfig:
    name: str
    text: BertTextConfig
    vision: CLIPConfig  # full CLIP config; its visual tower is used
    embed_dim: int = 512
    # 'linear': pooled @ (D, embed) — rinna ja_clip.
    # 'mlp': open_clip HFTextEncoder proj='mlp' (hf_model.py): two bias-free
    #   linears with exact GELU between, hidden = (D + embed) // 2 — the
    #   xlm-roberta multilingual rows (models/mclip.py) use this.
    proj_arch: str = "linear"

    @property
    def proj_hidden(self) -> int:
        return (self.text.hidden + self.embed_dim) // 2

    @property
    def image_size(self) -> int:
        return self.vision.image_size


JACLIP_CONFIGS: Dict[str, JaCLIPConfig] = {
    # rinna/japanese-clip-vit-b-16: ViT-B/16 tower + japanese-roberta-base;
    # arange positions per rinna's tokenize protocol (see BertTextConfig)
    "ja_clip-vit-b-16": JaCLIPConfig(
        "ja_clip-vit-b-16",
        BertTextConfig(position_convention="arange"),
        CLIP_CONFIGS["ViT-B-16"],
    ),
    "test-tiny": JaCLIPConfig(
        "test-tiny",
        BertTextConfig(
            vocab_size=128, hidden=32, layers=2, heads=2, intermediate=64,
            max_positions=64,
        ),
        CLIP_CONFIGS["test-tiny"],
        embed_dim=CLIP_CONFIGS["test-tiny"].embed_dim,
    ),
}


def default_position_ids(
    input_ids: jax.Array, attention_mask: jax.Array, cfg: BertTextConfig
) -> jax.Array:
    """Position ids per `cfg.position_convention` (see BertTextConfig):
    'roberta' counts real tokens from `position_offset` with pads pinned to
    pad_token_id; 'arange' is rinna's explicit arange(seq_len) protocol."""
    if cfg.position_convention == "arange":
        return jnp.broadcast_to(
            jnp.arange(input_ids.shape[-1], dtype=jnp.int32), input_ids.shape
        )
    pos = jnp.cumsum(attention_mask, axis=-1) - 1 + cfg.position_offset
    return jnp.where(attention_mask > 0, pos, cfg.pad_token_id).astype(jnp.int32)


def _attn(h, bp, cfg: BertTextConfig, bias):
    b, t, d = h.shape
    hd = d // cfg.heads

    def proj(x, w, bb):
        return (x @ w + bb).reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)

    q = proj(h, bp["q_w"], bp["q_b"])
    k = proj(h, bp["k_w"], bp["k_b"])
    v = proj(h, bp["v_w"], bp["v_b"])
    # XLA's fused einsum attention; bias carries the padding mask
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(hd)) + bias
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
    return o @ bp["o_w"] + bp["o_b"]


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def bert_text_forward(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: BertTextConfig,
    *,
    position_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, T) ids -> (B, T, D) last hidden state, HF BertModel/RobertaModel
    semantics (post-LN residual blocks, gelu intermediate)."""
    if position_ids is None:
        position_ids = default_position_ids(input_ids, attention_mask, cfg)
    emb = (
        params["word_emb"][input_ids]
        + params["pos_emb"][position_ids]
        + params["type_emb"][jnp.zeros_like(input_ids)]
    )
    h = _ln(emb, params["emb_ln_w"], params["emb_ln_b"], cfg.layer_norm_eps)

    bias = (1.0 - attention_mask[:, None, None, :].astype(h.dtype)) * -1e9

    def body(h, bp):
        a = _attn(h, bp, cfg, bias)
        h = _ln(h + a, bp["ln1_w"], bp["ln1_b"], cfg.layer_norm_eps)
        f = jax.nn.gelu(h @ bp["ff1_w"] + bp["ff1_b"], approximate=False)
        f = f @ bp["ff2_w"] + bp["ff2_b"]
        h = _ln(h + f, bp["ln2_w"], bp["ln2_b"], cfg.layer_norm_eps)
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    return h


def encode_text(
    params: Params,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: JaCLIPConfig,
    *,
    position_ids: Optional[jax.Array] = None,
    normalize: bool = False,
) -> jax.Array:
    """(B, T) -> (B, embed_dim): pooled BERT feature through the text
    projection (reference wrapper's model.get_text_features)."""
    h = bert_text_forward(
        params["text"], input_ids, attention_mask, cfg.text,
        position_ids=position_ids,
    )
    if cfg.text.pool == "cls":
        pooled = h[:, 0]
    else:  # masked mean
        m = attention_mask[..., None].astype(h.dtype)
        pooled = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    if cfg.proj_arch == "mlp":
        tp = params["text_projection"]
        e = jax.nn.gelu(pooled @ tp["fc_w"], approximate=False) @ tp["out_w"]
    else:
        e = pooled @ params["text_projection"]
    if normalize:
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
    return e


def encode_image(params: Params, x: jax.Array, cfg: JaCLIPConfig, **kw):
    """Image tower IS the CLIP ViT: params carries a CLIP-layout 'visual'
    subtree (reference wrapper's model.get_image_features)."""
    from robustvlm_tpu.models.clip.model import encode_image as clip_encode

    return clip_encode(params, x, cfg.vision, **kw)


def wrap_hf_ja_tokenizer(tok, max_len: int = 77):
    """rinna's ja_clip.tokenize protocol over an HF tokenizer object:
    encode with add_special_tokens=False to max_len-1, then prepend
    cls_token_id by hand (rinna's T5-based japanese-roberta-base tokenizer
    does NOT auto-add [CLS]; the package prepends it explicitly). Exposed
    separately from `get_ja_tokenizer` so the protocol is unit-testable
    without a downloadable tokenizer dir."""
    cls_id = getattr(tok, "cls_token_id", None)
    if cls_id is None:
        cls_id = getattr(tok, "bos_token_id", None)
    if cls_id is None:
        raise ValueError(
            "ja_clip tokenizer needs a cls_token_id (or bos_token_id) to "
            "prepend — rinna's protocol pools the prepended [CLS] slot"
        )

    def tokenize(texts):
        out = tok(
            list(texts), padding="max_length", truncation=True,
            max_length=max_len - 1, add_special_tokens=False,
            return_tensors="np",
        )
        ids = np.asarray(out["input_ids"], np.int32)
        mask = np.asarray(out["attention_mask"], np.int32)
        ids = np.concatenate(
            [np.full((ids.shape[0], 1), cls_id, np.int32), ids], axis=1
        )
        mask = np.concatenate(
            [np.ones((mask.shape[0], 1), np.int32), mask], axis=1
        )
        return jnp.asarray(ids), jnp.asarray(mask)

    return tokenize


def get_ja_tokenizer(path: Optional[str], cfg: JaCLIPConfig, max_len: int = 77):
    """tokenize(texts) -> (input_ids, attention_mask) int32 arrays.

    With a local HF tokenizer dir (rinna/japanese-roberta-base layout) this
    follows rinna's ja_clip.tokenize exactly (see `wrap_hf_ja_tokenizer`).
    Without one (no-egress test environments) a deterministic hash tokenizer
    keeps the pipeline runnable on random weights — it mirrors the same
    protocol: a CLS slot (id 0) first, then content tokens."""
    if path:
        from transformers import AutoTokenizer

        return wrap_hf_ja_tokenizer(
            AutoTokenizer.from_pretrained(path), max_len
        )

    import zlib

    v = cfg.text.vocab_size

    def tokenize(texts):
        ids = np.full((len(texts), max_len), cfg.text.pad_token_id, np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for i, t in enumerate(texts):
            # CLS slot (id 0, outside the hash range) first — the 'cls'
            # pool reads h[:, 0], which must be a constant token like in
            # the real protocol. crc32, not hash(): PYTHONHASHSEED-
            # independent, so runs are reproducible across processes.
            toks = [0] + [
                2 + (zlib.crc32(w.encode()) % (v - 3))
                for w in str(t).split()
            ][: max_len - 1]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    return tokenize


def build_ja_text_classifier(
    params: Params,
    cfg: JaCLIPConfig,
    tokenize,
    classnames,
    templates=None,
) -> jax.Array:
    """(D, C) column-normalized template-ensemble classifier — the CLIP
    recipe (eval/classifier.build_text_classifier) over the BERT tower:
    per class, mean of normalized template embeddings, re-normalized."""
    from robustvlm_tpu.benchmark.templates import format_prompts

    enc = jax.jit(
        lambda p, ids, mask: encode_text(p, ids, mask, cfg, normalize=True)
    )
    tpls = list(templates) if templates else ["{c}"]
    cols = []
    for name in classnames:
        ids, mask = tokenize(format_prompts(tpls, name))
        e = enc(params, ids, mask)
        m = jnp.mean(e, axis=0)
        cols.append(m / jnp.linalg.norm(m))
    return jnp.stack(cols, axis=1)  # (D, C)


def init_jaclip_params(rng: jax.Array, cfg: JaCLIPConfig) -> Params:
    from robustvlm_tpu.models.clip.model import init_clip_params

    kt, kv, kp = jax.random.split(rng, 3)
    tc = cfg.text
    d, l = tc.hidden, tc.layers
    s = d ** -0.5
    ks = jax.random.split(kt, 12)

    def nrm(k, shape, scale=0.02):
        return jax.random.normal(k, shape) * scale

    text = {
        "word_emb": nrm(ks[0], (tc.vocab_size, d)),
        "pos_emb": nrm(ks[1], (tc.max_positions, d)),
        "type_emb": nrm(ks[2], (tc.type_vocab, d)),
        "emb_ln_w": jnp.ones((d,)),
        "emb_ln_b": jnp.zeros((d,)),
        "blocks": {
            "q_w": nrm(ks[3], (l, d, d), s),
            "q_b": jnp.zeros((l, d)),
            "k_w": nrm(ks[4], (l, d, d), s),
            "k_b": jnp.zeros((l, d)),
            "v_w": nrm(ks[5], (l, d, d), s),
            "v_b": jnp.zeros((l, d)),
            "o_w": nrm(ks[6], (l, d, d), s),
            "o_b": jnp.zeros((l, d)),
            "ln1_w": jnp.ones((l, d)),
            "ln1_b": jnp.zeros((l, d)),
            "ff1_w": nrm(ks[7], (l, d, tc.intermediate), s),
            "ff1_b": jnp.zeros((l, tc.intermediate)),
            "ff2_w": nrm(ks[8], (l, tc.intermediate, d), tc.intermediate ** -0.5),
            "ff2_b": jnp.zeros((l, d)),
            "ln2_w": jnp.ones((l, d)),
            "ln2_b": jnp.zeros((l, d)),
        },
    }
    clip = init_clip_params(kv, cfg.vision)
    if cfg.proj_arch == "mlp":
        kp1, kp2 = jax.random.split(kp)
        hid = cfg.proj_hidden
        proj = {
            "fc_w": nrm(kp1, (d, hid), s),
            "out_w": nrm(kp2, (hid, cfg.embed_dim), hid ** -0.5),
        }
    else:
        proj = nrm(kp, (d, cfg.embed_dim), s)
    return {
        "text": text,
        "text_projection": proj,
        "visual": clip["visual"],
        "logit_scale": jnp.asarray(2.659260036932778),  # ln(1/0.07), CLIP init
    }
