"""Autoregressive generation: jitted greedy and beam decode with KV cache.

Replaces the reference's HF `model.generate` calls (beam search with length
penalty + stop handling, reference open_flamingo/src/flamingo.py:126-193,
llava eval models :73-96). TPU-first: the whole decode is a `lax.scan` of a
single-token step over a static-length KV cache; prompts are LEFT-padded so
every example writes cache slot T+i at step i (no per-example dynamic
offsets), with a key-validity mask hiding pad slots.

Model-agnostic: driven by a `prefill_fn` / `decode_fn` pair so CLIP-LLaMA
(LLaVA) and Flamingo share it.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def left_pad(
    seqs: Sequence[Sequence[int]], pad_id: int = 0, length: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (tokens (B, T) left-padded, n_pad (B,))."""
    t = length or max(len(s) for s in seqs)
    out = np.full((len(seqs), t), pad_id, np.int32)
    n_pad = np.zeros((len(seqs),), np.int32)
    for i, s in enumerate(seqs):
        s = list(s)[-t:]
        out[i, t - len(s):] = s
        n_pad[i] = t - len(s)
    return out, n_pad


class GenerateResult(NamedTuple):
    tokens: jax.Array   # (B, max_new_tokens) generated ids (pad after EOS)
    scores: jax.Array   # (B,) sequence log-prob (length-penalized for beam)


def greedy_generate(
    prefill_fn: Callable,
    decode_fn: Callable,
    prompt_tokens: jax.Array,
    n_pad: jax.Array,
    *,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int = 0,
) -> GenerateResult:
    """prefill_fn(tokens, kv_mask, positions) -> (logits_last (B, V), cache);
    decode_fn(tok (B,1), cache, pos, kv_mask, positions) -> (logits, cache).
    """
    b, t = prompt_tokens.shape
    kv_valid0 = jnp.arange(t)[None, :] >= n_pad[:, None]  # (B, T)
    positions = jnp.maximum(jnp.arange(t)[None, :] - n_pad[:, None], 0)
    logits, cache = prefill_fn(prompt_tokens, kv_valid0, positions)

    total = t + max_new_tokens
    kv_mask0 = jnp.concatenate(
        [kv_valid0, jnp.zeros((b, max_new_tokens), bool)], axis=1
    )

    def step(carry, i):
        tok, cache, kv_mask, done, logp, logits = carry
        nxt = jnp.argmax(logits, axis=-1)  # (B,)
        lp = jax.nn.log_softmax(logits, axis=-1)
        logp = logp + jnp.where(
            done, 0.0, jnp.take_along_axis(lp, nxt[:, None], axis=1)[:, 0]
        )
        nxt = jnp.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        kv_mask = kv_mask.at[:, t + i].set(True)
        pos = t + i
        qpos = (pos - n_pad)[:, None]  # (B, 1) true positions
        logits_next, cache = decode_fn(
            nxt[:, None], cache, pos, kv_mask, qpos
        )
        return (nxt, cache, kv_mask, done, logp, logits_next[:, -1]), nxt

    init = (
        jnp.zeros((b,), jnp.int32), cache, kv_mask0,
        jnp.zeros((b,), bool), jnp.zeros((b,), jnp.float32), logits,
    )
    (_, _, _, _, logp, _), toks = jax.lax.scan(
        step, init, jnp.arange(max_new_tokens)
    )
    return GenerateResult(tokens=toks.T, scores=logp)


def beam_generate(
    prefill_fn: Callable,
    decode_fn: Callable,
    prompt_tokens: jax.Array,
    n_pad: jax.Array,
    *,
    max_new_tokens: int,
    eos_id: int,
    num_beams: int = 3,
    length_penalty: float = 0.0,
    pad_id: int = 0,
) -> GenerateResult:
    """Batched beam search with HF-style length penalty
    (score = logp / len**length_penalty). Cache rows are physically
    reordered each step with jnp.take — B*num_beams cache rows total.

    Carry reordering: by default every carry leaf is assumed (L, B, ...)
    with batch on axis 1 (the llama/mpt cache layout). Decode-fn families
    whose carry holds extra batch-axis-0 state (Flamingo media_locations,
    LLaVA-MPT kv position tables) attach a `reorder_carry(carry, gather)`
    attribute to their prefill_fn."""
    b, t = prompt_tokens.shape
    nb = num_beams
    reorder = getattr(
        prefill_fn, "reorder_carry",
        lambda carry, gather: jax.tree.map(
            lambda a: jnp.take(a, gather, axis=1), carry
        ),
    )

    def rep(x):  # (B, ...) -> (B*nb, ...)
        return jnp.repeat(x, nb, axis=0)

    tokens_r = rep(prompt_tokens)
    n_pad_r = rep(n_pad)
    kv_valid0 = jnp.arange(t)[None, :] >= n_pad_r[:, None]
    positions = jnp.maximum(jnp.arange(t)[None, :] - n_pad_r[:, None], 0)
    logits, cache = prefill_fn(tokens_r, kv_valid0, positions)
    kv_mask0 = jnp.concatenate(
        [kv_valid0, jnp.zeros((b * nb, max_new_tokens), bool)], axis=1
    )

    # beam log-probs: beam 0 starts at 0, others at -inf (standard trick so
    # the first expansion picks the top-nb continuations of beam 0)
    beam_lp = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((nb - 1,), -1e9)]), (b,)
    )
    done = jnp.zeros((b * nb,), bool)
    out_toks = jnp.full((b * nb, max_new_tokens), pad_id, jnp.int32)

    def step(carry, i):
        cache, kv_mask, beam_lp, done, out_toks, logits = carry
        lp = jax.nn.log_softmax(logits, axis=-1)  # (B*nb, V)
        v = lp.shape[-1]
        # finished beams only propose EOS at score 0 (freeze their score)
        lp = jnp.where(
            done[:, None],
            jnp.full_like(lp, -1e9).at[:, eos_id].set(0.0),
            lp,
        )
        cand = (beam_lp[:, None] + lp).reshape(b, nb * v)
        top_lp, top_idx = jax.lax.top_k(cand, nb)          # (B, nb)
        src_beam = top_idx // v                             # (B, nb)
        tok = (top_idx % v).astype(jnp.int32)               # (B, nb)
        gather = (jnp.arange(b)[:, None] * nb + src_beam).reshape(-1)

        cache = reorder(cache, gather)
        kv_mask = jnp.take(kv_mask, gather, axis=0)
        out_toks = jnp.take(out_toks, gather, axis=0)
        done = jnp.take(done, gather, axis=0)
        tok_flat = tok.reshape(-1)
        tok_flat = jnp.where(done, pad_id, tok_flat)
        out_toks = out_toks.at[:, i].set(tok_flat)
        beam_lp = top_lp.reshape(-1)
        done = done | (tok_flat == eos_id)

        kv_mask = kv_mask.at[:, t + i].set(True)
        qpos = (t + i - n_pad_r)[:, None]
        logits_next, cache = decode_fn(
            tok_flat[:, None], cache, t + i, kv_mask, qpos
        )
        return (cache, kv_mask, beam_lp, done, out_toks, logits_next[:, -1]), None

    init = (cache, kv_mask0, beam_lp, done, out_toks, logits)
    (cache, _, beam_lp, done, out_toks, _), _ = jax.lax.scan(
        step, init, jnp.arange(max_new_tokens)
    )

    # length-penalized selection per batch row
    lengths = jnp.sum(out_toks != pad_id, axis=1).astype(jnp.float32)
    denom = jnp.maximum(lengths, 1.0) ** length_penalty
    score = beam_lp / denom
    score_b = score.reshape(b, nb)
    best = jnp.argmax(score_b, axis=1)
    sel = jnp.arange(b) * nb + best
    return GenerateResult(
        tokens=jnp.take(out_toks, sel, axis=0),
        scores=jnp.take(score, sel, axis=0),
    )


def greedy_generate_stream(
    prefill_fn: Callable,
    decode_fn: Callable,
    prompt_tokens: jax.Array,
    n_pad: jax.Array,
    *,
    max_new_tokens: int,
    eos_id: int,
    pad_id: int = 0,
):
    """Host-driven greedy decode yielding one (B,) token-id array per step
    — the serving stream path (reference model_worker generate_stream).

    Same argmax semantics as greedy_generate; runs the decode step eagerly
    so tokens surface as produced (and nothing jits over the closed-over
    param tree). Stops early when every row has emitted EOS.
    """
    b, t = prompt_tokens.shape
    kv_valid0 = jnp.arange(t)[None, :] >= n_pad[:, None]
    positions = jnp.maximum(jnp.arange(t)[None, :] - n_pad[:, None], 0)
    logits, cache = prefill_fn(prompt_tokens, kv_valid0, positions)
    kv_mask = jnp.concatenate(
        [kv_valid0, jnp.zeros((b, max_new_tokens), bool)], axis=1
    )
    done = np.zeros((b,), bool)
    for i in range(max_new_tokens):
        nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
        nxt = np.where(done, pad_id, nxt)
        done = done | (nxt == eos_id)
        yield nxt.copy()
        if done.all():
            return
        kv_mask = kv_mask.at[:, t + i].set(True)
        qpos = (t + i - n_pad)[:, None]
        logits, cache = decode_fn(
            jnp.asarray(nxt)[:, None], cache, t + i, kv_mask, qpos
        )
        logits = logits[:, -1]


def strip_after_eos(tokens: np.ndarray, eos_id: int, pad_id: int = 0):
    """Host-side: list of token lists truncated at the first EOS."""
    out = []
    for row in np.asarray(tokens):
        ids = []
        for t in row:
            if t == eos_id or t == pad_id:
                break
            ids.append(int(t))
        out.append(ids)
    return out
