"""Prompt-lookup speculative decoding for the single-stream serving path.

Checkpoint-free speculative decoding (prompt-lookup decoding, the n-gram
drafter behind HF assisted generation): draft the next k tokens by copying
the continuation of the most recent earlier occurrence of the current
n-gram suffix, then verify all k drafts AND harvest one bonus token in ONE
cached decode step of width k+1. Greedy verification keeps the output
TOKEN-EXACT vs plain greedy decode by construction: every emitted token is
an argmax of the true model's logits given the true emitted prefix — the
drafter only decides how many of them one device step yields.

Why this pays on TPU serving: the batch-1 decode step is HBM-weight-bound
(measured on v5e: bf16 18.13 ms/step = 749 GB/s of pure weight read; int8
10.2 ms — CLAUDE.md), so a width-(k+1) verify step reads the SAME weight
bytes as a width-1 step and its extra FLOPs are noise next to the memory
stream. Every accepted draft token is therefore one full weight pass AND
one ~30 ms tunnel dispatch saved; a fully rejected draft costs only the
epsilon compute of the wider step. Expected single-stream speedup is
1 + E[accepted tokens per step] minus that epsilon.

Reference match: the reference worker serves HF fp16 generation strictly
one token per forward (llava/serve/model_worker.py:126-226) — no
speculative path exists there; this is a beyond-reference serving feature.

Cache-slot safety (why rejected drafts can't poison later steps): a verify
step at depth `pos` writes KV rows for its k+1 input tokens at slots
[pos, pos+k]. Accepting m drafts moves the depth to pos' = pos+m+1 and
leaves slots [pos', pos+k] stale. The NEXT verify step writes slots
[pos', pos'+k] ⊇ that stale range BEFORE any attention read
(llama.model._block updates the cache first), and in the meantime the
slot-indexed causal mask (key slot jj <= query slot, llama.model._attn)
hides every slot beyond the current query — so a stale row is never read.
The lane cache carries k spill slots past t_prompt+max_new so the final
verify (which may start at depth t_prompt+max_new-1) stays in bounds.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def draft_prompt_lookup(
    ids: Sequence[int], k: int, *, max_ngram: int = 3
) -> List[int]:
    """Draft k tokens by n-gram lookup over `ids` (prompt + everything
    generated so far, ending with the token about to be fed): for n from
    max_ngram down to 1, find the MOST RECENT earlier occurrence of the
    last-n-token suffix and return the k tokens that followed it. No match
    at any n (or a match flush against the end) falls back to repeating
    the last token — a deliberately cheap guess: verification makes any
    draft safe, and at batch 1 a wrong draft costs ~nothing (the verify
    step's weight read dominates and is width-independent)."""
    if k <= 0:
        return []
    ids = list(ids)
    t = len(ids)
    for n in range(min(max_ngram, t - 1), 0, -1):
        suffix = ids[t - n:]
        # latest match strictly before the suffix's own position, with at
        # least one continuation token available
        for i in range(t - n - 1, -1, -1):
            if ids[i: i + n] == suffix and i + n < t:
                cont = ids[i + n: i + n + k]
                if len(cont) < k:
                    cont = cont + [ids[-1]] * (k - len(cont))
                return cont
    return [ids[-1]] * k


def _spec_cores(model, t_prompt: int, max_new: int, k: int):
    """Cached jitted (prefill, verify) pair on the model's compiled-core
    cache (params ride as OPERANDS — bound-model protocol, CLAUDE.md).

    prefill(params, x01, pre, toks, n_pad) -> (first_tok (B,), cache)
        identical to the stream prefill, but the cache carries k spill
        slots (see module docstring).
    verify(params, x01, pre, toks_k1, cache, pos, n_pad)
        -> ((B, k+1) greedy tokens, cache)
        toks_k1 = [last_emitted, draft_1..draft_k]; one decode step of
        width k+1 at depth `pos`. Row j of the result is the model's
        greedy token AFTER consuming toks_k1[:, :j+1] — row 0 checks
        draft_1, ..., row k-1 checks draft_k, row k is the bonus token."""
    from robustvlm_tpu.models.llava.model import make_llava_decode_fns

    key = ("spec", t_prompt, max_new, k, model.quantize_kv)
    pair = model._gen_cores.get(key)
    if pair is None:
        cfg, dtype = model.cfg, model.compute_dtype
        kv_bits = 8 if model.quantize_kv else 0
        total = t_prompt + max_new + k  # k spill slots for the last verify

        def prefill(params, x01, pre, toks, n_pad):
            pf, _ = make_llava_decode_fns(
                params, cfg, x01, pre, max_total_len=total,
                compute_dtype=dtype, kv_bits=kv_bits,
            )
            t = toks.shape[1]
            kv_valid0 = jnp.arange(t)[None, :] >= n_pad[:, None]
            positions = jnp.maximum(
                jnp.arange(t)[None, :] - n_pad[:, None], 0
            )
            logits, cache = pf(toks, kv_valid0, positions)
            return jnp.argmax(logits, axis=-1), cache

        def verify(params, x01, pre, toks_k1, cache, pos, n_pad):
            _, df = make_llava_decode_fns(
                params, cfg, x01, pre, max_total_len=total,
                compute_dtype=dtype, kv_bits=kv_bits,
            )
            sl = jnp.arange(total)[None, :]
            # valid keys: past depth plus the k+1 rows this step writes
            # (all of [pos, pos+k] is freshly written before attention;
            # per-query causality comes from the slot-indexed mask inside
            # _attn via cache_pos)
            kv_mask = (sl >= n_pad[:, None]) & (sl < pos + k + 1)
            qpos = (pos - n_pad)[:, None] + jnp.arange(k + 1)[None, :]
            logits, cache = df(toks_k1, cache, pos, kv_mask, qpos)
            return jnp.argmax(logits, axis=-1), cache

        pair = model._gen_cores[key] = (jax.jit(prefill), jax.jit(verify))
    return pair


def spec_stream_tokens(
    model,
    x01: jax.Array,
    prompts: Sequence[str],
    max_new_tokens: int,
    *,
    k: int = 8,
    max_ngram: int = 3,
    drafter: Optional[Callable[[Sequence[int], int], List[int]]] = None,
    stats: Optional[dict] = None,
):
    """Speculative greedy decode for ONE stream: yields (1,) int32 arrays,
    one per token, in exactly the order/values of
    `model.stream_tokens(x01, prompts, max_new_tokens)` — but generated in
    bursts of 1..k+1 tokens per device dispatch. Batch 1 only (lanes with
    divergent acceptance would need ragged per-lane depths; the continuous
    engine is the batched serving path).

    drafter(history_ids, k) -> k proposed ids; defaults to
    draft_prompt_lookup. stats (optional dict) is updated in place with
    verify_steps / emitted / accept_rate for benchmarking."""
    if x01.shape[0] != 1 or len(prompts) != 1:
        raise ValueError(
            f"speculative decode is single-stream (batch 1); got batch "
            f"{x01.shape[0]} — use the continuous engine for multi-lane"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if drafter is None:
        def drafter(ids, kk):
            return draft_prompt_lookup(ids, kk, max_ngram=max_ngram)

    if stats is not None:
        stats.update({"verify_steps": 0, "emitted": 0, "accept_rate": 0.0})
    if max_new_tokens <= 0:
        return

    pre_ids, toks, n_pad = model._tokenize_gen(prompts)
    t = toks.shape[1]
    prefill_j, verify_j = _spec_cores(model, t, max_new_tokens, k)
    params = model._gen_params()
    pre = jnp.asarray([pre_ids])
    n_pad_dev = jnp.asarray(n_pad)
    nxt_dev, cache = prefill_j(
        params, x01, pre, jnp.asarray(toks), n_pad_dev
    )
    eos = model.tok.eos_token_id
    # drafting history: prompt (unpadded) + every token emitted so far;
    # pre_ids anchor the lookup in the prompt text (the image splice is
    # invisible to the n-gram drafter, which is fine — it drafts text)
    history = list(pre_ids) + [int(v) for v in toks[0][int(n_pad[0]):]]
    nxt = int(np.asarray(nxt_dev)[0])
    emitted = 0
    pos = t  # next free cache slot in the post region
    steps = 0
    accepted = 0
    try:
        while True:
            yield np.asarray([nxt], np.int32)
            emitted += 1
            if nxt == eos or emitted >= max_new_tokens:
                return
            history.append(nxt)
            draft = list(drafter(history, k))
            if len(draft) != k:
                raise ValueError(
                    f"drafter returned {len(draft)} tokens, expected {k}"
                )
            toks_k1 = jnp.asarray(
                np.asarray([[nxt] + draft], np.int32)
            )
            preds_dev, cache = verify_j(
                params, x01, pre, toks_k1, cache, pos, n_pad_dev
            )
            preds = np.asarray(preds_dev)[0]  # (k+1,)
            steps += 1
            m = 0
            while m < k and int(draft[m]) == int(preds[m]):
                m += 1
            accepted += m
            pos += m + 1
            # emit the m accepted drafts now; the bonus token preds[m]
            # becomes the next loop-top emission (and next verify input)
            for j in range(m):
                tok = int(preds[j])
                yield np.asarray([tok], np.int32)
                emitted += 1
                history.append(tok)
                if tok == eos or emitted >= max_new_tokens:
                    return
            nxt = int(preds[m])
    finally:
        if stats is not None:
            stats["verify_steps"] = steps
            stats["emitted"] = emitted
            # fraction of drafted tokens the model confirmed (bonus tokens
            # are free regardless and excluded from the rate)
            stats["accept_rate"] = (
                accepted / (steps * k) if steps else 0.0
            )
