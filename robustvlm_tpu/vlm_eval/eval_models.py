"""VLM eval-model adapters: the threat-model layer (L2) for VLM attacks.

Equivalents of reference EvalModelAdv (open_flamingo/eval/models/
of_eval_model_adv.py:18-243) and EvalModelLLAVA (models/llava.py:19-185):
hold params + tokenizer, build prompts, cache tokenized adversarial targets
(`set_inputs`), expose `loss(x01) -> (B,) per-sample loss` for the attack
loop and `get_outputs(x01) -> captions` for generation — pixels always
unnormalized [0,1], normalization inside the forward.

Tokenizer protocol (duck-typed): encode(str)->List[int], decode(ids)->str,
plus eos_token_id / pad_token_id attributes. transformers tokenizers
satisfy it; WordTokenizer is the test stand-in.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.models.generation import (
    beam_generate,
    greedy_generate,
    left_pad,
    strip_after_eos,
)


class WordTokenizer:
    """Deterministic whitespace/hash tokenizer for tests; reserves ids:
    0=pad, 1=bos, 2=eos, vocab-1=<image> media token."""

    def __init__(self, vocab_size: int = 512):
        self.vocab_size = vocab_size
        self.pad_token_id = 0
        self.bos_token_id = 1
        self.eos_token_id = 2
        self.media_token_id = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        import zlib

        out = []
        for w in text.strip().split():
            if w == "<image>":
                out.append(self.media_token_id)
            else:
                out.append(3 + zlib.crc32(w.encode()) % (self.vocab_size - 5))
        return out

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(f"tok{int(i)}" for i in ids)




def truncate_at_stops(text: str, stop_strings) -> str:
    """Host-side stop-string handling (reference KeywordsStoppingCriteria,
    llava/mm_utils.py:78: generation halts at conversation separators; here
    the decoded text is truncated at the first stop occurrence)."""
    for stop in stop_strings or ():
        idx = text.find(stop)
        if idx >= 0:
            text = text[:idx]
    return text.strip()


def _encode_plain(tok, text: str) -> List[int]:
    """Encode a plain-text segment in ONE tokenizer call, without the
    tokenizer's own special tokens (adapters add BOS/EOS explicitly). HF
    tokenizers take add_special_tokens; the test stand-ins don't."""
    try:
        return list(tok.encode(text, add_special_tokens=False))
    except TypeError:
        return list(tok.encode(text))


def _pad_right(seqs: Sequence[Sequence[int]], pad: int, length: int):
    out = np.full((len(seqs), length), pad, np.int32)
    mask = np.zeros((len(seqs), length), np.float32)
    for i, s in enumerate(seqs):
        s = list(s)[:length]
        out[i, : len(s)] = s
        mask[i, : len(s)] = 1.0
    return out, mask


@dataclasses.dataclass
class _CachedInputs:
    pre: jax.Array          # (B, T_pre) prompt tokens before the image
    post: jax.Array         # (B, T_post) tokens after the image (incl answer)
    labels: jax.Array       # (B, T_post)
    label_mask: jax.Array   # (B, T_post) 1.0 on answer tokens


class LlavaEvalModel:
    """EvalModelLLAVA equivalent. `__call__(x)` returns per-sample HF-style
    mean CE over the answer span (reference models/llava.py:98-113)."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        *,
        compute_dtype=jnp.bfloat16,
        remat: bool = False,
        max_post_len: int = 64,
        quantize_decode: bool = False,
    ):
        from robustvlm_tpu.models.llava.model import llava_per_sample_loss

        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.max_post_len = max_post_len
        self._cached: Optional[_CachedInputs] = None
        # quantize_decode: serve generation from weight-only quantized LM
        # blocks (ops/quant.py — decode is HBM-bandwidth-bound, int8 halves
        # the bytes/step, int4 halves them again). Truthy values select
        # bits: True/8 -> int8, 4 -> packed int4 group-128. Quantized
        # LAZILY on first generate so attack-only use pays nothing; the fp
        # tree is kept for the loss/attack path (the threat model is
        # defined on the fp model). NOTE at 7B both trees don't fit one
        # 16 GiB chip — a serving-only worker must call
        # quantize_for_serving() instead (progressive, in place, drops the
        # fp tree) or shard fsdp over 2 chips.
        self.quantize_decode = quantize_decode
        # int8 KV cache for generation (llama.model._quantize_kv): halves
        # the decode step's cache-read bytes; orthogonal to weight quant
        self.quantize_kv = False
        self._decode_params = None  # (bits, tree) once built
        self._fp_dropped = False
        # jitted generation cores, keyed (max_new, num_beams, length
        # penalty); jit itself keys on shapes + param-tree structure. The
        # whole generate (prefill + splice + scan) is ONE compiled program
        # with params/pixels/tokens as runtime OPERANDS — the serving
        # worker's hot path (an eager composition would re-dispatch the
        # vision tower op-by-op over the tunnel per request)
        self._gen_cores: dict = {}

        def loss_fn(p, x, pre, post, labels, mask):
            return llava_per_sample_loss(
                p, x, pre, post, labels, mask, cfg,
                compute_dtype=compute_dtype, remat=remat,
                reduction_per_token="mean",
            )

        # params as jit args (not closure constants): fast compiles + stable
        # persistent-cache keys
        jitted = jax.jit(loss_fn)
        self._loss = lambda *a: jitted(self.params, *a)

        # bound-model protocol (attacks/apgd.py): params AND the cached
        # teacher-forcing tokens ride as runtime operands of the compiled
        # attack core — never HLO constants (CLAUDE.md: closed-over trees
        # mean hundred-MB programs + per-prompt recompiles + a latent
        # stale-prompt hazard if the core cache ever hits)
        def pure(p, pre, post, labels, mask, x01):
            return loss_fn(p, x01, pre, post, labels, mask)

        self.pure = pure

    # ---- prompt builders (reference models/llava.py:148-185)
    def get_caption_prompt(self, caption: Optional[str] = None) -> str:
        from robustvlm_tpu.models.llava.conversation import get_caption_prompt

        return get_caption_prompt(caption)

    def get_vqa_prompt(self, question: str, answer: Optional[str] = None) -> str:
        from robustvlm_tpu.models.llava.conversation import get_vqa_prompt

        return get_vqa_prompt(question, answer)

    def set_inputs(self, full_prompts: Sequence[str]):
        """Tokenize teacher-forcing prompts; loss is masked to the span after
        the last 'ASSISTANT:' (reference :115-133)."""
        from robustvlm_tpu.models.llava.conversation import answer_span, split_at_image

        pres, posts, masks = [], [], []
        for p in full_prompts:
            pre_txt, post_txt = split_at_image(p)
            ctx, ans = answer_span(post_txt)
            pre_ids = [self.tok.bos_token_id] + _encode_plain(self.tok, pre_txt)
            ctx_ids = _encode_plain(self.tok, ctx)
            ans_ids = _encode_plain(self.tok, ans) + [self.tok.eos_token_id]
            pres.append(pre_ids)
            posts.append(ctx_ids + ans_ids)
            masks.append([0.0] * len(ctx_ids) + [1.0] * len(ans_ids))
        t_pre = max(len(p) for p in pres)
        pre_arr, _ = _pad_right(pres, self.tok.pad_token_id, t_pre)
        post_arr, valid = _pad_right(posts, self.tok.pad_token_id, self.max_post_len)
        mask_arr = np.zeros_like(valid)
        for i, m in enumerate(masks):
            m = m[: self.max_post_len]
            mask_arr[i, : len(m)] = m
        self._cached = _CachedInputs(
            pre=jnp.asarray(pre_arr),
            post=jnp.asarray(post_arr),
            labels=jnp.asarray(post_arr),
            label_mask=jnp.asarray(mask_arr),
        )

    def quantize_for_serving(self, bits: int = 8) -> None:
        """SERVING-ONLY: progressively quantize the LM decode weights IN
        PLACE (ops/quant.quantize_decode_params_inplace) — peak HBM stays
        ~the fp tree (the lazy quantize_decode path holds fp + quantized
        trees, 19.8 GiB at 7B -> OOM on one 16 GiB v5e). The fp weights
        are GONE afterwards, so the loss/attack path is disabled: the
        threat model is defined on the fp model and quantized gradients
        would silently misreport it. serve/model_worker.py calls this at
        startup for --quantize-decode."""
        from robustvlm_tpu.ops.quant import quantize_decode_params_inplace

        bits = 8 if int(bits) == 1 else int(bits)
        quantize_decode_params_inplace(self.params, bits=bits)
        self.quantize_decode = bits
        self._decode_params = (bits, self.params)
        self._fp_dropped = True

    def _require_fp(self):
        if self._fp_dropped:
            raise RuntimeError(
                "loss/attack path disabled: quantize_for_serving() dropped "
                "the fp weights (serving-only mode); build a fresh model "
                "for attacks"
            )

    @property
    def bound_args(self):
        self._require_fp()
        c = self._cached
        assert c is not None, "call set_inputs first"
        return (self.params, c.pre, c.post, c.labels, c.label_mask)

    def __call__(self, x01: jax.Array) -> jax.Array:
        self._require_fp()
        c = self._cached
        assert c is not None, "call set_inputs first"
        return self._loss(x01, c.pre, c.post, c.labels, c.label_mask)

    DEFAULT_STOPS = ("</s>", "USER:")

    def _tokenize_gen(self, prompts):
        """Host-side generation tokenization: (pre_ids, left-padded post
        tokens, n_pad). All prompts share the pre-image segment (the vicuna
        system prompt — one image tower run serves the batch)."""
        from robustvlm_tpu.models.llava.conversation import split_at_image

        pre_txt, _ = split_at_image(prompts[0])
        pre_ids = [self.tok.bos_token_id] + _encode_plain(self.tok, pre_txt)
        post_seqs = [_encode_plain(self.tok, split_at_image(p)[1]) for p in prompts]
        toks, n_pad = left_pad(post_seqs, self.tok.pad_token_id)
        return pre_ids, toks, n_pad

    def _gen_params(self):
        """The tree generation runs on: fp, or the (cached) weight-only
        quantized decode tree when quantize_decode is set."""
        if not self.quantize_decode:
            return self.params
        bits = int(self.quantize_decode)
        bits = 8 if bits == 1 else bits  # True -> int8
        # cache keyed on the RESOLVED bits: changing quantize_decode
        # after a generate (8 -> 4) must rebuild, not silently serve
        # the stale width
        if self._decode_params is None or self._decode_params[0] != bits:
            if self._fp_dropped:
                raise RuntimeError(
                    "cannot requantize to a different width after "
                    "quantize_for_serving(): the fp weights are gone"
                )
            from robustvlm_tpu.ops.quant import quantize_llama_decode_params

            self._decode_params = (
                bits, quantize_llama_decode_params(self.params, bits=bits)
            )
        return self._decode_params[1]

    def _decode_fns(self, x01, prompts, max_new_tokens):
        from robustvlm_tpu.models.llava.model import make_llava_decode_fns

        pre_ids, toks, n_pad = self._tokenize_gen(prompts)
        pf, df = make_llava_decode_fns(
            self._gen_params(), self.cfg, x01,
            jnp.asarray([pre_ids] * x01.shape[0]),
            max_total_len=toks.shape[1] + max_new_tokens,
            compute_dtype=self.compute_dtype,
            kv_bits=8 if self.quantize_kv else 0,
        )
        return pf, df, toks, n_pad

    def _gen_core(self, max_new_tokens: int, num_beams: int,
                  length_penalty: float):
        key = (max_new_tokens, num_beams, length_penalty, self.quantize_kv)
        fn = self._gen_cores.get(key)
        if fn is None:
            from robustvlm_tpu.models.llava.model import make_llava_decode_fns

            cfg, dtype = self.cfg, self.compute_dtype
            eos, pad = self.tok.eos_token_id, self.tok.pad_token_id
            kv_bits = 8 if self.quantize_kv else 0

            def core(params, x01, pre, toks, n_pad):
                pf, df = make_llava_decode_fns(
                    params, cfg, x01, pre,
                    max_total_len=toks.shape[1] + max_new_tokens,
                    compute_dtype=dtype, kv_bits=kv_bits,
                )
                if num_beams == 1:
                    return greedy_generate(
                        pf, df, toks, n_pad, max_new_tokens=max_new_tokens,
                        eos_id=eos, pad_id=pad,
                    )
                return beam_generate(
                    pf, df, toks, n_pad, max_new_tokens=max_new_tokens,
                    eos_id=eos, pad_id=pad, num_beams=num_beams,
                    length_penalty=length_penalty,
                )

            fn = self._gen_cores[key] = jax.jit(core)
        return fn

    def _stream_core(self, t_prompt: int, max_new_tokens: int):
        """Cached jitted (prefill, step) pair for the streaming path —
        params ride as OPERANDS. The legacy eager stream re-dispatches the
        unstacked 7B layer loop op-by-op over the tunnel: measured
        4.25 s/token through the worker (round 5); these cores bring a
        token step back to one dispatch. The step core re-traces
        make_llava_decode_fns to rebuild the decode closure from the
        params ARGUMENT; the vision tower it also traces is dead code
        there (decode consumes only the cache) and XLA removes it."""
        from robustvlm_tpu.models.llava.model import make_llava_decode_fns

        key = ("stream", t_prompt, max_new_tokens, self.quantize_kv)
        pair = self._gen_cores.get(key)
        if pair is None:
            cfg, dtype = self.cfg, self.compute_dtype
            kv_bits = 8 if self.quantize_kv else 0
            total = t_prompt + max_new_tokens

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

            def step(params, x01, pre, nxt, cache, pos, n_pad):
                _, df = make_llava_decode_fns(
                    params, cfg, x01, pre, max_total_len=total,
                    compute_dtype=dtype, kv_bits=kv_bits,
                )
                # kv validity and query positions are pure functions of
                # (pos, n_pad) — computed on device so the host loop ships
                # only the one sampled token per step, not (B, T) masks
                sl = jnp.arange(total)[None, :]
                kv_mask = (sl >= n_pad[:, None]) & (sl < pos + 1)
                qpos = (pos - n_pad)[:, None]
                logits, cache = df(nxt[:, None], cache, pos, kv_mask, qpos)
                return jnp.argmax(logits[:, -1], axis=-1), cache

            pair = self._gen_cores[key] = (jax.jit(prefill), jax.jit(step))
        return pair

    def _continuous_cores(self, n_slots: int, width: int, max_new: int,
                          chunk: int = 1):
        """Cached jitted (admit, step) cores + an unjitted shape probe for
        the continuous-batching engine (serve/continuous.py) — slot-based
        admission into a RUNNING decode batch, the throughput discipline
        the window micro-batcher can't reach (it only coalesces same-phase
        requests; reference llava/serve/model_worker.py serves strictly
        request-at-a-time).

        Static config: `n_slots` decode lanes, post-prompt tokens left-padded
        to `width`, `max_new` generated tokens, `chunk` decode steps per
        device dispatch (a lax.scan inside the step core — amortizes the
        ~25 ms tunnel dispatch across chunk tokens at the cost of up to
        chunk-1 steps of admission latency). Params ride as OPERANDS
        (bound-model protocol). Per-slot cache depths are handled by the
        vector-position decode path (llama.model._cache_write).

        admit(params, x01, pre, toks, n_pad, bcaches, slot)
            -> (first_tok (1,), bcaches)
            batch-1 prefill of one request at the static width, written
            DIRECTLY into decode lane `slot` of the donated batched caches
            — prefill + lane insert fused into one program saves a
            dispatch and the intermediate slot-cache copy (~0.8 GiB of
            HBM traffic per admission at 7B).
        prefill_probe(params, x01, pre, toks, n_pad)
            -> (logits, slot_caches); UNJITTED — the engine jax.eval_shapes
            it once to build the zeroed lane caches.
        step(params, x01, pre, nxt, bcaches, pos, n_pad)
            -> ((n_slots, chunk) tokens, bcaches, pos + chunk)
            `chunk` greedy steps for all lanes; x01/pre are dead operands
            (decode consumes only the cache; XLA removes the traced vision
            tower) so any batch-1 arrays work."""
        from robustvlm_tpu.models.llava.model import make_llava_decode_fns

        key = ("cb", n_slots, width, max_new, chunk, self.quantize_kv)
        cores = self._gen_cores.get(key)
        if cores is None:
            cfg, dtype = self.cfg, self.compute_dtype
            kv_bits = 8 if self.quantize_kv else 0
            total = width + max_new
            # stacked llama caches are (L, B, Hkv, N, hd): lane axis 1; the
            # unstacked 7B serving layout ('layers' trees) keeps lanes at 0
            batch_axis = 0 if "layers" in self._gen_params() else 1

            def prefill_probe(params, x01, pre, toks, n_pad):
                pf, _ = make_llava_decode_fns(
                    params, cfg, x01, pre, max_total_len=total,
                    compute_dtype=dtype, kv_bits=kv_bits,
                )
                kv_valid0 = jnp.arange(width)[None, :] >= n_pad[:, None]
                positions = jnp.maximum(
                    jnp.arange(width)[None, :] - n_pad[:, None], 0
                )
                return pf(toks, kv_valid0, positions)

            def admit(params, x01, pre, toks, n_pad, bcaches, slot):
                logits, caches = prefill_probe(params, x01, pre, toks, n_pad)

                def put(b, s):
                    idx = [0] * b.ndim
                    idx[batch_axis] = slot
                    return jax.lax.dynamic_update_slice(
                        b, s.astype(b.dtype), tuple(idx)
                    )

                return (
                    jnp.argmax(logits, axis=-1),
                    jax.tree.map(put, bcaches, caches),
                )

            def step(params, x01, pre, nxt, bcaches, pos, n_pad):
                _, df = make_llava_decode_fns(
                    params, cfg, x01, pre, max_total_len=total,
                    compute_dtype=dtype, kv_bits=kv_bits,
                )
                sl = jnp.arange(total)[None, :]

                def body(carry, _):
                    cur, caches, p = carry
                    kv_mask = (sl >= n_pad[:, None]) & (sl <= p[:, None])
                    qpos = (p - n_pad)[:, None]
                    logits, caches = df(cur[:, None], caches, p, kv_mask, qpos)
                    nxt2 = jnp.argmax(logits[:, -1], axis=-1)
                    return (nxt2, caches, p + 1), nxt2

                (_, bcaches, pos), toks = jax.lax.scan(
                    body, (nxt, bcaches, pos), None, length=chunk
                )
                return toks.T, bcaches, pos

            donate = jax.default_backend() == "tpu"
            # batch_axis rides along so the engine allocates lane caches on
            # the same axis the insert writes (single source of truth)
            cores = self._gen_cores[key] = (
                jax.jit(admit, donate_argnums=(5,) if donate else ()),
                jax.jit(step, donate_argnums=(4,) if donate else ()),
                prefill_probe,
                batch_axis,
            )
        return cores

    def stream_tokens(self, x01: jax.Array, prompts: Sequence[str],
                      max_new_tokens: int):
        """Greedy decode yielding one (B,) np token-id array per step, via
        the jitted stream cores (one device dispatch per token). Same
        argmax/done semantics as generation.greedy_generate_stream."""
        import numpy as np

        pre_ids, toks, n_pad = self._tokenize_gen(prompts)
        b, t = toks.shape
        prefill_j, step_j = self._stream_core(t, max_new_tokens)
        params = self._gen_params()
        pre = jnp.asarray([pre_ids] * x01.shape[0])
        n_pad_dev = jnp.asarray(n_pad)
        nxt_dev, cache = prefill_j(params, x01, pre, jnp.asarray(toks),
                                   n_pad_dev)
        done = np.zeros((b,), bool)
        eos, pad = self.tok.eos_token_id, self.tok.pad_token_id
        for i in range(max_new_tokens):
            nxt = np.asarray(nxt_dev).astype(np.int32)
            nxt = np.where(done, pad, nxt)
            done = done | (nxt == eos)
            yield nxt.copy()
            if done.all():
                return
            # per step the host ships ONE (B,) token array; kv validity and
            # query positions derive from (pos, n_pad) inside the step core
            nxt_dev, cache = step_j(
                params, x01, pre, jnp.asarray(nxt), cache, t + i, n_pad_dev
            )

    def get_outputs(
        self,
        x01: jax.Array,
        prompts: Sequence[str],
        *,
        max_new_tokens: int = 32,
        num_beams: int = 1,
        length_penalty: float = 0.0,
        stop_strings: Sequence[str] = DEFAULT_STOPS,
    ) -> List[str]:
        pre_ids, toks, n_pad = self._tokenize_gen(prompts)
        res = self._gen_core(max_new_tokens, num_beams, length_penalty)(
            self._gen_params(), x01,
            jnp.asarray([pre_ids] * x01.shape[0]),
            jnp.asarray(toks), jnp.asarray(n_pad),
        )
        return [
            truncate_at_stops(self.tok.decode(ids), stop_strings)
            for ids in strip_after_eos(
                res.tokens, self.tok.eos_token_id, self.tok.pad_token_id
            )
        ]


class FlamingoEvalModel:
    """EvalModelAdv equivalent for OpenFlamingo. Prompts follow the
    reference few-shot format: '<image>Output:...<|endofchunk|>' chains;
    `__call__` returns per-sample SUMMED CE over the answer span, labels
    masked up to the LAST ':' in the final segment (reference
    models/utils.py get_label :14-40)."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        *,
        compute_dtype=jnp.bfloat16,
        remat: bool = False,
        max_len: int = 128,
        pad_to_multiple: Optional[int] = None,
    ):
        from robustvlm_tpu.models.flamingo.model import flamingo_per_sample_loss

        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.max_len = max_len
        # round the token pad length up to a multiple: batched ensemble
        # stages tokenize per-GROUP, so a group-max pad length retraces the
        # attack core per distinct length (multi-minute remote compiles);
        # bucketing bounds the shape count. End-padding is loss-invariant
        # (causal attention + masked labels), so this is exact — pinned by
        # tests/test_vlm_eval.py::test_pad_to_multiple_loss_invariant.
        self.pad_to_multiple = pad_to_multiple
        self._lang = None
        self._labels = None
        self._mask = None

        def loss_fn(p, vx, lang, labels, mask):
            return flamingo_per_sample_loss(
                p, vx, lang, labels, mask, cfg,
                compute_dtype=compute_dtype, remat=remat,
            )

        jitted = jax.jit(loss_fn)
        self._loss = lambda *a: jitted(self.params, *a)

        # bound-model protocol (attacks/apgd.py; see LlavaEvalModel)
        def pure(p, lang, labels, mask, vision_x):
            if vision_x.ndim == 4:
                vision_x = vision_x[:, None, None]
            return loss_fn(p, vision_x, lang, labels, mask)

        self.pure = pure

    def get_caption_prompt(self, caption: Optional[str] = None) -> str:
        c = f" {caption.strip()}<|endofchunk|>" if caption else ""
        return f"<image>Output:{c}"

    def get_vqa_prompt(self, question: str, answer: Optional[str] = None) -> str:
        a = f" {answer.strip()}<|endofchunk|>" if answer else ""
        return f"<image>Question:{question.strip()} Short answer:{a}"

    def _encode(self, text: str) -> List[int]:
        """Tokenize WHOLE text segments between the special markers.

        Real BPE tokenizers are whitespace-sensitive (leading-space merge
        rules), so encoding word-by-word produces different ids than
        encoding the segment at once — the reference tokenizes the full
        prompt in one call with <image>/<|endofchunk|> registered as
        special tokens (of_eval_model_adv.py:183-198, factory.py special
        tokens). Here the text is split ONLY on those markers and each
        plain-text segment is encoded in one call."""
        import re

        out = []
        for seg in re.split(r"(<image>|<\|endofchunk\|>)", text):
            if seg == "<image>":
                out.append(self.cfg.media_token_id)
            elif seg == "<|endofchunk|>":
                out.append(self.tok.eos_token_id)
            elif seg:
                out.extend(_encode_plain(self.tok, seg))
        return out

    def set_inputs(self, full_prompts: Sequence[str]):
        langs, masks = [], []
        for p in full_prompts:
            # answer span: after the LAST ':' (reference models/utils.py
            # get_label :14-40 masks everything up to & incl. the last colon
            # token). Context and answer are encoded as separate whole
            # segments — identical ids to whole-string encoding for
            # GPT-2-family BPEs, whose pre-tokenizer never merges across a
            # ':'-to-space boundary (pinned by a CLIP-BPE test) — which
            # makes the mask exact in token space by construction.
            marker = p.rfind(":")
            if marker >= 0:
                ctx_ids = self._encode(p[: marker + 1])
                ans_ids = self._encode(p[marker + 1:])
            else:
                ctx_ids, ans_ids = [], self._encode(p)
            ids = ctx_ids + ans_ids
            m = [0.0] * len(ctx_ids) + [1.0] * len(ans_ids)
            # special tokens never contribute loss (reference get_label
            # masks media/eoc/pad label positions to -100)
            for k, t_id in enumerate(ids):
                if t_id in (self.cfg.media_token_id, self.tok.eos_token_id):
                    m[k] = 0.0
            langs.append(ids)
            masks.append(m)
        t = max(len(x) for x in langs)
        if self.pad_to_multiple:
            m_ = self.pad_to_multiple
            t = -(-t // m_) * m_
        t = min(t, self.max_len)
        lang_arr, _ = _pad_right(langs, self.tok.pad_token_id, t)
        mask_arr = np.zeros((len(langs), t), np.float32)
        for i, m in enumerate(masks):
            m = m[:t]
            mask_arr[i, : len(m)] = m
        self._lang = jnp.asarray(lang_arr)
        self._labels = jnp.asarray(lang_arr)
        self._mask = jnp.asarray(mask_arr)

    @property
    def bound_args(self):
        assert self._lang is not None, "call set_inputs first"
        return (self.params, self._lang, self._labels, self._mask)

    def __call__(self, vision_x: jax.Array) -> jax.Array:
        assert self._lang is not None, "call set_inputs first"
        if vision_x.ndim == 4:  # (B,C,H,W) -> (B,T=1,F=1,C,H,W)
            vision_x = vision_x[:, None, None]
        return self._loss(vision_x, self._lang, self._labels, self._mask)

    DEFAULT_STOPS = ("<|endofchunk|>", "Output:", "Question:")

    def _decode_fns(self, vision_x, prompts, max_new_tokens):
        from robustvlm_tpu.models.flamingo.model import make_flamingo_decode_fns

        if vision_x.ndim == 4:
            vision_x = vision_x[:, None, None]
        seqs = [self._encode(p) for p in prompts]
        toks, n_pad = left_pad(seqs, self.tok.pad_token_id)
        pf, df = make_flamingo_decode_fns(
            self.params, self.cfg, vision_x,
            max_total_len=toks.shape[1] + max_new_tokens,
            compute_dtype=self.compute_dtype,
        )
        return pf, df, toks, n_pad

    def get_outputs(
        self,
        vision_x: jax.Array,
        prompts: Sequence[str],
        *,
        max_new_tokens: int = 32,
        num_beams: int = 1,
        length_penalty: float = 0.0,
        stop_strings: Sequence[str] = DEFAULT_STOPS,
    ) -> List[str]:
        pf, df, toks, n_pad = self._decode_fns(vision_x, prompts, max_new_tokens)
        gen = greedy_generate if num_beams == 1 else beam_generate
        kw = {} if num_beams == 1 else {
            "num_beams": num_beams, "length_penalty": length_penalty
        }
        res = gen(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=max_new_tokens, eos_id=self.tok.eos_token_id,
            pad_id=self.tok.pad_token_id, **kw,
        )
        return [
            truncate_at_stops(self.tok.decode(ids), stop_strings)
            for ids in strip_after_eos(
                res.tokens, self.tok.eos_token_id, self.tok.pad_token_id
            )
        ]


class Blip2EvalModel:
    """BLIP-2 adapter (reference open_flamingo/eval/models/blip.py). The
    reference wrapper is generation-only; this adapter additionally
    implements the full adversarial protocol (`set_inputs` + per-sample
    loss), so BLIP-2 is attackable like the other families. One image per
    example (reference blip.py:52-53)."""

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        *,
        compute_dtype=jnp.float32,
        remat: bool = False,
        max_len: int = 64,
    ):
        from robustvlm_tpu.models.blip2.model import blip2_per_sample_loss

        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.compute_dtype = compute_dtype
        self.remat = remat
        self.max_len = max_len
        self._cached = None

        def loss_fn(p, x01, tokens, labels, mask):
            return blip2_per_sample_loss(
                p, x01, tokens, labels, mask, cfg,
                compute_dtype=compute_dtype, remat=remat,
            )

        jitted = jax.jit(loss_fn)
        self._loss = lambda *a: jitted(self.params, *a)

        # bound-model protocol (attacks/apgd.py; see LlavaEvalModel)
        def pure(p, tokens, labels, mask, x01):
            return loss_fn(p, x01, tokens, labels, mask)

        self.pure = pure

    # ---- prompt builders (reference blip.py:105-112)
    def get_caption_prompt(self, caption: Optional[str] = None) -> str:
        return f"A photo of {caption if caption is not None else ''}"

    def get_vqa_prompt(self, question: str, answer: Optional[str] = None) -> str:
        return (
            f"Question:{question} Short answer:"
            f"{answer if answer is not None else ''}"
        )

    @staticmethod
    def _answer_split(prompt: str):
        """(context, answer) split at the PROMPT MARKER, not any colon —
        answers like '4:30' and captions containing ':' must stay whole."""
        vqa_marker = " Short answer:"
        i = prompt.rfind(vqa_marker)
        if i >= 0:
            cut = i + len(vqa_marker)
            return prompt[:cut], prompt[cut:]
        cap_marker = "A photo of "
        if prompt.startswith(cap_marker):
            return cap_marker, prompt[len(cap_marker):]
        return "", prompt

    def set_inputs(self, full_prompts: Sequence[str]):
        bos = getattr(self.tok, "bos_token_id", None)
        toks, masks = [], []
        for p in full_prompts:
            ctx, ans = self._answer_split(p)
            ctx_ids = _encode_plain(self.tok, ctx)
            if bos is not None:
                ctx_ids = [bos] + ctx_ids
            ans_ids = _encode_plain(self.tok, ans) + [self.tok.eos_token_id]
            toks.append(ctx_ids + ans_ids)
            masks.append([0.0] * len(ctx_ids) + [1.0] * len(ans_ids))
        arr, _ = _pad_right(toks, self.tok.pad_token_id, self.max_len)
        mask_arr = np.zeros(arr.shape, np.float32)
        for i, m in enumerate(masks):
            m = m[: self.max_len]
            mask_arr[i, : len(m)] = m
        self._cached = (
            jnp.asarray(arr), jnp.asarray(arr), jnp.asarray(mask_arr)
        )

    @property
    def bound_args(self):
        assert self._cached is not None, "call set_inputs first"
        tokens, labels, mask = self._cached
        return (self.params, tokens, labels, mask)

    def __call__(self, x01: jax.Array) -> jax.Array:
        assert self._cached is not None, "call set_inputs first"
        tokens, labels, mask = self._cached
        return self._loss(x01, tokens, labels, mask)

    DEFAULT_STOPS = ("Question:", "\n")

    def _decode_fns(self, x01, prompts, max_new_tokens):
        from robustvlm_tpu.models.blip2.model import make_blip2_decode_fns

        bos = getattr(self.tok, "bos_token_id", None)
        seqs = []
        for p in prompts:
            ids = _encode_plain(self.tok, p)
            seqs.append(([bos] if bos is not None else []) + ids)
        toks, n_pad = left_pad(seqs, self.tok.pad_token_id)
        pf, df = make_blip2_decode_fns(
            self.params, self.cfg, x01,
            max_total_len=toks.shape[1] + max_new_tokens,
            compute_dtype=self.compute_dtype,
        )
        return pf, df, toks, n_pad

    def get_outputs(
        self,
        x01: jax.Array,
        prompts: Sequence[str],
        *,
        max_new_tokens: int = 32,
        num_beams: int = 1,
        length_penalty: float = 0.0,
        stop_strings: Sequence[str] = DEFAULT_STOPS,
    ) -> List[str]:
        pf, df, toks, n_pad = self._decode_fns(x01, prompts, max_new_tokens)
        gen = greedy_generate if num_beams == 1 else beam_generate
        kw = {} if num_beams == 1 else {
            "num_beams": num_beams, "length_penalty": length_penalty
        }
        res = gen(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=max_new_tokens, eos_id=self.tok.eos_token_id,
            pad_id=self.tok.pad_token_id, **kw,
        )
        return [
            truncate_at_stops(self.tok.decode(ids), stop_strings)
            for ids in strip_after_eos(
                res.tokens, self.tok.eos_token_id, self.tok.pad_token_id
            )
        ]


def stream_outputs(
    model,
    x01: jax.Array,
    prompt: str,
    *,
    max_new_tokens: int = 32,
    stop_strings: Optional[Sequence[str]] = None,
    speculate: int = 0,
):
    """Yield cumulative decoded text for ONE example as greedy tokens
    arrive (the serving stream path — reference model_worker
    generate_stream). Works with any adapter exposing `_decode_fns`.
    speculate=k > 0 routes through prompt-lookup speculative decoding
    (serve/speculative.py — token-exact, 1..k+1 tokens per dispatch).
    """
    from robustvlm_tpu.models.generation import greedy_generate_stream

    stops = (
        tuple(stop_strings) if stop_strings is not None
        else getattr(model, "DEFAULT_STOPS", ())
    )
    if speculate and hasattr(model, "stream_tokens"):
        from robustvlm_tpu.serve.speculative import spec_stream_tokens

        gen = spec_stream_tokens(
            model, x01, [prompt], max_new_tokens, k=speculate
        )
    elif hasattr(model, "stream_tokens"):
        # jitted stream cores (params as operands): one device dispatch
        # per token. The legacy eager path below re-dispatches the layer
        # loop op-by-op — measured 4.25 s/token at 7B through the tunnel.
        gen = model.stream_tokens(x01, [prompt], max_new_tokens)
    else:
        pf, df, toks, n_pad = model._decode_fns(x01, [prompt], max_new_tokens)
        gen = greedy_generate_stream(
            pf, df, jnp.asarray(toks), jnp.asarray(n_pad),
            max_new_tokens=max_new_tokens, eos_id=model.tok.eos_token_id,
            pad_id=model.tok.pad_token_id,
        )
    ids: List[int] = []
    for step in gen:
        t_id = int(step[0])
        if t_id in (model.tok.eos_token_id, model.tok.pad_token_id):
            break
        ids.append(t_id)
        raw = model.tok.decode(ids)
        if any(s in raw for s in stops):
            yield truncate_at_stops(raw, stops)
            return
        yield raw.strip()


def make_frame_mask(vision_x_shape, mask_out: str = "context"):
    """Gradient mask over few-shot media frames (reference
    vlm_eval/attacks/pgd.py:75-87 _set_mask). vision_x is (B, T_img, F, C,
    H, W). Matching the reference exactly:

    - 'context': zero every frame except the LAST (attack only the query);
    - 'query':   zero ONLY the last frame (attack only the context shots);
    - int k:     zero ONLY frame k (attack everything else);
    - 'none':    attack everything.

    The round-1 int semantics (attack ONLY frame k) are kept under the
    explicit spelling 'only:k'."""
    import numpy as np

    mask = np.ones(vision_x_shape, np.float32)
    t = vision_x_shape[1]
    if mask_out == "none":
        return jnp.asarray(mask)
    if mask_out == "context":
        mask[:, : t - 1] = 0.0
    elif mask_out == "query":
        mask[:, t - 1] = 0.0
    elif isinstance(mask_out, str) and mask_out.startswith("only:"):
        k = int(mask_out[len("only:"):])
        mask[:, :k] = 0.0
        mask[:, k + 1:] = 0.0
    else:
        mask[:, int(mask_out)] = 0.0
    return jnp.asarray(mask)
