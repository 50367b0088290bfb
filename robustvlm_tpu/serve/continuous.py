"""Continuous-batching serving engine: slot admission into a RUNNING decode.

The reference worker serves generation strictly request-at-a-time
(/root/reference/llava/serve/model_worker.py:126-226); our window
micro-batcher (serve/model_worker._Batcher) lifts that to same-phase
coalescing, but a request arriving mid-decode still waits out the whole
running batch. This engine admits it into the running decode batch at the
next step boundary instead — the vLLM-style scheduling discipline, built
TPU-first:

- ONE static decode shape for the engine's lifetime: `n_slots` lanes,
  prompts left-padded to `width` post tokens, a `width + max_new` KV cache
  per lane. No recompiles, no cache re-layout, ever.
- Admission = one batch-1 prefill (vision tower + splice) + an in-place
  `dynamic_update_slice` of the lane's cache rows. Per-lane cache depths
  ride the vector-position decode path (models/llama/model._cache_write:
  B static single-lane in-place updates, not a full-cache scatter).
- Per-lane RoPE positions and kv masks are derived ON DEVICE from the
  (n_slots,) `pos`/`n_pad` operands; the host ships three tiny int vectors
  per dispatch and receives (n_slots, chunk) token ids back.
- `chunk` decode steps run as ONE device dispatch (a lax.scan inside the
  jitted step core) — amortizes the ~25 ms remote-tunnel dispatch latency
  across `chunk` tokens at the cost of up to `chunk-1` steps of admission
  latency for a newly arrived request.

The jitted (admit, insert, step) cores live on the eval adapter
(vlm_eval/eval_models.LlavaEvalModel._continuous_cores); params ride as
operands (the bound-model protocol — CLAUDE.md). Greedy only, llama-family
LLaVA only (the vector-position cache write lives in the llama block).
Lane isolation is exact math, not best-effort: attention masks confine
each lane to its own cache rows, so a lane's tokens are independent of
what its neighbours decode (pinned by tests/test_continuous.py).
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from typing import List, Optional

import numpy as np


class CBRequest:
    """Handle for one submitted request: a host-side greedy token stream.

    Tokens arrive on `tokens` (a Queue of int ids; None terminates — EOS is
    consumed by the engine, never emitted). `cancel()` retires the lane at
    the engine's next emission point (the stream wrapper calls it when a
    stop string lands, so abandoned lanes don't decode to max_new)."""

    def __init__(self, image: np.ndarray, prompt: str, max_new: int):
        self.image = image
        self.prompt = prompt
        self.max_new = max_new
        self.tokens: "queue.Queue[Optional[int]]" = queue.Queue()
        self.error: Optional[str] = None
        self.cancelled = False
        # set at submit time (host tokenization)
        self._toks = None   # (1, width) np.int32
        self._n_pad = None  # (1,) np.int32

    def cancel(self):
        self.cancelled = True

    def token_stream(self):
        """Yield token ids as they arrive; raises RuntimeError on engine
        error. Terminates when the lane retires (EOS / max_new / cancel)."""
        while True:
            t = self.tokens.get()
            if t is None:
                if self.error:
                    raise RuntimeError(self.error)
                return
            yield t

    def wait_ids(self) -> List[int]:
        return list(self.token_stream())


class _DeviceFailure(RuntimeError):
    """A jitted core raised AFTER the batched caches were donated to it —
    the old buffer is consumed, so the whole running batch must be failed
    and the lane caches rebuilt from scratch."""


class _Slot:
    __slots__ = ("req", "emitted", "cap")

    def __init__(self, req: CBRequest, cap: int):
        self.req = req
        self.emitted = 0
        self.cap = cap


class ContinuousEngine:
    """Slot scheduler over a LlavaEvalModel. One engine per worker process
    (one process per chip — CLAUDE.md); the loop thread owns all device
    state, `submit` only tokenizes and enqueues."""

    def __init__(self, model, *, n_slots: int = 4, width: int = 32,
                 max_new: int = 32, chunk: int = 1):
        if (not hasattr(model, "_continuous_cores")
                or getattr(model.cfg, "lm_family", None) != "llama"):
            raise ValueError(
                "continuous batching requires a llava adapter with the "
                "llama LM family (vector-position cache writes; got "
                f"{type(model).__name__} / "
                f"{getattr(model.cfg, 'lm_family', None)!r})"
            )
        if n_slots < 1 or width < 1 or max_new < 1 or chunk < 1:
            raise ValueError("n_slots/width/max_new/chunk must be >= 1")
        self.model = model
        self.n_slots = n_slots
        self.width = width
        self.max_new = max_new
        self.chunk = chunk
        self._total = width + max_new
        pad = model.tok.pad_token_id
        self._pad = int(pad)
        self._eos = int(model.tok.eos_token_id)

        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._slots: List[Optional[_Slot]] = [None] * n_slots
        self._stop = False

        # host mirrors of the per-lane device operands
        self._nxt = np.full((n_slots,), self._pad, np.int32)
        self._pos = np.full((n_slots,), width, np.int32)
        self._npad = np.zeros((n_slots,), np.int32)

        # device state, built lazily at first admission
        self._bcaches = None
        self._pre_dev = None   # pinned pre-image tokens (1, T_pre)
        self._pre_ids = None   # host tuple for the submit-side check
        self._x01_any = None   # dead operand for the step core

        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------ submission
    def submit(self, image: np.ndarray, prompt: str,
               max_new: Optional[int] = None) -> CBRequest:
        """Tokenize + enqueue. Raises ValueError host-side for prompts that
        can't fit the engine's static shapes (too many post tokens, or a
        pre-image segment differing from the pinned one — all llava
        caption/VQA prompts share the system-prompt pre segment)."""
        cap = self.max_new if max_new is None else int(max_new)
        req = CBRequest(image, prompt, min(cap, self.max_new))
        pre_ids, toks, n_pad = self.model._tokenize_gen([prompt])
        with self._cv:
            if self._pre_ids is None:
                self._pre_ids = tuple(pre_ids)
            elif tuple(pre_ids) != self._pre_ids:
                raise ValueError(
                    "pre-image segment differs from the engine's pinned "
                    "prompt prefix (continuous batching shares one "
                    "compiled prefix length)"
                )
        toks = np.asarray(toks, np.int32)
        n_pad = np.asarray(n_pad, np.int32)
        t = toks.shape[1]
        if t > self.width:
            raise ValueError(
                f"prompt has {t} post tokens > engine width {self.width}"
            )
        if t < self.width:
            extra = self.width - t
            toks = np.concatenate(
                [np.full((1, extra), self._pad, np.int32), toks], axis=1
            )
            n_pad = n_pad + extra
        req._toks, req._n_pad = toks, n_pad
        with self._cv:
            if self._stop:
                raise RuntimeError("engine is shut down")
            self._queue.append(req)
            self._cv.notify()
        return req

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=30)
        for st in self._slots:
            if st is not None:
                st.req.error = "engine shut down"
                st.req.tokens.put(None)
        while self._queue:
            r = self._queue.popleft()
            r.error = "engine shut down"
            r.tokens.put(None)

    # ------------------------------------------------------------ scheduling
    def _cores(self):
        return self.model._continuous_cores(
            self.n_slots, self.width, self.max_new, self.chunk
        )

    def _emit(self, slot: int, tok: int):
        """Deliver one decoded token to lane `slot`'s request; retire the
        lane on EOS/pad / cap / cancellation. Like every other decode
        surface (stream_outputs, strip_after_eos), pad terminates too —
        the terminator token itself is never emitted."""
        st = self._slots[slot]
        req = st.req
        if (req.cancelled or tok == self._eos or tok == self._pad
                or st.emitted >= st.cap):
            self._retire(slot)
            return
        req.tokens.put(tok)
        st.emitted += 1
        if st.emitted >= st.cap:
            self._retire(slot)

    def _retire(self, slot: int):
        st = self._slots[slot]
        self._slots[slot] = None
        self._nxt[slot] = self._pad
        st.req.tokens.put(None)

    def _admit(self, slot: int, req: CBRequest):
        import jax
        import jax.numpy as jnp

        admit_j, _, prefill_probe, ax = self._cores()
        params = self.model._gen_params()
        x01 = jnp.asarray(req.image)[None]
        if self._pre_dev is None:
            self._pre_dev = jnp.asarray([list(self._pre_ids)], jnp.int32)
        toks = jnp.asarray(req._toks)
        n_pad = jnp.asarray(req._n_pad)
        if self._bcaches is None:
            # learn the per-slot cache shapes abstractly (no compile, no
            # device work) and allocate the zeroed lane caches once, on the
            # lane axis the cores' insert targets
            n = self.n_slots
            _, cache_sds = jax.eval_shape(
                prefill_probe, params, x01, self._pre_dev, toks, n_pad
            )

            def lanes(s):
                shape = list(s.shape)
                shape[ax] = n
                return jnp.zeros(shape, s.dtype)

            self._bcaches = jax.tree.map(lanes, cache_sds)
        # prefill + lane insert fused: the new request's KV rows are written
        # straight into the donated batched caches
        try:
            first, self._bcaches = admit_j(
                params, x01, self._pre_dev, toks, n_pad, self._bcaches,
                jnp.int32(slot),
            )
        except Exception as e:
            raise _DeviceFailure(f"{type(e).__name__}: {e}") from e
        self._x01_any = x01
        self._pos[slot] = self.width
        self._npad[slot] = int(req._n_pad[0])
        tok = int(np.asarray(first)[0])
        self._nxt[slot] = tok
        self._slots[slot] = _Slot(req, req.max_new)
        self._emit(slot, tok)

    def _dispatch(self):
        import jax.numpy as jnp

        _, step_j, _, _ = self._cores()
        params = self.model._gen_params()
        active_before = [i for i in range(self.n_slots)
                         if self._slots[i] is not None]
        toks, self._bcaches, _ = step_j(
            params, self._x01_any, self._pre_dev, jnp.asarray(self._nxt),
            self._bcaches, jnp.asarray(self._pos), jnp.asarray(self._npad),
        )
        t = np.asarray(toks)  # (n_slots, chunk)
        for j in range(self.chunk):
            for i in active_before:
                if self._slots[i] is not None:  # may retire mid-chunk
                    self._emit(i, int(t[i, j]))
        for i in range(self.n_slots):
            if self._slots[i] is not None:
                # an active lane's next write position never clamps: it
                # retires in the dispatch that would reach total-1
                self._pos[i] += self.chunk
                self._nxt[i] = t[i, -1]
            else:
                # inactive lanes decode garbage at the clamped last row;
                # re-admission overwrites the whole lane cache (insert
                # copies every position), so no state leaks across reuse
                self._pos[i] = min(self._pos[i] + self.chunk,
                                   self._total - 1)

    def _loop(self):
        while True:
            with self._cv:
                while (not self._stop and not self._queue
                       and not any(s is not None for s in self._slots)):
                    self._cv.wait()
                if self._stop:
                    return
                admits = []
                for i in range(self.n_slots):
                    if self._slots[i] is None and self._queue:
                        admits.append((i, self._queue.popleft()))
            for slot, req in admits:
                try:
                    self._admit(slot, req)
                except _DeviceFailure as e:  # pragma: no cover
                    # the donated batched caches are consumed: fail the
                    # whole running batch and rebuild the lanes fresh
                    self._slots[slot] = None
                    req.error = str(e)
                    req.tokens.put(None)
                    self._fail_batch(str(e))
                except Exception as e:  # host-side: surfaced per request
                    self._slots[slot] = None
                    req.error = f"{type(e).__name__}: {e}"
                    req.tokens.put(None)
            if any(s is not None for s in self._slots):
                try:
                    self._dispatch()
                except Exception as e:  # pragma: no cover - device failure
                    self._fail_batch(f"{type(e).__name__}: {e}")

    def _fail_batch(self, msg: str):
        """Retire every active lane with `msg` and drop the (possibly
        donated-and-consumed) batched caches so the next admission
        reallocates them."""
        for i in range(self.n_slots):
            if self._slots[i] is not None:
                self._slots[i].req.error = msg
                self._retire(i)
        self._bcaches = None
