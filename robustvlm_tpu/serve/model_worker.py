"""Model worker: serves VLM caption/VQA generation over HTTP.

Equivalent of reference llava/serve/model_worker.py (285 LoC FastAPI worker):
loads an eval model (vlm_eval/eval_models.py adapter), registers with the
controller, sends heartbeats, and answers /worker_generate requests (images
as base64 PNG or raw float lists). Single worker process per TPU chip — the
model runs jitted generation; the HTTP layer is a thin stdlib server.

Beyond the reference: --batch-window-ms coalesces concurrent requests into
one padded batched TPU call (see _Batcher) — the chip's per-example
generation throughput rises with batch, which the reference's strictly
per-request worker leaves on the table. --continuous goes further:
requests are admitted into the RUNNING decode batch at step boundaries
(serve/continuous.py), so arrivals mid-decode don't wait out the batch.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

HEARTBEAT_INTERVAL = 30.0


class _Batcher:
    """Window-coalescing micro-batcher for /worker_generate.

    Concurrent requests arriving within `window_ms` are grouped by their
    generation config (max_new_tokens, num_beams) and run as ONE batched
    `get_outputs` call, padded to `max_batch` by repeating the last row so
    the compiled program has a single batch shape (the ensemble harness's
    ragged-group padding trick). Per-example TPU throughput rises with
    batch at serving sizes, and the fixed shape keeps the jit cache to one
    entry per generation config. window_ms=0 disables batching (the
    reference llava/serve worker is strictly one request per call)."""

    def __init__(self, worker: "ModelWorker", window_ms: float,
                 max_batch: int):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.worker = worker
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self.cv = threading.Condition()
        self.pending: list = []  # (key, image, prompt, slot)
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, payload: dict) -> dict:
        try:
            image = self.worker.decode_image(payload)
            prompt = self.worker._prompt(payload)
        except Exception as e:
            return {"text": "", "error_code": 1, "error": str(e)}
        key = (
            int(payload.get("max_new_tokens", 32)),
            int(payload.get("num_beams", 1)),
        )
        slot = {"event": threading.Event(), "result": None}
        with self.cv:
            self.pending.append((key, image, prompt, slot))
            self.cv.notify()
        slot["event"].wait()
        return slot["result"]

    def _take_group(self):
        """Block for the first request, linger `window` for more, then take
        up to max_batch entries sharing the oldest request's config.
        monotonic clock (a wall-clock step must not stretch or collapse the
        window); the early-break counts only SAME-config entries, so mixed
        traffic can't end the oldest key's window with a near-empty batch."""
        with self.cv:
            while not self.pending:
                self.cv.wait()
            key = self.pending[0][0]
        deadline = time.monotonic() + self.window
        while time.monotonic() < deadline:
            with self.cv:
                if sum(1 for p in self.pending if p[0] == key) >= self.max_batch:
                    break
            time.sleep(min(0.002, self.window))
        with self.cv:
            grp = [p for p in self.pending if p[0] == key][: self.max_batch]
            taken = set(map(id, grp))
            self.pending = [p for p in self.pending if id(p) not in taken]
        return key, grp

    def _loop(self):
        import jax.numpy as jnp

        while True:
            key, grp = self._take_group()
            xs = [g[1] for g in grp]
            prompts = [g[2] for g in grp]
            n = len(xs)
            while len(xs) < self.max_batch:  # pad to the compiled shape
                xs.append(xs[-1])
                prompts.append(prompts[-1])
            try:
                outs = self.worker.model.get_outputs(
                    jnp.asarray(np.stack(xs)), prompts,
                    max_new_tokens=key[0], num_beams=key[1],
                )[:n]
                results = [{"text": t, "error_code": 0} for t in outs]
            except Exception as e:  # pragma: no cover
                results = [
                    {"text": "", "error_code": 1, "error": str(e)}
                ] * n
            for g, r in zip(grp, results):
                g[3]["result"] = r
                g[3]["event"].set()


class ModelWorker:
    def __init__(
        self,
        eval_model,
        model_name: str,
        *,
        worker_address: str,
        controller_address: Optional[str] = None,
        image_size: int = 224,
        batch_window_ms: float = 0.0,
        max_batch: int = 8,
        continuous=None,
        speculate: int = 0,
    ):
        self.model = eval_model
        self.model_name = model_name
        self.worker_address = worker_address
        self.controller_address = controller_address
        self.image_size = image_size
        self.queue_length = 0
        self.lock = threading.Lock()
        self.batcher = (
            _Batcher(self, batch_window_ms, max_batch)
            if batch_window_ms > 0 else None
        )
        # continuous: a serve.continuous.ContinuousEngine — greedy requests
        # join the running decode batch instead of queueing behind it
        self.continuous = continuous
        # speculate: k > 0 serves /worker_generate_stream via prompt-lookup
        # speculative decoding (serve/speculative.py) — token-exact, up to
        # k+1 tokens per device dispatch on the dispatch-bound stream path
        self.speculate = speculate
        if controller_address:
            self.register()
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    # ------------------------------------------------------------ controller
    def _post(self, url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            return json.loads(r.read())

    def status(self):
        return {
            "model_names": [self.model_name],
            "speed": 1.0,
            "queue_length": self.queue_length,
        }

    def register(self):
        self._post(
            self.controller_address + "/register_worker",
            {
                "worker_name": self.worker_address,
                "check_heart_beat": True,
                "worker_status": self.status(),
            },
        )

    def _heartbeat_loop(self):
        while True:
            time.sleep(HEARTBEAT_INTERVAL)
            try:
                self._post(
                    self.controller_address + "/receive_heart_beat",
                    {
                        "worker_name": self.worker_address,
                        "queue_length": self.queue_length,
                    },
                )
            except Exception:
                try:
                    self.register()
                except Exception:
                    pass

    # -------------------------------------------------------------- generate
    def decode_image(self, payload) -> np.ndarray:
        from robustvlm_tpu.data.loaders import default_image_transform

        if "image_b64" in payload:
            from PIL import Image

            raw = base64.b64decode(payload["image_b64"])
            with Image.open(io.BytesIO(raw)) as img:
                return default_image_transform(self.image_size)(img)
        arr = np.asarray(payload["image"], np.float32)
        # keep the raw-array path consistent with the b64 path: same
        # resolution (and the [0,1] threat-model contract) either way
        if arr.ndim != 3 or arr.shape[0] != 3:
            raise ValueError(
                f"'image' must be (3, H, W) floats in [0,1]; got {arr.shape}"
            )
        if float(arr.max(initial=0.0)) > 1.5 or float(arr.min(initial=0.0)) < -0.5:
            # a 0-255-scaled array would otherwise clip to near-white
            raise ValueError(
                "'image' values must be in [0,1] (got range "
                f"[{arr.min():.3g}, {arr.max():.3g}]; divide by 255?)"
            )
        if arr.shape[1:] != (self.image_size, self.image_size):
            import jax.numpy as jnp

            from robustvlm_tpu.ops.image import resize_bicubic

            arr = np.asarray(
                resize_bicubic(jnp.asarray(arr)[None], self.image_size)[0]
            )
        return np.clip(arr, 0.0, 1.0)

    def _prompt(self, payload: dict) -> str:
        if payload.get("task", "caption") == "vqa":
            return self.model.get_vqa_prompt(payload["question"], None)
        return self.model.get_caption_prompt(None)

    def generate(self, payload: dict) -> dict:
        import jax.numpy as jnp

        with self.lock:
            self.queue_length += 1
        try:
            if (self.continuous is not None
                    and int(payload.get("num_beams", 1)) == 1):
                from robustvlm_tpu.vlm_eval.eval_models import (
                    truncate_at_stops,
                )

                req = self.continuous.submit(
                    self.decode_image(payload), self._prompt(payload),
                    int(payload.get("max_new_tokens", 32)),
                )
                text = self.model.tok.decode(req.wait_ids())
                stops = getattr(self.model, "DEFAULT_STOPS", ())
                return {"text": truncate_at_stops(text, stops),
                        "error_code": 0}
            if self.batcher is not None:
                return self.batcher.submit(payload)
            x = jnp.asarray(self.decode_image(payload))[None]
            text = self.model.get_outputs(
                x, [self._prompt(payload)],
                max_new_tokens=int(payload.get("max_new_tokens", 32)),
                num_beams=int(payload.get("num_beams", 1)),
            )[0]
            return {"text": text, "error_code": 0}
        except Exception as e:  # pragma: no cover
            return {"text": "", "error_code": 1, "error": str(e)}
        finally:
            with self.lock:
                self.queue_length -= 1

    def generate_stream(self, payload: dict):
        """Yield {"text": cumulative, "error_code": 0} dicts as tokens
        arrive (reference model_worker generate_stream)."""
        import jax.numpy as jnp

        from robustvlm_tpu.vlm_eval.eval_models import stream_outputs

        with self.lock:
            self.queue_length += 1
        try:
            if self.continuous is not None:
                from robustvlm_tpu.vlm_eval.eval_models import (
                    truncate_at_stops,
                )

                req = self.continuous.submit(
                    self.decode_image(payload), self._prompt(payload),
                    int(payload.get("max_new_tokens", 32)),
                )
                stops = getattr(self.model, "DEFAULT_STOPS", ())
                ids = []
                for t in req.token_stream():
                    ids.append(t)
                    raw = self.model.tok.decode(ids)
                    if any(s in raw for s in stops):
                        req.cancel()  # free the lane: don't decode to cap
                        yield {"text": truncate_at_stops(raw, stops),
                               "error_code": 0}
                        return
                    yield {"text": raw.strip(), "error_code": 0}
                return
            x = jnp.asarray(self.decode_image(payload))[None]
            for text in stream_outputs(
                self.model, x, self._prompt(payload),
                max_new_tokens=int(payload.get("max_new_tokens", 32)),
                speculate=self.speculate,
            ):
                yield {"text": text, "error_code": 0}
        except Exception as e:  # pragma: no cover
            yield {"text": "", "error_code": 1, "error": str(e)}
        finally:
            with self.lock:
                self.queue_length -= 1


def make_handler(worker: ModelWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            path = self.path.rstrip("/")
            if path == "/worker_get_status":
                self._json(worker.status())
            elif path == "/worker_generate":
                self._json(worker.generate(payload))
            elif path == "/worker_generate_stream":
                # newline-delimited JSON chunks, flushed per token
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                for chunk in worker.generate_stream(payload):
                    data = json.dumps(chunk).encode() + b"\n"
                    self.wfile.write(f"{len(data):X}\r\n".encode())
                    self.wfile.write(data + b"\r\n")
                    self.wfile.flush()
                self.wfile.write(b"0\r\n\r\n")
            else:
                self._json({"error": "unknown endpoint"}, 404)

    return Handler


def serve_worker(worker: ModelWorker, host: str, port: int) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(worker))
    server.worker = worker
    return server


def main(argv=None):
    p = argparse.ArgumentParser(description="VLM model worker")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21002)
    p.add_argument("--worker-address", default="http://localhost:21002")
    p.add_argument("--controller-address", default="http://localhost:21001")
    p.add_argument("--model", default="llava")
    p.add_argument("--model_size", default="7b")
    p.add_argument("--llava_ckpt", default="")
    p.add_argument("--of_ckpt", default="")
    p.add_argument("--mpt_ckpt", default="")
    p.add_argument("--clip_ckpt", default="")
    p.add_argument("--vision_encoder_pretrained", default="")
    p.add_argument("--tokenizer_path", default="")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="coalesce concurrent /worker_generate requests "
                        "arriving within this window into one batched TPU "
                        "call (0 = per-request, the reference behavior)")
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batch cap; requests pad to this one "
                        "compiled shape")
    p.add_argument("--quantize-decode", action="store_true",
                   help="serve generation from weight-only quantized LM "
                        "blocks (ops/quant.py): decode is HBM-bandwidth-"
                        "bound, so halving the weight bytes ~halves the "
                        "step time. Quantizes at STARTUP, progressively "
                        "per leaf, IN PLACE — the fp tree is dropped "
                        "(serving-only: at 7B fp + quantized trees cannot "
                        "coexist on one 16 GiB chip)")
    p.add_argument("--quantize-bits", type=int, default=8, choices=(8, 4),
                   help="weight-only width for --quantize-decode: 8 = "
                        "per-channel int8 (default), 4 = packed int4 with "
                        "group-128 scales (half the HBM bytes again, "
                        "coarser logits)")
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching (serve/continuous.py): admit "
                        "greedy requests into the RUNNING decode batch at "
                        "step boundaries instead of queueing behind it — "
                        "one static compiled shape (--cb-slots lanes)")
    p.add_argument("--cb-slots", type=int, default=4,
                   help="decode lanes for --continuous")
    p.add_argument("--cb-width", type=int, default=32,
                   help="static post-prompt token width for --continuous "
                        "(longer prompts are rejected)")
    p.add_argument("--cb-max-new", type=int, default=64,
                   help="per-lane generation cap for --continuous "
                        "(per-request max_new_tokens clamps to this)")
    p.add_argument("--cb-chunk", type=int, default=1,
                   help="decode steps per device dispatch for --continuous "
                        "(amortizes tunnel dispatch latency; admission "
                        "waits up to chunk-1 steps)")
    p.add_argument("--speculate", type=int, default=0,
                   help="k > 0: serve /worker_generate_stream via prompt-"
                        "lookup speculative decoding (serve/speculative.py) "
                        "— token-exact greedy, up to k+1 tokens per device "
                        "dispatch on the dispatch-bound stream path")
    p.add_argument("--quantize-kv", action="store_true",
                   help="int8 KV cache with per-token scales "
                        "(llama family): halves the decode step's "
                        "cache-read bytes — matters from batch >= 4 where "
                        "the KV share of HBM traffic bites; orthogonal to "
                        "--quantize-decode")
    args = p.parse_args(argv)

    from robustvlm_tpu.vlm_eval.run_evaluation import build_eval_model

    model = build_eval_model(args, "half")
    if args.quantize_decode:
        if not hasattr(model, "quantize_for_serving"):
            raise SystemExit(
                f"--quantize-decode is not supported by the "
                f"'{args.model}' adapter (llava only)"
            )
        # startup, in place, progressive: a serving worker never runs the
        # attack/loss path, so dropping the fp tree is free — and at 7B
        # it is REQUIRED (fp + quantized = 19.8 GiB > one v5e)
        model.quantize_for_serving(args.quantize_bits)
    if args.quantize_kv:
        if not hasattr(model, "quantize_kv"):
            raise SystemExit(
                f"--quantize-kv is not supported by the '{args.model}' "
                f"adapter (llava only)"
            )
        model.quantize_kv = True
    engine = None
    if args.continuous:
        from robustvlm_tpu.serve.continuous import ContinuousEngine

        engine = ContinuousEngine(
            model, n_slots=args.cb_slots, width=args.cb_width,
            max_new=args.cb_max_new, chunk=args.cb_chunk,
        )
    size = model.cfg.vision.image_size
    worker = ModelWorker(
        model, f"{args.model}-{args.model_size}",
        worker_address=args.worker_address,
        controller_address=args.controller_address or None,
        image_size=size,
        batch_window_ms=args.batch_window_ms,
        max_batch=args.max_batch,
        continuous=engine,
        speculate=args.speculate,
    )
    server = serve_worker(worker, args.host, args.port)
    print(f"worker listening on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
