"""End-to-end serving-worker benchmark: HTTP -> worker -> jitted decode.

scripts/bench_decode.py times the jitted prefill+scan alone (the serving
floor); this script times the REAL worker surface
(robustvlm_tpu/serve/model_worker.py — reference counterpart
llava/serve/model_worker.py:126-226, which serves HF fp16 with no published
throughput) through actual HTTP on localhost:

  1. /worker_generate, single stream, window=0 (the reference's strictly
     per-request behavior): latency + tok/s at batch 1 — quantifies the
     HTTP + base64/PNG decode + host tokenize overhead over the jitted scan.
  2. /worker_generate_stream, single stream: tok/s with per-token chunk
     flushes — quantifies the per-token tunnel-dispatch penalty
     (greedy_generate_stream re-dispatches one fused step per token instead
     of ONE compiled prefill+scan program).
  3. /worker_generate under concurrency c in {2,4,8} with the
     window-coalescing micro-batcher (max_batch=c, so the compiled batch
     shape equals the offered concurrency): aggregate tok/s — the measured
     case for the batcher that bench_decode's b2/b4 scan numbers only imply.
  4. STAGGERED arrivals (clients offset by --stagger seconds) against (a)
     the continuous-batching engine (serve/continuous.py: requests join
     the RUNNING decode batch at step boundaries) and (b) the window
     micro-batcher under the identical schedule. Staggering is the traffic
     shape the window batcher cannot coalesce (a request arriving
     mid-decode waits out the whole batch) and the reason continuous
     batching exists; same-instant volleys (stage 3) are its best case.

Model: LLaVA-1.5-7B at real shapes, random bf16 weights (throughput is
weight-agnostic), progressively quantized IN PLACE at startup
(quantize_for_serving — fp+quantized trees cannot coexist at 7B on one
16 GiB v5e). int8 by default: the measured serving default for b1 latency
(bench_decode.py); BENCH_WORKER_BITS=4 serves the packed-int4 Pallas path
(wins at batch >= 2 and leaves ~3 GiB more KV headroom for the b8 point).

Measured (v5e, round 5, int8 weights, 64 new tokens/request):

  single request (window=0):  80.16 tok/s, 0.798 s latency — the whole
      HTTP + base64-PNG decode + tokenize + readback overhead costs ~13%
      vs the raw jitted scan (92.3 tok/s, bench_decode.py): the jitted
      generation core (eval_models._gen_core) keeps the request path at
      ONE device dispatch.
  micro-batched aggregate:  c2 139.1 / c4 185.7 / c8 132.4 tok/s — the
      batcher's case measured THROUGH HTTP, not inferred from scan
      numbers. c4 ~= 79% of the b4 scan rate (236): the window tax +
      thread scheduling. c8 REGRESSES: the b8 decode step's KV-cache read
      (~0.7 GiB/step bf16) erases the batching win — the motivation for
      the int8 KV cache (--quantize-kv, measured separately).
  streaming: 22.9 tok/s, 40.8 ms/token steady, 0.132 s to first token —
      AFTER the round-5 fix. The first measured run hit 4247 ms/token:
      the legacy eager stream re-dispatched the unstacked 7B layer loop
      op-by-op over the tunnel (~300 dispatches x ~14 ms). stream_tokens
      (jitted prefill/step cores, params as operands) brought a token
      step back to one dispatch — a 104x fix only an end-to-end
      measurement could expose.

Stage 4 measured (v5e, int8 weights, 64 new/request, 3 reqs/client,
chunk=8; aggregate emitted-tok/s and per-request latency):

  stagger 0.25s c4:  continuous 129.1 (p95 1.89 s, max 1.89)
                     window     136.5 (p95 2.37 s, max 2.62)
      bursty arrivals: the batcher still coalesces most of the volley and
      keeps a ~5% throughput edge (admission prefills are serialized per
      request in the engine) — but continuous already cuts the latency
      TAIL by ~20% (every lane decodes concurrently; nobody waits out a
      running batch).
  stagger 0.5s  c4:  continuous 120.0 (p95 1.82) vs window 111.3 (p95 2.75)
  stagger 0.5s  c8:  continuous 143.1 (p95 2.81) vs window 128.3 (p95 4.08)
      de-phased arrivals (the production shape): continuous wins BOTH
      axes — +8%/+12% throughput and a ~31-34% lower p95 — exactly the
      crossover the design predicts (window coalescing degrades toward
      per-request serving as arrivals spread; slot admission keeps lanes
      busy regardless of phase).
  stagger 0.5s c8 + int8 KV (--quantize-kv):
                     continuous 138.3 (p95 3.05) vs window 13.4 (p95 105.1)
      two honest findings: (1) KV-quant does NOT pay at partial lane
      occupancy (138.3 < 143.1 plain — the per-step rescale overhead
      without the full-b8 cache-read saving); (2) the window batcher
      DESTABILIZES: each near-singleton group pays the full padded-b8
      KVq prefill+scan, calls slow down, coalescing degrades further — a
      queueing feedback the phase-free engine is structurally immune to.

Usage:  python scripts/bench_worker.py            (needs the TPU)
        BENCH_WORKER_BITS=8|4     weight-only width (default 8)
        BENCH_WORKER_NEW=64       new tokens per request
        BENCH_WORKER_CONC=2,4,8   concurrency sweep (micro-batched;
                                  empty string skips the sweep)
        BENCH_WORKER_REQS=3       sequential requests per client thread
        BENCH_WORKER_STREAM_NEW=32  new tokens for the stream point
        BENCH_WORKER_KVQ=1        int8 KV cache (llama _quantize_kv)
        BENCH_WORKER_CB=4         continuous-vs-batcher staggered sweep
                                  (lane counts; empty string skips)
        BENCH_WORKER_CB_CHUNK=8   decode steps per dispatch (amortizes the
                                  ~30 ms tunnel dispatch across tokens)
        BENCH_WORKER_STAGGER_S=0.25  client start offset for stage 4

Prints one JSON line per stage; the last line is the summary. CPU smoke
test of the harness plumbing: tests/test_bench_worker.py.
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _configure_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _png_b64(size: int, seed: int = 0) -> str:
    """A random RGB PNG at the model's resolution, base64 — exercises the
    worker's real image path (PIL decode + transform), like a browser
    client would."""
    import numpy as np
    from PIL import Image

    rgb = (np.random.RandomState(seed).rand(size, size, 3) * 255).astype("uint8")
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url: str, payload: dict, timeout: float = 3600.0) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _stream_times(url: str, payload: dict, timeout: float = 3600.0):
    """POST to /worker_generate_stream; -> (t_first_chunk_s, t_total_s,
    n_chunks) relative to the send. Each NDJSON chunk is one new token."""
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    t_first = None
    n = 0
    with urllib.request.urlopen(req, timeout=timeout) as r:
        for line in r:
            if not line.strip():
                continue
            chunk = json.loads(line)
            if chunk.get("error_code"):
                raise RuntimeError(chunk.get("error", "stream error"))
            if t_first is None:
                t_first = time.perf_counter() - t0
            n += 1
    return t_first, time.perf_counter() - t0, n


def _serve(model, *, image_size: int, window_ms: float, max_batch: int):
    """Start a worker HTTP server on an ephemeral localhost port;
    -> (server, base_url). Caller must server.shutdown()."""
    from robustvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    worker = ModelWorker(
        model, "llava-7b-bench", worker_address="", controller_address=None,
        image_size=image_size, batch_window_ms=window_ms, max_batch=max_batch,
    )
    srv = serve_worker(worker, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def bench_single(url: str, img: str, max_new: int, *, reps: int = 3) -> dict:
    """Stage 1: per-request endpoint, one client. First call compiles;
    best-of-`reps` afterwards."""
    payload = {"image_b64": img, "task": "caption", "max_new_tokens": max_new}
    t0 = time.perf_counter()
    out = _post(url + "/worker_generate", payload)
    t_compile = time.perf_counter() - t0
    if out.get("error_code"):
        raise RuntimeError(out.get("error", "generate failed"))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _post(url + "/worker_generate", payload)
        dt = time.perf_counter() - t0
        if out.get("error_code"):
            raise RuntimeError(out.get("error", "generate failed"))
        best = dt if best is None else min(best, dt)
    return {
        "stage": "single_request",
        "latency_s": round(best, 3),
        "tokens_per_sec": round(max_new / best, 2),
        "compile_plus_first_s": round(t_compile, 1),
        "max_new_tokens": max_new,
    }


def bench_stream(url: str, img: str, max_new: int, *, reps: int = 3) -> dict:
    """Stage 2: streaming endpoint, one client. Reports the steady per-token
    rate (chunks after the first, which absorbs prefill + dispatch warmup)."""
    payload = {"image_b64": img, "task": "caption", "max_new_tokens": max_new}
    _stream_times(url + "/worker_generate_stream", payload)  # compile/warm
    best = None
    for _ in range(reps):
        t_first, t_total, n = _stream_times(
            url + "/worker_generate_stream", payload
        )
        if best is None or t_total < best[1]:
            best = (t_first, t_total, n)
    t_first, t_total, n = best
    if t_first is None:  # all rows hit EOS immediately (tiny test models)
        t_first = t_total
    per_tok_ms = (t_total - t_first) / max(n - 1, 1) * 1000
    return {
        "stage": "stream_single",
        "time_to_first_token_s": round(t_first, 3),
        "total_s": round(t_total, 3),
        "n_chunks": n,
        "steady_ms_per_token": round(per_tok_ms, 2),
        "tokens_per_sec": round(n / t_total, 2),
        "max_new_tokens": max_new,
    }


def _run_clients(url: str, img: str, max_new: int, conc: int, reqs: int,
                 stagger_s: float):
    """`conc` client threads (client i starts i*stagger_s late), `reqs`
    sequential /worker_generate requests each; -> (wall_s, n_tokens,
    errors). Tokens are counted from the response text — the bench model's
    WordTokenizer decodes exactly one space-separated word per token — so
    a lane that retires early at EOS is credited only for what it emitted:
    the same honest count for BOTH scheduler modes (the fixed-length-scan
    argument holds for the window batcher but NOT for the continuous
    engine). A transport exception is recorded, never silently lost with
    its thread."""
    errors: list = []
    counts = [0] * conc
    lats: list = []  # per-request end-to-end latencies (all clients)

    def client(i: int):
        try:
            time.sleep(i * stagger_s)
            payload = {
                "image_b64": img, "task": "vqa",
                "question": f"what is in image {i}",
                "max_new_tokens": max_new,
            }
            for _ in range(reqs):
                t0 = time.perf_counter()
                out = _post(url + "/worker_generate", payload)
                dt = time.perf_counter() - t0
                if out.get("error_code"):
                    errors.append(out.get("error", "?"))
                    return
                counts[i] += len(out.get("text", "").split())
                lats.append(dt)
        except Exception as e:  # noqa: BLE001 — surface, don't lose
            errors.append(f"{type(e).__name__}: {e}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(conc)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0, sum(counts), errors, sorted(lats)


def bench_concurrent(
    url: str, img: str, max_new: int, conc: int, reqs: int
) -> dict:
    """Stage 3: `conc` client threads against a worker whose micro-batcher
    compiles at batch shape == conc; aggregate emitted-tokens/s."""
    # warm/compile: one full concurrent volley (the batcher pads to conc)
    t_compile, _, errors, _ = _run_clients(url, img, max_new, conc, 1, 0.0)
    if errors:
        raise RuntimeError(f"concurrency {conc}: {errors[0][:300]}")
    dt, n_tokens, errors, lats = _run_clients(url, img, max_new, conc, reqs, 0.0)
    if errors:
        raise RuntimeError(f"concurrency {conc}: {errors[0][:300]}")
    return {
        "stage": "concurrent_batched",
        "concurrency": conc,
        "requests_per_client": reqs,
        "aggregate_tokens_per_sec": round(n_tokens / dt, 2),
        "tokens_counted": "emitted",
        "latency_mean_s": round(sum(lats) / len(lats), 3),
        "latency_p95_s": round(lats[max(0, int(len(lats) * 0.95) - 1)], 3),
        "latency_max_s": round(lats[-1], 3),
        "wall_s": round(dt, 4),
        "compile_plus_first_volley_s": round(t_compile, 1),
        "max_new_tokens": max_new,
    }


def _serve_continuous(model, *, image_size: int, n_slots: int, max_new: int,
                      chunk: int, width: int = 32):
    """Worker backed by the continuous-batching engine; -> (server, url,
    engine). Caller must shutdown() both."""
    from robustvlm_tpu.serve.continuous import ContinuousEngine
    from robustvlm_tpu.serve.model_worker import ModelWorker, serve_worker

    eng = ContinuousEngine(
        model, n_slots=n_slots, width=width, max_new=max_new, chunk=chunk
    )
    worker = ModelWorker(
        model, "llava-7b-bench", worker_address="", controller_address=None,
        image_size=image_size, continuous=eng,
    )
    srv = serve_worker(worker, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", eng


def bench_staggered(
    url: str, img: str, max_new: int, *, conc: int, reqs: int,
    stagger_s: float, mode: str
) -> dict:
    """Stage 4: client i starts i*stagger_s after client 0, then sends
    `reqs` back-to-back requests — arrivals land MID-decode, the shape
    window coalescing can't batch. Aggregate emitted-tokens/s over the
    whole ramp (identical schedule + identical counting for both modes,
    so the numbers compare directly)."""
    # warm/compile volley (no stagger needed: compiles are shape-keyed)
    t_compile, _, errors, _ = _run_clients(url, img, max_new, conc, 1, 0.0)
    if errors:
        raise RuntimeError(f"{mode} conc {conc}: {errors[0][:300]}")
    dt, n_tokens, errors, lats = _run_clients(
        url, img, max_new, conc, reqs, stagger_s
    )
    if errors:
        raise RuntimeError(f"{mode} conc {conc}: {errors[0][:300]}")
    return {
        "stage": "staggered_arrivals",
        "mode": mode,
        "concurrency": conc,
        "requests_per_client": reqs,
        "stagger_s": stagger_s,
        "aggregate_tokens_per_sec": round(n_tokens / dt, 2),
        "tokens_counted": "emitted",
        "latency_mean_s": round(sum(lats) / len(lats), 3),
        "latency_p95_s": round(lats[max(0, int(len(lats) * 0.95) - 1)], 3),
        "latency_max_s": round(lats[-1], 3),
        "wall_s": round(dt, 4),
        "compile_plus_first_volley_s": round(t_compile, 1),
        "max_new_tokens": max_new,
    }


def build_7b_serving_model(bits: int):
    """LLaVA-1.5-7B eval model, random bf16 weights born unstacked on
    device (bench_llava7b._init_bf16_on_device — the stacked layout OOMs),
    then quantized in place for serving."""
    import jax.numpy as jnp

    from bench_llava7b import _init_bf16_on_device
    from robustvlm_tpu.models.llava.model import LLAVA_CONFIGS
    from robustvlm_tpu.vlm_eval.eval_models import LlavaEvalModel, WordTokenizer

    cfg = LLAVA_CONFIGS["llava-1.5-7b"]
    params = _init_bf16_on_device(cfg)
    model = LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.bfloat16,
    )
    model.quantize_for_serving(bits)
    return model


def main(argv=None):
    _configure_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    bits = int(os.environ.get("BENCH_WORKER_BITS", 8))
    max_new = int(os.environ.get("BENCH_WORKER_NEW", 64))
    stream_new = int(os.environ.get("BENCH_WORKER_STREAM_NEW", 32))
    concs = [
        int(c) for c in os.environ.get("BENCH_WORKER_CONC", "2,4,8").split(",")
        if c.strip()
    ]
    reqs = int(os.environ.get("BENCH_WORKER_REQS", 3))

    model = build_7b_serving_model(bits)
    kvq = os.environ.get("BENCH_WORKER_KVQ") == "1"
    if kvq:
        model.quantize_kv = True
    size = model.cfg.vision.image_size
    img = _png_b64(size)
    n_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree.leaves(model.params)
    )
    print(f"params resident: {n_bytes / 2**30:.2f} GiB int{bits}",
          file=sys.stderr)

    points = []

    def stage(fn, *a, **kw):
        try:
            out = fn(*a, **kw)
        except Exception as e:  # sweep must continue past an OOM point
            out = {"stage": fn.__name__, "error": str(e)[:400], **kw}
        points.append(out)
        print(json.dumps({"metric": "llava7b_worker_e2e", **out}), flush=True)
        return out

    # stages 1+2: per-request worker (window=0, the reference behavior);
    # BENCH_WORKER_SINGLE=0 skips them when iterating on later stages
    single = stream = {}
    if os.environ.get("BENCH_WORKER_SINGLE", "1") != "0":
        srv, url = _serve(model, image_size=size, window_ms=0.0, max_batch=1)
        single = stage(bench_single, url, img, max_new)
        stream = stage(bench_stream, url, img, stream_new)
        srv.shutdown()

    # stage 3: one worker per concurrency so the compiled batch shape
    # equals the offered load (max_batch=c); window 30 ms coalesces the
    # volley into one padded TPU call
    for c in concs:
        srv, url = _serve(model, image_size=size, window_ms=30.0, max_batch=c)
        stage(bench_concurrent, url, img, max_new, conc=c, reqs=reqs)
        srv.shutdown()

    # stage 4: continuous batching vs the window batcher under STAGGERED
    # arrivals — the traffic shape same-phase coalescing can't batch
    cb_concs = [
        int(c) for c in os.environ.get("BENCH_WORKER_CB", "4").split(",")
        if c.strip()
    ]
    cb_chunk = int(os.environ.get("BENCH_WORKER_CB_CHUNK", 8))
    stagger_s = float(os.environ.get("BENCH_WORKER_STAGGER_S", 0.25))
    for c in cb_concs:
        srv, url, eng = _serve_continuous(
            model, image_size=size, n_slots=c, max_new=max_new,
            chunk=cb_chunk,
        )
        stage(bench_staggered, url, img, max_new, conc=c, reqs=reqs,
              stagger_s=stagger_s, mode="continuous")
        srv.shutdown()
        eng.shutdown()
        srv, url = _serve(model, image_size=size, window_ms=30.0, max_batch=c)
        stage(bench_staggered, url, img, max_new, conc=c, reqs=reqs,
              stagger_s=stagger_s, mode="window_batcher")
        srv.shutdown()

    agg = {
        p["concurrency"]: p["aggregate_tokens_per_sec"]
        for p in points
        if p.get("stage") == "concurrent_batched" and "error" not in p
    }
    stag = {
        f'{p["mode"]}_c{p["concurrency"]}': p["aggregate_tokens_per_sec"]
        for p in points
        if p.get("stage") == "staggered_arrivals" and "error" not in p
    }
    summary = {
        "metric": "llava7b_worker_e2e_tokens_per_sec",
        "value": max(
            [single.get("tokens_per_sec", 0), *agg.values(), *stag.values()],
            default=None,
        ),
        "unit": "tokens/s/chip",
        "weights": f"int{bits}",
        "kv_cache": "int8" if kvq else "bf16",
        "single_request_tokens_per_sec": single.get("tokens_per_sec"),
        "stream_steady_ms_per_token": stream.get("steady_ms_per_token"),
        "aggregate_by_concurrency": agg,
        "staggered_aggregate": stag,
        "max_new_tokens": max_new,
    }
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
