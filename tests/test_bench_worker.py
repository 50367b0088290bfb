"""CPU smoke tests for scripts/bench_worker.py — the end-to-end serving
bench harness (HTTP -> micro-batcher -> jitted decode). The 7B chip run is
the script's __main__; here the same stage functions drive a tiny LLaVA
through real localhost HTTP and must return well-formed measurements."""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

import bench_worker  # noqa: E402


@pytest.fixture(scope="module")
def tiny_model():
    from robustvlm_tpu.models.llava.model import LLAVA_CONFIGS, init_llava_params
    from robustvlm_tpu.vlm_eval.eval_models import LlavaEvalModel, WordTokenizer

    cfg = LLAVA_CONFIGS["test-tiny"]
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    return LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )


@pytest.fixture(scope="module")
def img_b64(tiny_model):
    return bench_worker._png_b64(tiny_model.cfg.vision.image_size, seed=3)


def test_single_and_stream_stages(tiny_model, img_b64):
    size = tiny_model.cfg.vision.image_size
    srv, url = bench_worker._serve(
        tiny_model, image_size=size, window_ms=0.0, max_batch=1
    )
    try:
        single = bench_worker.bench_single(url, img_b64, max_new=3, reps=1)
        assert single["stage"] == "single_request"
        assert single["latency_s"] > 0
        assert single["tokens_per_sec"] > 0
        stream = bench_worker.bench_stream(url, img_b64, max_new=3, reps=1)
        assert stream["stage"] == "stream_single"
        assert stream["total_s"] > 0
        assert 0 <= stream["n_chunks"] <= 3
    finally:
        srv.shutdown()


def test_concurrent_stage_batches_and_counts(tiny_model, img_b64):
    size = tiny_model.cfg.vision.image_size
    srv, url = bench_worker._serve(
        tiny_model, image_size=size, window_ms=20.0, max_batch=2
    )
    try:
        out = bench_worker.bench_concurrent(
            url, img_b64, max_new=3, conc=2, reqs=2
        )
        assert out["stage"] == "concurrent_batched"
        assert out["concurrency"] == 2
        # emitted-token counting: at most 2 clients x 2 requests x 3 tokens
        # (early EOS/pad on the random tiny model may emit fewer)
        assert out["tokens_counted"] == "emitted"
        assert 0 < out["aggregate_tokens_per_sec"] <= (
            2 * 2 * 3 / out["wall_s"] * 1.01
        )
    finally:
        srv.shutdown()


def test_staggered_stage_continuous_and_batcher(tiny_model, img_b64):
    """Stage 4 harness: the same staggered schedule drives the continuous
    engine and the window batcher; both return comparable measurements."""
    size = tiny_model.cfg.vision.image_size
    srv, url, eng = bench_worker._serve_continuous(
        tiny_model, image_size=size, n_slots=2, max_new=3, chunk=2, width=16
    )
    try:
        out = bench_worker.bench_staggered(
            url, img_b64, 3, conc=2, reqs=2, stagger_s=0.05,
            mode="continuous",
        )
        assert out["stage"] == "staggered_arrivals"
        assert out["mode"] == "continuous"
        assert out["tokens_counted"] == "emitted"
        assert 0 < out["aggregate_tokens_per_sec"] <= (
            2 * 2 * 3 / out["wall_s"] * 1.01
        )
    finally:
        srv.shutdown()
        eng.shutdown()
    srv, url = bench_worker._serve(
        tiny_model, image_size=size, window_ms=20.0, max_batch=2
    )
    try:
        out = bench_worker.bench_staggered(
            url, img_b64, 3, conc=2, reqs=2, stagger_s=0.05,
            mode="window_batcher",
        )
        assert out["mode"] == "window_batcher"
        assert out["aggregate_tokens_per_sec"] > 0
    finally:
        srv.shutdown()


def test_stream_times_counts_ndjson_chunks(tiny_model, img_b64):
    size = tiny_model.cfg.vision.image_size
    srv, url = bench_worker._serve(
        tiny_model, image_size=size, window_ms=0.0, max_batch=1
    )
    try:
        t_first, t_total, n = bench_worker._stream_times(
            url + "/worker_generate_stream",
            {"image_b64": img_b64, "task": "caption", "max_new_tokens": 4},
        )
        assert t_total >= (t_first or 0)
        assert 0 <= n <= 4
    finally:
        srv.shutdown()
