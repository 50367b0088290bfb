"""Continuous-batching engine (serve/continuous.py): lane isolation is
exact math — a request's greedy tokens are independent of what its
neighbour lanes decode (attention masks confine each lane to its own cache
rows), so every scenario here pins TOKEN-EXACT parity against the solo
batch-1 stream decode. Beyond-reference feature: the reference worker
(llava/serve/model_worker.py) serves strictly request-at-a-time."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.serve.continuous import ContinuousEngine


@pytest.fixture(scope="module")
def setup():
    from robustvlm_tpu.models.llava.model import (
        LLAVA_CONFIGS,
        init_llava_params,
    )
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    cfg = LLAVA_CONFIGS["test-tiny"]
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    model = LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    rng = np.random.RandomState(1)
    imgs = [rng.rand(3, 32, 32).astype(np.float32) for _ in range(3)]
    prompt = model.get_caption_prompt()

    def solo(m, img, max_new=8):
        ids = []
        for t in m.stream_tokens(jnp.asarray(img)[None], [prompt], max_new):
            tid = int(t[0])
            if tid in (m.tok.eos_token_id, m.tok.pad_token_id):
                break
            ids.append(tid)
        return ids

    return cfg, params, model, imgs, prompt, solo


def test_single_request_matches_solo_stream(setup):
    _, _, model, imgs, prompt, solo = setup
    ref = solo(model, imgs[0])
    eng = ContinuousEngine(model, n_slots=2, width=8, max_new=8)
    try:
        assert eng.submit(imgs[0], prompt, 8).wait_ids() == ref
    finally:
        eng.shutdown()


def test_staggered_admission_is_isolated(setup):
    """The core continuous-batching property: a request admitted into a
    RUNNING decode batch gets the same tokens as a solo run."""
    _, _, model, imgs, prompt, solo = setup
    refs = [solo(model, im) for im in imgs[:2]]
    eng = ContinuousEngine(model, n_slots=2, width=8, max_new=8)
    try:
        ra = eng.submit(imgs[0], prompt, 8)
        # ensure ra is mid-decode before rb arrives (consume one token)
        first = next(ra.token_stream().__iter__())
        rb = eng.submit(imgs[1], prompt, 8)
        ga = [first] + list(ra.token_stream())
        gb = rb.wait_ids()
        assert ga == refs[0]
        assert gb == refs[1]
    finally:
        eng.shutdown()


def test_slot_reuse_overwrites_stale_cache(setup):
    """3 requests through 2 lanes: the third reuses a retired lane and its
    tokens must be untouched by the previous occupant's KV rows."""
    _, _, model, imgs, prompt, solo = setup
    refs = [solo(model, im) for im in imgs]
    eng = ContinuousEngine(model, n_slots=2, width=8, max_new=8)
    try:
        rs = [eng.submit(im, prompt, 8) for im in imgs]
        assert [r.wait_ids() for r in rs] == refs
    finally:
        eng.shutdown()


def test_chunked_dispatch_parity(setup):
    """chunk=3 (3 decode steps per device dispatch, chunk not dividing
    max_new-1): same tokens, fewer dispatches."""
    _, _, model, imgs, prompt, solo = setup
    refs = [solo(model, im) for im in imgs[:2]]
    eng = ContinuousEngine(model, n_slots=2, width=8, max_new=8, chunk=3)
    try:
        rs = [eng.submit(im, prompt, 8) for im in imgs[:2]]
        assert [r.wait_ids() for r in rs] == refs
    finally:
        eng.shutdown()


def test_int8_kv_cache_engine_parity(setup):
    """quantize_kv engine matches the kv-quant solo stream (the serving
    aggregate-champion config, CLAUDE.md: int8+int8KV)."""
    cfg, params, _, imgs, prompt, _ = setup
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    m = LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    m.quantize_kv = True
    ref = []
    for t in m.stream_tokens(jnp.asarray(imgs[0])[None], [prompt], 8):
        tid = int(t[0])
        if tid in (m.tok.eos_token_id, m.tok.pad_token_id):
            break
        ref.append(tid)
    eng = ContinuousEngine(m, n_slots=2, width=8, max_new=8)
    try:
        assert eng.submit(imgs[0], prompt, 8).wait_ids() == ref
    finally:
        eng.shutdown()


def test_unstacked_serving_layout_parity(setup):
    """The 7B serving layout (params['layers'], lane axis 0) — the layout
    the real chip serves — through the engine."""
    cfg, params, _, imgs, prompt, _ = setup
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    p = jax.tree.map(lambda a: a, params)
    blocks = p["llama"]["blocks"]
    p["layers"] = tuple(
        jax.tree.map(lambda a, i=i: a[i], blocks)
        for i in range(cfg.llama.n_layers)
    )
    m = LlavaEvalModel(
        p, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    ref = []
    for t in m.stream_tokens(jnp.asarray(imgs[0])[None], [prompt], 8):
        tid = int(t[0])
        if tid in (m.tok.eos_token_id, m.tok.pad_token_id):
            break
        ref.append(tid)
    eng = ContinuousEngine(m, n_slots=2, width=8, max_new=8)
    try:
        assert eng.submit(imgs[0], prompt, 8).wait_ids() == ref
    finally:
        eng.shutdown()


def test_prompt_wider_than_engine_rejected(setup):
    _, _, model, imgs, prompt, _ = setup
    eng = ContinuousEngine(model, n_slots=1, width=2, max_new=4)
    try:
        with pytest.raises(ValueError, match="post tokens"):
            eng.submit(imgs[0], prompt + " a b c d e f g h", 4)
    finally:
        eng.shutdown()


def test_cancel_frees_lane_for_next_request(setup):
    """cancel() retires the lane at the next emission point (deterministic
    check via _emit directly — the engine loop may outrun a consumer-side
    cancel on a warm cache) and the freed lane serves the next request
    with exact parity."""
    from robustvlm_tpu.serve.continuous import CBRequest, _Slot

    _, _, model, imgs, prompt, solo = setup
    ref1 = solo(model, imgs[1])
    eng = ContinuousEngine(model, n_slots=1, width=8, max_new=8)
    try:
        r = eng.submit(imgs[0], prompt, 8)
        r.cancel()  # may land before, during, or after decode — all legal
        list(r.token_stream())
        # the lane serves the next request exactly regardless of where the
        # cancel landed
        assert eng.submit(imgs[1], prompt, 8).wait_ids() == ref1
    finally:
        eng.shutdown()
    # deterministic cancel semantics, host-side on a quiesced engine (loop
    # joined by shutdown, so poking lane state cannot race the dispatcher):
    # a cancelled request's next emission retires the lane WITHOUT emitting
    eng2 = ContinuousEngine(model, n_slots=1, width=8, max_new=8)
    eng2.shutdown()
    dummy = CBRequest(imgs[0], prompt, 8)
    dummy.cancel()
    eng2._slots[0] = _Slot(dummy, 8)
    eng2._emit(0, 42)
    assert eng2._slots[0] is None  # retired
    assert dummy.tokens.get() is None  # no token emitted, stream terminated


def test_dispatch_failure_fails_batch_then_recovers(setup):
    """A device-side dispatch failure retires the running batch with the
    error surfaced on each request stream, drops the (possibly donated)
    lane caches, and the next admission rebuilds them cleanly."""
    _, _, model, imgs, prompt, solo = setup
    ref = solo(model, imgs[1])
    eng = ContinuousEngine(model, n_slots=1, width=8, max_new=8)
    try:
        orig, fired = eng._dispatch, []

        def boom():
            if not fired:
                fired.append(1)
                raise RuntimeError("injected device failure")
            return orig()

        eng._dispatch = boom
        r1 = eng.submit(imgs[0], prompt, 8)
        with pytest.raises(RuntimeError, match="injected"):
            list(r1.token_stream())
        assert eng._bcaches is None  # lanes dropped for rebuild
        assert eng.submit(imgs[1], prompt, 8).wait_ids() == ref
    finally:
        eng.shutdown()


def test_max_new_zero_emits_nothing(setup):
    """An explicit max_new=0 request must generate zero tokens (matches
    get_outputs with a zero-length scan), not fall back to the engine cap."""
    _, _, model, imgs, prompt, _ = setup
    eng = ContinuousEngine(model, n_slots=1, width=8, max_new=8)
    try:
        assert eng.submit(imgs[0], prompt, 0).wait_ids() == []
    finally:
        eng.shutdown()


def test_non_llama_family_rejected():
    class _Cfg:
        lm_family = "mpt"

    class _M:
        cfg = _Cfg()

        class tok:
            pad_token_id = 0
            eos_token_id = 2

    with pytest.raises(ValueError, match="llama"):
        ContinuousEngine(_M())


def test_worker_routes_through_engine(setup):
    """--continuous worker path: /worker_generate collects the stream,
    /worker_generate_stream yields cumulative text; both match the solo
    greedy decode."""
    from robustvlm_tpu.serve.model_worker import ModelWorker
    from robustvlm_tpu.vlm_eval.eval_models import truncate_at_stops

    _, _, model, imgs, prompt, solo = setup
    ref_text = truncate_at_stops(
        model.tok.decode(solo(model, imgs[0])), model.DEFAULT_STOPS
    )
    eng = ContinuousEngine(model, n_slots=2, width=8, max_new=8)
    try:
        w = ModelWorker(
            model, "llava-tiny", worker_address="",
            controller_address=None, image_size=32, continuous=eng,
        )
        payload = {"image": imgs[0].tolist(), "task": "caption",
                   "max_new_tokens": 8}
        out = w.generate(dict(payload))
        assert out["error_code"] == 0 and out["text"] == ref_text
        chunks = list(w.generate_stream(dict(payload)))
        assert all(c["error_code"] == 0 for c in chunks)
        assert chunks[-1]["text"] == ref_text
    finally:
        eng.shutdown()


def test_fsdp_sharded_params_engine_parity(setup):
    """Serving scale-out: the engine with fsdp/TP-sharded params over the
    8-device virtual mesh decodes the same tokens as the single-device
    engine — the cores take params as operands, so the sharding rules
    (parallel/mesh.py) compose with continuous batching unchanged. This is
    the multi-chip path that serves bf16 at batch >= 2 (one v5e OOMs)."""
    cfg, params, _, imgs, prompt, solo = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from robustvlm_tpu.parallel import make_mesh, shard_params
    from robustvlm_tpu.vlm_eval.eval_models import (
        LlavaEvalModel,
        WordTokenizer,
    )

    mesh = make_mesh(data=1, fsdp=4, model=2)
    p = shard_params(jax.tree.map(lambda a: a, params), mesh)
    m = LlavaEvalModel(
        p, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )
    refs = [solo(m, im) for im in imgs[:2]]  # sharded solo reference
    eng = ContinuousEngine(m, n_slots=2, width=8, max_new=8)
    try:
        rs = [eng.submit(im, prompt, 8) for im in imgs[:2]]
        assert [r.wait_ids() for r in rs] == refs
    finally:
        eng.shutdown()


def test_concurrent_submissions_all_exact(setup):
    """Three threads submit concurrently against 2 lanes (forcing queueing
    + staggered admission + reuse under racing submits)."""
    _, _, model, imgs, prompt, solo = setup
    refs = [solo(model, im) for im in imgs]
    eng = ContinuousEngine(model, n_slots=2, width=8, max_new=8)
    got = [None] * 3

    def run(i):
        got[i] = eng.submit(imgs[i], prompt, 8).wait_ids()

    try:
        ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
            time.sleep(0.01)
        for t in ts:
            t.join(timeout=120)
        assert got == refs
    finally:
        eng.shutdown()
