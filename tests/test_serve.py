"""Serving stack: controller registry/dispatch + worker generate E2E."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.serve.controller import Controller, serve
from robustvlm_tpu.serve.model_worker import ModelWorker, serve_worker


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _llava_model():
    from robustvlm_tpu.models.llava.model import LLAVA_CONFIGS, init_llava_params
    from robustvlm_tpu.vlm_eval.eval_models import LlavaEvalModel, WordTokenizer

    cfg = LLAVA_CONFIGS["test-tiny"]
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    return LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=jnp.float32, max_post_len=16,
    )


class TestControllerUnit:
    def test_register_and_dispatch(self):
        c = Controller()
        c.workers  # empty
        assert c.get_worker_address("m") == ""
        c.register_worker("http://w1", False, {"model_names": ["m"], "queue_length": 0})
        c.register_worker("http://w2", False, {"model_names": ["m"], "queue_length": 5})
        assert c.list_models() == ["m"]
        # shortest queue wins
        assert c.get_worker_address("m") == "http://w1"

    def test_heartbeat_updates(self):
        c = Controller()
        c.register_worker("http://w1", False, {"model_names": ["m"]})
        assert c.heartbeat("http://w1", 3)
        assert c.workers["http://w1"].queue_length == 3
        assert not c.heartbeat("http://nope", 0)


class TestEndToEnd:
    def test_controller_worker_generate(self):
        ctrl_srv = serve(host="127.0.0.1", port=0)
        ctrl_port = ctrl_srv.server_address[1]
        threading.Thread(target=ctrl_srv.serve_forever, daemon=True).start()
        ctrl_addr = f"http://127.0.0.1:{ctrl_port}"

        model = _llava_model()
        worker = ModelWorker(
            model, "llava-tiny", worker_address="", controller_address=None,
            image_size=32,
        )
        wsrv = serve_worker(worker, "127.0.0.1", 0)
        wport = wsrv.server_address[1]
        threading.Thread(target=wsrv.serve_forever, daemon=True).start()
        waddr = f"http://127.0.0.1:{wport}"
        worker.worker_address = waddr

        # register via HTTP (controller pulls status from the worker)
        out = _post(ctrl_addr + "/register_worker",
                    {"worker_name": waddr, "check_heart_beat": False})
        assert out["exist"]
        models = _post(ctrl_addr + "/list_models", {})["models"]
        assert models == ["llava-tiny"]

        img = np.random.RandomState(0).rand(3, 32, 32).astype(np.float32)
        res = _post(ctrl_addr + "/worker_generate", {
            "model": "llava-tiny", "image": img.tolist(),
            "task": "caption", "max_new_tokens": 3,
        })
        assert res["error_code"] == 0
        assert isinstance(res["text"], str)

        res2 = _post(ctrl_addr + "/worker_generate", {
            "model": "llava-tiny", "image": img.tolist(),
            "task": "vqa", "question": "what is it", "max_new_tokens": 3,
        })
        assert res2["error_code"] == 0

        # streaming: NDJSON chunks through the controller proxy, final
        # cumulative text equals the non-streamed greedy output
        req = urllib.request.Request(
            ctrl_addr + "/worker_generate_stream",
            data=json.dumps({
                "model": "llava-tiny", "image": img.tolist(),
                "task": "caption", "max_new_tokens": 3,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        chunks = []
        with urllib.request.urlopen(req, timeout=60) as r:
            for line in r:
                chunks.append(json.loads(line))
        assert chunks and all(c["error_code"] == 0 for c in chunks)
        assert chunks[-1]["text"] == res["text"]
        ctrl_srv.shutdown()
        wsrv.shutdown()


class TestWebUI:
    def test_controller_serves_html_page(self):
        import urllib.request

        from robustvlm_tpu.serve.controller import serve

        srv = serve(host="127.0.0.1", port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            port = srv.server_address[1]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10
            ) as r:
                assert r.headers["Content-Type"].startswith("text/html")
                body = r.read().decode()
            assert "worker_generate" in body and "list_models" in body
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/web", timeout=10
            ) as r:
                assert r.status == 200
        finally:
            srv.shutdown()

    def test_unknown_get_is_404(self):
        import urllib.error
        import urllib.request

        from robustvlm_tpu.serve.controller import serve

        srv = serve(host="127.0.0.1", port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            port = srv.server_address[1]
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/nope", timeout=10
                )
            assert ei.value.code == 404
        finally:
            srv.shutdown()


class TestMicroBatcher:
    """Window-coalescing micro-batcher (ModelWorker batch_window_ms):
    concurrent same-config requests run as ONE padded batched get_outputs
    call; different generation configs split into separate calls;
    window=0 keeps the reference's per-request behavior."""

    class _FakeModel:
        """Records every get_outputs batch; echoes prompt per row."""

        def __init__(self):
            self.calls = []

        def get_caption_prompt(self, caption=None):
            return "<image>Output:"

        def get_vqa_prompt(self, q, a=None):
            return f"<image>Q:{q} A:"

        def get_outputs(self, x, prompts, max_new_tokens=32, num_beams=1):
            self.calls.append(
                (int(x.shape[0]), tuple(prompts), max_new_tokens, num_beams)
            )
            return [f"out:{p}:{max_new_tokens}" for p in prompts]

    def _worker(self, model, window_ms, max_batch=4):
        return ModelWorker(
            model, "fake",
            worker_address="http://local", controller_address=None,
            image_size=8, batch_window_ms=window_ms, max_batch=max_batch,
        )

    def _payload(self, q=None, mnt=8):
        img = np.zeros((3, 8, 8), np.float32).tolist()
        p = {"image": img, "max_new_tokens": mnt}
        if q is not None:
            p["task"] = "vqa"
            p["question"] = q
        return p

    def test_concurrent_requests_coalesce_into_one_padded_call(self):
        model = self._FakeModel()
        # window only has to outlast thread STARTUP on the loaded 1-CPU
        # xdist box; the batch fires at window expiry regardless
        w = self._worker(model, window_ms=1500.0, max_batch=4)
        results = [None] * 3

        def call(i):
            results[i] = w.generate(self._payload(q=f"q{i}"))

        ts = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=30)
        assert all(r is not None and r["error_code"] == 0 for r in results)
        # each caller got ITS OWN answer
        for i, r in enumerate(results):
            assert f"q{i}" in r["text"]
        # one batched call, padded to max_batch
        assert len(model.calls) == 1
        assert model.calls[0][0] == 4  # padded batch shape
        assert model.calls[0][2] == 8

    def test_different_configs_split_into_separate_calls(self):
        import time as _time

        model = self._FakeModel()
        w = self._worker(model, window_ms=300.0, max_batch=4)
        results = {}

        def call(name, mnt):
            results[name] = w.generate(self._payload(q=name, mnt=mnt))

        # both requests observably enqueued before either window closes
        ts = [
            threading.Thread(target=call, args=("a", 8)),
            threading.Thread(target=call, args=("b", 16)),
        ]
        ts[0].start()
        deadline = _time.monotonic() + 20
        while _time.monotonic() < deadline:
            with w.batcher.cv:
                if w.batcher.pending:
                    break
            _time.sleep(0.005)
        ts[1].start()
        for t in ts:
            t.join(timeout=60)
        assert results["a"]["text"].endswith(":8")
        assert results["b"]["text"].endswith(":16")
        assert len(model.calls) == 2
        assert {c[2] for c in model.calls} == {8, 16}

    def test_window_zero_is_per_request(self):
        model = self._FakeModel()
        w = self._worker(model, window_ms=0.0)
        assert w.batcher is None
        r = w.generate(self._payload())
        assert r["error_code"] == 0
        assert len(model.calls) == 1 and model.calls[0][0] == 1

    def test_mixed_config_traffic_waits_for_same_key_fill(self):
        """The linger early-break must count only same-config requests: a
        burst of other-config traffic can't cut the oldest key's window
        into a near-empty padded batch. Orderings are made OBSERVABLE (poll
        the pending queue) instead of sleep-raced — the 1-CPU test box with
        3 xdist workers can delay thread starts past any fixed margin."""
        import time as _time

        model = self._FakeModel()
        # generous window: the test ends as soon as the same-key fill is
        # reached, so a large window costs nothing when the logic is right
        w = self._worker(model, window_ms=5000.0, max_batch=2)
        results = {}

        def call(name, mnt):
            results[name] = w.generate(self._payload(q=name, mnt=mnt))

        def wait_pending(n):
            deadline = _time.monotonic() + 20
            while _time.monotonic() < deadline:
                with w.batcher.cv:
                    if len(w.batcher.pending) >= n:
                        return
                _time.sleep(0.005)
            raise AssertionError(f"pending never reached {n}")

        # a0 enqueues FIRST (observed), then the other-config burst, then
        # the same-config a1 — which must complete a0's batch
        t_a0 = threading.Thread(target=call, args=("a0", 8))
        t_a0.start()
        wait_pending(1)
        ts = [threading.Thread(target=call, args=("b0", 16)),
              threading.Thread(target=call, args=("b1", 16))]
        for t in ts:
            t.start()
        wait_pending(3)
        t_a1 = threading.Thread(target=call, args=("a1", 8))
        t_a1.start()
        for t in [t_a0, *ts, t_a1]:
            t.join(timeout=60)
        assert all(r["error_code"] == 0 for r in results.values())
        mnt8_calls = [c for c in model.calls if c[2] == 8]
        assert len(mnt8_calls) == 1, model.calls
        assert {p.split("Q:")[1][:2] for p in mnt8_calls[0][1]} == {"a0", "a1"}

    def test_invalid_max_batch_rejected(self):
        with pytest.raises(ValueError, match="max_batch"):
            self._worker(self._FakeModel(), window_ms=10.0, max_batch=0)


class TestQuantizedServing:
    def test_quantize_decode_lazy_and_isolated(self):
        """--quantize-decode: generation runs off a lazily-built int8 tree
        (lm_head always quantized) while the fp tree keeps serving the
        loss/attack path untouched."""
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS,
            init_llava_params,
        )
        from robustvlm_tpu.ops.quant import QuantizedWeight
        from robustvlm_tpu.vlm_eval.eval_models import (
            LlavaEvalModel,
            WordTokenizer,
        )

        cfg = LLAVA_CONFIGS["test-tiny"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        model = LlavaEvalModel(
            params, cfg, WordTokenizer(cfg.llama.vocab_size),
            compute_dtype=jnp.float32, max_post_len=16,
            quantize_decode=True,
        )
        assert model._decode_params is None  # lazy: attack-only use is free

        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
        )
        out = model.get_outputs(
            x, [model.get_caption_prompt()], max_new_tokens=3
        )
        assert len(out) == 1 and isinstance(out[0], str)
        bits, dtree = model._decode_params
        assert bits == 8
        assert isinstance(dtree["llama"]["lm_head"], QuantizedWeight)
        # fp loss path untouched by the quantized generation tree
        assert not isinstance(model.params["llama"]["lm_head"], QuantizedWeight)
        model.set_inputs([model.get_caption_prompt("a cat")])
        loss = model(x)
        assert np.isfinite(float(loss[0]))

    def test_quantize_decode_bits4(self):
        """quantize_decode=4 (--quantize-bits 4): generation runs off a
        packed-int4 tree; the fp tree stays fp."""
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS,
            init_llava_params,
        )
        from robustvlm_tpu.ops.quant import PackedQ4Weight
        from robustvlm_tpu.vlm_eval.eval_models import (
            LlavaEvalModel,
            WordTokenizer,
        )

        cfg = LLAVA_CONFIGS["test-tiny"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        model = LlavaEvalModel(
            params, cfg, WordTokenizer(cfg.llama.vocab_size),
            compute_dtype=jnp.float32, max_post_len=16,
            quantize_decode=4,
        )
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
        )
        out = model.get_outputs(
            x, [model.get_caption_prompt()], max_new_tokens=3
        )
        assert len(out) == 1 and isinstance(out[0], str)
        bits, dtree = model._decode_params
        assert bits == 4
        assert isinstance(dtree["llama"]["lm_head"], PackedQ4Weight)
        assert not isinstance(
            model.params["llama"]["lm_head"], PackedQ4Weight
        )

    def test_quantize_decode_cache_keyed_on_bits(self):
        """Changing quantize_decode after a generate (8 -> 4) rebuilds the
        cached decode tree instead of silently serving the stale width."""
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS,
            init_llava_params,
        )
        from robustvlm_tpu.ops.quant import PackedQ4Weight, QuantizedWeight
        from robustvlm_tpu.vlm_eval.eval_models import (
            LlavaEvalModel,
            WordTokenizer,
        )

        cfg = LLAVA_CONFIGS["test-tiny"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        model = LlavaEvalModel(
            params, cfg, WordTokenizer(cfg.llama.vocab_size),
            compute_dtype=jnp.float32, max_post_len=16,
            quantize_decode=True,
        )
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
        )
        model.get_outputs(x, [model.get_caption_prompt()], max_new_tokens=2)
        assert isinstance(
            model._decode_params[1]["llama"]["lm_head"], QuantizedWeight
        )
        model.quantize_decode = 4
        model.get_outputs(x, [model.get_caption_prompt()], max_new_tokens=2)
        assert isinstance(
            model._decode_params[1]["llama"]["lm_head"], PackedQ4Weight
        )

    def test_quantize_for_serving_inplace_drops_fp(self):
        """Serving-only mode: the fp tree is consumed in place (worker
        startup path), generation runs, and the loss/attack surface raises
        an actionable error instead of silently running quantized math."""
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS,
            init_llava_params,
        )
        from robustvlm_tpu.ops.quant import QuantizedWeight
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
        model.quantize_for_serving(8)
        # mutated IN PLACE: the caller's tree and the model's are the same
        # (tiny block leaves fall under the default min_size gate; the
        # leaf-selection parity with the functional path is pinned by
        # test_inplace_matches_functional_quantization at min_size=0)
        assert isinstance(params["llama"]["lm_head"], QuantizedWeight)
        # norms/embeddings stay fp
        assert not isinstance(params["llama"]["tok_embedding"],
                              QuantizedWeight)

        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
        )
        out = model.get_outputs(
            x, [model.get_caption_prompt()], max_new_tokens=3
        )
        assert len(out) == 1 and isinstance(out[0], str)

        model.set_inputs([model.get_caption_prompt("a cat")])
        with pytest.raises(RuntimeError, match="serving-only"):
            model(x)
        with pytest.raises(RuntimeError, match="serving-only"):
            _ = model.bound_args
        with pytest.raises(RuntimeError, match="fp weights are gone"):
            model.quantize_decode = 4
            model.get_outputs(
                x, [model.get_caption_prompt()], max_new_tokens=2
            )

    def test_inplace_matches_functional_quantization(self):
        """quantize_decode_params_inplace produces numerically identical
        quantized leaves to quantize_llama_decode_params on both the
        stacked and the unstacked ('layers') layouts."""
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS,
            init_llava_params,
        )
        from robustvlm_tpu.ops.quant import (
            quantize_decode_params_inplace,
            quantize_llama_decode_params,
        )

        cfg = LLAVA_CONFIGS["test-tiny"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        # build the unstacked serving layout next to the stacked one
        # (scripts/bench_llava7b._init_bf16_on_device's shape)
        blocks = params["llama"]["blocks"]
        params["layers"] = tuple(
            jax.tree.map(lambda a, i=i: a[i], blocks)
            for i in range(cfg.llama.n_layers)
        )
        ref = quantize_llama_decode_params(params, min_size=0)
        got = quantize_decode_params_inplace(
            jax.tree.map(lambda a: a, params), min_size=0
        )
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            assert a.dtype == b.dtype
            if a.dtype in (jnp.int8, jnp.uint8):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            else:  # fp32 scales: jitted vs eager fuse/round at ~1e-7 rel
                np.testing.assert_allclose(
                    np.asarray(a, np.float64), np.asarray(b, np.float64),
                    rtol=1e-6, atol=1e-12,
                )

    def test_worker_cli_rejects_unsupported_adapter(self):
        from robustvlm_tpu.serve.model_worker import main

        with pytest.raises(SystemExit):
            main(["--model", "open_flamingo", "--quantize-decode",
                  "--model_size", "test-tiny", "--controller-address", ""])
