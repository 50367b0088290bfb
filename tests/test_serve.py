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
