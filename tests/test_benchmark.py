"""Benchmark suite: templates, metrics, wds tar reader, zero-shot runner."""

import io
import json
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.benchmark import templates
from robustvlm_tpu.benchmark.builder import (
    WdsBatchedLoader,
    WdsShardDataset,
    build_dataset,
)
from robustvlm_tpu.benchmark.linear_probe import train_linear_probe
from robustvlm_tpu.benchmark.retrieval import (
    evaluate_retrieval,
    recall_at_k,
)
from robustvlm_tpu.benchmark.zeroshot import (
    accuracy_topk,
    mean_per_class_recall,
    multilabel_average_precision,
    run_classification,
)


class TestTemplates:
    def test_imagenet_ensemble_has_80(self):
        assert len(templates.get_templates("imagenet1k")) == 80

    def test_classnames(self):
        assert len(templates.get_classnames("cifar10")) == 10
        assert len(templates.get_classnames("cifar100")) == 100
        assert len(templates.imagenet_classnames()) == 1000

    def test_format_prompts(self):
        out = templates.format_prompts(["a photo of a {c}."], "dog")
        assert out == ["a photo of a dog."]

    def test_target_seeds_nonempty(self):
        assert len(templates.target_to_seed()) > 0


class TestMetrics:
    def test_topk(self):
        logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
        y = np.array([1, 2])
        a1, a5 = accuracy_topk(logits, y, (1, 2))
        assert a1 == 0.5
        assert a5 == 0.5  # top-2 contains class 2? row2 top2 = {0,1} -> no

    def test_mean_per_class_recall(self):
        logits = np.eye(4)
        y = np.array([0, 1, 2, 0])
        r = mean_per_class_recall(logits, y)
        # class0: preds for idx 0,3 -> [0, 3->3!=0]: recall 0.5; c1: 1; c2: 1
        assert r == pytest.approx((0.5 + 1 + 1) / 3)

    def test_map_perfect(self):
        scores = np.array([[0.9, 0.1], [0.2, 0.8]])
        target = np.array([[1, 0], [0, 1]])
        assert multilabel_average_precision(scores, target) == 1.0

    def test_recall_at_k(self):
        scores = np.array([[1.0, 0.5, 0.2]])
        pos = np.array([[False, True, False]])
        assert recall_at_k(scores, pos, 1)[0] == 0.0
        assert recall_at_k(scores, pos, 2)[0] == 1.0

    def test_retrieval_roundtrip(self):
        rng = np.random.RandomState(0)
        im = rng.randn(10, 16).astype(np.float32)
        # 2 captions per image, identical to the image embedding -> perfect
        tx = np.repeat(im, 2, axis=0)
        t2i = np.repeat(np.arange(10), 2)
        out = evaluate_retrieval(im, tx, t2i)
        assert out["image_retrieval_recall@1"] == 1.0
        assert out["text_retrieval_recall@1"] == 1.0


class TestWdsReader:
    def _make_shard(self, path, n=6):
        from PIL import Image

        with tarfile.open(path, "w") as tf:
            for i in range(n):
                img = Image.fromarray(
                    (np.random.RandomState(i).rand(40, 40, 3) * 255).astype(np.uint8)
                )
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{i:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(i % 3).encode()
                info = tarfile.TarInfo(f"{i:06d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))

    def test_reads_samples(self, tmp_path):
        shard = tmp_path / "shard-000000.tar"
        self._make_shard(shard)
        ds = WdsShardDataset([shard], size=32)
        samples = list(ds)
        assert len(samples) == 6
        x, y = samples[0]
        assert x.shape == (3, 32, 32) and 0 <= x.min() and x.max() <= 1
        assert y == 0

    def test_batched_loader_and_builder(self, tmp_path):
        self._make_shard(tmp_path / "shard-000000.tar")
        loader = build_dataset("wds/test", str(tmp_path), size=32, batch_size=4)
        batches = list(loader)
        assert batches[0][0].shape == (4, 3, 32, 32)
        assert sum(len(b[1]) for b in batches) == 6


class TestLinearProbe:
    def test_separable_features(self):
        rng = np.random.RandomState(0)
        f = rng.randn(200, 8).astype(np.float32)
        w_true = rng.randn(8, 3)
        y = (f @ w_true).argmax(-1)
        probe = train_linear_probe(f, y, 3, epochs=150, lr=0.1, batch_size=64)
        acc = float(
            (np.asarray(jnp.asarray(f) @ probe["w"] + probe["b"]).argmax(-1) == y).mean()
        )
        assert acc > 0.9


class TestRunClassification:
    def test_clean_linear_model(self):
        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 5).astype(np.float32))

        def logits_fn(x):
            return x.reshape(x.shape[0], -1) @ W

        xs = rng.rand(32, 3, 8, 8).astype(np.float32)
        ys = np.asarray(jnp.argmax(logits_fn(jnp.asarray(xs)), -1))
        data = [(xs[:16], ys[:16]), (xs[16:], ys[16:])]
        m = run_classification(logits_fn, data)
        assert m["acc1"] == 1.0

    def test_adversarial_mode(self):
        rng = np.random.RandomState(0)
        W = jnp.asarray(rng.randn(3 * 8 * 8, 5).astype(np.float32)) * 0.05

        def logits_fn(x):
            return x.reshape(x.shape[0], -1) @ W

        xs = rng.rand(16, 3, 8, 8).astype(np.float32)
        ys = np.asarray(jnp.argmax(logits_fn(jnp.asarray(xs)), -1))
        m = run_classification(
            [(xs, ys)].__iter__(), data=None
        ) if False else run_classification(
            logits_fn, [(xs, ys)], attack="aa", eps=16 / 255, n_iter=10,
            batch_size=16,
        )
        assert m["acc1"] == 1.0
        assert m["adv_acc1"] < m["acc1"]
