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


class TestWdsStreaming:
    """Reference-layout webdataset roots (nshards.txt + numbered shards +
    metadata txt), streamed through urllib — file:// exercises the same
    remote code path as https:// / HF-hub URLs (builder.py:616-715)."""

    def _make_root(self, tmp_path, dataset_type="classification"):
        import io as _io
        import tarfile

        from PIL import Image

        root = tmp_path / "wdsroot"
        (root / "test").mkdir(parents=True)
        n_shards = 2
        idx = 0
        for s in range(n_shards):
            with tarfile.open(root / "test" / f"{s}.tar", "w") as tf:
                for _ in range(3):
                    img = Image.fromarray(
                        (np.random.RandomState(idx).rand(32, 32, 3) * 255)
                        .astype(np.uint8)
                    )
                    buf = _io.BytesIO()
                    img.save(buf, format="JPEG")

                    def add(name, data):
                        info = tarfile.TarInfo(name)
                        info.size = len(data)
                        tf.addfile(info, _io.BytesIO(data))

                    add(f"{idx:06d}.jpg", buf.getvalue())
                    if dataset_type == "retrieval":
                        add(f"{idx:06d}.txt",
                            f"caption a {idx}\ncaption b {idx}".encode())
                    else:
                        add(f"{idx:06d}.cls", str(idx % 3).encode())
                    idx += 1
        (root / "test" / "nshards.txt").write_text(str(n_shards))
        if dataset_type != "classification":
            (root / "dataset_type.txt").write_text(dataset_type)
        if dataset_type == "classification":
            (root / "classnames.txt").write_text("aaa\nbbb\nccc\n")
            (root / "zeroshot_classification_templates.txt").write_text(
                "a photo of a {c}.\n"
            )
        return root

    def test_classification_local_and_file_url(self, tmp_path):
        from robustvlm_tpu.benchmark.builder import WdsDataset

        root = self._make_root(tmp_path)
        for spec in (str(root), root.as_uri()):  # plain dir + file:// URL
            ds = WdsDataset(spec, split="test", size=32)
            assert ds.classes == ["aaa", "bbb", "ccc"]
            assert ds.templates == ["a photo of a {c}."]
            batches = list(ds.batched(4))
            xs = np.concatenate([b[0] for b in batches])
            ys = np.concatenate([b[1] for b in batches])
            assert xs.shape == (6, 3, 32, 32)
            assert list(ys) == [0, 1, 2, 0, 1, 2]

    def test_retrieval_type(self, tmp_path):
        from robustvlm_tpu.benchmark.builder import WdsDataset

        root = self._make_root(tmp_path, dataset_type="retrieval")
        ds = WdsDataset(root.as_uri(), split="test", size=32)
        assert ds.dataset_type == "retrieval"
        x, caps = next(iter(ds))
        assert x.shape == (3, 32, 32)
        assert caps == ["caption a 0", "caption b 0"]

    def test_hf_url_split(self):
        from robustvlm_tpu.benchmark.builder import resolve_wds_dirs

        meta, tar = resolve_wds_dirs(
            "https://huggingface.co/datasets/user/repo/tree/main"
        )
        assert meta == "https://huggingface.co/datasets/user/repo/raw/main"
        assert tar == "https://huggingface.co/datasets/user/repo/resolve/main"
        meta2, tar2 = resolve_wds_dirs("hf://user/repo")
        assert (meta2, tar2) == (meta, tar)

    def test_build_dataset_dispatch(self, tmp_path):
        from robustvlm_tpu.benchmark.builder import build_dataset

        root = self._make_root(tmp_path)
        data = build_dataset("wds/mytest", root.as_uri(), size=32, batch_size=3)
        xs, ys = next(iter(data))
        assert xs.shape == (3, 3, 32, 32)


class TestCaptioningMetrics:
    def test_perfect_match(self):
        from robustvlm_tpu.benchmark.captioning import score_captions

        cands = ["the cat sat on the mat", "a dog runs in the park"]
        refs = [[c] for c in cands]
        m = score_captions(cands, refs)
        for k in ("Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "ROUGE_L"):
            assert m[k] == pytest.approx(1.0), k

    def test_bleu_hand_values(self):
        from robustvlm_tpu.benchmark.captioning import bleu_scores

        # cand 'the cat the cat' vs ref 'the cat sat':
        # 1-gram clipped 2/4; 2-gram clipped 1/3; BP=1 (cand longer)
        b = bleu_scores(["the cat the cat"], [["the cat sat"]])
        assert b[0] == pytest.approx(0.5)
        assert b[1] == pytest.approx((0.5 * (1 / 3)) ** 0.5)

    def test_rouge_hand_value(self):
        from robustvlm_tpu.benchmark.captioning import rouge_l_score

        # LCS=2, prec=2/4, rec=2/3, F_{beta=1.2}
        p, r, b2 = 0.5, 2 / 3, 1.2 ** 2
        expect = (1 + b2) * p * r / (r + b2 * p)
        assert rouge_l_score("the cat the cat", ["the cat sat"]) == pytest.approx(expect)

    def test_evaluate_with_generate_fn(self):
        from robustvlm_tpu.benchmark.captioning import evaluate_captioning

        data = [(np.zeros((2, 3, 4, 4)), [["a cat sits here"], ["a dog runs fast"]])]
        gen = lambda imgs: ["a cat sits here", "something else"]
        m = evaluate_captioning(gen, data)
        assert m["Bleu_1"] < 1.0 and m["CIDEr"] > 0.0


class TestLanguageWiring:
    def test_templates_and_classnames_cn(self):
        from robustvlm_tpu.benchmark import templates

        cn_t = templates.get_templates("imagenet1k", language="cn")
        en_t = templates.get_templates("imagenet1k", language="en")
        assert cn_t and cn_t != en_t
        cn_c = templates.get_classnames("imagenet1k", language="cn")
        assert len(cn_c) == 1000

    def test_cli_language_flag(self, tmp_path):
        """--language loops through the product (reference cli.py:140-151)."""
        from robustvlm_tpu.benchmark.cli import build_parser

        args = build_parser().parse_args(
            ["eval", "--language", "en,cn", "--dataset", "imagenet1k"]
        )
        assert args.language == "en,cn"


class TestTfdsVtabAdapter:
    """tfds/ and vtab/ branches via a fake tensorflow_datasets module (the
    real dep is optional and not bundled)."""

    @staticmethod
    def _install_fake_tfds(monkeypatch, examples, label_names=("a", "b")):
        import sys
        import types

        class _Feature:
            names = list(label_names)

        class _Info:
            features = {"label": _Feature()}

        class _Builder:
            info = _Info()

            def __init__(self, examples):
                self._examples = examples

            def download_and_prepare(self):
                pass

            def as_dataset(self, split):
                assert split in ("test", "train")
                return list(self._examples)

        fake = types.ModuleType("tensorflow_datasets")
        fake.builder = lambda name, data_dir=None: _Builder(examples)
        fake.as_numpy = lambda ds: ds
        monkeypatch.setitem(sys.modules, "tensorflow_datasets", fake)

    def test_missing_tfds_raises_informatively(self, monkeypatch):
        import sys

        from robustvlm_tpu.benchmark import tfds_adapter

        monkeypatch.setitem(sys.modules, "tensorflow_datasets", None)
        with pytest.raises(ImportError, match="wds/"):
            tfds_adapter.build_tfds_dataset("cifar10", None)

    def test_tfds_iteration_and_classnames(self, monkeypatch):
        rng = np.random.RandomState(0)
        examples = [
            {"image": rng.randint(0, 255, (40, 40, 3), np.uint8), "label": i % 2}
            for i in range(5)
        ]
        self._install_fake_tfds(monkeypatch, examples)
        from robustvlm_tpu.benchmark.builder import build_dataset

        batches = list(
            build_dataset("tfds/cifar10", "", split="test", size=32, batch_size=2)
        )
        assert sum(b[0].shape[0] for b in batches) == 5
        x, y = batches[0]
        assert x.shape == (2, 3, 32, 32) and x.dtype == np.float32
        assert 0.0 <= x.min() and x.max() <= 1.0
        assert list(y) == [0, 1]

    def test_vtab_kitti_label_math(self):
        from robustvlm_tpu.benchmark.tfds_adapter import (
            kitti_closest_vehicle_distance_label,
        )

        # closest vehicle at 5m -> class 0 (thresholds -100, 8, 20, 999;
        # label = max index with threshold < distance)
        ex = {"objects": {"type": np.array([0, 5]),
                          "location": np.array([[0, 0, 5.0], [0, 0, 1.0]])}}
        assert kitti_closest_vehicle_distance_label(ex) == 0
        # closest vehicle at 15m -> class 1
        ex["objects"]["location"][0, 2] = 15.0
        assert kitti_closest_vehicle_distance_label(ex) == 1
        # no vehicles (types >= 3) -> 'no vehicle' class 3 (dist 1000)
        ex = {"objects": {"type": np.array([5]),
                          "location": np.array([[0, 0, 2.0]])}}
        assert kitti_closest_vehicle_distance_label(ex) == 3

    def test_vtab_clevr_label_math(self):
        from robustvlm_tpu.benchmark.tfds_adapter import (
            clevr_closest_object_distance_label,
            clevr_count_all_label,
        )

        ex = {"objects": {"size": np.zeros(7)}}
        assert clevr_count_all_label(ex) == 4  # 7 objects -> class 7-3
        ex = {"objects": {"pixel_coords": np.array([[0, 0, 9.2], [0, 0, 12.0]])}}
        # min z 9.2 falls in (9.0, 9.5] -> class 3 (thrs 0,8,8.5,9,9.5,10,100)
        assert clevr_closest_object_distance_label(ex) == 3

    def test_vtab_derived_dataset_labels(self, monkeypatch):
        rng = np.random.RandomState(1)
        examples = [
            {
                "image": rng.randint(0, 255, (30, 30, 3), np.uint8),
                "objects": {"size": np.zeros(3 + i)},
            }
            for i in range(3)
        ]
        self._install_fake_tfds(monkeypatch, examples)
        from robustvlm_tpu.benchmark.builder import build_dataset

        (x, y), = list(
            build_dataset("vtab/clevr_count_all", "", size=32, batch_size=8)
        )
        assert list(y) == [0, 1, 2]

    def test_vtab_task_adaptation_tasks_raise(self, monkeypatch):
        self._install_fake_tfds(monkeypatch, [])
        from robustvlm_tpu.benchmark.tfds_adapter import build_vtab_dataset

        with pytest.raises(NotImplementedError, match="wds/vtab"):
            build_vtab_dataset("dsprites_label_orientation", None)


class TestTfdsCliEndToEnd:
    def test_cli_zeroshot_over_fake_tfds(self, tmp_path, monkeypatch):
        """`--dataset tfds/cifar10` runs the full zero-shot CLI with the
        adapter-provided classnames (regression: the classname lookup used
        the prefixed name and the adapter's classes were discarded)."""
        rng = np.random.RandomState(0)
        examples = [
            {"image": rng.randint(0, 255, (32, 32, 3), np.uint8),
             "label": i % 2}
            for i in range(4)
        ]
        TestTfdsVtabAdapter._install_fake_tfds(
            monkeypatch, examples, label_names=("a cat", "a dog")
        )
        from robustvlm_tpu.benchmark import templates as T
        from robustvlm_tpu.benchmark.cli import main

        # the adapter-provided classnames MUST be used: a fallback to the
        # builtin cifar10 table (the original regression) would silently
        # run a 10-class classifier over this 2-class data
        def no_table(*a, **k):
            raise AssertionError(
                "classname table consulted — adapter classes were discarded"
            )

        monkeypatch.setattr(T, "get_classnames", no_table)

        res = main([
            "eval", "--model", "test-tiny", "--pretrained", "random",
            "--dataset", "tfds/cifar10", "--dataset_root", "",
            "--task", "zeroshot_classification",
            "--batch_size", "2", "--n_samples", "4",
            "--output", str(tmp_path / "{model}_{dataset}_{task}.json"),
        ])
        assert len(res) == 1 and "acc1" in res[0]["metrics"]


class TestModelPretrainedPairRows:
    """@file rows may pair 'model,pretrained' on one line (reference
    model_collection.py get_model_collection_from_file)."""

    def test_pair_rows_run(self, tmp_path, monkeypatch):
        rng = np.random.RandomState(0)
        examples = [
            {"image": rng.randint(0, 255, (32, 32, 3), np.uint8),
             "label": i % 2}
            for i in range(4)
        ]
        TestTfdsVtabAdapter._install_fake_tfds(
            monkeypatch, examples, label_names=("a cat", "a dog")
        )
        from robustvlm_tpu.benchmark.cli import main

        mf = tmp_path / "models.txt"
        mf.write_text("# comment\ntest-tiny,random\n")
        res = main([
            "eval", "--model", f"@{mf}",
            "--dataset", "tfds/cifar10", "--dataset_root", "",
            "--task", "zeroshot_classification",
            "--batch_size", "2", "--n_samples", "4",
            "--output", str(tmp_path / "{model}_{dataset}_{task}.json"),
        ])
        assert len(res) == 1 and res[0]["pretrained"] == "random"

    def test_pair_rows_reject_explicit_pretrained(self, tmp_path):
        from robustvlm_tpu.benchmark.cli import main

        mf = tmp_path / "models.txt"
        mf.write_text("test-tiny,random\n")
        with pytest.raises(ValueError, match="mutually exclusive"):
            main([
                "eval", "--model", f"@{mf}", "--pretrained", "x.pt",
                "--dataset", "synthetic", "--dataset_root", "",
                "--task", "zeroshot_classification",
            ])


class TestPrefetchIter:
    """Background-thread stream prefetcher (builder.prefetch_iter): order
    preserved, bounded memory, producer exceptions surface at the consumer."""

    def test_order_and_completeness(self):
        from robustvlm_tpu.benchmark.builder import prefetch_iter

        assert list(prefetch_iter(iter(range(100)), depth=3)) == list(range(100))

    def test_producer_exception_reraises(self):
        from robustvlm_tpu.benchmark.builder import prefetch_iter

        def gen():
            yield 1
            raise RuntimeError("shard fetch failed")

        it = prefetch_iter(gen())
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="shard fetch failed"):
            list(it)

    def test_batched_loader_prefetches_same_batches(self, tmp_path):
        from robustvlm_tpu.benchmark.builder import (
            WdsBatchedLoader, WdsShardDataset,
        )

        shard = tmp_path / "shard-000000.tar"
        TestWdsReader()._make_shard(shard)
        a = list(WdsBatchedLoader(WdsShardDataset([shard], size=32), 4))
        b_xs, b_ys = [], []
        for x, y in WdsShardDataset([shard], size=32):
            b_xs.append(x)
            b_ys.append(y)
        assert sum(len(x[1]) for x in a) == len(b_ys) == 6
        np.testing.assert_allclose(a[0][0][0], b_xs[0], atol=0)

    def test_abandoned_consumer_releases_producer(self):
        """An n_samples-capped run abandons the prefetch generator mid-
        stream; the producer must exit (releasing its thread, buffered
        items, and the open shard handle) instead of blocking forever."""
        import threading
        import time as _time

        from robustvlm_tpu.benchmark.builder import prefetch_iter

        closed = {"v": False}

        def gen():
            try:
                for i in range(1000):
                    yield i
            finally:
                closed["v"] = True  # generator finalized = handles released

        before = threading.active_count()
        it = prefetch_iter(gen(), depth=2)
        assert next(it) == 0
        it.close()  # abandon (what _truncate_batches' early return does)
        deadline = _time.monotonic() + 5.0
        while _time.monotonic() < deadline and (
            not closed["v"] or threading.active_count() > before
        ):
            _time.sleep(0.05)
        assert closed["v"], "producer generator never finalized (leak)"
        assert threading.active_count() <= before, "producer thread leaked"
