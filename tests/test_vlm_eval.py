"""VLM eval harness: CIDEr-D properties, VQA accuracy vs official semantics,
datasets, eval-model adapters, ensemble runner end-to-end on tiny models."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustvlm_tpu.vlm_eval.metrics.cider import (
    CiderScorer,
    compute_cider_all_scores,
)
from robustvlm_tpu.vlm_eval.metrics.ok_vqa import postprocess_ok_vqa_generation
from robustvlm_tpu.vlm_eval.metrics.vqa_accuracy import (
    compute_vqa_accuracy,
    normalize_answer,
    postprocess_vqa_generation,
    vqa_accuracy,
)


class TestCider:
    def test_exact_match_beats_mismatch(self):
        # IDF needs a diverse corpus: identical refs across all images give
        # zero idf (true of pycocoevalcap as well)
        refs = [
            ["a cat sits on a mat", "a cat on a mat"],
            ["a dog runs in the park", "a running dog outside"],
            ["an airplane in the blue sky", "a plane flying high"],
        ]
        cands = ["a cat sits on a mat", "an airplane in the park", "nothing here"]
        s = CiderScorer(cands, refs).per_image()
        assert s[0] > s[1] > s[2]

    def test_identical_corpus_high(self):
        refs = [[f"the number {i} is here"] for i in range(8)]
        cands = [r[0] for r in refs]
        s = CiderScorer(cands, refs).per_image()
        assert min(s) > 1.0  # perfect match scores high on pyccoco scale

    def test_length_penalty(self):
        # diverse corpus so idf is nonzero (see test_exact_match)
        refs = [
            ["a man riding a horse on a beach"],
            ["a man riding a horse on a beach"],
            ["two birds perched on a wire"],
            ["a bowl of soup on the table"],
        ]
        cands = [
            "a man riding a horse on a beach",
            "a man riding a horse on a beach with a dog and a kite and more",
            "two birds perched on a wire",
            "a bowl of soup on the table",
        ]
        s = CiderScorer(cands, refs).per_image()
        assert s[0] > s[1]

    def test_all_scores_scale(self):
        res = {1: "a cat on a mat", 2: "a dog"}
        ann = {1: ["a cat on a mat"], 2: ["a bird in the sky"]}
        scores = compute_cider_all_scores(res, ann)
        assert scores[1] > 100  # x100 scale
        assert scores[2] < 20


class TestVQAAccuracy:
    def test_normalization(self):
        assert normalize_answer("Two.") == "2"
        assert normalize_answer("a red apple") == "red apple"
        assert normalize_answer("isnt") == "isn't"

    def test_consensus(self):
        gts = ["yes"] * 10
        assert vqa_accuracy("yes", gts) == 1.0
        assert vqa_accuracy("no", gts) == 0.0
        # 3-of-10 consensus: "yes" x3 -> leave-one-out avg = 0.9
        gts = ["yes"] * 3 + ["no"] * 7
        acc = vqa_accuracy("yes", gts)
        assert acc == pytest.approx((3 * (2 / 3) + 7 * 1.0) / 10)

    def test_compute_over_results(self):
        ann = {1: ["2"] * 10, 2: ["blue"] * 10}
        results = [
            {"question_id": 1, "answer": "two"},
            {"question_id": 2, "answer": "red"},
        ]
        mean, per = compute_vqa_accuracy(results, ann, return_individual_scores=True)
        assert per[1] == 1.0 and per[2] == 0.0
        assert mean == 50.0

    def test_postprocess(self):
        assert postprocess_vqa_generation("blue\nQuestion: what") == "blue"

    def test_ok_vqa_stemming(self):
        assert postprocess_ok_vqa_generation("Riding horses!") == "ride hors"


class TestDatasets:
    def _write_coco(self, tmp_path, n=3):
        from PIL import Image

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(n):
            fn = f"img{i}.jpg"
            Image.fromarray(
                (np.random.RandomState(i).rand(40, 40, 3) * 255).astype(np.uint8)
            ).save(img_dir / fn)
            images.append({"id": i, "file_name": fn})
            for j in range(3):
                anns.append({"image_id": i, "caption": f"caption {i} v{j}"})
        ann_path = tmp_path / "ann.json"
        ann_path.write_text(json.dumps({"images": images, "annotations": anns}))
        return img_dir, ann_path

    def test_caption_dataset(self, tmp_path):
        from robustvlm_tpu.vlm_eval.datasets import CaptionDataset

        img_dir, ann = self._write_coco(tmp_path)
        ds = CaptionDataset(str(img_dir), str(ann), size=32, which_gt=1)
        assert len(ds) == 3
        it = ds[0]
        assert it["image"].shape == (3, 32, 32)
        assert it["caption"] == "caption 0 v1"
        assert len(it["all_captions"]) == 3

    def test_tensor_dataset_roundtrip(self, tmp_path):
        from robustvlm_tpu.vlm_eval.datasets import (
            CaptionDataset,
            TensorCaptionDataset,
            save_adv_image,
        )

        img_dir, ann = self._write_coco(tmp_path)
        base = CaptionDataset(str(img_dir), str(ann), size=32)
        adv = np.random.RandomState(9).rand(3, 32, 32).astype(np.float32)
        save_adv_image(adv, str(tmp_path / "adv"), 1)
        ds = TensorCaptionDataset(base, str(tmp_path / "adv"))
        np.testing.assert_allclose(ds[1]["image"], adv)
        # untouched image passes through
        np.testing.assert_allclose(ds[0]["image"], base[0]["image"])

    def test_vqa_dataset(self, tmp_path):
        from PIL import Image

        from robustvlm_tpu.vlm_eval.datasets import VQADataset

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
            img_dir / "000000000007.jpg"
        )
        q = {"questions": [
            {"question_id": 11, "image_id": 7, "question": "What color?"}
        ]}
        a = {"annotations": [
            {"question_id": 11, "answers": [{"answer": "blue"}] * 6 + [{"answer": "red"}] * 4}
        ]}
        (tmp_path / "q.json").write_text(json.dumps(q))
        (tmp_path / "a.json").write_text(json.dumps(a))
        ds = VQADataset(
            str(img_dir), str(tmp_path / "q.json"), str(tmp_path / "a.json"),
            size=32, file_prefix="", which_gt=1,
        )
        it = ds[0]
        assert it["question_id"] == 11
        assert it["gt_answer"] == "red"  # 2nd most common


def _llava_model(precision="half"):
    from robustvlm_tpu.models.llava.model import LLAVA_CONFIGS, init_llava_params
    from robustvlm_tpu.vlm_eval.eval_models import LlavaEvalModel, WordTokenizer

    cfg = LLAVA_CONFIGS["test-tiny"]
    params = init_llava_params(jax.random.PRNGKey(0), cfg)
    dtype = jnp.bfloat16 if precision == "half" else jnp.float32
    return LlavaEvalModel(
        params, cfg, WordTokenizer(cfg.llama.vocab_size),
        compute_dtype=dtype, max_post_len=24,
    )


class TestLlavaEvalModel:
    def test_loss_and_outputs(self):
        m = _llava_model("full")
        x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32))
        m.set_inputs([m.get_caption_prompt("a red apple on a table")])
        loss = m(x)
        assert loss.shape == (1,) and np.isfinite(float(loss[0]))
        outs = m.get_outputs(x, [m.get_caption_prompt(None)], max_new_tokens=4)
        assert len(outs) == 1 and isinstance(outs[0], str)


class TestEnsembleRunner:
    def test_end_to_end_tiny(self, tmp_path):
        """Full worst-case schedule on a 2-image synthetic caption set."""
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec, EnsembleRunner
        from robustvlm_tpu.vlm_eval.metrics.cider import CiderScorer

        class SynthDS:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                rng = np.random.RandomState(i)
                return {
                    "image": rng.rand(3, 32, 32).astype(np.float32),
                    "image_id": i,
                    "all_captions": [f"synthetic caption {i} v{j}" for j in range(3)],
                }

        def prompt_fn(model, item, gt_idx, query_only):
            if query_only:
                return model.get_caption_prompt(None)
            caps = item["all_captions"]
            return model.get_caption_prompt(caps[(gt_idx or 0) % len(caps)])

        def score_fn(caption, item):
            return CiderScorer([caption], [item["all_captions"]]).corpus() * 100

        runner = EnsembleRunner(
            lambda prec: _llava_model(prec),
            eps=8 / 255, score_fn=score_fn, prompt_fn=prompt_fn,
            threshold=5.0, out_dir=str(tmp_path), max_new_tokens=4,
            verbose=False,
        )
        schedule = [
            AttackSpec(kind="none", precision="full"),
            AttackSpec(precision="full", n_iter=2, gt_idx=0),
            AttackSpec(precision="full", n_iter=2, init_from_best=True),
        ]
        res = runner.run(SynthDS(), schedule, save_adv=True)
        assert set(res["scores"]) == {0, 1}
        assert all(v is not None for v in res["outputs"].values())
        assert (tmp_path / "left_to_attack.json").exists()
        assert (tmp_path / "gt_dict.json").exists()
        # adv images persisted
        assert (tmp_path / "adv" / "0.npy").exists()


class TestPope:
    def test_binarize_and_score(self):
        from robustvlm_tpu.vlm_eval.pope import binarize_answer, eval_pope

        assert binarize_answer("No, there is not.") == "no"
        assert binarize_answer("Yes, a dog.") == "yes"
        assert binarize_answer("there is no cat") == "no"
        answers = [
            {"question_id": 1, "text": "Yes"},
            {"question_id": 2, "text": "No."},
            {"question_id": 3, "text": "Yes it is"},
            {"question_id": 4, "text": "nothing, no"},
        ]
        labels = ["yes", "no", "no", "no"]
        m = eval_pope(answers, labels)
        assert m["TP"] == 1 and m["TN"] == 2 and m["FP"] == 1 and m["FN"] == 0
        assert m["accuracy"] == 0.75
        assert m["yes_ratio"] == 0.5

    def test_run_pope_with_tiny_model(self, tmp_path):
        from PIL import Image

        from robustvlm_tpu.vlm_eval.pope import run_pope

        (tmp_path / "imgs").mkdir()
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
            tmp_path / "imgs" / "a.jpg"
        )
        qs = [{"question_id": 1, "image": "a.jpg",
               "text": "Is there a dog?", "label": "no"}]
        m = run_pope(
            _llava_model("full"), qs, str(tmp_path / "imgs"), size=32,
            max_new_tokens=3,
        )
        assert set(m) >= {"precision", "recall", "f1", "accuracy", "yes_ratio"}


class TestScienceQA:
    def test_parse_option(self):
        from robustvlm_tpu.vlm_eval.science_qa import parse_option

        assert parse_option("B") == "B"
        assert parse_option("C. the sun") == "C"
        assert parse_option("I think The answer is D.") == "D"
        assert parse_option("no idea") == "FAILED"

    def test_eval(self):
        from robustvlm_tpu.vlm_eval.science_qa import eval_science_qa

        problems = {
            "q1": {"choices": ["x", "y"], "answer": 1},
            "q2": {"choices": ["x", "y", "z"], "answer": 0},
        }
        preds = {
            "q1": {"text": "B", "prompt": "<image>\nwhat"},
            "q2": {"text": "The answer is A.", "prompt": "what"},
        }
        m = eval_science_qa(preds, problems, ["q1", "q2"])
        assert m["acc"] == 100.0
        assert m["img_acc"] == 100.0

    def test_prompt(self):
        from robustvlm_tpu.vlm_eval.science_qa import build_sqa_prompt

        p = build_sqa_prompt({"question": "What?", "choices": ["a", "b"]}, True)
        assert p.startswith("<image>") and "A. a" in p and "B. b" in p


class TestFlamingoEvalModel:
    def _model(self, dtype=jnp.float32):
        import dataclasses

        from robustvlm_tpu.models.flamingo.model import (
            FLAMINGO_CONFIGS, init_flamingo_params,
        )
        from robustvlm_tpu.vlm_eval.eval_models import (
            FlamingoEvalModel, WordTokenizer,
        )

        cfg = dataclasses.replace(FLAMINGO_CONFIGS["test-tiny"], media_token_id=511)
        params = init_flamingo_params(jax.random.PRNGKey(0), cfg)
        params["xattn"]["attn_gate"] = jnp.full_like(params["xattn"]["attn_gate"], 0.5)
        return FlamingoEvalModel(
            params, cfg, WordTokenizer(cfg.mpt.vocab_size),
            compute_dtype=dtype, max_len=24,
        )

    def test_media_token_present_and_grad_nonzero(self):
        """Regression: '<image>Output:' must tokenize the media token, else
        cross-attention masks everything and pixel gradients vanish."""
        m = self._model()
        ids = m._encode(m.get_caption_prompt("a bird"))
        assert m.cfg.media_token_id in ids
        x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32))
        m.set_inputs([m.get_caption_prompt("a small red bird")])
        g = jax.grad(lambda xx: jnp.sum(m(xx)))(x)
        assert float(jnp.abs(g).max()) > 0

    def test_attack_increases_loss(self):
        from robustvlm_tpu.attacks.apgd import apgd_attack

        m = self._model()
        x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32))
        m.set_inputs([m.get_caption_prompt("a small red bird")])
        l0 = float(m(x)[0])
        res = apgd_attack(
            m, x, None, criterion=lambda o, y: o, eps=8 / 255, n_iter=4,
            norm="linf",
        )
        assert float(m(res.x_best)[0]) > l0

    def test_answer_mask_covers_caption_only(self):
        m = self._model()
        m.set_inputs([m.get_caption_prompt("red bird")])
        mask = np.asarray(m._mask[0])
        lang = np.asarray(m._lang[0])
        # some tokens masked (context) and some unmasked (answer)
        n_real = int((lang != m.tok.pad_token_id).sum())
        assert 0 < mask.sum() < n_real


class TestFrameMask:
    def test_context_masking(self):
        from robustvlm_tpu.vlm_eval.eval_models import make_frame_mask

        m = make_frame_mask((2, 3, 1, 3, 8, 8), "context")
        assert float(m[:, :2].max()) == 0.0 and float(m[:, 2].min()) == 1.0
        m2 = make_frame_mask((2, 3, 1, 3, 8, 8), "1")
        assert float(m2[:, 1].min()) == 1.0
        assert float(m2[:, 0].max()) == 0.0 and float(m2[:, 2].max()) == 0.0
        m3 = make_frame_mask((2, 3, 1, 3, 8, 8), "none")
        assert float(m3.min()) == 1.0
