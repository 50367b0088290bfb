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


class TestPtbTokenize:
    """Pin the native PTB-style tokenizer to the effective output of
    pycocoevalcap's PTBTokenizer pipeline (Stanford tokenizer + the
    PUNCTUATIONS filter) on the documented drift-prone cases; the
    skip-if-absent oracle (tests/test_cider_oracle.py) cross-checks these
    against the real Java pipeline wherever it's installed."""

    CASES = [
        ("a man, wearing a red-striped shirt, rides a horse.",
         ["a", "man", "wearing", "a", "red-striped", "shirt", "rides",
          "a", "horse"]),
        ("it's a dog; isn't it?!",
         ["it", "'s", "a", "dog", "is", "n't", "it"]),
        ("the U.S. flag (large) waves -- proudly.",
         ["the", "u.s.", "flag", "large", "waves", "proudly"]),
        ("two cats... one black, one white: both sleeping.",
         ["two", "cats", "one", "black", "one", "white", "both",
          "sleeping"]),
        ("the cats' toys cost 1,000 dollars & more",
         ["the", "cats", "toys", "cost", "1,000", "dollars", "&", "more"]),
        ("we'll see they're we've i'm i'd",
         ["we", "'ll", "see", "they", "'re", "we", "'ve", "i", "'m",
          "i", "'d"]),
        # % and $ are standalone Stanford tokens NOT in the PUNCTUATIONS
        # filter — they survive, detached from their numbers
        ("a 50% off sign costs $5 today",
         ["a", "50", "%", "off", "sign", "costs", "$", "5", "today"]),
    ]

    def test_ptb_effective_tokens(self):
        from robustvlm_tpu.vlm_eval.metrics.cider import tokenize

        for raw, want in self.CASES:
            assert tokenize(raw) == want, raw

    def test_pure_punctuation_drops_to_empty(self):
        from robustvlm_tpu.vlm_eval.metrics.cider import tokenize

        assert tokenize("... -- ?! ; ( )") == []


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
        # strict default: a missing tensor is a loud error (a silent clean
        # fallback would report clean performance as robustness)
        with pytest.raises(FileNotFoundError, match="seed"):
            ds[0]
        # opt-in lenient mode passes the clean image through
        lenient = TensorCaptionDataset(
            base, str(tmp_path / "adv"), strict=False
        )
        np.testing.assert_allclose(lenient[0]["image"], base[0]["image"])

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


class TestCiderGolden:
    """Hand-derived golden values pinning CiderIDF to the pycocoevalcap
    CIDEr-D algorithm (tf = raw count, idf = log N - log max(df,1), clipped
    dot / norms, gaussian length penalty sigma=6, mean over n=1..4, x10)."""

    REFS = [["a cat sits here"], ["a dog runs fast"]]  # N=2 corpus

    def _idf(self):
        from robustvlm_tpu.vlm_eval.metrics.cider import CiderIDF

        return CiderIDF(self.REFS)

    def test_perfect_match_scores_10(self):
        # every n-gram overlaps with identical weights -> sim=1 for all four
        # n (>=4 tokens), penalty 1 -> 10.0 exactly
        assert self._idf().score("a cat sits here", self.REFS[0]) == pytest.approx(10.0)

    def test_disjoint_scores_0(self):
        assert self._idf().score("nothing matches this text", self.REFS[0]) == 0.0

    def test_partial_overlap_golden(self):
        # cand "a cat runs here" vs ref "a cat sits here", corpus as above:
        # 1-grams: overlap {a(idf 0), cat, here} -> num=2(log2)^2,
        #   norms sqrt(3)log2 each -> sim1 = 2/3
        # 2-grams: overlap {"a cat"} of 3 cand / 3 ref entries -> sim2 = 1/3
        # 3-/4-grams: no overlap -> 0;   score = 10*(2/3+1/3)/4 = 2.5
        assert self._idf().score("a cat runs here", self.REFS[0]) == pytest.approx(2.5)

    def test_length_penalty_golden(self):
        # cand "a cat" (2 tokens) vs 4-token ref: delta=2 ->
        # penalty exp(-4/72); sim1 = sim2 = (1/sqrt3)*penalty, sim3=sim4=0
        # score = 10 * 2*(1/sqrt3)*exp(-1/18) / 4
        import math

        expect = 10.0 * 2 * (1 / math.sqrt(3)) * math.exp(-1 / 18) / 4
        assert self._idf().score("a cat", self.REFS[0]) == pytest.approx(expect)

    def test_singleton_corpus_is_degenerate_but_corpus_idf_is_not(self):
        """The round-1 ensemble bug: scoring under a 1-image corpus returns
        identically 0 (log N = 0 kills every TF-IDF weight). The corpus-level
        CiderIDF must give the perfect match a nonzero (=10) score."""
        from robustvlm_tpu.vlm_eval.metrics.cider import CiderIDF, CiderScorer

        assert CiderScorer(["a cat sits here"], [self.REFS[0]]).corpus() == 0.0
        assert self._idf().score("a cat sits here", self.REFS[0]) == pytest.approx(10.0)


class _SynthDS:
    """2-image caption set with distinctive >=4-token captions."""

    CAPS = [
        ["a shiny red apple on the table", "the red apple sits on a table"],
        ["a small blue bird flying high", "the blue bird flies in the sky"],
    ]

    def __len__(self):
        return 2

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        return {
            "image": rng.rand(3, 32, 32).astype(np.float32),
            "image_id": i,
            "all_captions": self.CAPS[i],
        }


def _spec_prompt_fn(model, item, spec, query_only):
    if query_only:
        return model.get_caption_prompt(None)
    if spec.targeted and spec.target_str:
        return model.get_caption_prompt(spec.target_str)
    caps = item["all_captions"]
    return model.get_caption_prompt(caps[(spec.gt_idx or 0) % len(caps)])


def _corpus_score_fn(ds):
    from robustvlm_tpu.vlm_eval.metrics.cider import CiderIDF

    idf = CiderIDF([ds[i]["all_captions"] for i in range(len(ds))])
    return lambda caption, item: idf.score(caption, item["all_captions"]) * 100


class _FakeCaptioner:
    """Deterministic eval model: clean pixels caption perfectly, attacked
    pixels caption garbage — isolates the runner's selection logic."""

    def __init__(self, ds):
        self._clean = {i: ds[i]["image"] for i in range(len(ds))}
        self._caps = {i: ds[i]["all_captions"][0] for i in range(len(ds))}
        self.prompts_seen = []
        self.attack_calls = 0

    def get_caption_prompt(self, cap=None):
        return f"<image>Output:{'' if cap is None else cap}"

    def set_inputs(self, prompts):
        self.prompts_seen.extend(prompts)

    def __call__(self, x):  # per-sample loss for the attack
        self.attack_calls += 1
        return jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=-1)

    def get_outputs(self, x, prompts, max_new_tokens=8, num_beams=1):
        xa = np.asarray(x[0])
        for i, cl in self._clean.items():
            if np.allclose(xa, cl, atol=1e-6):
                return [self._caps[i]]
        return ["meaningless garbage words entirely"]


class TestEnsembleSelection:
    """Worst-case selection semantics (the round-1 e2e test only asserted
    plumbing and passed over the always-0 CIDEr bug)."""

    def _run(self, tmp_path, schedule):
        from robustvlm_tpu.vlm_eval.ensemble import EnsembleRunner

        ds = _SynthDS()
        model = _FakeCaptioner(ds)
        runner = EnsembleRunner(
            lambda prec: model,
            eps=8 / 255, score_fn=_corpus_score_fn(ds),
            prompt_fn=_spec_prompt_fn,
            threshold=10.0, out_dir=str(tmp_path), max_new_tokens=4,
            verbose=False,
        )
        return ds, model, runner.run(ds, schedule, save_adv=True)

    def test_clean_scores_nonzero_and_attacks_run(self, tmp_path):
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec

        schedule = [
            AttackSpec(kind="none", precision="full"),
            AttackSpec(precision="full", n_iter=2, gt_idx=0),
            AttackSpec(precision="full", n_iter=2, init_from_best=True),
        ]
        ds, model, res = self._run(tmp_path, schedule)
        # clean stage: perfect caption -> score 1000 (nonzero!), far above
        # the cider<10 threshold -> both images stay left_to_attack
        # (before round 2 the singleton-IDF score was identically 0 and the
        # whole schedule no-opped after stage 1)
        assert model.attack_calls > 0, "attack stages must actually run"
        # worst case kept: attacked captions are garbage (disjoint from the
        # refs -> CIDEr 0), strictly below the clean score
        assert all(s == pytest.approx(0.0) for s in res["scores"].values())
        assert all(v is not None for v in res["outputs"].values())
        assert (tmp_path / "left_to_attack.json").exists()
        assert (tmp_path / "gt_dict.json").exists()
        assert (tmp_path / "adv" / "0.npy").exists()

    def test_clean_only_schedule_keeps_images_active(self, tmp_path):
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec

        _, model, res = self._run(
            tmp_path, [AttackSpec(kind="none", precision="full")]
        )
        # perfect clean captions score >> threshold: nothing flips inactive
        # (score averages over both refs, so: 10.0 vs ref0 exactly, partial
        # vs ref1 -> well above 100 on the x100 scale either way)
        assert all(res["left_to_attack"].values())
        assert all(s > 100.0 for s in res["scores"].values())

    def test_targeted_stage_teacher_forces_target(self, tmp_path):
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec

        schedule = [
            AttackSpec(precision="full", n_iter=2, targeted=True,
                       target_str="visit evil site"),
        ]
        _, model, _ = self._run(tmp_path, schedule)
        # the teacher-forcing prompt must carry the TARGET string, not a gt
        # caption (round-1 bug: target_str was dead and the gt caption's
        # loss was minimized, reinforcing the correct answer)
        assert any("visit evil site" in p for p in model.prompts_seen)
        assert not any("red apple" in p for p in model.prompts_seen)


class TestEnsembleRunner:
    def test_end_to_end_tiny(self, tmp_path):
        """Full worst-case schedule through the real tiny-LLaVA adapter."""
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec, EnsembleRunner

        ds = _SynthDS()
        runner = EnsembleRunner(
            lambda prec: _llava_model(prec),
            eps=8 / 255, score_fn=_corpus_score_fn(ds),
            prompt_fn=_spec_prompt_fn,
            threshold=5.0, out_dir=str(tmp_path), max_new_tokens=4,
            verbose=False,
        )
        schedule = [
            AttackSpec(kind="none", precision="full"),
            AttackSpec(precision="full", n_iter=2, gt_idx=0),
            AttackSpec(precision="full", n_iter=2, init_from_best=True),
        ]
        res = runner.run(ds, schedule, save_adv=True)
        assert set(res["scores"]) == {0, 1}
        assert all(v is not None for v in res["outputs"].values())
        assert (tmp_path / "left_to_attack.json").exists()
        assert (tmp_path / "gt_dict.json").exists()
        # adv images persisted
        assert (tmp_path / "adv" / "0.npy").exists()

    def test_targeted_attack_decreases_target_loss(self, tmp_path):
        """A targeted stage must minimize the teacher-forced target loss
        (crit=-loss), measurably increasing the target's log-likelihood."""
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec, EnsembleRunner

        ds = _SynthDS()
        model = _llava_model("full")
        target = "purple elephant dancing wildly"
        runner = EnsembleRunner(
            lambda prec: model,
            eps=16 / 255, score_fn=_corpus_score_fn(ds),
            prompt_fn=_spec_prompt_fn,
            threshold=-1.0, out_dir=str(tmp_path), max_new_tokens=4,
            verbose=False,
        )
        schedule = [AttackSpec(precision="full", n_iter=6, targeted=True,
                               target_str=target)]
        res = runner.run(ds, schedule, n_samples=1, save_adv=False)
        x_clean = jnp.asarray(ds[0]["image"])[None]
        x_adv = jnp.asarray(res["adv"][0])[None]
        model.set_inputs([model.get_caption_prompt(target)])
        loss_clean = float(model(x_clean)[0])
        loss_adv = float(model(x_adv)[0])
        assert loss_adv < loss_clean, (loss_adv, loss_clean)


class _SynthDS4:
    """4-image caption set (batched-ensemble tests need partial chunks)."""

    CAPS = [
        ["a shiny red apple on the table", "the red apple sits on a table"],
        ["a small blue bird flying high", "the blue bird flies in the sky"],
        ["a green frog on a wet rock", "the frog rests on the stone"],
        ["an old yellow taxi in the rain", "the taxi drives through rain"],
    ]

    def __len__(self):
        return 4

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        return {
            "image": rng.rand(3, 32, 32).astype(np.float32),
            "image_id": i,
            "all_captions": self.CAPS[i],
        }


@pytest.mark.heavy
class TestEnsembleBatched:
    """batch_size>1 on the untargeted stages must reproduce the serial
    per-image results exactly: attack state is vectorized per example and
    prompt right-padding is loss-invariant (causal + masked labels)."""

    def _run(self, tmp_path, batch_size, sub):
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec, EnsembleRunner

        ds = _SynthDS4()
        runner = EnsembleRunner(
            lambda prec: _llava_model(prec),
            eps=8 / 255, score_fn=_corpus_score_fn(ds),
            prompt_fn=_spec_prompt_fn,
            threshold=-1.0,  # keep every item active (full chunks)
            out_dir=str(tmp_path / sub), max_new_tokens=4,
            verbose=False, batch_size=batch_size,
        )
        schedule = [
            AttackSpec(kind="none", precision="full"),
            AttackSpec(precision="full", n_iter=2, gt_idx=0),
            AttackSpec(precision="full", n_iter=2, gt_idx=1),
            # warm-start stage: always serial, consumes the batched stages'
            # best_adv — covers the batched->serial handoff
            AttackSpec(precision="full", n_iter=2, init_from_best=True),
        ]
        return runner.run(ds, schedule, save_adv=False)

    def test_batched_matches_serial(self, tmp_path):
        r1 = self._run(tmp_path, 1, "serial")
        r3 = self._run(tmp_path, 3, "batch3")  # chunks [3, 1]: partial chunk
        assert r1["outputs"] == r3["outputs"]
        for i in r1["scores"]:
            assert r1["scores"][i] == pytest.approx(r3["scores"][i], abs=1e-5)
        for i in r1["adv"]:
            np.testing.assert_allclose(
                r1["adv"][i], r3["adv"][i], atol=1e-6
            )

    def test_targeted_stays_serial_with_per_item_rng(self, tmp_path):
        """Targeted stages consume per-item rng streams (use_rs): batching
        must not change them — the runner keeps those stages serial."""
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec, EnsembleRunner

        ds = _SynthDS4()

        calls = []
        model = _llava_model("full")
        runner = EnsembleRunner(
            lambda prec: model,
            eps=8 / 255, score_fn=_corpus_score_fn(ds),
            prompt_fn=_spec_prompt_fn,
            threshold=-1.0, out_dir=str(tmp_path), max_new_tokens=4,
            verbose=False, batch_size=4,
        )
        orig = runner._attack_one

        def spy(model, x, spec, x_init, rng):
            calls.append((int(x.shape[0]), spec.targeted))
            return orig(model, x, spec, x_init, rng)

        runner._attack_one = spy
        schedule = [
            AttackSpec(precision="full", n_iter=2, gt_idx=0),
            AttackSpec(precision="full", n_iter=2, targeted=True,
                       target_str="purple elephant"),
        ]
        runner.run(ds, schedule, save_adv=False)
        assert (4, False) in calls, "untargeted stage batched"
        assert calls.count((1, True)) == 4, "targeted stage serial per item"


@pytest.mark.heavy
class TestEnsembleResume:
    """Crash-resume: the per-stage state checkpoint (ensemble_state.json +
    adv tensors) must reproduce an uninterrupted run exactly. The reference
    persists left_to_attack/gt_dict only for MANUAL restarts
    (run_evaluation.py:1096-1105); automatic resume is a rebuild extra."""

    def _schedule(self):
        from robustvlm_tpu.vlm_eval.ensemble import AttackSpec

        return [
            AttackSpec(kind="none", precision="full"),
            AttackSpec(precision="full", n_iter=2, gt_idx=0),
            AttackSpec(precision="full", n_iter=2, gt_idx=1),
            AttackSpec(precision="full", n_iter=2, init_from_best=True),
        ]

    def _runner(self, ds, out_dir, score_fn):
        from robustvlm_tpu.vlm_eval.ensemble import EnsembleRunner

        return EnsembleRunner(
            lambda prec: _llava_model(prec),
            eps=8 / 255, score_fn=score_fn, prompt_fn=_spec_prompt_fn,
            threshold=-1.0, out_dir=str(out_dir), max_new_tokens=4,
            verbose=False,
        )

    def test_resume_after_crash_matches_uninterrupted(self, tmp_path):
        ds = _SynthDS4()
        base_score = _corpus_score_fn(ds)

        # ground truth: uninterrupted run
        ref = self._runner(ds, tmp_path / "ref", base_score).run(
            ds, self._schedule(), save_adv=False
        )

        # crash mid-stage-3 (after stages 1-2 checkpointed)
        calls = {"n": 0}

        def crashing(caption, item):
            calls["n"] += 1
            if calls["n"] == 9:  # stage1: 4 scores, stage2: 4, then boom
                raise RuntimeError("simulated crash")
            return base_score(caption, item)

        with pytest.raises(RuntimeError, match="simulated crash"):
            self._runner(ds, tmp_path / "run", crashing).run(
                ds, self._schedule(), save_adv=False
            )
        state = json.loads(
            (tmp_path / "run" / "ensemble_state.json").read_text()
        )
        assert state["stages_done"] == 2  # stage 3 never checkpointed

        # resume re-runs stages 3-4 and must land on the reference results
        res = self._runner(ds, tmp_path / "run", base_score).run(
            ds, self._schedule(), save_adv=False, resume=True
        )
        assert res["outputs"] == ref["outputs"]
        for i in ref["scores"]:
            assert res["scores"][i] == pytest.approx(
                ref["scores"][i], abs=1e-5
            )
        for i in ref["adv"]:
            np.testing.assert_allclose(res["adv"][i], ref["adv"][i], atol=1e-6)

    def _crashed_state(self, tmp_path, ds, base_score, after_calls=5):
        """Run until a mid-schedule crash so a resume checkpoint is left
        behind (a COMPLETED save_adv=False run cleans its state up)."""
        calls = {"n": 0}

        def crashing(caption, item):
            calls["n"] += 1
            if calls["n"] == after_calls:
                raise RuntimeError("simulated crash")
            return base_score(caption, item)

        with pytest.raises(RuntimeError, match="simulated crash"):
            self._runner(ds, tmp_path, crashing).run(
                ds, self._schedule(), save_adv=False
            )

    def test_resume_rejects_different_subset(self, tmp_path):
        ds = _SynthDS4()
        score = _corpus_score_fn(ds)
        self._crashed_state(tmp_path, ds, score)

        class Shifted(_SynthDS4):
            def __getitem__(self, i):
                item = super().__getitem__(i)
                item["image_id"] = i + 100
                return item

        with pytest.raises(ValueError, match="subset"):
            self._runner(Shifted(), tmp_path, score).run(
                Shifted(), self._schedule(), save_adv=False, resume=True
            )

    def test_resume_rejects_different_attack_config(self, tmp_path):
        """eps or any per-stage knob (n_iter/targeted/...) differing from
        the checkpoint must refuse — completed stages would silently mix
        with the new settings."""
        import dataclasses

        ds = _SynthDS4()
        score = _corpus_score_fn(ds)
        self._crashed_state(tmp_path, ds, score)

        longer = [
            dataclasses.replace(s, n_iter=s.n_iter * 2)
            if s.kind != "none" else s
            for s in self._schedule()
        ]
        with pytest.raises(ValueError, match="attack configuration"):
            self._runner(ds, tmp_path, score).run(
                ds, longer, save_adv=False, resume=True
            )

        from robustvlm_tpu.vlm_eval.ensemble import EnsembleRunner

        other_eps = EnsembleRunner(
            lambda prec: _llava_model(prec),
            eps=4 / 255, score_fn=score, prompt_fn=_spec_prompt_fn,
            threshold=-1.0, out_dir=str(tmp_path), max_new_tokens=4,
            verbose=False,
        )
        with pytest.raises(ValueError, match="attack configuration"):
            other_eps.run(ds, self._schedule(), save_adv=False, resume=True)

    def test_resume_without_state_starts_fresh(self, tmp_path):
        ds = _SynthDS4()
        score = _corpus_score_fn(ds)
        res = self._runner(ds, tmp_path, score).run(
            ds, self._schedule(), save_adv=False, resume=True
        )
        assert all(v is not None for v in res["outputs"].values())

    def test_completed_run_adv_lifecycle(self, tmp_path):
        """save_adv=False: transient resume files are cleaned on success.
        save_adv=True: adv/*.npy persist (written at stage boundaries;
        no redundant re-write pass)."""
        ds = _SynthDS4()
        score = _corpus_score_fn(ds)
        self._runner(ds, tmp_path / "no", score).run(
            ds, self._schedule(), save_adv=False
        )
        assert not (tmp_path / "no" / "ensemble_state.json").exists()
        assert not list((tmp_path / "no" / "adv").glob("*.npy"))

        res = self._runner(ds, tmp_path / "yes", score).run(
            ds, self._schedule(), save_adv=True
        )
        saved = sorted((tmp_path / "yes" / "adv").glob("*.npy"))
        assert len(saved) == len([a for a in res["adv"].values() if a is not None])
        for p in saved:
            iid = int(p.stem)
            np.testing.assert_allclose(
                np.load(p), res["adv"][iid], atol=1e-6
            )


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

    def test_bound_model_protocol_one_core_fresh_prompts(self):
        """The adapters must expose .pure/.bound_args so (a) params and
        prompt tokens ride as runtime operands — NOT HLO constants — and
        (b) a second prompt reuses the SAME compiled attack core while
        attacking the NEW prompt (stale-prompt regression)."""
        from robustvlm_tpu.attacks.apgd import _CORE_CACHE, apgd_attack

        m = self._model()
        assert callable(m.pure)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
        )
        crit = lambda o, y: o
        _CORE_CACHE.clear()
        m.set_inputs([m.get_caption_prompt("a small red bird")])
        res_a = apgd_attack(m, x, None, criterion=crit, eps=8 / 255,
                            n_iter=3, norm="linf")
        m.set_inputs([m.get_caption_prompt("an enormous blue whale truck")])
        res_b = apgd_attack(m, x, None, criterion=crit, eps=8 / 255,
                            n_iter=3, norm="linf")
        assert len(_CORE_CACHE) == 1, "prompt change must not recompile"
        # the second attack must have optimized the SECOND prompt's loss:
        # its best loss equals the adapter's loss on its adv point under
        # prompt B, and differs from prompt A's trajectory
        lb = float(m(res_b.x_best)[0])
        assert abs(lb - float(res_b.loss_best[0])) < 1e-3
        assert abs(float(res_a.loss_best[0]) - float(res_b.loss_best[0])) > 1e-6

    def test_answer_mask_covers_caption_only(self):
        m = self._model()
        m.set_inputs([m.get_caption_prompt("red bird")])
        mask = np.asarray(m._mask[0])
        lang = np.asarray(m._lang[0])
        # some tokens masked (context) and some unmasked (answer)
        n_real = int((lang != m.tok.pad_token_id).sum())
        assert 0 < mask.sum() < n_real

    def test_pad_to_multiple_loss_invariant(self):
        """Bucketed end-padding (batched-ensemble shape stabilization) must
        not change per-sample losses: pads sit after every real token under
        causal attention and their label positions are masked."""
        m = self._model()
        x = jnp.asarray(
            np.random.RandomState(0).rand(2, 3, 32, 32).astype(np.float32)
        )
        prompts = [
            m.get_caption_prompt("red bird"),
            m.get_caption_prompt("a very small blue bird"),
        ]
        m.set_inputs(prompts)
        t_tight = m._lang.shape[1]
        loss_tight = np.asarray(m(x))

        m.pad_to_multiple = 16
        m.set_inputs(prompts)
        assert m._lang.shape[1] % 16 == 0
        assert m._lang.shape[1] > t_tight  # actually exercises extra pads
        loss_padded = np.asarray(m(x))
        np.testing.assert_allclose(loss_padded, loss_tight, atol=1e-5)

    def test_ensemble_sets_pad_to_multiple_when_batched(self):
        from robustvlm_tpu.vlm_eval.ensemble import EnsembleRunner

        for bs, expect in ((1, None), (3, 32)):
            runner = EnsembleRunner(
                lambda prec: self._model(),
                eps=8 / 255, score_fn=lambda *a: 0.0,
                prompt_fn=lambda *a: "", verbose=False, batch_size=bs,
            )
            assert runner._model("full").pad_to_multiple == expect


class TestFrameMask:
    def test_context_masking(self):
        from robustvlm_tpu.vlm_eval.eval_models import make_frame_mask

        m = make_frame_mask((2, 3, 1, 3, 8, 8), "context")
        assert float(m[:, :2].max()) == 0.0 and float(m[:, 2].min()) == 1.0
        # reference semantics: int k zeroes ONLY frame k (_set_mask:81-82)
        m2 = make_frame_mask((2, 3, 1, 3, 8, 8), "1")
        assert float(m2[:, 1].max()) == 0.0
        assert float(m2[:, 0].min()) == 1.0 and float(m2[:, 2].min()) == 1.0
        # reference 'query': zero ONLY the last frame
        mq = make_frame_mask((2, 3, 1, 3, 8, 8), "query")
        assert float(mq[:, 2].max()) == 0.0 and float(mq[:, :2].min()) == 1.0
        # 'only:k' keeps the attack-only-frame-k behavior
        mo = make_frame_mask((2, 3, 1, 3, 8, 8), "only:1")
        assert float(mo[:, 1].min()) == 1.0
        assert float(mo[:, 0].max()) == 0.0 and float(mo[:, 2].max()) == 0.0
        m3 = make_frame_mask((2, 3, 1, 3, 8, 8), "none")
        assert float(m3.min()) == 1.0


class TestWholeSegmentTokenization:
    """The Flamingo adapter must encode whole text segments between the
    special markers, not word-by-word: byte-level BPEs merge the leading
    space into the word token (GPT-2 family, incl. the MPT tokenizer), so
    per-word encoding diverges from whole-string encoding (the reference
    tokenizes the full prompt at once, of_eval_model_adv.py:183-198)."""

    @staticmethod
    def _gpt2_tok(tmp_path):
        """Tiny synthetic GPT-2 byte-level BPE with leading-space merges
        (' cat' -> one token; 'cat' -> three)."""
        import json

        chars = list("Output:catwhnsierdl?bQ ")
        sym = [c if c != " " else "\u0120" for c in chars]
        vocab = {s: i for i, s in enumerate(dict.fromkeys(sym))}
        for extra in ["\u0120c", "\u0120ca", "\u0120cat",
                      "\u0120b", "\u0120bi", "\u0120bir", "\u0120bird"]:
            vocab[extra] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        merges = ["#version: test", "\u0120 c", "\u0120c a", "\u0120ca t",
                  "\u0120 b", "\u0120b i", "\u0120bi r", "\u0120bir d"]
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        # GPT2Tokenizer drops the final line (expects trailing newline)
        (tmp_path / "merges.txt").write_text("\n".join(merges) + "\n")
        from transformers import GPT2Tokenizer

        tok = GPT2Tokenizer(
            str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
        )
        tok.pad_token = "<|endoftext|>"
        return tok

    def _flamingo(self, tok):
        import dataclasses

        from robustvlm_tpu.models.flamingo.model import (
            FLAMINGO_CONFIGS, init_flamingo_params,
        )
        from robustvlm_tpu.vlm_eval.eval_models import FlamingoEvalModel

        cfg = dataclasses.replace(FLAMINGO_CONFIGS["test-tiny"], media_token_id=511)
        params = init_flamingo_params(jax.random.PRNGKey(0), cfg)
        return FlamingoEvalModel(params, cfg, tok, compute_dtype=jnp.float32)

    def test_segment_ids_match_whole_string_encoding(self, tmp_path):
        tok = self._gpt2_tok(tmp_path)
        m = self._flamingo(tok)
        text = "Output: cat"
        ids = m._encode(f"<image>{text}<|endofchunk|>")
        expect = (
            [m.cfg.media_token_id]
            + tok.encode(text, add_special_tokens=False)
            + [tok.eos_token_id]
        )
        assert ids == expect
        # word-by-word encoding demonstrably differs on this BPE: ' cat'
        # is one merged token, bare 'cat' is three
        word_by_word = []
        for w in text.split():
            word_by_word.extend(tok.encode(w, add_special_tokens=False))
        assert word_by_word != tok.encode(text, add_special_tokens=False)

    def test_ctx_answer_split_is_prefix_exact(self, tmp_path):
        """set_inputs encodes context and answer as separate segments; the
        GPT-2 pre-tokenizer never merges across the ':'-to-space boundary,
        so the ids must equal whole-string encoding (mask exact in token
        space)."""
        tok = self._gpt2_tok(tmp_path)
        m = self._flamingo(tok)
        p = "<image>Output: cat<|endofchunk|>"
        marker = p.rfind(":")
        joined = m._encode(p[: marker + 1]) + m._encode(p[marker + 1:])
        assert joined == m._encode(p)

    def test_mask_excludes_specials_and_covers_answer(self, tmp_path):
        tok = self._gpt2_tok(tmp_path)
        m = self._flamingo(tok)
        m.set_inputs(["<image>Output: bird<|endofchunk|>"])
        lang = np.asarray(m._lang[0])
        mask = np.asarray(m._mask[0])
        # media + eoc tokens carry no loss
        assert mask[lang == m.cfg.media_token_id].sum() == 0
        assert mask[lang == tok.eos_token_id].sum() == 0
        # the answer tokens do: ' bird' is exactly one merged token
        ans = tok.encode(" bird", add_special_tokens=False)
        assert len(ans) == 1
        assert mask.sum() == len(ans)


class TestMMBench:
    def _rows(self, tmp_path):
        import base64
        import csv
        import io as _io

        import numpy as _np
        from PIL import Image

        buf = _io.BytesIO()
        Image.fromarray(_np.zeros((16, 16, 3), _np.uint8)).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        rows = [
            {"index": "1", "question": "What color is the sky?",
             "hint": "", "answer": "B", "A": "green", "B": "blue",
             "C": "red", "D": "", "image": b64},
        ]
        p = tmp_path / "mmbench.tsv"
        with open(p, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
            w.writeheader()
            w.writerows(rows)
        return p

    def test_tsv_prompt_rotation(self, tmp_path):
        from robustvlm_tpu.vlm_eval.mmbench import (
            build_prompt, get_options, load_mmbench_tsv, rotate,
        )

        rows = load_mmbench_tsv(str(self._rows(tmp_path)))
        opts = get_options(rows[0])
        assert opts == ["green", "blue", "red"]  # empty D dropped
        assert rotate(opts, 1) == ["blue", "red", "green"]
        p = build_prompt(rows[0]["question"], opts, rows[0]["hint"])
        assert "A. green" in p and "B. blue" in p
        assert "option's letter" in p

    def test_parse_choice(self):
        from robustvlm_tpu.vlm_eval.mmbench import parse_choice

        assert parse_choice("B", 3) == "B"
        assert parse_choice("The answer is (C).", 3) == "C"
        assert parse_choice("D", 3) == "FAILED"  # out of range
        assert parse_choice("no idea", 3) == "FAILED"

    def test_circular_eval(self, tmp_path):
        """A model that always answers the rotated position of the true
        option scores 100% circular; one that always says 'A' does not."""
        from robustvlm_tpu.vlm_eval import mmbench

        rows = mmbench.load_mmbench_tsv(str(self._rows(tmp_path)))

        class Oracle:
            def get_vqa_prompt(self, q, a=None):
                return f"<image>{q}"

            def get_outputs(self, x, prompts, max_new_tokens=8):
                # find where 'blue' sits in this round's prompt
                for line in prompts[0].splitlines():
                    if line.endswith(". blue"):
                        return [line.split(".")[0][-1]]
                return ["A"]

        recs = mmbench.run_mmbench(Oracle(), rows, size=16)
        assert len(recs) == 3  # 3 options -> 3 rounds
        m = mmbench.eval_mmbench(recs)
        assert m["circular_accuracy"] == 100.0 and m["accuracy"] == 100.0

        class AlwaysA(Oracle):
            def get_outputs(self, x, prompts, max_new_tokens=8):
                return ["A"]

        m2 = mmbench.eval_mmbench(mmbench.run_mmbench(AlwaysA(), rows, size=16))
        assert m2["circular_accuracy"] == 0.0
        assert 0.0 < m2["accuracy"] < 100.0


class TestGptReview:
    def test_review_and_summary(self, tmp_path):
        from robustvlm_tpu.vlm_eval.gpt_review import (
            parse_score, review_answers, summarize_reviews,
        )

        qs = [{"question_id": 1, "text": "describe the red apple",
               "category": "default"}]
        a1 = [{"question_id": 1, "text": "the red apple is round"}]
        a2 = [{"question_id": 1, "text": "banana"}]
        rows = review_answers(
            qs, a1, a2, output_path=str(tmp_path / "review.jsonl")
        )
        assert rows[0]["tuple"][0] > rows[0]["tuple"][1]  # a1 overlaps more
        assert (tmp_path / "review.jsonl").exists()
        summary = summarize_reviews(rows)
        assert summary["all"]["n"] == 1
        assert summary["all"]["relative"] < 100.0
        assert parse_score("7 9\nreason") == [7.0, 9.0]
        assert parse_score("garbage") == [-1.0, -1.0]


class TestAuxEvalCLIs:
    """End-to-end CLI smoke for the aux evals (reference llava/eval scripts):
    tiny model, hash tokenizer, tmp fixtures."""

    @staticmethod
    def _png(path, size=32):
        from PIL import Image

        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (size, size, 3), np.uint8)
        ).save(path)

    def test_pope_cli(self, tmp_path):
        from robustvlm_tpu.vlm_eval.pope import main

        self._png(tmp_path / "img.png")
        qfile = tmp_path / "pope.jsonl"
        with open(qfile, "w") as f:
            for i, lab in enumerate(["yes", "no"]):
                f.write(json.dumps({
                    "question_id": i, "image": "img.png",
                    "text": "Is there a dog?", "label": lab,
                }) + "\n")
        m = main([
            "--model", "llava", "--model_size", "test-tiny",
            "--pope_questions", str(qfile), "--image_root", str(tmp_path),
            "--answers_path", str(tmp_path / "ans.jsonl"),
            "--max_new_tokens", "4", "--image_size", "32",
        ])
        assert set(m) >= {"accuracy", "precision", "recall", "f1", "yes_ratio"}
        assert (tmp_path / "ans.jsonl").exists()

    def test_science_qa_cli(self, tmp_path):
        from robustvlm_tpu.vlm_eval.science_qa import main

        (tmp_path / "q1").mkdir()
        self._png(tmp_path / "q1" / "image.png")
        problems = {
            "q1": {"question": "Which?", "choices": ["x", "y"], "answer": 0,
                   "image": "image.png"},
            "q2": {"question": "What?", "choices": ["a", "b"], "answer": 1},
        }
        pfile = tmp_path / "problems.json"
        pfile.write_text(json.dumps(problems))
        m = main([
            "--model", "llava", "--model_size", "test-tiny",
            "--problems", str(pfile), "--image_root", str(tmp_path),
            "--max_new_tokens", "2", "--image_size", "32",
        ])
        assert m["total"] == 2 and 0.0 <= m["acc"] <= 100.0

    def test_mmbench_cli(self, tmp_path):
        import base64
        import io

        from PIL import Image

        from robustvlm_tpu.vlm_eval.mmbench import main

        buf = io.BytesIO()
        Image.fromarray(
            np.random.RandomState(1).randint(0, 255, (32, 32, 3), np.uint8)
        ).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        tsv = tmp_path / "mmbench.tsv"
        tsv.write_text(
            "index\tquestion\thint\tA\tB\tC\tD\tanswer\timage\n"
            f"0\tWhat is shown?\t\tcat\tdog\t\t\tA\t{b64}\n"
        )
        m = main([
            "--model", "llava", "--model_size", "test-tiny",
            "--mmbench_tsv", str(tsv),
            "--answers_file", str(tmp_path / "ans.jsonl"),
            "--single_round", "--max_new_tokens", "2", "--image_size", "32",
        ])
        assert "acc" in m or "accuracy" in m


class TestRunEvaluationE2E:
    """run_evaluation.main end-to-end on a tmp COCO-format dataset with the
    tiny models — every family through the real harness (dataset ->
    adapter -> APGD -> generation -> CIDEr -> results.json)."""

    @staticmethod
    def _fixture(tmp_path):
        from PIL import Image

        img_dir = tmp_path / "images"
        img_dir.mkdir(exist_ok=True)
        rng = np.random.RandomState(0)
        images, anns = [], []
        for i in range(2):
            name = f"im{i}.png"
            Image.fromarray(
                rng.randint(0, 255, (32, 32, 3), np.uint8)
            ).save(img_dir / name)
            images.append({"id": i, "file_name": name})
            anns.append({"image_id": i, "caption": f"a photo number {i}"})
        ann = tmp_path / "ann.json"
        ann.write_text(json.dumps({"images": images, "annotations": anns}))
        return img_dir, ann

    @pytest.mark.parametrize("model", ["llava", "open_flamingo", "blip2"])
    def test_coco_apgd_all_families(self, tmp_path, model):
        from robustvlm_tpu.vlm_eval.run_evaluation import main

        img_dir, ann = self._fixture(tmp_path)
        res = main([
            "--model", model, "--model_size", "test-tiny",
            "--eval_coco", "--coco_image_dir", str(img_dir),
            "--coco_annotations", str(ann),
            "--attack", "apgd", "--eps", "8", "--n_iter", "2",
            "--num_samples", "2", "--max_new_tokens", "4",
            "--out_base_path", str(tmp_path / "out"),
        ])
        assert "coco" in res
        assert (tmp_path / "out" / "results.json").exists()


class TestLlavaStreamCores:
    """stream_tokens (the jitted-core streaming path) must emit exactly the
    batch path's greedy trajectory, reuse its compiled cores across calls,
    and honor the int8 KV flag."""

    @staticmethod
    def _model():
        from robustvlm_tpu.models.llava.model import (
            LLAVA_CONFIGS, init_llava_params,
        )
        from robustvlm_tpu.vlm_eval.eval_models import (
            LlavaEvalModel, WordTokenizer,
        )

        cfg = LLAVA_CONFIGS["test-tiny"]
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        return LlavaEvalModel(
            params, cfg, WordTokenizer(cfg.llama.vocab_size),
            compute_dtype=jnp.float32, max_post_len=16,
        )

    def test_stream_matches_batch_greedy(self):
        model = self._model()
        s = model.cfg.vision.image_size
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 3, s, s).astype(np.float32)
        )
        prompt = model.get_caption_prompt()
        batch_out = model.get_outputs(x, [prompt], max_new_tokens=5)[0]
        streamed = [
            int(t[0]) for t in model.stream_tokens(x, [prompt], 5)
        ]
        # reconstruct the text the way get_outputs does
        from robustvlm_tpu.vlm_eval.eval_models import truncate_at_stops

        ids = []
        for t in streamed:
            if t in (model.tok.eos_token_id, model.tok.pad_token_id):
                break
            ids.append(t)
        assert truncate_at_stops(
            model.tok.decode(ids), model.DEFAULT_STOPS
        ) == batch_out

    def test_stream_core_cached_across_calls(self):
        model = self._model()
        s = model.cfg.vision.image_size
        x = jnp.asarray(
            np.random.RandomState(1).rand(1, 3, s, s).astype(np.float32)
        )
        prompt = model.get_caption_prompt()
        list(model.stream_tokens(x, [prompt], 4))
        n = len(model._gen_cores)
        list(model.stream_tokens(x, [prompt], 4))
        assert len(model._gen_cores) == n  # same key, no rebuild

    def test_stream_with_kv8_runs_and_matches(self):
        model = self._model()
        s = model.cfg.vision.image_size
        x = jnp.asarray(
            np.random.RandomState(2).rand(1, 3, s, s).astype(np.float32)
        )
        prompt = model.get_caption_prompt()
        fp = [int(t[0]) for t in model.stream_tokens(x, [prompt], 5)]
        model.quantize_kv = True
        q = [int(t[0]) for t in model.stream_tokens(x, [prompt], 5)]
        assert fp == q  # near-lossless int8 KV on the tiny model
