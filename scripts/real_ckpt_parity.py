#!/usr/bin/env python
"""Real-checkpoint parity gate (skip-if-absent).

One-command check that a REAL published checkpoint (openai ViT-B/32 or
ViT-L/14, FARE/TeCoA visual-only overlays) imports correctly and produces
the recorded embeddings / accuracies — the executable form of the 0.5%
robust-accuracy north star (reference load path:
CLIP_eval/eval_utils.py:30-61).

Modes
-----
Record (run once against a trusted checkpoint import):
  CLIP_CKPT=/ckpts/openai_vitl14.pt python scripts/real_ckpt_parity.py \
      --model ViT-L-14 --record expected_vitl14.json

Check (the gate; CI skips when $CLIP_CKPT is unset):
  CLIP_CKPT=/ckpts/openai_vitl14.pt python scripts/real_ckpt_parity.py \
      --model ViT-L-14 --expected expected_vitl14.json

Optional end-to-end accuracy vs the published tables (BASELINE.md):
  ... --imagenet_dir /data/imagenet/val --n_samples 1000 --eps 2 --bpe_path
      bpe_simple_vocab_16e6.txt.gz
prints clean + APGD-CE/APGD-T robust accuracy to compare with the
reference's README rows.

The fingerprint is checkpoint-deterministic: embeddings of a fixed
synthetic image batch (unit-normalized; any import bug — transpose, eps,
QuickGELU, LN order — shifts them far beyond the 1e-4 tolerance).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def fingerprint(params, cfg, n_images: int = 4, n_dims: int = 16):
    """Checkpoint-deterministic probe: unit-norm embeddings of a fixed
    synthetic batch + scalar norms of the pre-normalized embeddings."""
    import jax
    import jax.numpy as jnp

    from robustvlm_tpu.models.clip.model import encode_image
    from robustvlm_tpu.ops.image import normalize_clip

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.rand(n_images, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    )
    emb_raw = encode_image(
        params, normalize_clip(x), cfg, normalize=False,
        compute_dtype=jnp.float32,
    )
    norms = jnp.linalg.norm(emb_raw, axis=-1)
    emb = emb_raw / norms[:, None]
    return {
        "model": cfg.name,
        "embed_head": np.asarray(emb[:, :n_dims]).tolist(),
        "embed_norms": np.asarray(norms).tolist(),
    }


def compare(got: dict, expected: dict, atol: float = 1e-4) -> list:
    errs = []
    if got["model"] != expected["model"]:
        errs.append(f"model mismatch: {got['model']} != {expected['model']}")
    for key, tol in (("embed_head", atol), ("embed_norms", 1e-3)):
        g = np.asarray(got[key])
        e = np.asarray(expected[key])
        if g.shape != e.shape:
            errs.append(f"{key}: shape {g.shape} != {e.shape}")
            continue
        d = float(np.abs(g - e).max())
        if d > tol:
            errs.append(f"{key}: max abs diff {d:.2e} > {tol}")
    return errs


def load_real_checkpoint(args):
    import jax

    from robustvlm_tpu.models.clip import (
        CLIP_CONFIGS, init_clip_params, load_clip_checkpoint,
    )

    cfg = CLIP_CONFIGS[args.model]
    base = None
    if args.base_ckpt:
        base = load_clip_checkpoint(args.base_ckpt, cfg)
    elif args.visual_only:
        # visual-only overlays need SOME text tower; random is fine for the
        # visual fingerprint (not for zero-shot accuracy)
        base = init_clip_params(jax.random.PRNGKey(0), cfg)
    params = load_clip_checkpoint(args.ckpt, cfg, base_params=base)
    return params, cfg


def run_imagenet_eval(args, params, cfg):
    """Clean + AutoAttack(APGD-CE, APGD-T) accuracy on an ImageNet val tree
    (reference clip_robustbench protocol: 100 iters, eps in /255)."""
    import jax.numpy as jnp

    from robustvlm_tpu.benchmark import templates
    from robustvlm_tpu.benchmark.zeroshot import zero_shot_classifier
    from robustvlm_tpu.data.loaders import DataLoader, ImageFolderDataset
    from robustvlm_tpu.eval.autoattack import AutoAttackTPU
    from robustvlm_tpu.eval.classifier import make_zero_shot_classifier
    from robustvlm_tpu.models.clip.tokenizer import get_tokenizer

    tok = get_tokenizer(args.bpe_path or None, cfg.context_length)
    classnames = templates.imagenet_classnames()
    tpls = templates.get_templates("imagenet1k")
    classifier = zero_shot_classifier(
        params, cfg, lambda t: jnp.asarray(tok(t)), classnames, tpls
    )
    logits_fn = make_zero_shot_classifier(params, cfg, classifier)

    ds = ImageFolderDataset(args.imagenet_dir, size=cfg.image_size)
    loader = DataLoader(ds, args.batch_size, shuffle=False, drop_last=False)
    xs, ys = [], []
    for xb, yb in loader:
        xs.append(xb)
        ys.append(yb)
        if sum(len(v) for v in ys) >= args.n_samples:
            break
    x = jnp.asarray(np.concatenate(xs)[: args.n_samples])
    y = jnp.asarray(np.concatenate(ys)[: args.n_samples])

    aa = AutoAttackTPU(
        logits_fn, norm="linf", eps=args.eps / 255.0,
        attacks_to_run=["apgd-ce", "apgd-t"], n_iter=args.n_iter,
        verbose=True, host_loop=args.host_loop,
    )
    # attack chunks at the measured v5e per-example throughput peak
    # (bench.py batch curve: 8); forwards stay at the loader batch
    aa.run_standard_evaluation(
        x, y, bs=args.attack_batch, bs_forward=args.batch_size,
        run_checks=False,
    )
    return aa.robust_accuracy_dict


def _load_quality_images(image_dir: str, image_size: int, n: int):
    """(n, 3, S, S) [0,1] batch: real images from a flat dir when given
    (sorted, deterministic), else a fixed synthetic batch — quantization
    consistency (fp vs int8/int4 on the SAME inputs) is measurable either
    way; CIDEr is only meaningful with real images + real weights."""
    import jax.numpy as jnp

    if image_dir:
        from pathlib import Path

        from robustvlm_tpu.data.loaders import default_image_transform
        from PIL import Image

        tf = default_image_transform(image_size)
        paths = sorted(
            p for p in Path(image_dir).iterdir()
            if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp")
        )[:n]
        if not paths:
            raise ValueError(f"no images found in {image_dir}")
        arrs = []
        for p in paths:
            with Image.open(p) as img:
                arrs.append(tf(img.convert("RGB")))
        return jnp.asarray(np.stack(arrs))
    rng = np.random.RandomState(0)
    return jnp.asarray(
        rng.rand(n, 3, image_size, image_size).astype(np.float32)
    )


def quant_quality(model_factory, images, *, widths=(8, 4), max_new=32):
    """Serving-quantization quality gate (VERDICT r4 #4): greedy-decode the
    SAME images through the fp model and each weight-only width
    (quantize_for_serving — the production serving path), then score each
    width against fp: token agreement over fp's generated span, exact-match
    rate, and CIDEr-D with the fp captions as references.

    `model_factory` must return a FRESH LlavaEvalModel per call:
    quantize_for_serving drops the fp tree in place (at 7B fp + quantized
    trees cannot coexist on one 16 GiB v5e), so each width reloads from
    disk. Returns {"int8": {...}, "int4": {...}} metric dicts.
    """
    import gc

    import jax
    import jax.numpy as jnp

    from robustvlm_tpu.vlm_eval.eval_models import (
        strip_after_eos, truncate_at_stops,
    )
    from robustvlm_tpu.vlm_eval.metrics.cider import compute_cider

    def generate(width):
        model = model_factory()
        if width:
            model.quantize_for_serving(width)
        prompts = [model.get_caption_prompt()] * images.shape[0]
        pre_ids, toks, n_pad = model._tokenize_gen(prompts)
        res = model._gen_core(max_new, 1, 0.0)(
            model._gen_params(), images,
            jnp.asarray([pre_ids] * images.shape[0]),
            jnp.asarray(toks), jnp.asarray(n_pad),
        )
        tokens = np.asarray(res.tokens)
        eos, pad = model.tok.eos_token_id, model.tok.pad_token_id
        caps = [
            truncate_at_stops(model.tok.decode(ids), model.DEFAULT_STOPS)
            for ids in strip_after_eos(tokens, eos, pad)
        ]
        del model
        gc.collect()
        jax.clear_caches()
        return tokens, caps, (eos, pad)

    fp_tokens, fp_caps, (eos, pad) = generate(0)
    out = {}
    for width in widths:
        q_tokens, q_caps, _ = generate(width)
        agree, exact = [], 0
        for fp_row, q_row in zip(fp_tokens, q_tokens):
            stop = np.where((fp_row == eos) | (fp_row == pad))[0]
            valid = int(stop[0]) if len(stop) else len(fp_row)
            valid = max(valid, 1)
            a = float(np.mean(fp_row[:valid] == q_row[:valid]))
            agree.append(a)
            exact += int(a == 1.0)
        ids = list(range(len(fp_caps)))
        out[f"int{width}"] = {
            "token_agreement": round(float(np.mean(agree)), 4),
            "exact_match_rate": round(exact / len(agree), 4),
            "cider_vs_fp": round(
                compute_cider(
                    dict(zip(ids, q_caps)),
                    {i: [fp_caps[i]] for i in ids},
                ), 4
            ),
            "n_images": len(agree),
            "max_new_tokens": max_new,
        }
    return out


def run_llava_quant_quality(args):
    """CLI wiring for the gate: reload the real LLaVA checkpoint per width
    (see quant_quality docstring) and print one JSON line. Skips unless
    $LLAVA_CKPT / --llava_ckpt points at real weights."""
    import jax.numpy as jnp

    from robustvlm_tpu.models.llava import LLAVA_CONFIGS, load_llava_checkpoint
    from robustvlm_tpu.vlm_eval.eval_models import LlavaEvalModel

    cfg = LLAVA_CONFIGS[args.llava_model]

    def factory():
        params = load_llava_checkpoint(args.llava_ckpt, cfg)
        tok = _hf_tokenizer(args.tokenizer_path)
        return LlavaEvalModel(params, cfg, tok, compute_dtype=jnp.bfloat16)

    images = _load_quality_images(
        args.image_dir, cfg.vision.image_size, args.n_quality_images
    )
    res = quant_quality(
        factory, images, max_new=args.quality_max_new
    )
    print(json.dumps({"metric": "llava_quant_quality_vs_fp", **res}))
    # the north-star bar the day a checkpoint is reachable: int8 should be
    # near-transcript-identical; int4 visibly coarser but CIDEr-high
    return res


def _hf_tokenizer(tokenizer_path: str):
    if not tokenizer_path:
        raise ValueError(
            "--tokenizer_path required with --llava_ckpt (the HF LLaMA "
            "tokenizer directory)"
        )
    from robustvlm_tpu.vlm_eval.run_evaluation import _tokenizer as _rt

    class _A:  # minimal arg shim for run_evaluation's loader
        pass

    a = _A()
    a.tokenizer_path = tokenizer_path
    a.model = "llava"
    return _rt(a)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", default=os.environ.get("CLIP_CKPT", ""))
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--base_ckpt", default="",
                   help="openai full ckpt providing the text tower when "
                        "--ckpt is a visual-only FARE/TeCoA overlay")
    p.add_argument("--visual_only", action="store_true")
    p.add_argument("--record", default="", help="write the fingerprint here")
    p.add_argument("--expected", default="", help="compare against this json")
    p.add_argument("--imagenet_dir", default="")
    p.add_argument("--n_samples", type=int, default=1000)
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--eps", type=float, default=2.0, help="/255 units")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--attack_batch", type=int, default=8)
    p.add_argument("--bpe_path", default=os.environ.get("CLIP_BPE_PATH", ""))
    p.add_argument("--host_loop", action="store_true")
    # serving-quantization quality gate (LLaVA): int8/int4 greedy decode vs
    # fp on the same images — token agreement + CIDEr with fp captions as
    # references. Gated on a real LLaVA checkpoint being reachable.
    p.add_argument("--llava_ckpt", default=os.environ.get("LLAVA_CKPT", ""))
    p.add_argument("--llava_model", default="llava-1.5-7b")
    p.add_argument("--tokenizer_path",
                   default=os.environ.get("LLAVA_TOKENIZER", ""))
    p.add_argument("--image_dir", default="",
                   help="flat dir of images for the quality gate "
                        "(default: fixed synthetic batch)")
    p.add_argument("--n_quality_images", type=int, default=8)
    p.add_argument("--quality_max_new", type=int, default=32)
    args = p.parse_args(argv)

    if args.llava_ckpt:
        run_llava_quant_quality(args)
        if not args.ckpt:
            return 0

    if not args.ckpt:
        print(
            "SKIP: no checkpoint ($CLIP_CKPT unset, --ckpt empty; "
            "$LLAVA_CKPT unset for the quantized-serving quality gate)"
        )
        return 0

    params, cfg = load_real_checkpoint(args)
    fp = fingerprint(params, cfg)

    rc = 0
    if args.record:
        with open(args.record, "w") as f:
            json.dump(fp, f, indent=2)
        print(f"recorded fingerprint -> {args.record}")
    if args.expected:
        expected = json.load(open(args.expected))
        errs = compare(fp, expected)
        if errs:
            print("PARITY FAIL:\n  " + "\n  ".join(errs))
            rc = 1
        else:
            print("PARITY OK: fingerprint matches recorded values")
    if args.imagenet_dir:
        racc = run_imagenet_eval(args, params, cfg)
        print(json.dumps({"robust_accuracy": racc}))
        print(
            "compare against BASELINE.md ViT-L/14 rows "
            "(0.5%-point tolerance north star)"
        )
    return rc


if __name__ == "__main__":
    sys.exit(main())
