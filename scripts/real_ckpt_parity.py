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
    args = p.parse_args(argv)

    if not args.ckpt:
        print("SKIP: no checkpoint ($CLIP_CKPT unset, --ckpt empty)")
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
