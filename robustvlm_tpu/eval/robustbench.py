"""Robust-accuracy benchmark CLI for standalone CLIP.

Usage mirror of `python -m CLIP_eval.clip_robustbench` (reference
CLIP_eval/clip_robustbench.py:22-45 flags, :81-357 flow):

  python -m robustvlm_tpu.eval.robustbench \
      --clip_model_name ViT-L-14 --pretrained /ckpt/openai_l14.pt \
      --dataset imagenet --imagenet_root /data/imagenet \
      --n_ex 5000 --eps 2 --n_iter 100 --attacks apgd-ce,apgd-t

Flow: load CLIP (optionally β-interpolating two checkpoints,
eval_utils.py:18-27), build the zero-shot classifier (std single template or
the 80-template ensemble :184-227), wrap as a pixel-space logits closure
(logits = 100·ê·T with normalize+resize inside — the threat-model contract),
report clean accuracy, then run the AutoAttack cascade over still-robust
examples. CIFAR-10 attacks at native 32x32 with in-model bicubic resize
(:105-114,176-178). eps in /255 units.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.benchmark import templates as T
from robustvlm_tpu.benchmark.builder import build_dataset
from robustvlm_tpu.eval.autoattack import AutoAttackTPU
from robustvlm_tpu.eval.classifier import (
    build_text_classifier,
    make_zero_shot_classifier,
)
from robustvlm_tpu.models.clip import (
    CLIP_CONFIGS,
    init_clip_params,
    load_clip_checkpoint,
)
from robustvlm_tpu.models.clip.tokenizer import get_tokenizer
from robustvlm_tpu.utils.logging import MetricLogger


def build_parser():
    p = argparse.ArgumentParser(description="CLIP robust-accuracy benchmark (TPU)")
    p.add_argument("--clip_model_name", default="ViT-L-14")
    p.add_argument("--pretrained", default="", help="checkpoint path; '' = random")
    p.add_argument("--base_pretrained", default="",
                   help="full CLIP checkpoint supplying the text tower when "
                        "--pretrained is a visual-only (FARE/TeCoA) dict")
    p.add_argument("--pretrained2", default="",
                   help="second ckpt for beta-interpolation")
    p.add_argument("--beta", type=float, default=0.5,
                   help="interpolation weight of --pretrained2")
    p.add_argument("--dataset", default="imagenet",
                   choices=["imagenet", "cifar10", "synthetic"])
    p.add_argument("--imagenet_root", default="/mnt/datasets/imagenet")
    p.add_argument("--cifar10_root", default="/mnt/datasets/cifar10")
    p.add_argument("--n_ex", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=128,
                   help="data-loading / clean-accuracy batch")
    p.add_argument("--attack_batch", type=int, default=8,
                   help="attack chunk size; per-example APGD throughput on "
                        "v5e PEAKS at 8 (see bench.py batch curve) while "
                        "forward-only cost is batch-insensitive")
    p.add_argument("--template", default="ensemble", choices=["std", "ensemble"])
    p.add_argument("--norm", default="linf")
    p.add_argument("--eps", type=float, default=2.0, help="in /255 units")
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--attacks", default="apgd-ce,apgd-t",
                   help="comma list; 'square' for blackbox-only")
    p.add_argument("--full_benchmark", action="store_true",
                   help="run the full AutoAttack 'standard' cascade "
                        "(apgd-ce, apgd-t, fab-t, square) like the "
                        "reference's robustbench.benchmark() path "
                        "(clip_robustbench.py:264-296)")
    p.add_argument("--alpha", type=float, default=None,
                   help="APGD initial step-size multiplier override")
    p.add_argument("--remat", default="dots",
                   choices=["dots", "full", "dots_saveable", "none"],
                   help="per-block remat for the attacked forward "
                        "(bench.py: 'dots' is the tuned default)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--bpe_path", default="")
    p.add_argument("--state_path", default="", help="AutoAttack resume state file")
    p.add_argument("--host_loop", action="store_true",
                   help="host-looped APGD steps (O(1) compile in n_iter; use "
                        "on backends with slow loop compilation)")
    p.add_argument("--output_dir", default="out/robustbench")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--experiment_name", default="")
    p.add_argument("--save_adv", action="store_true")
    return p


def load_model(args):
    cfg = CLIP_CONFIGS[args.clip_model_name]
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    if getattr(args, "base_pretrained", ""):
        # full base checkpoint first: visual-only fine-tunes then overlay
        # just the vision tower (reference eval_utils.py:30-61 loads openai
        # weights before model.visual.load_state_dict(ckpt))
        params = load_clip_checkpoint(args.base_pretrained, cfg, base_params=params)
    if args.pretrained:
        params = load_clip_checkpoint(
            args.pretrained, cfg, base_params=params,
            interpolate_with=args.pretrained2 or None, beta=args.beta,
        )
    elif getattr(args, "pretrained2", ""):
        raise ValueError(
            "--pretrained2 interpolates AGAINST --pretrained; give both"
        )
    return cfg, params


def main(argv=None):
    args = build_parser().parse_args(argv)
    eps = args.eps / 255.0
    cfg, params = load_model(args)
    tok = get_tokenizer(args.bpe_path or None, cfg.context_length)
    tokenize = lambda t: jnp.asarray(tok(t))

    dataset_key = "imagenet1k" if args.dataset in ("imagenet", "synthetic") else args.dataset
    classnames = T.get_classnames(dataset_key)
    tpls = T.get_templates(dataset_key) if args.template == "ensemble" else None
    classifier = build_text_classifier(params, cfg, tokenize, classnames, templates=tpls)

    native = 32 if args.dataset == "cifar10" else cfg.image_size
    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    logits_fn = make_zero_shot_classifier(
        params, cfg, classifier,
        resize_to=cfg.image_size if native != cfg.image_size else None,
        compute_dtype=compute_dtype,
        # 'dots' is the tuned production remat for grad-wrt-pixels at the
        # attack chunk size (bench.py measurement trail); no-remat loses
        # ~17% at b8 and fails to compile at b32
        remat=args.remat if args.remat != "none" else False,
    )

    root = {"imagenet": args.imagenet_root, "cifar10": args.cifar10_root,
            "synthetic": "."}[args.dataset]
    data = build_dataset(
        args.dataset, root, split="test", size=native,
        batch_size=args.batch_size, n_samples=args.n_ex,
    )
    xs, ys = [], []
    n = 0
    for xb, yb in data:
        take = min(len(xb), args.n_ex - n)
        xs.append(np.asarray(xb[:take]))
        ys.append(np.asarray(yb[:take]))
        n += take
        if n >= args.n_ex:
            break
    # keep the eval set on the HOST: the cascade slices fixed-size chunks
    # and uploads per batch; a whole-set jnp.asarray would round-trip
    # multi-GB arrays through the remote tunnel and pin HBM for the run
    x = np.concatenate(xs)
    y = np.concatenate(ys)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(
        str(out), run_name=args.experiment_name or "robustbench",
        use_wandb=args.wandb, config=vars(args),
    )

    t0 = time.time()

    if args.full_benchmark:
        # reference --full_benchmark == robustbench.benchmark(): the
        # standard AutoAttack version over the clean split
        aa = AutoAttackTPU(
            logits_fn, norm=args.norm, eps=eps, n_iter=args.n_iter,
            version="standard", alpha=args.alpha, verbose=True,
            host_loop=args.host_loop,
        )
    else:
        aa = AutoAttackTPU(
            logits_fn, norm=args.norm, eps=eps, n_iter=args.n_iter,
            attacks_to_run=[a.strip() for a in args.attacks.split(",") if a.strip()],
            alpha=args.alpha, verbose=True, host_loop=args.host_loop,
        )
    x_adv = aa.run_standard_evaluation(
        x, y, bs=args.attack_batch,
        state_path=(args.state_path or None),
        bs_forward=args.batch_size,
    )
    racc = aa.robust_accuracy_dict
    # the cascade's clean pass IS the clean accuracy — no second sweep
    clean_acc = racc["clean"]
    print(f"clean accuracy: {100 * clean_acc:.2f}%")
    robust_acc = min(
        (v for k, v in racc.items() if k != "clean"), default=racc["clean"]
    )

    result = {
        "model": args.clip_model_name,
        "pretrained": args.pretrained,
        "dataset": args.dataset,
        "n_ex": int(x.shape[0]),
        "eps": args.eps,
        "norm": args.norm,
        "clean_acc": clean_acc,
        "robust_acc": robust_acc,
        "cascade": racc,
        "wall_s": round(time.time() - t0, 1),
    }
    # wandb-style summary keys written back like the reference
    # (clip_robustbench.py:283-287: rb/acc-<ds>, rb/racc-<ds>-<norm>-<eps>)
    ds_short = {"imagenet": "img", "cifar10": "c10", "synthetic": "synth"}[
        args.dataset
    ]
    eps_descr = str(int(args.eps)) if args.norm == "linf" else str(eps)
    result[f"rb/acc-{ds_short}"] = 100 * clean_acc
    result[f"rb/racc-{ds_short}-{args.norm}-{eps_descr}"] = 100 * robust_acc
    logger.summary(result)
    (out / "result.json").write_text(json.dumps(result, indent=2))
    if args.save_adv:
        np.save(out / "x_adv.npy", np.asarray(x_adv))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
