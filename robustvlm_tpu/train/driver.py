"""Training CLI: adversarial CLIP fine-tuning (TeCoA / FARE).

Usage mirror of `python -m train.adversarial_training_clip` (reference
adversarial_training_clip.py:31-64):

  python -m robustvlm_tpu.train.driver --clip_model_name ViT-L-14 \
      --pretrained /path/openai_clip.pt --dataset imagenet \
      --imagenet_root /data/imagenet --loss l2 --attack apgd --eps 4 \
      --steps 20000 --warmup 1400 --batch_size 128 --output_dir out/fare4

eps/stepsize are given in /255 units and divided at parse, as in the
reference (:537). `--dataset synthetic` runs without any data on disk.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from robustvlm_tpu.data.loaders import (
    DataLoader,
    ImageFolderDataset,
    SyntheticClassificationDataset,
)
from robustvlm_tpu.models.clip import (
    CLIP_CONFIGS,
    init_clip_params,
    load_clip_checkpoint,
)
from robustvlm_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from robustvlm_tpu.train.trainer import (
    TrainConfig,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from robustvlm_tpu.utils.checkpoint import CheckpointManager
from robustvlm_tpu.utils.logging import MetricLogger
from robustvlm_tpu.utils.meters import AverageMeter


def str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Adversarial CLIP fine-tuning (TPU)")
    p.add_argument("--clip_model_name", default="ViT-L-14")
    p.add_argument("--pretrained", default="",
                   help="path to a torch CLIP checkpoint; empty = random init")
    p.add_argument("--dataset", default="imagenet",
                   choices=["imagenet", "synthetic"])
    p.add_argument("--imagenet_root", default="/mnt/datasets/imagenet")
    p.add_argument("--template", default="std")
    p.add_argument("--output_normalize", type=str2bool, default=False)
    p.add_argument("--start_step", type=int, default=0)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--warmup", type=int, default=1400)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--loss", default="l2", help="outer loss: l2 (FARE) | ce (TeCoA)")
    p.add_argument("--loss_clean", default="none")
    p.add_argument("--clean_weight", type=float, default=0.0)
    p.add_argument("--trades", type=str2bool, default=False)
    p.add_argument("--opt", default="adamw")
    p.add_argument("--momentum_sgd", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--attack", default="apgd", choices=["pgd", "apgd", "none"])
    p.add_argument("--inner_loss", default="l2")
    p.add_argument("--norm", default="linf")
    p.add_argument("--eps", type=float, default=4.0, help="in /255 units")
    p.add_argument("--iterations_adv", type=int, default=10)
    p.add_argument("--stepsize_adv", type=float, default=1.0, help="in /255 units")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--remat", type=str2bool, default=False)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="micro-batch the step into k chunks (one optimizer "
                        "update); exact for equal chunks")
    p.add_argument("--eval_freq", type=int, default=50)
    p.add_argument("--log_freq", type=int, default=1)
    p.add_argument("--output_dir", default="out/run")
    p.add_argument("--save_checkpoints", type=str2bool, default=True)
    p.add_argument("--resume", default="",
                   help="checkpoint name under <output_dir>/checkpoints to "
                        "restore params+optimizer from (e.g. fallback_4200); "
                        "pair with --start_step (reference "
                        "adversarial_training_clip.py:38-39,98-102)")
    p.add_argument("--text_embedding_path", default="",
                   help="npy file with the (D, C) normalized class-text matrix; "
                        "empty = precompute from the ImageNet classnames "
                        "(reference adversarial_training_clip.py:150-180)")
    p.add_argument("--bpe_path", default="",
                   help="CLIP BPE merges file (or $CLIP_BPE_PATH)")
    p.add_argument("--wandb", type=str2bool, default=False)
    p.add_argument("--experiment_name", default="")
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    eps = args.eps / 255.0
    stepsize = args.stepsize_adv / 255.0

    clip_cfg = CLIP_CONFIGS[args.clip_model_name]
    cfg = TrainConfig(
        loss=args.loss, inner_loss=args.inner_loss, loss_clean=args.loss_clean,
        clean_weight=args.clean_weight, trades=args.trades, attack=args.attack,
        norm=args.norm, eps=eps, iterations_adv=args.iterations_adv,
        stepsize_adv=stepsize, opt=args.opt, lr=args.lr, wd=args.wd,
        momentum_sgd=args.momentum_sgd, warmup=args.warmup, steps=args.steps,
        output_normalize=args.output_normalize,
        compute_dtype=args.compute_dtype, remat=args.remat,
        grad_accum=args.grad_accum,
    )

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "args.json").write_text(json.dumps(vars(args), indent=2))
    logger = MetricLogger(str(out), run_name=args.experiment_name or "train",
                          use_wandb=args.wandb, config=vars(args))

    # ---- models: trainable + frozen original (reference :95-103)
    rng = jax.random.PRNGKey(0)
    if args.pretrained:
        base = init_clip_params(rng, clip_cfg)
        params = load_clip_checkpoint(args.pretrained, clip_cfg, base_params=base)
    else:
        params = init_clip_params(rng, clip_cfg)
    params_orig = jax.tree.map(jnp.copy, params)  # frozen copy (fresh buffers: params are donated)

    # ---- class-text embedding matrix (TeCoA / eval metrics)
    text_embedding = None
    if args.text_embedding_path:
        text_embedding = jnp.asarray(np.load(args.text_embedding_path))
    elif args.loss == "ce" or args.inner_loss == "ce" or args.dataset == "imagenet":
        # precompute from the frozen text tower, 500-class chunks
        # (reference adversarial_training_clip.py:150-180)
        from robustvlm_tpu.benchmark.templates import (
            STD_TEMPLATE, get_templates, imagenet_classnames,
        )
        from robustvlm_tpu.eval.classifier import build_text_classifier
        from robustvlm_tpu.models.clip.tokenizer import get_tokenizer

        tok = get_tokenizer(args.bpe_path or None, clip_cfg.context_length)
        classnames = imagenet_classnames()
        tpls = get_templates("imagenet1k") if args.template == "ensemble" else None
        text_embedding = build_text_classifier(
            params, clip_cfg, lambda t: jnp.asarray(tok(t)), classnames,
            templates=tpls,
        )

    # ---- data
    if args.dataset == "imagenet":
        ds = ImageFolderDataset(args.imagenet_root + "/train",
                                size=clip_cfg.image_size)
        ds_eval = ImageFolderDataset(args.imagenet_root + "/val",
                                     size=clip_cfg.image_size)
    else:
        ds = SyntheticClassificationDataset(
            n=max(args.batch_size * 4, 64), size=clip_cfg.image_size)
        ds_eval = SyntheticClassificationDataset(
            n=args.batch_size, size=clip_cfg.image_size, seed=1)
    loader = DataLoader(ds, args.batch_size, shuffle=True, drop_last=True)
    loader_eval = DataLoader(ds_eval, args.batch_size, shuffle=True, drop_last=True)

    # ---- mesh + sharded step (data-parallel; params replicated)
    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    params = replicate(params, mesh)
    params_orig = replicate(params_orig, mesh)

    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    train_step = jax.jit(
        make_train_step(cfg, clip_cfg, text_embedding), donate_argnums=(0, 2)
    )
    eval_step = (
        jax.jit(make_eval_step(cfg, clip_cfg, text_embedding,
                               initial_stepsize=0.05 * eps if args.clean_weight > 0 else None))
        if text_embedding is not None else None
    )

    ckpt = (
        CheckpointManager(str(out), args.steps)
        if args.save_checkpoints or args.resume else None
    )
    if args.resume:
        params, opt_restored = ckpt.restore(args.resume, params, opt_state)
        if opt_restored is not None:
            opt_state = opt_restored
        print(f"resumed from {args.resume} at step {args.start_step}")
    meters = {k: AverageMeter(k) for k in ["loss", "cos_sim", "acc", "racc"]}

    step = args.start_step
    start_step = step  # throughput counts only THIS process's steps
    epoch = 0
    t_start = time.time()
    eval_iter = iter(loader_eval) if eval_step is not None else None
    while step < args.steps:
        for x_np, y_np in loader:
            x = jax.device_put(jnp.asarray(x_np), bsh)
            y = jax.device_put(jnp.asarray(y_np), batch_sharding(mesh, 1))
            params, opt_state, metrics = train_step(
                params, params_orig, opt_state, x, y,
                jax.random.fold_in(jax.random.PRNGKey(1), step), step,
            )
            step += 1

            if (step - 1) % args.log_freq == 0:
                m = {k: float(v) for k, v in metrics.items()}
                for k in meters:
                    if k in m:
                        meters[k].update(m[k], x.shape[0])
                m["imgs_per_sec"] = (
                    args.batch_size * (step - start_step)
                    / max(time.time() - t_start, 1e-9)
                )
                logger.log(m, step=step)
                print(f"[step] {step} " + " ".join(f"[{k}] {v:.4f}" for k, v in m.items()))

            if eval_step is not None and (step - 1) % args.eval_freq == 0:
                # one persistent iterator: a fresh iter() per eval would
                # spin up (and abandon) a prefetch producer every time
                try:
                    xe, ye = next(eval_iter)
                except StopIteration:
                    eval_iter = iter(loader_eval)
                    xe, ye = next(eval_iter)
                em = {k: float(v) for k, v in eval_step(
                    params, jax.device_put(jnp.asarray(xe), bsh),
                    jax.device_put(jnp.asarray(ye), batch_sharding(mesh, 1))).items()}
                logger.log(em, step=step)
                print(f"[eval] {em}")

            if ckpt is not None:
                ckpt.maybe_save(step, params, opt_state)
            if step >= args.steps:
                break
        epoch += 1
        print(f"Epoch {epoch} done.")

    if ckpt is not None:
        ckpt.save_final(params, opt_state)
        try:
            ckpt.export_torch_visual(params, clip_cfg)
        except ImportError:
            pass
    logger.summary({"steps": step, "wall_time_s": time.time() - t_start})
    return params


if __name__ == "__main__":
    main()
