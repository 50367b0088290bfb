"""Zero-shot benchmark CLI: models x datasets x tasks runner.

Usage mirror of reference `clip_benchmark.cli` (CLIP_benchmark/
clip_benchmark/cli.py:20-71 flags, :140-151 product loop):

  python -m robustvlm_tpu.benchmark.cli eval \
      --model ViT-B-32 --pretrained /ckpt/openai_b32.pt \
      --dataset cifar10 --dataset_root /data/cifar10 \
      --task zeroshot_classification --attack aa --eps 2 \
      --output results/{model}_{dataset}_{task}.json

Collections: --model/--dataset accept comma lists or @file with one entry
per line (the reference's models.txt/datasets.txt mechanism, cli.py:104-130).
eps is in /255 units.
"""

from __future__ import annotations

import argparse
import itertools
import json
import time
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def _expand(arg: str) -> List[str]:
    if arg.startswith("@"):
        return [
            l.strip() for l in Path(arg[1:]).read_text().splitlines()
            if l.strip() and not l.startswith("#")
        ]
    return [a for a in arg.split(",") if a]


def build_parser():
    p = argparse.ArgumentParser(description="zero-shot benchmark suite (TPU)")
    p.add_argument("command", choices=["eval"], nargs="?", default="eval")
    p.add_argument("--model", default="ViT-B-32",
                   help="comma list or @file of CLIP config names")
    p.add_argument("--pretrained", default="",
                   help="comma list or @file of checkpoints (parallel to --model; "
                        "'random' = random init)")
    p.add_argument("--dataset", default="cifar10", help="comma list or @file")
    p.add_argument("--dataset_root", default=".")
    p.add_argument("--retrieval_annotations", default="",
                   help="captions json for retrieval/caption-selection tasks")
    p.add_argument("--split", default="test")
    p.add_argument("--task", default="zeroshot_classification",
                   choices=["zeroshot_classification", "zeroshot_retrieval",
                            "linear_probe", "image_caption_selection",
                            "captioning"])
    p.add_argument("--language", default="en",
                   help="comma list of prompt/classname languages "
                        "(reference cli.py:140-151 loops languages)")
    p.add_argument("--predictions", default="",
                   help="captioning task: json [{image_id, caption}] to score")
    p.add_argument("--attack", default=None, choices=[None, "none", "aa"])
    p.add_argument("--eps", type=float, default=2.0, help="in /255 units")
    p.add_argument("--n_iter", type=int, default=100)
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--template", default="ensemble", choices=["std", "ensemble"])
    p.add_argument("--bpe_path", default="")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--output", default="{model}_{dataset}_{task}.json")
    p.add_argument("--verbose", action="store_true")
    return p


def _bare_dataset_name(dataset: str) -> str:
    """Strip wds/tfds/vtab namespace prefixes: classname/template tables
    are keyed on the bare dataset name."""
    bare = dataset.split("/", 1)[1] if dataset.startswith(
        ("wds/", "tfds/", "vtab/")
    ) else dataset
    return bare.split("/")[-1] if bare.startswith("vtab/") else bare


def run_one(args, model_name: str, pretrained: str, dataset: str,
            language: str = "en") -> dict:
    from robustvlm_tpu.benchmark import builder, templates, zeroshot
    from robustvlm_tpu.eval.classifier import make_zero_shot_classifier
    from robustvlm_tpu.models.clip import (
        CLIP_CONFIGS, init_clip_params, load_clip_checkpoint,
    )
    from robustvlm_tpu.models.clip.tokenizer import get_tokenizer

    if args.task == "captioning":
        # score-only task: generated captions (json [{image_id, caption}])
        # vs reference annotations — the reference's captioning metric
        # (metrics/captioning.py) minus the java scorers
        from robustvlm_tpu.benchmark.captioning import score_captions
        from robustvlm_tpu.vlm_eval.datasets import load_caption_annotations

        preds = {
            p["image_id"]: p["caption"]
            for p in json.loads(Path(args.predictions).read_text())
        }
        refs_by_id = load_caption_annotations(args.retrieval_annotations)
        ids = [i for i in preds if i in refs_by_id]
        metrics = score_captions(
            [preds[i] for i in ids], [refs_by_id[i] for i in ids]
        )
        return {
            "model": model_name, "pretrained": pretrained,
            "dataset": dataset, "task": args.task, "language": language,
            "metrics": metrics,
        }

    # --dataset_root may be a template over the dataset name (reference
    # cli.py:216), e.g. "hf://clip-benchmark/wds_{dataset_cleaned}" for the
    # 13-dataset suite in benchmark/collections/datasets.txt
    ds_name = dataset[len("wds/"):] if dataset.startswith("wds/") else dataset
    args = argparse.Namespace(**{
        **vars(args),
        "dataset_root": args.dataset_root.format(
            dataset=ds_name, dataset_cleaned=ds_name.replace("/", "-")
        ),
    })

    from robustvlm_tpu.models.mclip import MCLIP_CONFIGS

    if model_name in MCLIP_CONFIGS:
        # multilingual open_clip rows (reference model_collection.py
        # "openclip_multilingual"): native XLM-RoBERTa text tower (mean
        # pool + MLP proj, models/mclip.py) + the repo's CLIP ViT vision
        # tower — same downstream flow as plain CLIP, so the adversarial
        # zero-shot path works. Use --language for the multilingual tables.
        from robustvlm_tpu.models.mclip import (
            build_mclip_text_classifier,
            get_mclip_tokenizer,
            import_open_clip_mclip,
            init_mclip_params,
        )

        if args.task != "zeroshot_classification":
            raise NotImplementedError(
                "multilingual xlm-roberta models support "
                "zeroshot_classification (the reference's multilingual "
                "benchmark task)"
            )
        mcfg = MCLIP_CONFIGS[model_name]
        if pretrained and pretrained != "random":
            params = import_open_clip_mclip(pretrained, mcfg)
        else:
            params = init_mclip_params(jax.random.PRNGKey(0), mcfg)
        cfg = mcfg.vision  # vision-side flow (attacks, resize) is CLIP
        # --bpe_path doubles as the local HF tokenizer dir
        tokenize = get_mclip_tokenizer(args.bpe_path or None, mcfg)
        build_classifier = lambda classnames, tpls: build_mclip_text_classifier(
            params, mcfg, tokenize, classnames, tpls
        )
    elif model_name.startswith("ja_clip"):
        # native rinna Japanese CLIP (reference CLIP_benchmark
        # models/japanese_clip.py loads it via the external `japanese_clip`
        # package): BERT text tower (models/jaclip, HF-RobertaModel
        # bit-parity-tested) + the repo's CLIP ViT-B/16 image tower.
        # Supported here for zeroshot_classification with the jp tables.
        if args.task != "zeroshot_classification":
            raise NotImplementedError(
                "ja_clip supports zeroshot_classification (the reference "
                "only benchmarks rinna models there)"
            )
        from robustvlm_tpu.models.jaclip import JACLIP_CONFIGS

        stripped = model_name[len("ja_clip-"):] if model_name.startswith(
            "ja_clip-"
        ) else model_name
        if model_name in JACLIP_CONFIGS:
            jkey = model_name
        elif stripped in JACLIP_CONFIGS:
            jkey = stripped
        else:
            raise KeyError(
                f"unknown ja_clip model {model_name!r}; known: "
                f"{sorted(JACLIP_CONFIGS)}"
            )
        jcfg = JACLIP_CONFIGS[jkey]
        if pretrained and pretrained != "random":
            from robustvlm_tpu.models.jaclip.import_torch import (
                import_rinna_jaclip,
            )

            params = import_rinna_jaclip(pretrained, jcfg)
        else:
            from robustvlm_tpu.models.jaclip import init_jaclip_params

            params = init_jaclip_params(jax.random.PRNGKey(0), jcfg)
        from robustvlm_tpu.models.jaclip import (
            build_ja_text_classifier, get_ja_tokenizer,
        )

        cfg = jcfg.vision  # vision-side flow (attacks, resize) is CLIP
        # --bpe_path doubles as the local HF sentencepiece tokenizer dir
        tokenize = get_ja_tokenizer(args.bpe_path or None, jcfg)
        build_classifier = lambda classnames, tpls: build_ja_text_classifier(
            params, jcfg, tokenize, classnames, tpls
        )
    else:
        cfg = CLIP_CONFIGS[model_name]
        params = init_clip_params(jax.random.PRNGKey(0), cfg)
        if pretrained and pretrained != "random":
            params = load_clip_checkpoint(pretrained, cfg, base_params=params)
        tok = get_tokenizer(args.bpe_path or None, cfg.context_length)
        tokenize = lambda t: jnp.asarray(tok(t))
        build_classifier = lambda classnames, tpls: zeroshot.zero_shot_classifier(
            params, cfg, tokenize, classnames, tpls
        )

    size = 32 if dataset == "cifar10" else cfg.image_size
    compute_dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    def classification_data():
        return builder.build_dataset(
            dataset, args.dataset_root, split=args.split, size=size,
            batch_size=args.batch_size, n_samples=args.n_samples,
        )

    t0 = time.time()
    if args.task == "zeroshot_classification":
        # wds datasets may carry their own classnames/templates metadata
        # (reference builder.py:700-715); they win over the shipped tables
        wds_classes = wds_templates = None
        if dataset.startswith("wds/"):
            from robustvlm_tpu.benchmark.builder import WdsDataset, _is_url

            if _is_url(args.dataset_root) or Path(
                args.dataset_root, args.split, "nshards.txt"
            ).exists():
                wds = WdsDataset(args.dataset_root, split=args.split, size=size)
                wds_classes, wds_templates = wds.classes, wds.templates
                data = wds.batched(args.batch_size)
            else:
                data = classification_data()
        elif dataset.startswith(("tfds/", "vtab/")):
            # build through the adapter directly so its dataset-provided
            # classnames (TFDS feature names / VTAB tables) are usable
            from robustvlm_tpu.benchmark.tfds_adapter import (
                build_tfds_dataset,
                build_vtab_dataset,
            )

            build = (build_tfds_dataset if dataset.startswith("tfds/")
                     else build_vtab_dataset)
            tf_ds = build(
                dataset.split("/", 1)[1], args.dataset_root or None,
                split=args.split, size=size, n_samples=args.n_samples,
            )
            wds_classes = tf_ds.classes
            data = tf_ds.batched(args.batch_size)
        else:
            data = classification_data()
        # classname/template tables are keyed on the bare dataset name
        bare = _bare_dataset_name(dataset)
        classnames = wds_classes or templates.get_classnames(
            bare if dataset != "synthetic" else "cifar10",
            language=language,
        )
        tpls = (
            (wds_templates or templates.get_templates(bare, language=language))
            if args.template == "ensemble"
            else [templates.STD_TEMPLATE + ""]
        )
        classifier = build_classifier(classnames, tpls)
        # CIFAR path attacks at native 32x32 with in-model resize
        # (reference clip_robustbench.py:105-114)
        logits_fn = make_zero_shot_classifier(
            params, cfg, classifier,
            resize_to=cfg.image_size if size != cfg.image_size else None,
            compute_dtype=compute_dtype,
        )
        attack = args.attack if args.attack not in (None, "none") else None
        metrics = zeroshot.run_classification(
            logits_fn, data, attack=attack, eps=args.eps / 255.0,
            n_iter=args.n_iter, n_samples=args.n_samples,
            batch_size=args.batch_size, verbose=args.verbose,
        )
    elif args.task in ("zeroshot_retrieval", "image_caption_selection"):
        from robustvlm_tpu.benchmark.retrieval import (
            encode_corpus,
            evaluate_image_caption_selection,
            evaluate_retrieval,
        )
        from robustvlm_tpu.eval.classifier import make_embedding_fn
        from robustvlm_tpu.models.clip.model import encode_text
        from robustvlm_tpu.vlm_eval.datasets import CaptionDataset

        # dataset_root points at the image dir; --retrieval_annotations at a
        # COCO/karpathy-style captions json
        ds = CaptionDataset(
            args.dataset_root, args.retrieval_annotations, size=size,
            n_samples=args.n_samples,
        )
        # make_embedding_fn jits internally with params as arguments —
        # wrapping it in jax.jit here would bake the tree as HLO constants
        image_fn = make_embedding_fn(params, cfg, output_normalize=True)
        text_fn = jax.jit(
            lambda p, t: encode_text(p, t, cfg, normalize=True)
        )

        def batches():
            bsz = args.batch_size
            for i in range(0, len(ds), bsz):
                items = [ds[j] for j in range(i, min(i + bsz, len(ds)))]
                import numpy as _np

                yield (
                    _np.stack([it["image"] for it in items]),
                    [it["all_captions"] for it in items],
                )

        if args.task == "zeroshot_retrieval":
            im, tx, t2i = encode_corpus(
                image_fn, lambda toks: text_fn(params, toks), batches(),
                tokenize, batch_size=args.batch_size,
            )
            metrics = evaluate_retrieval(im, tx, t2i)
        else:
            metrics = evaluate_image_caption_selection(
                image_fn, lambda toks: text_fn(params, toks), batches(), tokenize
            )
    elif args.task == "linear_probe":
        from robustvlm_tpu.benchmark.linear_probe import evaluate_linear_probe
        from robustvlm_tpu.eval.classifier import make_embedding_fn
        data = classification_data()
        train_data = builder.build_dataset(
            dataset, args.dataset_root, split="train", size=size,
            batch_size=args.batch_size, n_samples=args.n_samples,
        )
        classnames = templates.get_classnames(
            _bare_dataset_name(dataset) if dataset != "synthetic" else "cifar10"
        )
        embed_fn = make_embedding_fn(params, cfg, output_normalize=True)
        metrics = evaluate_linear_probe(
            embed_fn, train_data, data, n_classes=len(classnames)
        )
    else:
        raise ValueError(f"unknown task {args.task}")

    return {
        "model": model_name,
        "pretrained": pretrained,
        "dataset": dataset,
        "task": args.task,
        "language": language,
        "metrics": metrics,
        "eps": args.eps,
        "attack": args.attack,
        "wall_s": round(time.time() - t0, 2),
    }


def main(argv=None):
    args = build_parser().parse_args(argv)
    models = _expand(args.model)
    if any("," in m for m in models):
        # @file rows may pair "model,pretrained" on one line (reference
        # CLIP_benchmark model_collection.py get_model_collection_from_file);
        # bare-CLI comma lists never reach here with commas intact
        if args.pretrained:
            raise ValueError(
                "model,pretrained @file rows and --pretrained are mutually "
                "exclusive — put the checkpoint in the file row"
            )
        rows = [m.split(",", 1) for m in models]
        models = [r[0].strip() for r in rows]
        pretrained = [r[1].strip() if len(r) > 1 else "" for r in rows]
    else:
        pretrained = _expand(args.pretrained) if args.pretrained else [""] * len(models)
        if len(pretrained) == 1 and len(models) > 1:
            pretrained = pretrained * len(models)  # one checkpoint, many archs
        if len(pretrained) != len(models):
            raise ValueError(
                f"--model has {len(models)} entries but --pretrained has "
                f"{len(pretrained)}; they pair positionally (a single "
                "--pretrained broadcasts)"
            )
    datasets = _expand(args.dataset)
    languages = _expand(args.language) or ["en"]

    def out_path(m, pt, ds, lang):
        stem = args.output.format(
            model=m, dataset=ds.replace("/", "_"), task=args.task,
            language=lang, pretrained=Path(pt).stem if pt else "random",
        )
        if len(languages) > 1 and "{language}" not in args.output:
            # language tag goes on the FILENAME, not the directory part
            p = Path(stem)
            return p.with_name(f"{lang}_{p.name}")
        return Path(stem)

    # distinct runs must not clobber each other's results file
    all_paths = [
        out_path(m, pt, ds, lang)
        for (m, pt), ds, lang in itertools.product(
            zip(models, pretrained), datasets, languages
        )
    ]
    if len(set(map(str, all_paths))) != len(all_paths):
        raise ValueError(
            "--output template maps multiple runs to the same file "
            "(same model, different checkpoints?); add {pretrained} to it"
        )

    results = []
    for (m, pt), ds, lang in itertools.product(
        zip(models, pretrained), datasets, languages
    ):
        res = run_one(args, m, pt, ds, language=lang)
        results.append(res)
        out = out_path(m, pt, ds, lang)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(res, indent=2))
        print(json.dumps(res))
    return results


if __name__ == "__main__":
    main()
