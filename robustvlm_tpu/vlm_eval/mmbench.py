"""MMBench multiple-choice evaluation.

Equivalent of reference llava/eval/model_vqa_mmbench.py: TSV rows carry a
base64-encoded image, a question, optional hint, and options A..D; prompts
append the enumerated options plus the "Answer with the option's letter
from the given choices directly." instruction (:88-99), and `all_rounds`
runs every cyclic rotation of the options (circular evaluation, :76-79,
:124-133 option rotation between rounds). Scoring is offline here: a
question is circular-correct only when every rotation round picks the
rotated ground-truth letter (the MMBench protocol the upstream server
applies to the submitted answers file).
"""

from __future__ import annotations

import base64
import csv
import io
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

ALL_OPTIONS = ["A", "B", "C", "D"]
_EN_SUFFIX = "Answer with the option's letter from the given choices directly."
_CN_SUFFIX = "请直接回答选项字母。"


def _is_none(v) -> bool:
    return v is None or str(v).strip().lower() in ("", "none", "nan")


def load_mmbench_tsv(path: str) -> List[Dict]:
    """Rows with keys index/question/hint/answer/A..D/image (base64)."""
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f, delimiter="\t"))


def decode_image(b64: str, size: int) -> np.ndarray:
    from PIL import Image

    from robustvlm_tpu.data.loaders import default_image_transform

    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    return default_image_transform(size)(img)


def get_options(row: Dict) -> List[str]:
    opts = []
    for c in ALL_OPTIONS:
        if not _is_none(row.get(c)):
            opts.append(str(row[c]))
    return opts


def rotate(options: Sequence[str], rounds: int) -> List[str]:
    """Cyclic option rotation between rounds (reference :124-133)."""
    options = list(options)
    return options[rounds:] + options[:rounds]


def build_prompt(
    question: str,
    options: Sequence[str],
    hint: Optional[str] = None,
    lang: str = "en",
    single_pred_prompt: bool = True,
) -> str:
    q = question if _is_none(hint) else f"{hint}\n{question}"
    for ch, opt in zip(ALL_OPTIONS, options):
        q = f"{q}\n{ch}. {opt}"
    if single_pred_prompt:
        q = f"{q}\n{_CN_SUFFIX if lang == 'cn' else _EN_SUFFIX}"
    return q


def parse_choice(text: str, n_options: int) -> str:
    """First standalone option letter in the generation; 'FAILED' if none."""
    valid = set(ALL_OPTIONS[:n_options])
    for tok in text.replace(".", " ").replace(",", " ").split():
        t = tok.strip("()*'\"").upper()
        if t in valid:
            return t
    return "FAILED"


def run_mmbench(
    model,
    rows: Sequence[Dict],
    *,
    size: int = 336,
    all_rounds: bool = True,
    lang: str = "en",
    max_new_tokens: int = 8,
    answers_file: Optional[str] = None,
    image_decode=decode_image,
) -> List[Dict]:
    """Generate one answer record per (question, round) — the reference's
    answers-JSONL rows (:134-147). `model` follows the eval-model adapter
    contract (get_vqa_prompt / get_outputs)."""
    import jax.numpy as jnp

    records = []
    for row in rows:
        options = get_options(row)
        n_rounds = len(options) if all_rounds else 1
        x = jnp.asarray(image_decode(row["image"], size))[None]
        for r in range(n_rounds):
            opts = rotate(options, r)
            prompt_q = build_prompt(
                row["question"], opts, row.get("hint"), lang=lang
            )
            out = model.get_outputs(
                x, [model.get_vqa_prompt(prompt_q, None)],
                max_new_tokens=max_new_tokens,
            )[0]
            records.append({
                "question_id": row["index"],
                "round_id": r,
                "prompt": prompt_q,
                "text": out,
                "options": opts,
                "option_char": ALL_OPTIONS[: len(opts)],
                "answer": row.get("answer"),
            })
    if answers_file:
        Path(answers_file).parent.mkdir(parents=True, exist_ok=True)
        with open(answers_file, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
    return records


def eval_mmbench(records: Sequence[Dict]) -> Dict[str, float]:
    """Offline MMBench scoring: per-round accuracy plus circular accuracy
    (correct in EVERY rotation of the same question)."""
    per_q: Dict[str, List[bool]] = {}
    for rec in records:
        gt_letter = str(rec.get("answer") or "").strip().upper()
        if gt_letter not in ALL_OPTIONS:
            continue
        # the ground-truth OPTION TEXT moves under rotation; find where the
        # original answer letter's text landed this round
        base = rotate(rec["options"], -rec["round_id"] % len(rec["options"]))
        gt_text = base[ALL_OPTIONS.index(gt_letter)]
        rotated_gt = ALL_OPTIONS[rec["options"].index(gt_text)]
        pred = parse_choice(rec["text"], len(rec["options"]))
        per_q.setdefault(str(rec["question_id"]), []).append(pred == rotated_gt)
    if not per_q:
        return {"accuracy": float("nan"), "circular_accuracy": float("nan")}
    flat = [c for v in per_q.values() for c in v]
    return {
        "accuracy": 100.0 * sum(flat) / len(flat),
        "circular_accuracy": 100.0 * sum(all(v) for v in per_q.values()) / len(per_q),
        "n_questions": len(per_q),
    }


def main(argv=None):
    """CLI (reference llava MMBench answer generation + accuracy scoring)."""
    import argparse

    from robustvlm_tpu.vlm_eval.run_evaluation import (
        add_model_args,
        build_eval_model,
    )

    p = argparse.ArgumentParser(description="MMBench multiple-choice eval")
    add_model_args(p)
    p.add_argument("--mmbench_tsv", required=True)
    p.add_argument("--answers_file", default="")
    p.add_argument("--single_round", action="store_true",
                   help="skip the all-rounds circular option rotation")
    p.add_argument("--lang", default="en")
    p.add_argument("--max_new_tokens", type=int, default=8)
    p.add_argument("--image_size", type=int, default=336)
    args = p.parse_args(argv)

    model = build_eval_model(args, "float")
    rows = load_mmbench_tsv(args.mmbench_tsv)
    records = run_mmbench(
        model, rows, size=args.image_size, all_rounds=not args.single_round,
        lang=args.lang, max_new_tokens=args.max_new_tokens,
        answers_file=args.answers_file or None,
    )
    metrics = eval_mmbench(records)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
