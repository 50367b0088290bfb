"""ScienceQA multiple-choice evaluation (driver + scorer).

Equivalent of reference llava/eval/model_vqa_science.py +
eval_science_qa.py: answers are parsed as an option letter (exact letter,
'X. ...' prefix, or the 'The answer is X.' pattern), mapped to a choice
index (failed parses fall back to a deterministic pseudo-random choice),
and scored as overall + image-question accuracy.
"""

from __future__ import annotations

import json
import random
from pathlib import Path
import re
from typing import Dict, List, Optional, Sequence

OPTIONS = ["A", "B", "C", "D", "E"]
_ANSWER_PATTERN = re.compile(r"The answer is ([A-E]).")


def parse_option(pred_text: str, options: Sequence[str] = OPTIONS) -> str:
    if pred_text in options:
        return pred_text
    if (
        len(pred_text) >= 3
        and pred_text[0] in options
        and pred_text[1:3] == ". "
    ):
        return pred_text[0]
    res = _ANSWER_PATTERN.findall(pred_text)
    if len(res) == 1:
        return res[0]
    return "FAILED"


def get_pred_idx(answer: str, choices: Sequence, options: Sequence[str] = OPTIONS) -> int:
    """Option letter -> choice index; failed parses pick pseudo-randomly
    (reference eval_science_qa.py get_pred_idx)."""
    if answer in options[: len(choices)]:
        return options.index(answer)
    return random.choice(range(len(choices)))


def eval_science_qa(
    predictions: Dict[str, Dict],
    problems: Dict[str, Dict],
    split_ids: Sequence[str],
    seed: int = 0,
) -> Dict[str, float]:
    """predictions: {question_id: {'text', 'prompt'}}; problems:
    {question_id: {'choices', 'answer'}}."""
    random.seed(seed)
    correct = incorrect = 0
    mm_correct = mm_total = 0
    per_question = {}
    for qid in split_ids:
        prob = problems[qid]
        pred = predictions.get(qid, {"text": "FAILED", "prompt": ""})
        answer = parse_option(pred["text"])
        idx = get_pred_idx(answer, prob["choices"])
        is_mm = "<image>" in pred.get("prompt", "")
        ok = idx == prob["answer"]
        per_question[qid] = idx
        correct += int(ok)
        incorrect += int(not ok)
        if is_mm:
            mm_total += 1
            mm_correct += int(ok)
    total = correct + incorrect
    return {
        "total": total,
        "correct": correct,
        "acc": 100.0 * correct / max(total, 1),
        "img_acc": 100.0 * mm_correct / max(mm_total, 1),
        "results": per_question,
    }


def build_sqa_prompt(problem: Dict, include_image: bool) -> str:
    """Question + lettered choices + answer instruction."""
    q = problem.get("question", "")
    choices = problem.get("choices", [])
    lines = [q] + [
        f"{OPTIONS[i]}. {c}" for i, c in enumerate(choices)
    ]
    prompt = "\n".join(lines) + "\nAnswer with the option's letter from the given choices directly."
    if include_image:
        prompt = "<image>\n" + prompt
    return prompt


def run_science_qa(
    model,
    problems: Dict[str, Dict],
    split_ids: Sequence[str],
    image_root: Optional[str] = None,
    *,
    size: int = 224,
    max_new_tokens: int = 8,
) -> Dict[str, float]:
    """Generate an answer per question and score (reference model_vqa_science.py
    generation loop + eval_science_qa.py scoring in one pass). Problems with
    an `image` field load `<image_root>/<qid>/<image>`; text-only problems
    run without pixels (a zero image keeps the adapter interface uniform)."""
    import jax.numpy as jnp
    import numpy as np

    predictions = {}
    for qid in split_ids:
        prob = problems[qid]
        has_image = bool(prob.get("image")) and image_root is not None
        if has_image:
            from PIL import Image

            from robustvlm_tpu.data.loaders import default_image_transform

            with Image.open(
                Path(image_root) / str(qid) / prob["image"]
            ) as img:
                x = jnp.asarray(default_image_transform(size)(img))[None]
        else:
            x = jnp.zeros((1, 3, size, size), jnp.float32)
        prompt_q = build_sqa_prompt(prob, include_image=has_image)
        text = model.get_outputs(
            x, [model.get_vqa_prompt(prompt_q.replace("<image>\n", ""), None)],
            max_new_tokens=max_new_tokens,
        )[0]
        predictions[qid] = {"text": text, "prompt": prompt_q}
    return eval_science_qa(predictions, problems, split_ids)


def main(argv=None):
    import argparse
    import json

    from robustvlm_tpu.vlm_eval.run_evaluation import (
        add_model_args,
        build_eval_model,
    )

    p = argparse.ArgumentParser(description="ScienceQA eval")
    add_model_args(p)
    p.add_argument("--problems", required=True, help="problems.json")
    p.add_argument("--split_file", default="", help="pid_splits.json")
    p.add_argument("--split", default="test")
    p.add_argument("--image_root", default="")
    p.add_argument("--max_new_tokens", type=int, default=8)
    p.add_argument("--image_size", type=int, default=224)
    args = p.parse_args(argv)

    problems = json.loads(Path(args.problems).read_text())
    if args.split_file:
        split_ids = json.loads(Path(args.split_file).read_text())[args.split]
    else:
        split_ids = list(problems)
    model = build_eval_model(args, "float")
    metrics = run_science_qa(
        model, problems, split_ids, args.image_root or None,
        size=args.image_size, max_new_tokens=args.max_new_tokens,
    )
    metrics = {k: v for k, v in metrics.items() if k != "results"}
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
