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
