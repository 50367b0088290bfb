"""Few-shot in-context evaluation protocol.

The reference prepends demonstration examples sampled from a train-split
query set to every eval prompt (vlm_eval/run_evaluation.py:764-791 —
`get_query_set`, `sample_batch_demos_from_query_set`,
`compute_effective_num_shots` — and the per-batch context assembly at
:946-970 / :1294-1337). Protocol facts this module reproduces:

- the query set is `query_set_size` examples drawn without replacement from
  the TRAIN split with the trial seed (:764-767);
- each eval item gets `effective_num_shots` demos; for OpenFlamingo the
  effective count is 2 even at 0 shots (:788-791) — the demos are then
  TEXT-ONLY: their `<image>` tags are stripped and no context frames are
  stacked (:965-967);
- at num_shots > 0 the demo images are stacked BEFORE the query image along
  the media-frame axis (:955-958), giving vision_x (B, shots+1, F, C, H, W);
- captioning demos teacher-force the demo's gt caption via
  `get_caption_prompt(caption)` (:960-962); VQA demos use the demo's FIRST
  annotator answer via `get_vqa_prompt(question, answers[0])` (:1311-1316).

Deviation (documented): the reference draws demos from Python's UNSEEDED
global `random` stream, re-sampling per attack stage — non-reproducible,
and it silently changes the context images under the ensemble's prev-best
warm start. Here demos are sampled ONCE per eval item from a
`random.Random(seed, item_index)` stream: runs are reproducible and the
warm-started final stage re-attacks the same stacked frames it was
initialized from.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import numpy as np


def compute_effective_num_shots(num_shots: int, model_type: str) -> int:
    """OpenFlamingo always gets at least 2 (text-only) demos (reference
    run_evaluation.py:788-791)."""
    if model_type == "open_flamingo":
        return num_shots if num_shots > 0 else 2
    return num_shots


def get_query_set(train_dataset, query_set_size: int, seed: int) -> List[Dict]:
    """Draw the demonstration pool from the train split (reference :764-767).
    `query_set_size` is clamped to the dataset size (the reference errors
    instead; tiny CI datasets make clamping the usable choice)."""
    n = min(query_set_size, len(train_dataset))
    idx = np.random.RandomState(seed).choice(len(train_dataset), n, replace=False)
    return [train_dataset[int(i)] for i in idx]


def sample_demos(
    query_set: Sequence[Dict], effective_num_shots: int, seed: int, item_index: int
) -> List[Dict]:
    """Demos for ONE eval item — `random.sample` like the reference (:784-785)
    but from a per-item seeded stream (see module deviation note)."""
    if effective_num_shots <= 0:
        return []
    r = random.Random(f"{seed}:{item_index}")
    return r.sample(list(query_set), min(effective_num_shots, len(query_set)))


def build_context_text(
    model, demos: Sequence[Dict], num_shots: int, task: str = "caption"
) -> str:
    """The in-context prefix for one item (reference :960-967 captioning,
    :1311-1322 VQA): demo prompts with their gt answers, `<image>` tags
    stripped in the zero-shot case."""
    if task == "caption":
        ctx = "".join(
            model.get_caption_prompt(d["caption"].strip()) for d in demos
        )
    else:
        if any(not d.get("answers") for d in demos):
            raise ValueError(
                "few-shot VQA demo without annotator answers — the demo "
                "pool must come from an ANNOTATED train split (pass the "
                "--<dataset>_train_questions/_train_annotations flags)"
            )
        ctx = "".join(
            model.get_vqa_prompt(d["question"], d["answers"][0])
            for d in demos
        )
    if num_shots == 0:
        ctx = ctx.replace("<image>", "")
    return ctx


class FewShotDataset:
    """Wrap an eval dataset so every item carries its in-context demos.

    Adds `item["demos"]` (the sampled demonstration dicts) and, when
    num_shots > 0, replaces `item["image"]` (C,H,W) with the stacked
    context+query frames (T=shots+1, F=1, C, H, W) — the layout the
    Flamingo adapters and `make_frame_mask` consume. The QUERY frame is
    last (reference :958 `context_images + [batch["image"][i]]`).
    """

    def __init__(
        self,
        base,
        query_set: Sequence[Dict],
        *,
        num_shots: int,
        effective_num_shots: Optional[int] = None,
        seed: int = 42,
    ):
        self.base = base
        self.query_set = list(query_set)
        self.num_shots = num_shots
        self.effective_num_shots = (
            num_shots if effective_num_shots is None else effective_num_shots
        )
        self.seed = seed

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int) -> Dict:
        item = dict(self.base[i])
        # never let an item demonstrate ITSELF: when the demo pool falls
        # back to the eval files (tiny CI fixtures; plain-COCO jsons), the
        # eval item could otherwise appear in its own context with its
        # ground truth teacher-forced — direct answer leakage. With a real
        # disjoint train pool this filter is a no-op.
        key = item.get("question_id", item.get("image_id"))
        pool = [
            d for d in self.query_set
            if d.get("question_id", d.get("image_id")) != key
        ]
        demos = sample_demos(pool, self.effective_num_shots, self.seed, i)
        item["demos"] = demos
        if (
            self.num_shots > 0 and demos
            and np.asarray(item["image"]).ndim == 3
        ):
            # ndim guard: TensorCaptionDataset may hand back an adv tensor
            # saved from a few-shot run that is ALREADY (T, F, C, H, W)
            frames = [np.asarray(d["image"]) for d in demos]
            frames.append(np.asarray(item["image"]))
            # (T, F=1, C, H, W): one frame per media slot
            item["image"] = np.stack(frames)[:, None]
        return item
