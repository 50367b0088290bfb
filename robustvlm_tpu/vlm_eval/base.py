"""Eval-model adapter contract.

Equivalent of reference open_flamingo/eval/eval_model.py (BaseEvalModel,
:8-73): the interface every VLM threat-model adapter satisfies so the
attack/ensemble/serving layers stay model-agnostic. Distributed init is a
mesh concern here (parallel/mesh.py), not a per-model hook.
"""

from __future__ import annotations

from typing import List, Optional, Protocol, Sequence, runtime_checkable

import jax


@runtime_checkable
class BaseEvalModel(Protocol):
    """Contract (duck-typed; see vlm_eval/eval_models.py implementations):

    - prompts: get_caption_prompt(caption|None), get_vqa_prompt(q, a|None)
    - set_inputs(full_prompts): cache tokenized teacher-forcing targets
    - __call__(x01) -> (B,) per-sample loss on the cached targets, pixels
      unnormalized in [0,1] (normalization inside — threat-model contract)
    - get_outputs(x01, prompts, ...) -> generated strings
    """

    def get_caption_prompt(self, caption: Optional[str] = None) -> str: ...

    def get_vqa_prompt(self, question: str, answer: Optional[str] = None) -> str: ...

    def set_inputs(self, full_prompts: Sequence[str]) -> None: ...

    def __call__(self, x01: jax.Array) -> jax.Array: ...

    def get_outputs(self, x01: jax.Array, prompts: Sequence[str],
                    **kw) -> List[str]: ...
