from robustvlm_tpu.eval.classifier import (
    build_text_classifier,
    make_zero_shot_classifier,
)
from robustvlm_tpu.eval.autoattack import AutoAttackTPU
from robustvlm_tpu.eval.state import EvaluationState

__all__ = [
    "build_text_classifier",
    "make_zero_shot_classifier",
    "AutoAttackTPU",
    "EvaluationState",
]
