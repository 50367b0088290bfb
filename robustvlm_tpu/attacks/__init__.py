from robustvlm_tpu.attacks.pgd import pgd_attack
from robustvlm_tpu.attacks.apgd import APGDResult, apgd_attack, apgd_decr_eps, apgd_restarts
from robustvlm_tpu.attacks.fab import FABResult, fab_attack
from robustvlm_tpu.attacks.square import (
    SquareResult,
    square_attack_l1,
    square_attack_l2,
    square_attack_linf,
)

__all__ = [
    "pgd_attack",
    "apgd_attack",
    "apgd_decr_eps",
    "apgd_restarts",
    "APGDResult",
    "fab_attack",
    "FABResult",
    "square_attack_linf",
    "square_attack_l2",
    "square_attack_l1",
    "SquareResult",
]
