from robustvlm_tpu.attacks.pgd import pgd_attack
from robustvlm_tpu.attacks.apgd import APGDResult, apgd_attack

__all__ = ["pgd_attack", "apgd_attack", "APGDResult"]
