from robustvlm_tpu.ops.pallas.attack_step import fused_linf_apgd_step

__all__ = ["fused_linf_apgd_step"]
