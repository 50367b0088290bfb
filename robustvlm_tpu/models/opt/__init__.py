from robustvlm_tpu.models.opt.model import (
    OPT_CONFIGS,
    OPTConfig,
    init_opt_cache,
    init_opt_params,
    opt_forward,
)

__all__ = [
    "OPT_CONFIGS",
    "OPTConfig",
    "init_opt_cache",
    "init_opt_params",
    "opt_forward",
]
