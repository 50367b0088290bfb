from robustvlm_tpu.models.mpt.model import (  # noqa: F401
    MPT_CONFIGS,
    MPTConfig,
    alibi_slopes,
    init_mpt_cache,
    init_mpt_params,
    mpt_forward,
)
from robustvlm_tpu.models.mpt.import_torch import (  # noqa: F401
    import_mpt_state_dict,
    load_mpt_checkpoint,
)
