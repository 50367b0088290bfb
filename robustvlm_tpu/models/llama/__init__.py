from robustvlm_tpu.models.llama.model import (  # noqa: F401
    LLAMA_CONFIGS,
    LlamaConfig,
    init_cache,
    init_llama_params,
    llama_forward,
)
from robustvlm_tpu.models.llama.import_torch import (  # noqa: F401
    import_llama_state_dict,
    load_llama_checkpoint,
)
