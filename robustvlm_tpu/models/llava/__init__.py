from robustvlm_tpu.models.llava.model import (  # noqa: F401
    LLAVA_CONFIGS,
    LlavaConfig,
    encode_images,
    init_llava_params,
    llava_forward,
    llava_per_sample_loss,
    make_llava_decode_fns,
)
from robustvlm_tpu.models.llava.import_torch import (  # noqa: F401
    import_llava_state_dict,
    load_llava_checkpoint,
)
