from robustvlm_tpu.models.flamingo.model import (  # noqa: F401
    FLAMINGO_CONFIGS,
    FlamingoConfig,
    encode_vision,
    flamingo_forward,
    flamingo_per_sample_loss,
    init_flamingo_params,
    make_flamingo_decode_fns,
    perceiver_resampler,
)
from robustvlm_tpu.models.flamingo.import_torch import (  # noqa: F401
    import_flamingo_checkpoint,
    load_flamingo_checkpoint,
)
