from robustvlm_tpu.models.blip2.model import (
    BLIP2_CONFIGS,
    Blip2Config,
    blip2_forward,
    blip2_image_features,
    blip2_per_sample_loss,
    blip2_vision_forward,
    init_blip2_params,
    qformer_forward,
)

__all__ = [
    "BLIP2_CONFIGS",
    "Blip2Config",
    "blip2_forward",
    "blip2_image_features",
    "blip2_per_sample_loss",
    "blip2_vision_forward",
    "init_blip2_params",
    "qformer_forward",
]
