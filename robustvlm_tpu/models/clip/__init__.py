from robustvlm_tpu.models.clip.model import (
    CLIPConfig,
    CLIP_CONFIGS,
    TransformerConfig,
    encode_image,
    encode_text,
    init_clip_params,
    vision_forward,
)
from robustvlm_tpu.models.clip.import_torch import (
    export_visual_state_dict,
    import_clip_state_dict,
    import_visual_state_dict,
    load_clip_checkpoint,
)

__all__ = [
    "CLIPConfig",
    "CLIP_CONFIGS",
    "TransformerConfig",
    "encode_image",
    "encode_text",
    "init_clip_params",
    "vision_forward",
    "import_clip_state_dict",
    "import_visual_state_dict",
    "export_visual_state_dict",
    "load_clip_checkpoint",
]
