from robustvlm_tpu.models.jaclip.model import (  # noqa: F401
    JACLIP_CONFIGS,
    BertTextConfig,
    JaCLIPConfig,
    bert_text_forward,
    build_ja_text_classifier,
    default_position_ids,
    get_ja_tokenizer,
    wrap_hf_ja_tokenizer,
    encode_image,
    encode_text,
    init_jaclip_params,
)
