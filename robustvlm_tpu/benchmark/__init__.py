"""Zero-shot benchmark suite (reference CLIP_benchmark equivalent):
templates/classnames, classification + retrieval + linear-probe metrics,
dataset builders (incl. native tar-shard reader), models x datasets CLI."""

from robustvlm_tpu.benchmark.templates import (  # noqa: F401
    format_prompts,
    get_classnames,
    get_templates,
    imagenet_classnames,
)
from robustvlm_tpu.benchmark.zeroshot import (  # noqa: F401
    run_classification,
    zero_shot_classifier,
)
