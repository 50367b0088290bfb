"""VLM adversarial evaluation harness (reference vlm_eval/ +
open_flamingo/eval/ equivalents): eval-model adapters, ensemble attack
schedule with worst-case selection, CIDEr-D / VQA-accuracy metrics,
caption/VQA datasets, run_evaluation CLI."""
