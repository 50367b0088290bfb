"""Prompt templates and classname tables for zero-shot benchmarks.

Equivalent of the reference's template/classname data
(CLIP_eval/zeroshot-templates.json, CLIP_benchmark
clip_benchmark/datasets/en_classnames.json + per-dataset torchvision label
sets, open_flamingo/eval/classification_utils.py tables). The tables
themselves are public label/prompt data, shipped as JSON under
benchmark/data/.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

_DATA = Path(__file__).parent / "data"

STD_TEMPLATE = "This is a photo of a {c}"

# small standard label sets not covered by the JSON tables
_BUILTIN_CLASSNAMES: Dict[str, List[str]] = {
    "cifar10": [
        "airplane", "automobile", "bird", "cat", "deer",
        "dog", "frog", "horse", "ship", "truck",
    ],
    "cifar100": [
        "apple", "aquarium fish", "baby", "bear", "beaver", "bed", "bee",
        "beetle", "bicycle", "bottle", "bowl", "boy", "bridge", "bus",
        "butterfly", "camel", "can", "castle", "caterpillar", "cattle",
        "chair", "chimpanzee", "clock", "cloud", "cockroach", "couch", "crab",
        "crocodile", "cup", "dinosaur", "dolphin", "elephant", "flatfish",
        "forest", "fox", "girl", "hamster", "house", "kangaroo", "keyboard",
        "lamp", "lawn mower", "leopard", "lion", "lizard", "lobster", "man",
        "maple tree", "motorcycle", "mountain", "mouse", "mushroom",
        "oak tree", "orange", "orchid", "otter", "palm tree", "pear",
        "pickup truck", "pine tree", "plain", "plate", "poppy", "porcupine",
        "possum", "rabbit", "raccoon", "ray", "road", "rocket", "rose",
        "sea", "seal", "shark", "shrew", "skunk", "skyscraper", "snail",
        "snake", "spider", "squirrel", "streetcar", "sunflower",
        "sweet pepper", "table", "tank", "telephone", "television", "tiger",
        "tractor", "train", "trout", "tulip", "turtle", "wardrobe", "whale",
        "willow tree", "wolf", "woman", "worm",
    ],
    "stl10": [
        "airplane", "bird", "car", "cat", "deer",
        "dog", "horse", "monkey", "ship", "truck",
    ],
}


@functools.lru_cache()
def _load_json(name: str):
    return json.loads((_DATA / name).read_text())


def get_templates(dataset: str, language: str = "en") -> List[str]:
    """Per-dataset prompt-template ensemble (`{c}` is the classname slot);
    falls back to the imagenet1k 80-template set. Languages beyond en load
    the translated template tables (reference CLIP_benchmark multilingual
    data: ar/cn/it/jp)."""
    name = (
        "zeroshot_templates.json" if language == "en"
        else f"{language}_zeroshot_classification_templates.json"
    )
    tpl = _load_json(name)
    return tpl.get(dataset, tpl["imagenet1k"])


def get_classnames(dataset: str, language: str = "en") -> List[str]:
    if language != "en":
        cn = _load_json(f"{language}_classnames.json")
        if dataset in cn:
            return cn[dataset]
        raise KeyError(f"no {language} classname table for '{dataset}'")
    if dataset in _BUILTIN_CLASSNAMES:
        return _BUILTIN_CLASSNAMES[dataset]
    cn = _load_json("en_classnames.json")
    if dataset in cn:
        return cn[dataset]
    if dataset in ("imagenet", "imagenet1k", "imagenet-r", "imagenet-a", "imagenetv2"):
        return _load_json("imagenet_classnames.json")
    raise KeyError(f"no classname table for dataset '{dataset}'")


def imagenet_classnames() -> List[str]:
    """The 1000 CLIP-style ImageNet classnames (reference
    classification_utils.py IMAGENET_CLASSNAMES)."""
    return _load_json("imagenet_classnames.json")


def target_to_seed() -> Dict[str, int]:
    """Fixed seeds for the stealthy targeted caption attacks (reference
    classification_utils.py:1014-1034)."""
    return _load_json("target_to_seed.json")


def format_prompts(templates: Sequence[str], classname: str) -> List[str]:
    return [
        t.format(c=classname) if "{c}" in t else t.format(classname)
        for t in templates
    ]
