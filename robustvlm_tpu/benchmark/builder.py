"""Dataset builders for the benchmark suite.

Equivalent of reference CLIP_benchmark/clip_benchmark/datasets/builder.py:
`build_dataset` dispatch (:20) including the webdataset branch (:616-715).
The reference streams HF-hub tar shards via the `webdataset` package; here
the shard reader is implemented natively on `tarfile` (no external dep):
sequential tar streaming groups same-basename entries into samples
({'jpg','cls','txt','json'}), decoded on host threads — the same
storage format, a TPU-friendly double-buffered pipeline.
"""

from __future__ import annotations

import io
import json
import tarfile
from pathlib import Path
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from robustvlm_tpu.data.loaders import (
    DataLoader,
    ImageFolderDataset,
    SyntheticClassificationDataset,
    default_image_transform,
    load_cifar10,
)

IMG_KEYS = ("jpg", "jpeg", "png", "webp", "bmp")


def _decode_image(data: bytes, transform) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        return transform(img)


class WdsShardDataset:
    """Iterable webdataset-format reader over local .tar shards.

    Each sample is the group of tar members sharing a basename; emits
    (image [0,1] NCHW float32, label-or-caption). Class label comes from a
    'cls' member, caption from 'txt'/'json' (reference build_wds_dataset
    :616-715 semantics, minus remote streaming).
    """

    def __init__(
        self,
        shards: Sequence[str],
        size: int = 224,
        transform: Optional[Callable] = None,
        mode: str = "classification",  # or "captions"
    ):
        self.shards = [str(s) for s in shards]
        self.transform = transform or default_image_transform(size)
        self.mode = mode

    def __iter__(self) -> Iterator[Tuple[np.ndarray, object]]:
        for shard in self.shards:
            with tarfile.open(shard, "r|*") as tf:
                current_key: Optional[str] = None
                parts: Dict[str, bytes] = {}
                for member in tf:
                    if not member.isfile():
                        continue
                    name = Path(member.name)
                    key, ext = str(name.parent / name.stem), name.suffix[1:].lower()
                    if current_key is not None and key != current_key and parts:
                        s = self._emit(parts)
                        if s is not None:
                            yield s
                        parts = {}
                    current_key = key
                    parts[ext] = tf.extractfile(member).read()
                if parts:
                    s = self._emit(parts)
                    if s is not None:
                        yield s

    def _emit(self, parts: Dict[str, bytes]):
        img_data = next(
            (parts[k] for k in IMG_KEYS if k in parts), None
        )
        if img_data is None:
            return None
        x = _decode_image(img_data, self.transform)
        if self.mode == "classification":
            if "cls" not in parts:
                return None
            return x, int(parts["cls"].decode().strip())
        caption = None
        if "txt" in parts:
            caption = parts["txt"].decode()
        elif "json" in parts:
            j = json.loads(parts["json"])
            caption = j.get("caption") or j.get("text")
        return x, caption


class WdsBatchedLoader:
    """Batch an iterable WdsShardDataset (classification mode)."""

    def __init__(self, ds: WdsShardDataset, batch_size: int):
        self.ds = ds
        self.bs = batch_size

    def __iter__(self):
        xs: List[np.ndarray] = []
        ys: List[int] = []
        for x, y in self.ds:
            xs.append(x)
            ys.append(y)
            if len(xs) == self.bs:
                yield np.stack(xs), np.asarray(ys, np.int64)
                xs, ys = [], []
        if xs:
            yield np.stack(xs), np.asarray(ys, np.int64)


def build_dataset(
    name: str,
    root: str,
    *,
    split: str = "test",
    size: int = 224,
    batch_size: int = 128,
    n_samples: Optional[int] = None,
):
    """Dispatch by dataset name -> batched (x, y) iterator.

    Supported: 'cifar10' (local python batches), 'imagenet'/'imagefolder'
    (class-per-dir tree), 'wds/<anything>' (local tar shards under root),
    'synthetic' (tests/benches).
    """
    if name == "cifar10":
        x, y = load_cifar10(root, train=(split == "train"), n_examples=n_samples)
        def gen():
            for i in range(0, len(x), batch_size):
                yield x[i : i + batch_size], y[i : i + batch_size]
        return gen()
    if name in ("imagenet", "imagefolder", "imagenet1k"):
        sub = {"test": "val", "train": "train"}.get(split, split)
        ds = ImageFolderDataset(f"{root}/{sub}", size=size)
        return DataLoader(ds, batch_size, shuffle=False, drop_last=False)
    if name.startswith("wds/"):
        shards = sorted(Path(root).glob("*.tar"))
        if not shards:
            raise FileNotFoundError(f"no .tar shards under {root}")
        return WdsBatchedLoader(
            WdsShardDataset(shards, size=size), batch_size
        )
    if name == "synthetic":
        ds = SyntheticClassificationDataset(
            n=n_samples or 256, size=size
        )
        return DataLoader(ds, batch_size, shuffle=False, drop_last=False)
    raise ValueError(f"unknown dataset: {name}")
