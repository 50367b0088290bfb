"""Multi-host (multi-process) evaluation utilities.

Equivalent of the reference's DDP eval plumbing — `init_distributed`
(open_flamingo/eval/eval_model.py:20-22) and the
`torch.distributed.all_gather_object` results merge
(vlm_eval/run_evaluation.py:1766-1775) — expressed the JAX way: each
process owns a contiguous slice of the dataset chosen by
`jax.process_index()`, computes its local results on its addressable
devices, and the merge is a `multihost_utils.process_allgather` over
host arrays (which rides DCN between hosts; no NCCL/process-group code).

Single-process runs degrade to the identity, so the same eval driver code
runs everywhere.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import numpy as np


def process_shard_bounds(
    n: int, process_index: int | None = None, process_count: int | None = None
) -> tuple:
    """[start, stop) of this process's contiguous dataset slice. The first
    `n % P` processes take one extra example (every example is covered
    exactly once, matching the reference's DistributedSampler-free manual
    chunking semantics)."""
    p = jax.process_count() if process_count is None else process_count
    i = jax.process_index() if process_index is None else process_index
    if not 0 <= i < p:
        raise ValueError(f"process_index {i} not in [0, {p})")
    base, extra = divmod(n, p)
    start = i * base + min(i, extra)
    stop = start + base + (1 if i < extra else 0)
    return start, stop


def process_shard_indices(
    n: int, process_index: int | None = None, process_count: int | None = None
) -> np.ndarray:
    start, stop = process_shard_bounds(n, process_index, process_count)
    return np.arange(start, stop)


def all_gather_results(local: Dict) -> List[Dict]:
    """Merge per-process result dicts into the full list on every process
    (the reference's all_gather_object). Values must be JSON-like host
    data; arrays are converted to lists."""
    import json

    def clean(v):
        if isinstance(v, (np.ndarray, np.generic)):
            return np.asarray(v).tolist()
        return v

    payload = json.dumps({k: clean(v) for k, v in local.items()})
    if jax.process_count() == 1:
        # identical serialization round-trip as the multi-process path, so
        # callers see one consistent value shape everywhere
        return [json.loads(payload)]
    from jax.experimental import multihost_utils

    buf = np.frombuffer(payload.encode("utf-8"), dtype=np.uint8)
    # pad to the global max length so allgather sees one static shape
    n = np.asarray([buf.size], np.int32)
    all_n = multihost_utils.process_allgather(n)
    m = int(all_n.max())
    padded = np.zeros((m,), np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(padded)
    lens = np.asarray(all_n).reshape(-1)
    return [
        json.loads(bytes(gathered[i, : lens[i]]).decode("utf-8"))
        for i in range(gathered.shape[0])
    ]


def merge_metric_means(locals_: Sequence[Dict[str, float]],
                       counts: Sequence[int]) -> Dict[str, float]:
    """Count-weighted mean of per-process metric dicts (the reference
    averages gathered per-rank scores, run_evaluation.py:1770-1775)."""
    total = sum(counts)
    out: Dict[str, float] = {}
    for key in locals_[0]:
        out[key] = float(
            sum(d[key] * c for d, c in zip(locals_, counts)) / max(total, 1)
        )
    return out
