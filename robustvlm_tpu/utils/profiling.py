"""Profiling and throughput telemetry.

The reference has wall-clock-only telemetry (SURVEY.md §5: epoch/ETA wandb
logs, attack cumulative timers). Here profiling is first-class:
- `trace(dir)` context manager captures a jax.profiler trace (view in
  TensorBoard / xprof) around any region;
- `annotate(name)` adds named TraceAnnotations so attack iterations and
  model sections are attributed inside the trace;
- `StepTimer` produces the attack-steps/sec/chip counters used by bench.py
  and the training loop, with device synchronization via scalar readback
  (remote-execution backends do not reliably block in block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (host + device annotation)."""
    return jax.profiler.TraceAnnotation(name)


def sync(tree) -> None:
    """Force completion of a device computation. Uses a scalar readback of
    the first leaf — unlike block_until_ready, this round-trips through the
    runtime even on remote-execution PJRT backends."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))


class StepTimer:
    """Throughput meter: per-example steps/sec/chip over a rolling window."""

    def __init__(self, batch_size: int, window: int = 50):
        self.batch_size = batch_size
        self.window = window
        self._t0: Optional[float] = None
        self._steps = 0
        self.rate = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1) -> Optional[float]:
        """Count n attack/train steps; returns the rate when a window
        completes (per-example steps/sec/chip), else None."""
        if self._t0 is None:
            self.start()
        self._steps += n
        if self._steps >= self.window:
            dt = time.perf_counter() - self._t0
            n_chips = max(jax.local_device_count(), 1)
            self.rate = self.batch_size * self._steps / dt / n_chips
            self.start()
            return self.rate
        return None
