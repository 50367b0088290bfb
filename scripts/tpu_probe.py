"""Bounded TPU-pool health probe.

`jax.devices()` on the axon tunnel blocks INDEFINITELY while the pool
claim is wedged (see CLAUDE.md) — this probe does the device touch in a
subprocess with a hard deadline and reports one JSON line:

    python scripts/tpu_probe.py [timeout_s=120]
    {"tpu_ok": true, "devices": 1, "probe_s": 4.2}
    {"tpu_ok": false, "error": "no device grant within 120s"}

Exit code 0 iff the chip answered. Run this BEFORE a bench or smoke run
so a wedged pool costs one bounded probe, not a hung session.
"""

import json
import subprocess
import sys
import time

_CHILD = (
    # sitecustomize imports jax before the env is consulted, so honor
    # JAX_PLATFORMS explicitly (e.g. JAX_PLATFORMS=cpu dry-probes locally)
    "import os, jax;"
    "p = os.environ.get('JAX_PLATFORMS');"
    "p and jax.config.update('jax_platforms', p);"
    "import jax.numpy as jnp;"
    "d = jax.devices();"
    "assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0;"
    "print(len(d))"
)


def main() -> int:
    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "tpu_ok": False,
            "error": f"no device grant within {timeout_s:.0f}s",
        }))
        return 1
    if out.returncode != 0:
        print(json.dumps({
            "tpu_ok": False,
            "error": (out.stderr or out.stdout).strip()[-300:],
        }))
        return 1
    print(json.dumps({
        "tpu_ok": True,
        "devices": int(out.stdout.strip().splitlines()[-1]),
        "probe_s": round(time.perf_counter() - t0, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
