"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are exercised on a fake 8-device CPU mesh
(XLA --xla_force_host_platform_device_count), per the test strategy in
SURVEY.md §4. Must run before jax initializes its backends.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the remote TPU
# tunnel), which must not be used for the test suite. The axon sitecustomize
# imports jax at interpreter startup, so the env var is already baked into
# jax.config — override via config.update, not os.environ.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# JAX's default matmul precision truncates to bf16 passes even on CPU; parity
# tests against torch f32 oracles need true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
