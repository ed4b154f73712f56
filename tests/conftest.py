"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip logic (sharding, ring attention, FSDP rules) is exercised on
fake CPU devices per SURVEY.md §4's test strategy.
"""

import os

# NOTE: the ambient environment pins JAX_PLATFORMS to the TPU plugin and
# something re-appends it even when the env var is overridden — the config
# update below is the only reliable override.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA-CPU's default matmul uses an oneDNN bf16/AMX fastmath path; parity
# tests need true float32 numerics.
jax.config.update("jax_default_matmul_precision", "highest")
