"""Platform forcing helpers.

The ambient axon TPU plugin ignores the ``JAX_PLATFORMS`` environment
variable, so scripts that need the virtual CPU mesh must override through
the config API *before* the backend initializes (``jax.devices()`` locks
it).  One helper, used by every script — instead of each rediscovering the
pitfall.
"""
from __future__ import annotations

import os


def force_cpu_devices(n: int = 8) -> None:
    """Force the CPU backend with ``n`` virtual devices.

    Must run before the first ``jax.devices()`` / computation; safe to call
    multiple times (subsequent calls are no-ops once the backend is up).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
