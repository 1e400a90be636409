"""Test configuration: run everything on a simulated 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The session environment presets JAX_PLATFORMS=axon (the TPU tunnel) and a
# plugin re-appends it even if the env var is overwritten, so force the
# platform through jax.config. Tests must run on the simulated CPU mesh
# unless explicitly opted out with FIR_TEST_TPU=1.
if os.environ.get("FIR_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
