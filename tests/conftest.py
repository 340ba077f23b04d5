"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: multi-host testing without a cluster via
--xla_force_host_platform_device_count. Note: the environment's
sitecustomize imports jax at interpreter startup (to register the TPU
plugin), so env vars alone are too late — we must also flip the platform
via jax.config before the backend initializes.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect an 8-device virtual mesh"
