"""Test config: force JAX onto an 8-device virtual CPU mesh (SURVEY.md §5.4).

The axon TPU plugin on this machine ignores the JAX_PLATFORMS env var, so
use the config API (must run before first backend use, hence module level
here).  Real-TPU runs (bench.py) import jax without this conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
