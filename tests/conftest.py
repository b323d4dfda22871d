"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (the driver bench-runs on the real chip separately).

The axon environment's sitecustomize imports jax and registers the TPU
backend before conftest runs, so env vars alone are too late — override
the already-loaded jax config instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
