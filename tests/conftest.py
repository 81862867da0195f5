"""Test configuration: run the suite on a virtual multi-device CPU mesh.

Real-TPU execution is exercised by bench.py; unit and golden tests run on
CPU with 8 virtual devices so the sharded code paths compile and execute
without TPU hardware.

Note: this environment preloads the 'axon' TPU plugin from sitecustomize.py
before conftest runs, so setting JAX_PLATFORMS in os.environ here is too
late — use jax.config.update instead (works until a backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
