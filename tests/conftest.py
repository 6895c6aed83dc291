"""Test configuration: run on CPU with 8 virtual devices.

Kernels run in Pallas interpret mode on CPU (the flash_attn_tpu ops detect
the backend); sharding tests use the 8-device virtual mesh. Real-TPU runs
happen through bench.py / the driver, not pytest.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we force
the platform through jax.config before any test imports jax arrays.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("FLASH_ATTN_TPU_TEST_REAL", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
