"""Test harness: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (SURVEY §4 item 4). Must run before jax is imported."""

import os

# Force CPU even if the ambient environment points JAX at a TPU platform
# (e.g. JAX_PLATFORMS=axon): tests must not occupy the real chip, and the
# virtual 8-device mesh only exists on the host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's startup hook pins jax_platforms to the TPU plugin even
# when JAX_PLATFORMS=cpu is exported, so force it via the config API (before
# any backend initializes).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# The CPU backend defaults to low-precision (bf16-like) matmuls; tests compare
# against float64/float32 numpy oracles, so pin full precision here. Production
# runs keep the fast default (bf16 MXU passes on TPU).
jax.config.update("jax_default_matmul_precision", "highest")
