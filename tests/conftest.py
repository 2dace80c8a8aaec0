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

# Pin the repo's main.py as the canonical `main` module. The cross-framework
# parity tests (test_h5_import / test_reference_parity / test_trajectory, plus
# train/h5_import.py at call time) put /root/reference — which ships its OWN
# main.py — at sys.path[0], and pytest imports every collected test module
# before running the first test. Without this pre-import, an `import main`
# executed at test time (tests/test_compose.py) resolves to the reference's
# main.py whenever those modules were collected in the same run.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import main  # noqa: E402,F401
