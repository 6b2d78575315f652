"""Test configuration.

Force the CPU backend with 8 virtual devices BEFORE any backend is
initialized, so sharding tests run without TPU hardware and the TPU-tunnel
startup cost is avoided. Note: in this environment ``JAX_PLATFORMS=axon``
is preset and the env var alone does NOT win — the config keys do.
"""

import os

if os.environ.get("SASSY_TESTS_TPU") == "1":
    # hardware lane: `SASSY_TESTS_TPU=1 pytest -m tpu` runs the real-TPU
    # conformance tests (tests/test_tpu_hardware.py) on the actual chip
    import jax  # noqa: F401
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("SASSY_PALLAS_INTERPRET", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
