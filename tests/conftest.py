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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_state():
    """Drop accumulated executables at every test-module boundary.

    A single full-lane process compiles hundreds of XLA CPU programs
    across ~25 modules; with all of them live, the CPU client's JIT
    eventually segfaults inside backend_compile (observed repeatedly at
    tests/test_sharded.py after ~180 prior tests, while the same module
    is green in a fresh process). Clearing the jit caches and the
    framework's executable memos bounds live-program count; modules
    recompile what they need."""
    yield
    import jax

    from sassy_tpu.ops import batch as _b, myers_pallas as _mp

    _b._BATCH_JIT.clear()
    _b._SCALAR_MEMO.clear()
    _mp._CACHE.clear()
    _mp._WARMED.clear()
    jax.clear_caches()
