"""Test configuration.

Force the CPU backend with 8 virtual devices BEFORE jax is imported anywhere,
so sharding tests run without TPU hardware and TPU-tunnel startup cost is
avoided.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
