"""Test configuration: run the suite on a virtual 8-device CPU platform.

Tests exercise the same XLA programs the TPU runs; sharding tests get an
8-device mesh via --xla_force_host_platform_device_count (the driver
separately dry-run-compiles the multi-chip path and benchmarks on real TPU).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
