"""Test configuration: run the suite on a virtual 8-device CPU platform.

Tests exercise the same XLA programs the TPU runs; sharding tests get an
8-device mesh via --xla_force_host_platform_device_count (the driver
separately dry-run-compiles the multi-chip path and benchmarks on real TPU).

Note: this environment force-registers the 'axon' TPU platform via
jax.config (overriding JAX_PLATFORMS env), so we must override through
jax.config as well — before any backend initialization.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
