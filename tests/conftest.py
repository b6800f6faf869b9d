"""Test harness: run everything on a virtual 8-device CPU mesh.

The container boots with an `axon` TPU PJRT plugin pre-registered and
`jax_platforms` forced to "axon,cpu", so plain env vars are not enough —
we set XLA_FLAGS before backend init and then override the platform list
through jax.config. Real-TPU checks live in bench.py, not the unit suite.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
