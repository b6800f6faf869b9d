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

# Persistent compilation cache: the suite is dominated by recompiles of
# identical tiny programs across runs on this 1-CPU box. Keyed by HLO
# hash, so staleness is impossible by construction; -1 min_entry_size
# caches everything, min_compile_time 0 includes fast compiles too.
_cache_dir = os.environ.get(
    "WMD_JAX_CACHE", os.path.expanduser("~/.cache/wmd_jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
