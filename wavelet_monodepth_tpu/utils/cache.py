"""Persistent XLA compile cache opt-in.

Remote Mosaic/XLA compiles on the relay-attached TPU take 1-5 minutes
per program (PERF.md landmine #5); the persistent cache makes every
relaunch of the same program (e.g. an --auto_resume restart after a
preemption, or a repeated bench window) near-instant. Keyed by
HLO+platform, so it is a correctness no-op; harmless if the backend
plugin declines executable serialization.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache() -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser(
                os.environ.get("WMD_JAX_CACHE", "~/.cache/wmd_jax_cache")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # older jax without these flags: run uncached
        pass
