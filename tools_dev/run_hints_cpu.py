"""Run depth-hints precompute with jax pinned to CPU (the axon
sitecustomize overrides JAX_PLATFORMS env — see CLAUDE.md landmine #1 —
so the pin must happen via jax.config after import)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from wavelet_monodepth_tpu.tools import precompute_depth_hints  # noqa: E402

if __name__ == "__main__":
    precompute_depth_hints.main(sys.argv[1:])
