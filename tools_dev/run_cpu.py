"""Run a wavelet_monodepth_tpu CLI module with jax pinned to CPU.

The axon sitecustomize force-registers the remote TPU plugin and
overrides JAX_PLATFORMS env (CLAUDE.md landmine #1), so CPU-only smoke
runs must pin the platform via jax.config after import.

Usage: python tools_dev/run_cpu.py <module-suffix> [args...]
e.g.   python tools_dev/run_cpu.py tools.train_kitti --data_path ...
"""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    mod = importlib.import_module(
        f"wavelet_monodepth_tpu.{sys.argv[1]}")
    mod.main(sys.argv[2:])
