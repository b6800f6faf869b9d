"""sparsity_sweep: the score-vs-latency curve artifact runs end-to-end
(slope-measured latency, threshold + edge-mask families, synthetic
training) and plot_sparsity_curve renders its JSON."""

import json
import os

import numpy as np


def test_density_and_mask_count_exact_in_bf16():
    """Counting masks must accumulate in f32: a bf16 mask summed in its
    own dtype rounds integer counts past 256 (the committed round-4
    artifact briefly reported density 1.0078 > 1)."""
    import jax.numpy as jnp

    from wavelet_monodepth_tpu.ops.sparse import (compute_density,
                                                  mask_count)
    m = jnp.ones((1, 96, 160, 1), jnp.bfloat16)          # 15360 sites
    assert float(mask_count(m)[0]) == 96 * 160
    assert float(compute_density({("wavelet_mask", 0): m})) == 1.0


def test_sweep_and_plot_end_to_end(tmp_path):
    from wavelet_monodepth_tpu.tools.sparsity_sweep import main as sweep
    out = str(tmp_path / "curve.json")
    result = sweep(["--height", "64", "--width", "96", "--batch", "1",
                    "--thresholds", "-1", "--densities", "0.1",
                    "--train_steps", "1", "--k", "1", "2",
                    "--weights", "random", "synthetic", "--out", out])

    assert os.path.exists(out)
    with open(out) as f:
        data = json.load(f)
    assert data["meta"]["measurement"].startswith("slope")
    rows = data["rows"]
    # per weight source: dense + 1 threshold + 1 edge row
    assert len(rows) == 6
    by = {(r["weights"], r["mask_family"], r.get("threshold")): r
          for r in rows}

    for src in ("random", "synthetic"):
        dense = by[(src, "dense", None)]
        assert dense["density"] == 1.0 and dense["gflops"] > 0
        assert np.isfinite(dense["abs_rel_vs_gt"])

        t = by[(src, "threshold", -1)]
        # thresh=-1 is the bit-equal dense oracle
        assert t["disp_mae_vs_dense"] == 0.0
        assert t["density"] == 1.0
        assert t["ms_per_image"] > 0

        edge = [r for r in rows if r["weights"] == src
                and r["mask_family"] == "edge"][0]
        assert abs(edge["density"] - 0.1) < 0.02
        assert edge["gflops"] < t["gflops"]

    assert result["rows"] == rows

    from wavelet_monodepth_tpu.tools.plot_sparsity_curve import main as plot
    png = str(tmp_path / "curve.png")
    plot([out, "--out", png])
    assert os.path.getsize(png) > 10_000


def test_nyu_sweep_runs(tmp_path):
    """--dataset nyu sweeps DecoderWave (the NYUv2 notebook's axis);
    edge-mask family is KITTI-only and silently skipped."""
    from wavelet_monodepth_tpu.tools.sparsity_sweep import main as sweep
    out = str(tmp_path / "nyu.json")
    res = sweep(["--dataset", "nyu", "--encoder_type", "mobilenet_light",
                 "--height", "64", "--width", "96", "--batch", "1",
                 "--thresholds", "-1", "0.1", "--train_steps", "1",
                 "--k", "1", "2", "--weights", "random", "--out", out])
    rows = res["rows"]
    assert [r["mask_family"] for r in rows] == ["dense", "threshold",
                                                "threshold"]
    t = [r for r in rows if r["threshold"] == -1][0]
    assert t["disp_mae_vs_dense"] == 0.0 and t["density"] == 1.0
    assert res["meta"]["model"] == "mobilenet_light + NYU DecoderWave"
