"""Multi-host wiring test: two REAL processes (jax.distributed over
localhost, gloo CPU collectives) shard a split list, assemble one
global batch from per-process local rows, and run the full KITTI train
step in lockstep — the exact path the train CLIs take on a TPU pod
(SURVEY §2.3 "DCN only for multi-host input pipelines"). The parent
then re-runs the same two steps single-process on the same global batch
and checks the losses agree, proving the assembled global batch IS the
single-process batch and the gradient psum spans both processes."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp, mode: str):
    port, nproc = _free_port(), 2
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO)
    procs, outs = [], []
    for pid in range(nproc):
        out = str(tmp / f"out{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port), out,
             mode],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    return _run_workers(tmp_path_factory.mktemp("mh"), "kitti")


@pytest.fixture(scope="module")
def nyu_worker_results(tmp_path_factory):
    return _run_workers(tmp_path_factory.mktemp("mh_nyu"), "nyu")


def test_two_processes_assemble_global_batch_and_step(worker_results):
    r0, r1 = sorted(worker_results, key=lambda r: r["pid"])

    # split sharding: disjoint, interleaved, union == full list
    full = [f"item{i:02d}" for i in range(11)]
    assert r0["shard"] == full[0::2]
    assert r1["shard"] == full[1::2]
    assert sorted(r0["shard"] + r1["shard"]) == sorted(full)

    # each process saw 2 local + 2 remote devices and a batch whose
    # GLOBAL leading dim is the full batch_size=4 (2 local rows each)
    assert r0["n_devices"] == r1["n_devices"] == 4
    assert r0["global_batch_dim"] == r1["global_batch_dim"] == 4

    # lockstep: identical losses and identical updated params
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert r0["fingerprint"] == pytest.approx(r1["fingerprint"], rel=1e-6)


def test_multihost_helpers_and_collective_checkpoint(worker_results):
    """multihost_setup rejects partial data meshes, agreement probes
    pass, and the orbax save/restore ran COLLECTIVELY on both processes
    (every process calls it — rank-0-only gating would deadlock) with
    the restored params matching the saved ones."""
    r0, r1 = sorted(worker_results, key=lambda r: r["pid"])
    assert r0["bad_axis_rejected"] and r1["bad_axis_rejected"]
    for r in (r0, r1):
        assert r["orbax_fingerprint"] == pytest.approx(r["fingerprint"],
                                                       rel=1e-6)


def test_multihost_setup_single_process_passthrough():
    """Single-process: batch and data_axis pass through unchanged (a
    partial mesh on one host is legitimate)."""
    from wavelet_monodepth_tpu.parallel import mesh as mesh_lib
    local_batch, axis = mesh_lib.multihost_setup(12, 2)
    assert (local_batch, axis) == (12, 2)
    # batch must divide across the data mesh — clean SystemExit at the
    # CLI, not a sharding error deep inside the prefetch thread
    with pytest.raises(SystemExit):
        mesh_lib.multihost_setup(7, 2)
    assert mesh_lib.agree_across_processes(7, "probe") == 7


def test_multihost_losses_match_single_process(worker_results):
    """The 2-process run must compute the same steps as one process on
    the same global batch — same losses within f32 reduction noise."""
    from wavelet_monodepth_tpu.train.kitti import (KittiTrainSetup,
                                                   synthetic_batch)
    from wavelet_monodepth_tpu.utils.config import KittiOptions
    opts = KittiOptions(use_stereo=True, frame_ids=(0,), use_wavelets=True,
                        height=64, width=96, scales=(0, 1, 2, 3),
                        loss_scales=(0, 1, 2, 3), num_layers=18,
                        batch_size=4)
    setup = KittiTrainSetup(opts, steps_per_epoch=10)
    state = setup.init_state(jax.random.PRNGKey(0))
    batch = synthetic_batch(opts, opts.batch_size)
    step_fn = setup.jit_train_step()
    ref_losses = []
    for i in range(2):
        state, losses = step_fn(state, batch, jax.random.PRNGKey(i))
        ref_losses.append(float(losses["loss"]))

    for r in worker_results:
        np.testing.assert_allclose(r["losses"], ref_losses, rtol=2e-4)


def test_nyu_two_processes_lockstep_and_checkpoint(nyu_worker_results):
    """train_nyu.py's multi-host path (`train_nyu.py:41-43,57-69,154-162`):
    pair-list process_shard is disjoint/interleaved, the assembled global
    batch has the full batch dim, both processes compute identical losses
    and params, and the collective orbax checkpoint round-trips."""
    r0, r1 = sorted(nyu_worker_results, key=lambda r: r["pid"])

    pairs = [[f"rgb_{i:02d}.png", f"depth_{i:02d}.png"] for i in range(11)]
    assert r0["shard"] == pairs[0::2]
    assert r1["shard"] == pairs[1::2]

    assert r0["n_devices"] == r1["n_devices"] == 4
    assert r0["global_batch_dim"] == r1["global_batch_dim"] == 4
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    assert r0["fingerprint"] == pytest.approx(r1["fingerprint"], rel=1e-6)
    for r in (r0, r1):
        assert r["orbax_fingerprint"] == pytest.approx(r["fingerprint"],
                                                       rel=1e-6)


def test_nyu_multihost_losses_match_single_process(nyu_worker_results):
    """The 2-process NYU run equals one process on the same global batch."""
    from wavelet_monodepth_tpu.train.nyu import NyuTrainSetup
    from wavelet_monodepth_tpu.utils.config import NyuOptions
    opts = NyuOptions(encoder_type="mobilenet_light", use_wavelets=True,
                      batch_size=4)
    setup = NyuTrainSetup(opts)
    setup.input_hw = (64, 96)
    setup.depth_hw = (32, 48)
    state = setup.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = rng.rand(4, 64, 96, 3).astype(np.float32)
    depth = (rng.rand(4, 32, 48, 1) * 990 + 10).astype(np.float32)
    step_fn = setup.jit_train_step()
    ref_losses = []
    for _ in range(2):
        state, losses = step_fn(state, image, depth)
        ref_losses.append(float(losses["loss"]))

    for r in nyu_worker_results:
        np.testing.assert_allclose(r["losses"], ref_losses, rtol=2e-4)
