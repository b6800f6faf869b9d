"""StableHLO serving-artifact export round-trip.

The artifact must (a) serialize/deserialize, (b) reproduce the direct
forward bit-for-bit on the same platform, (c) carry the sparse op
counter through export. Tiny feed size keeps CPU compile fast.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelet_monodepth_tpu.tools import export_serving as es


def _args(tmp_path, **kw):
    base = dict(out=str(tmp_path / "art"), model_path=None,
                torch_model_path=None, num_layers=18, height=64,
                width=96, batch=1, use_sparse=False, threshold=0.1,
                bfloat16=False, verify=False)
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.mark.parametrize("sparse", [False, True])
def test_export_roundtrip_matches_direct(tmp_path, sparse):
    args = _args(tmp_path, use_sparse=sparse)
    exported, enc_vars, dec_vars = es.export_artifact(args)

    with open(args.out + ".stablehlo", "rb") as f:
        rebuilt = jax.export.deserialize(f.read())
    with open(args.out + ".json") as f:
        meta = json.load(f)
    assert meta["height"] == 64 and meta["dtype"] == "float32"
    assert meta["sparse_threshold"] == (0.1 if sparse else None)

    forward, _, _ = es.build(args)
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 96, 3),
                             jnp.float32)
    direct = forward(enc_vars, dec_vars, img)
    via_artifact = rebuilt.call(enc_vars, dec_vars, img)
    # the exported program recompiles standalone, so fusion order may
    # differ from the in-process jit at the last ulp — tight allclose,
    # not bit-equality
    if sparse:
        np.testing.assert_allclose(np.asarray(direct[0]),
                                   np.asarray(via_artifact[0]),
                                   atol=1e-5, rtol=0)
        ops_direct = np.asarray(direct[1]).reshape(-1)
        ops_artifact = np.asarray(via_artifact[1]).reshape(-1)
        np.testing.assert_array_equal(ops_direct, ops_artifact)
        assert (ops_direct > 0).all()
    else:
        np.testing.assert_allclose(np.asarray(direct),
                                   np.asarray(via_artifact),
                                   atol=1e-5, rtol=0)


def test_export_bf16_and_cli_verify(tmp_path):
    args = _args(tmp_path, bfloat16=True)
    es.main(["--out", args.out, "--height", "64", "--width", "96",
             "--bfloat16", "--verify"])
    assert os.path.exists(args.out + ".stablehlo")
    with open(args.out + ".json") as f:
        assert json.load(f)["dtype"] == "bfloat16"


def test_export_nyu_family(tmp_path):
    args = _args(tmp_path, use_sparse=True)
    ns = vars(args)
    ns.update(family="nyu", encoder_type="mobilenet_light")
    args = argparse.Namespace(**ns)
    exported, enc_vars, dec_vars = es.export_artifact(args)
    with open(args.out + ".stablehlo", "rb") as f:
        rebuilt = jax.export.deserialize(f.read())
    with open(args.out + ".json") as f:
        assert json.load(f)["model"] == "nyu_mobilenet_light_wavelet"
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 64, 96, 3),
                             jnp.float32)
    forward, _, _ = es.build(args)
    direct = forward(enc_vars, dec_vars, img)
    via = rebuilt.call(enc_vars, dec_vars, img)
    np.testing.assert_allclose(np.asarray(direct[0]), np.asarray(via[0]),
                               atol=1e-5, rtol=0)


def test_export_uint8_input(tmp_path):
    """--uint8_input artifact: takes uint8 images, matches the f32
    artifact fed the same pixels/255 exactly."""
    args = _args(tmp_path, uint8_input=True)
    exported, enc_vars, dec_vars = es.export_artifact(args)
    with open(args.out + ".json") as f:
        assert json.load(f)["input_dtype"] == "uint8"
    with open(args.out + ".stablehlo", "rb") as f:
        rebuilt = jax.export.deserialize(f.read())
    img_u8 = jax.random.randint(jax.random.PRNGKey(5), (1, 64, 96, 3),
                                0, 256, jnp.int32).astype(jnp.uint8)
    via = rebuilt.call(enc_vars, dec_vars, img_u8)
    forward, _, _ = es.build(_args(tmp_path))
    direct = forward(enc_vars, dec_vars,
                     img_u8.astype(jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(via),
                               atol=1e-5, rtol=0)
    es.verify_artifact(args.out, enc_vars, dec_vars, args)


def test_serve_artifact_end_to_end(tmp_path):
    """export --bundle_params -> serve_artifact runs the program with
    no model-building Python and writes <stem>_disp.npy matching the
    direct forward."""
    from PIL import Image
    from wavelet_monodepth_tpu.tools import serve_artifact as sa

    args = _args(tmp_path, uint8_input=True, bundle_params=True)
    exported, enc_vars, dec_vars = es.export_artifact(args)
    assert os.path.exists(args.out + ".params.msgpack")

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    arrs = []
    for i in range(3):   # batch=1 artifact + 3 images = tail handling
        a = rng.randint(0, 255, (64, 96, 3), np.uint8)
        arrs.append(a)
        Image.fromarray(a).save(img_dir / f"im_{i}.png")
    out_dir = tmp_path / "preds"
    sa.main(["--artifact", args.out, "--images", str(img_dir),
             "--out", str(out_dir)])

    forward, _, _ = es.build(_args(tmp_path))
    for i, a in enumerate(arrs):
        got = np.load(out_dir / f"im_{i}_disp.npy")
        want = np.asarray(forward(
            enc_vars, dec_vars,
            jnp.asarray(a[None], jnp.float32) / 255.0))[0, :, :, 0]
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_serve_artifact_sparse_tuple_output(tmp_path):
    """A sparse artifact returns (disp, total_ops); the runner must
    take the disp element."""
    from PIL import Image
    from wavelet_monodepth_tpu.tools import serve_artifact as sa

    args = _args(tmp_path, use_sparse=True, uint8_input=True,
                 bundle_params=True)
    es.export_artifact(args)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.random.RandomState(1).randint(
        0, 255, (64, 96, 3), np.uint8)).save(img_dir / "a.png")
    out_dir = tmp_path / "preds"
    sa.main(["--artifact", args.out, "--images", str(img_dir),
             "--out", str(out_dir)])
    disp = np.load(out_dir / "a_disp.npy")
    assert disp.shape == (64, 96) and np.isfinite(disp).all()
