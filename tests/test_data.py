import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hand_tracking_samples_tpu.data.dataset import (DatasetInfo,
                                                    DatasetWriter, filter_ds4,
                                                    filter_ivy, load_dataset)


@pytest.fixture(scope="module")
def tiny_recording(tmp_path_factory):
    d = tmp_path_factory.mktemp("rec")
    rng = np.random.RandomState(0)
    depth = (rng.rand(4, 240, 320) * 4000).astype(np.uint16)
    pose = rng.rand(4, 17, 7).astype(np.float32)
    ir = (rng.rand(4, 240, 320) * 255).astype(np.uint8)
    base = str(d / "rec")
    with DatasetWriter(base) as w:
        w.save_frames(depth, pose, ir)
    return base, depth, pose, ir


def test_dataset_roundtrip(tiny_recording):
    base, depth, pose, ir = tiny_recording
    ds = load_dataset(base)
    np.testing.assert_array_equal(ds.depth, depth)
    np.testing.assert_allclose(ds.pose, pose, atol=1e-5)
    np.testing.assert_array_equal(ds.ir, ir)


def test_reference_fixture_header():
    info = DatasetInfo.from_json_dict(json.load(open(
        "/root/reference/datasets/example/hand_data_example.json")))
    assert info.dims == (320, 240)
    assert info.camtype == "ivycam"
    assert abs(info.depth_scale - 0.000124987) < 1e-9


def test_native_loader_matches_python(tiny_recording):
    base, depth, pose, ir = tiny_recording
    from hand_tracking_samples_tpu.native import StreamingLoader
    with StreamingLoader([base], batch=3) as ld:
        assert ld.total_frames == 4
        frames, poses = [], []
        for d, p, ids in ld:
            frames.append(d)
            poses.append(p)
    d = np.concatenate(frames)
    p = np.concatenate(poses)
    np.testing.assert_array_equal(d, depth)
    np.testing.assert_allclose(p, pose, atol=1e-5)


def test_filters():
    depth = np.full((240, 320), 0, np.uint16)
    out = filter_ivy(depth)
    assert (out == 4000).all()
    depth = np.full((240, 320), 500, np.uint16)
    ir = np.full((240, 320), 100, np.uint8)
    ir[10, 10] = 1  # dark pixel
    out = filter_ds4(depth, ir)
    assert out[10, 10] == 4096
    assert out[50, 50] == 500


def test_animbank_loader():
    from hand_tracking_samples_tpu.data.animbank import load_animbank
    bank = load_animbank(__import__("hand_tracking_samples_tpu.assets_paths", fromlist=["DEFAULT_ANIMBANK"]).DEFAULT_ANIMBANK)
    assert bank.shape[1:] == (17, 7)
    assert bank.shape[0] > 2000
    # quaternions are normalised poses
    qn = np.linalg.norm(bank[0, :, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


def test_six_stream_interop(tmp_path):
    """All six parallel files (.json/.rs/.ir/.pose/.rgb/.feye) plus the
    interleaved-`hasir` legacy layout roundtrip, gated against fixtures
    produced by loading the SAME (byte-reproducible) recordings through the
    reference's dataset.h (dataset.h:109-163; see tests/dataset_fixture.py)."""
    from dataset_fixture import write_fixture_recordings

    mix, legacy, (depth, ir, pose, rgb, feye) = write_fixture_recordings(
        str(tmp_path))

    ds = load_dataset(mix)
    np.testing.assert_array_equal(ds.depth, depth)
    np.testing.assert_array_equal(ds.ir, ir)
    np.testing.assert_allclose(ds.pose, pose, atol=1e-5)
    np.testing.assert_array_equal(ds.rgb, rgb)
    np.testing.assert_array_equal(ds.feye, feye)

    dl = load_dataset(legacy)
    np.testing.assert_array_equal(dl.depth, depth)
    np.testing.assert_array_equal(dl.ir, ir)
    assert dl.rgb is None and dl.feye is None

    # the reference's own reads of these exact bytes (GG_DATASET=1 golden)
    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    for name, d in (("dataset_ref_mix.json", ds),
                    ("dataset_ref_legacy.json", dl)):
        ref = json.load(open(os.path.join(fixdir, name)))
        assert ref["n_frames"] == len(d.depth)
        np.testing.assert_array_equal(
            ref["depth_sum"], d.depth.astype(np.int64).sum(axis=(1, 2)))
        np.testing.assert_array_equal(
            ref["ir_sum"], d.ir.astype(np.int64).sum(axis=(1, 2)))
        rgb_sum = (d.rgb.astype(np.int64).sum(axis=(1, 2, 3))
                   if d.rgb is not None else np.zeros(len(d.depth), np.int64))
        np.testing.assert_array_equal(ref["rgb_sum"], rgb_sum)
        feye_sum = (d.feye.astype(np.int64).sum(axis=(1, 2))
                    if d.feye is not None else np.zeros(len(d.depth), np.int64))
        np.testing.assert_array_equal(ref["feye_sum"], feye_sum)
        np.testing.assert_allclose(ref["pose1_x"], d.pose[:, 1, 0], atol=1e-5)
