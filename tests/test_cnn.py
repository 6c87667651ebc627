import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.cnn.labels import (analyze_cnn_output,
                                                  gather_hand_expected,
                                                  hand_pose_to_key_angle_set,
                                                  image_feature_points)
from hand_tracking_samples_tpu.cnn.model import (forward, init_params,
                                                 load_cnnb, save_cnnb,
                                                 sgd_step)
from hand_tracking_samples_tpu.imaging.camera import DCamera
from tests.conftest import FIXTURES

CNNB = f"{FIXTURES}/golden_cnn_init.cnnb"


def test_forward_matches_reference(golden):
    params = load_cnnb(CNNB)
    x = jnp.asarray(np.array(golden["cnn_input"], np.float32)).reshape(1, 64, 64)
    y = jax.jit(forward)(params, x)[0]
    np.testing.assert_allclose(np.array(y), golden["cnn_output"], atol=1e-5)


def test_sgd_step_matches_reference(golden):
    params = load_cnnb(CNNB)
    x = jnp.asarray(np.array(golden["cnn_input"], np.float32)).reshape(1, 64, 64)
    t = np.zeros(2304, np.float32)
    for i in range(8):
        t[i * 256 + 37] = 1.0
    for i in range(16):
        t[2048 + i * 16 + 5] = 1.0
    params2, mse = jax.jit(sgd_step, static_argnames=())(
        params, x, jnp.asarray(t)[None], 0.001)
    assert abs(float(mse) - golden["cnn_train_mse"][0]) < 1e-6
    y2 = jax.jit(forward)(params2, x)[0]
    np.testing.assert_allclose(np.array(y2), golden["cnn_output_after_step"],
                               atol=1e-5)


def test_cnnb_roundtrip(tmp_path):
    params = init_params(jax.random.PRNGKey(0))
    p = str(tmp_path / "w.cnnb")
    save_cnnb(params, p)
    back = load_cnnb(p)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]["w"]),
                                      np.asarray(back[k]["w"]))


def test_labels_golden(golden):
    poses = jnp.asarray(np.array(golden["animbank_frame0"], np.float32))
    hcam = DCamera.make((16, 16))
    vals = hand_pose_to_key_angle_set(poses, jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]))
    np.testing.assert_allclose(np.array(vals), golden["key_angles_frame0"],
                               atol=1e-5)
    fp = image_feature_points(poses, hcam)
    np.testing.assert_allclose(np.array(fp).reshape(-1),
                               golden["feature_points_frame0"], atol=1e-3)
    exp, _, _ = jax.jit(gather_hand_expected)(poses, hcam)
    np.testing.assert_allclose(np.array(exp), golden["cnn_expected_frame0"],
                               atol=1e-5)


def test_analysis_decodes_labels():
    """Encoding a pose to labels then decoding must recover the landmarks."""
    import json
    with open(f"{FIXTURES}/golden.json") as f:
        g = json.load(f)
    poses = jnp.asarray(np.array(g["animbank_frame0"], np.float32))
    hcam = DCamera.make((16, 16))
    exp, fp, vals = gather_hand_expected(poses, hcam)
    analysis = analyze_cnn_output(exp, hcam)
    inside = (np.array(fp)[:, 0] > 0.5) & (np.array(fp)[:, 0] < 14.5) \
        & (np.array(fp)[:, 1] > 0.5) & (np.array(fp)[:, 1] < 14.5)
    err = np.abs(np.array(analysis.image_points) - np.array(fp))[inside]
    assert err.max() < 0.25  # quantised splat -> sub-pixel decode
    verr = np.abs(np.array(analysis.vals) - np.array(vals))
    assert verr.max() < 0.04
