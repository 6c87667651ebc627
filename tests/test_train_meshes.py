"""Training pipeline + display-mesh coverage tests (small and CPU-fast)."""
import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.cnn.model import init_params
from hand_tracking_samples_tpu.cnn.train import (compress_frame,
                                                 synthetic_training_set,
                                                 train_epoch, evaluate)
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from tests.conftest import DEFAULT_ANIMBANK


def test_compress_frame_centers_hand(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    depth = fake_depth(jnp.asarray(bank[0]), hand_model, cam)
    x, labels, pose_seg = jax.jit(
        lambda d, p: compress_frame(d, cam, p))(depth, jnp.asarray(bank[0]))
    assert x.shape == (64, 64)
    # the crop must contain foreground (inverse-depth > 0 pixels)
    assert float((np.array(x) > 0.3).mean()) > 0.05
    # labels are unit-volume heatmaps: each 256-chunk sums to ~1
    hm = np.array(labels)[:2048].reshape(8, 256)
    np.testing.assert_allclose(hm.sum(1), 1.0, atol=0.05)


def test_train_epoch_reduces_mse(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    data = synthetic_training_set(hand_model, bank, np.arange(0, 64) * 11,
                                  chunk=32)
    params = init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    before = evaluate(params, data)
    params, _ = train_epoch(params, data, rng, steps=30, batch_size=16)
    after = evaluate(params, data)
    assert after < before * 0.9, (before, after)


def test_augmented_set_differs(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    ids = np.arange(0, 8)
    a = synthetic_training_set(hand_model, bank, ids, chunk=8)
    b = synthetic_training_set(hand_model, bank, ids, chunk=8, augment=True)
    assert float(jnp.abs(a.inputs - b.inputs).mean()) > 0.005
    # augmented crops still contain the hand
    assert float((np.array(b.inputs) > 0.3).mean()) > 0.03


def test_display_meshes_and_obj(tmp_path, hand_model):
    from hand_tracking_samples_tpu.model.meshes import (export_obj,
                                                        load_display_meshes,
                                                        smooth_normals)
    from tests.conftest import MODEL_JSON
    meshes = load_display_meshes(MODEL_JSON)
    assert len(meshes) == 17
    n = smooth_normals(*meshes[0])
    assert np.abs(np.linalg.norm(n, axis=1) - 1).max() < 1e-4
    poses = np.asarray(hand_model.start_pose)
    p = str(tmp_path / "hand.obj")
    export_obj(p, meshes, poses)
    txt = open(p).read()
    assert txt.count("o bone_") == 17 and "f " in txt
