"""Multi-chip code paths on the 8-device CPU mesh (conftest forces it).

VERDICT r1 item 7: sharded tracking must equal unsharded numerics, and the
data-parallel CNN train step must equal the single-device step.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.parallel.mesh import make_dp_train_step, make_mesh
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       sharded_track_sequences,
                                                       track_sequences)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig


def test_sharded_tracking_matches_unsharded(hand_model):
    assert len(jax.devices()) == 8
    bank = load_animbank(DEFAULT_ANIMBANK)
    cam = synth_camera()
    T, F = 8, 2
    ids = (np.arange(T)[None, :] * 29 + np.arange(F)[:, None]) % len(bank)
    poses = jnp.asarray(bank[ids])                      # (F, T, 17, 7)
    render = jax.jit(jax.vmap(jax.vmap(lambda p: fake_depth(p, hand_model, cam))))
    depths = render(poses)

    config = TrackerConfig(point_budget=256, cnn_every_frame=False,
                           cloud_rows_per_body=32, physics_iterations=4,
                           physics_iterations_post=2, solver="colored")
    states = batched_tracker_state(hand_model, T)
    states = states._replace(body=states.body._replace(pose=poses[0]))

    st_u, poses_u = jax.jit(lambda s, d: track_sequences(
        s, hand_model, None, d, cam, config))(states, depths)

    mesh = make_mesh("tracks")
    st_s, poses_s = sharded_track_sequences(mesh, states, hand_model, None,
                                            depths, cam, config)

    np.testing.assert_allclose(np.asarray(poses_u), np.asarray(poses_s),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_u.body.pose),
                               np.asarray(st_s.body.pose), atol=2e-5)


def test_dp_train_step_matches_single_device():
    from hand_tracking_samples_tpu.cnn.model import init_params, sgd_step
    assert len(jax.devices()) == 8
    rng = np.random.RandomState(0)
    params = init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(8, 64, 64).astype(np.float32))
    t = jnp.asarray(rng.rand(8, 2304).astype(np.float32))

    p_single, mse_single = jax.jit(sgd_step, static_argnums=3)(params, x, t, 1e-3)

    mesh = make_mesh("data")
    step = make_dp_train_step(mesh, 1e-3)
    p_dp, mse_dp = step(params, x, t)

    np.testing.assert_allclose(float(mse_single), float(mse_dp), atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
