"""The VMEM-resident PGS kernel must match the colored/sequential solvers.

On CPU the kernel runs in Pallas interpret mode (physics/pgs_kernel._interpret),
so iteration counts are kept small; the compiled TPU path is exercised by
bench.py (BENCH_SOLVER=kernel) and was validated against colored at 16+4
iterations (max position delta 2e-6 m).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.data.synth import fake_depth, synth_camera
from hand_tracking_samples_tpu.parallel.tracks import (batched_tracker_state,
                                                       batched_update)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import physics_params
from tests.conftest import quat_err


def _run(hand_model, solver, poses, depths, iters=2, ipost=1):
    config = TrackerConfig(point_budget=256, cnn_every_frame=False,
                           cloud_rows_per_body=32, physics_iterations=iters,
                           physics_iterations_post=ipost, solver=solver)
    params = physics_params(config)
    states = batched_tracker_state(hand_model, poses.shape[0])
    states = states._replace(body=states.body._replace(pose=poses))
    st, _ = jax.jit(lambda s, d: batched_update(
        s, hand_model, None, d, cam_g, config, params))(states, depths)
    return np.asarray(st.body.pose)


cam_g = synth_camera()


def test_kernel_update_matches_colored(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    poses = jnp.asarray(bank[[10, 400]])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, hand_model, cam_g)))
    depths = render(poses)

    col = _run(hand_model, "colored", poses, depths)
    ker = _run(hand_model, "kernel", poses, depths)
    assert np.abs(col[..., :3] - ker[..., :3]).max() < 1e-5
    assert quat_err(col[..., 3:].reshape(-1, 4),
                    ker[..., 3:].reshape(-1, 4)) < 1e-4


def test_unibody_kernel_matches_colored(hand_model):
    """UnibodyFit's kernel solve (physics_update_pgs with a build_unibody_plan
    plan, interpret mode on CPU) must match the colored single-body solve —
    same sequential row order, same math (handtrack.h:444-470)."""
    from hand_tracking_samples_tpu.imaging.image_ops import cloud_from_depth
    from hand_tracking_samples_tpu.tracker.runtime import unibody_fit

    bank = load_animbank(DEFAULT_ANIMBANK)
    poses = jnp.asarray(bank[[10, 400, 977]])
    render = jax.jit(jax.vmap(lambda p: fake_depth(p, hand_model, cam_g)))
    depths = render(poses)
    params = physics_params(TrackerConfig())

    pts, mask = jax.jit(jax.vmap(
        lambda d: cloud_from_depth(d, cam_g, 0.1, 0.7, 4, 1024)))(depths)
    # start slightly off the true poses so the fit does real work
    start = poses.at[:, :, 0].add(0.01)

    def fit(k):
        fn = lambda p, pt, m: unibody_fit(
            jax.tree.map(jnp.asarray, _body(p)), hand_model, params, pt, m,
            jnp.zeros(3), use_kernel=k).pose
        return np.asarray(jax.jit(jax.vmap(fn))(start, pts, mask))

    def _body(p):
        from hand_tracking_samples_tpu.physics.solver import BodyState
        return BodyState(pose=p, linear_momentum=jnp.zeros((17, 3)),
                         angular_momentum=jnp.zeros((17, 3)))

    col = fit(False)
    ker = fit(True)
    assert np.abs(col[..., :3] - ker[..., :3]).max() < 1e-5
    assert quat_err(col[..., 3:].reshape(-1, 4),
                    ker[..., 3:].reshape(-1, 4)) < 1e-4
