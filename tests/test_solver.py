import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.fitting.cloud import (closest_planes,
                                                     cloud_constraint_rows)
from hand_tracking_samples_tpu.model.hand import (body_params, fit_point_cloud,
                                                  joint_angular_rows,
                                                  joint_linear_rows)
from hand_tracking_samples_tpu.physics.solver import (BodyState, PhysicsParams,
                                                      physics_update)
from tests.conftest import quat_err


def _state(pose):
    return BodyState(pose=jnp.asarray(pose, jnp.float32),
                     linear_momentum=jnp.zeros((17, 3)),
                     angular_momentum=jnp.zeros((17, 3)))


def test_joint_solve_golden(golden, hand_model):
    """3x PhysicsUpdate with joint constraints from a perturbed pose must
    match the reference within fp32 tolerance (solve1 fixture)."""
    params = PhysicsParams()
    state = _state(np.array(golden["solve1_pose_in"], np.float32))
    bp = body_params(hand_model)

    @jax.jit
    def solve3(state):
        for _ in range(3):
            lin = joint_linear_rows(state, hand_model)
            ang = joint_angular_rows(state, hand_model, params)
            state = physics_update(state, bp, lin, ang, params)
        return state

    out = np.array(solve3(state).pose)
    ref = np.array(golden["solve1_pose_out"], np.float32)
    assert np.abs(out[:, :3] - ref[:, :3]).max() < 5e-4
    assert quat_err(out[:, 3:], ref[:, 3:]) < 5e-3


def test_closest_correspondence_golden(golden, hand_model):
    pts = jnp.asarray(np.array(golden["closest_points"], np.float32))
    state = _state(hand_model.start_pose)
    body, plane, val = jax.jit(closest_planes)(
        state, hand_model, pts, jnp.ones(len(pts), bool))
    rb_g = np.array(golden["closest_rb"], int)
    agree = (np.array(body) == rb_g)
    assert agree.mean() >= 0.95  # hull tie-break bones may differ
    pl_g = np.array(golden["closest_planes"]).reshape(-1, 4)
    perr = np.abs(np.array(plane) - pl_g).max(1)
    assert np.median(perr) < 1e-5


def test_cloud_rows_golden(golden, hand_model):
    pts = jnp.asarray(np.array(golden["solve2_points"], np.float32))
    state = _state(np.array(golden["solve2_pose_in"], np.float32))
    rows = jax.jit(cloud_constraint_rows)(
        state, hand_model, pts, jnp.ones(len(pts), bool))
    ref = np.array(golden["solve2_cloud_rows"]).reshape(-1, 8)
    dn = np.abs(np.array(rows.normal) - ref[:, 1:4]).max(1)
    dtd = np.abs(np.array(rows.targetdist) - ref[:, 7])
    assert (dn > 1e-3).sum() <= 5      # tie-break bones only
    assert (dtd > 1e-4).sum() <= 5
    assert (np.array(rows.b1) == ref[:, 0].astype(int)).all()


def test_fit_point_cloud_golden(golden, hand_model):
    """4x FitPointCloud must track the reference within ~0.2 mm."""
    params = PhysicsParams()
    pts = jnp.asarray(np.array(golden["solve2_points"], np.float32))
    state = _state(np.array(golden["solve2_pose_in"], np.float32))
    mask = jnp.ones(len(pts), bool)
    fit1 = jax.jit(lambda s: fit_point_cloud(s, hand_model, params, pts, mask))
    for it in range(4):
        state = fit1(state)
        ref = np.array(golden[f"solve2_pose_it{it}"], np.float32)
        mine = np.array(state.pose)
        assert np.abs(mine[:, :3] - ref[:, :3]).max() < 5e-4, f"iter {it}"
        assert quat_err(mine[:, 3:], ref[:, 3:]) < 1e-2, f"iter {it}"


def test_fit_error_golden(golden, hand_model):
    from hand_tracking_samples_tpu.fitting.cloud import fit_error
    from hand_tracking_samples_tpu.imaging.camera import DCamera
    pts = jnp.asarray(np.array(golden["fit_error_points"], np.float32))
    state = _state(hand_model.start_pose)
    cam = DCamera.make((320, 240))  # DCamera(int2(320,240)) ctor semantics
    depth = jnp.full((240, 320), 800, jnp.uint16)
    fe = jax.jit(fit_error, static_argnames=())(
        state, hand_model, pts, jnp.ones(len(pts), bool), depth, cam)
    assert abs(float(fe) - golden["fit_error"][0]) < 2e-3


def test_masked_rows_are_noops(hand_model):
    """A fully-masked extra row block must not change the solve."""
    from hand_tracking_samples_tpu.physics.solver import (LinearRows,
                                                          AngularRows,
                                                          concat_linear,
                                                          concat_angular)
    params = PhysicsParams()
    rng = np.random.RandomState(0)
    pose = np.array(hand_model.start_pose)
    pose[:, :3] += rng.uniform(-0.01, 0.01, (17, 3)).astype(np.float32)
    state = _state(pose)
    bp = body_params(hand_model)
    lin = joint_linear_rows(state, hand_model)
    ang = joint_angular_rows(state, hand_model, params)
    out1 = physics_update(state, bp, lin, ang, params)
    junk_l = LinearRows.empty(32)._replace(
        b1=jnp.full(32, 3, jnp.int32),
        normal=jnp.tile(jnp.asarray([[1.0, 0, 0]]), (32, 1)),
        targetdist=jnp.ones(32), fmin=jnp.full(32, -5.0), fmax=jnp.full(32, 5.0))
    junk_a = AngularRows.empty(16)._replace(
        b1=jnp.full(16, 4, jnp.int32),
        axis=jnp.tile(jnp.asarray([[0.0, 1, 0]]), (16, 1)),
        targetspin=jnp.ones(16))
    out2 = physics_update(state, bp, concat_linear(lin, junk_l),
                          concat_angular(ang, junk_a), params)
    np.testing.assert_allclose(np.array(out1.pose), np.array(out2.pose),
                               atol=1e-7)
