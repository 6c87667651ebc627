"""The colored fast solver must match the sequential reference solver."""
import jax
import jax.numpy as jnp
import numpy as np

from hand_tracking_samples_tpu.model.hand import fit_point_cloud
from hand_tracking_samples_tpu.physics.colored import precedence_coloring
from hand_tracking_samples_tpu.physics.schedule import build_hand_schedule
from hand_tracking_samples_tpu.physics.solver import BodyState, PhysicsParams
from tests.conftest import quat_err


def _state(pose):
    return BodyState(pose=jnp.asarray(pose, jnp.float32),
                     linear_momentum=jnp.zeros((17, 3)),
                     angular_momentum=jnp.zeros((17, 3)))


def test_precedence_coloring_properties():
    """Conflicting rows keep their order; rows within a group are disjoint."""
    rng = np.random.RandomState(0)
    body_sets = [tuple(rng.choice(8, 2, replace=False)) for _ in range(40)]
    groups = precedence_coloring(body_sets)
    row_group = {}
    for g, rows in enumerate(groups):
        seen = set()
        for r in rows:
            bs = set(body_sets[r])
            assert not (bs & seen), "conflict within a group"
            seen |= bs
            row_group[r] = g
    for i in range(len(body_sets)):
        for j in range(i):
            if set(body_sets[i]) & set(body_sets[j]):
                assert row_group[j] < row_group[i], (i, j)


def test_colored_matches_sequential(golden, hand_model):
    params = PhysicsParams()
    schedule = build_hand_schedule(hand_model)
    pts = jnp.asarray(np.array(golden["solve2_points"], np.float32))
    mask = jnp.ones(len(pts), bool)
    s_seq = _state(np.array(golden["solve2_pose_in"], np.float32))
    s_col = s_seq
    fit_seq = jax.jit(lambda s: fit_point_cloud(s, hand_model, params, pts, mask))
    fit_col = jax.jit(lambda s: fit_point_cloud(s, hand_model, params, pts,
                                                mask, schedule=schedule))
    for _ in range(3):
        s_seq, s_col = fit_seq(s_seq), fit_col(s_col)
    a, b = np.array(s_seq.pose), np.array(s_col.pose)
    assert np.abs(a[:, :3] - b[:, :3]).max() < 1e-5
    assert quat_err(a[:, 3:], b[:, 3:]) < 1e-5


def test_colored_with_jacobi_contacts_close(golden, hand_model):
    """The jacobi contact phases deviate well inside the parity budget."""
    params = PhysicsParams()
    exact = build_hand_schedule(hand_model, "exact")
    jac = build_hand_schedule(hand_model, "jacobi")
    pts = jnp.asarray(np.array(golden["solve2_points"], np.float32))
    mask = jnp.ones(len(pts), bool)
    s1 = _state(np.array(golden["solve2_pose_in"], np.float32))
    s2 = s1
    f1 = jax.jit(lambda s: fit_point_cloud(
        s, hand_model, params, pts, mask, schedule=exact,
        contacts_fn=lambda x: x))
    f2 = jax.jit(lambda s: fit_point_cloud(
        s, hand_model, params, pts, mask, schedule=jac,
        contacts_fn=lambda x: x))
    for _ in range(3):
        s1, s2 = f1(s1), f2(s2)
    a, b = np.array(s1.pose), np.array(s2.pose)
    assert np.abs(a[:, :3] - b[:, :3]).max() < 3e-4  # < 0.3 mm


def test_correspondence_kernel_matches_xla(hand_model):
    """Pallas kernel (interpret mode on CPU) == XLA reductions."""
    from jax.experimental.pallas import tpu as pltpu

    from hand_tracking_samples_tpu.fitting.cloud import _hull_dots
    from hand_tracking_samples_tpu.ops import correspondence as oc

    rng = np.random.RandomState(3)
    pose = jnp.asarray(np.array(hand_model.start_pose))
    pts = jnp.asarray(
        rng.uniform(-0.1, 0.1, (oc.N_BLK, 3)).astype(np.float32)
        + np.array([0, 0, 0.15], np.float32))
    state = BodyState(pose, jnp.zeros((17, 3)), jnp.zeros((17, 3)))
    with pltpu.force_tpu_interpret_mode():
        hv, pidx, te, tx, miss = oc.hull_reductions(
            pose, hand_model, pts, jnp.zeros(3))
    dots = _hull_dots(state, hand_model, pts)
    hv_ref = jnp.max(dots, axis=-1)
    np.testing.assert_allclose(np.array(hv), np.array(hv_ref), atol=1e-5)
    agree = (np.array(pidx) == np.array(jnp.argmax(dots, -1))).mean()
    assert agree > 0.999
