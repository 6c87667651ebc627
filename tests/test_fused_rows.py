"""physics/row_planes.py (tracks-last factories) vs the per-track factories.

The fused kernel path (physics/fused_fit.py) rebuilds every constraint-row
factory in the tracks-last planes layout; these tests pin each factory
against the vmapped per-track originals at tight tolerances (the residual is
fp reassociation noise amplified by arccos/normalize near alignment — the
drive rows and all masks/limits must be exact).
"""
import numpy as np

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import pytest

from hand_tracking_samples_tpu.assets_paths import DEFAULT_ANIMBANK
from hand_tracking_samples_tpu.data.animbank import load_animbank
from hand_tracking_samples_tpu.physics import row_planes as rp
from hand_tracking_samples_tpu.physics.solver import BodyState
from hand_tracking_samples_tpu.model.hand import (joint_angular_rows,
                                                  joint_linear_rows)
from hand_tracking_samples_tpu.tracker.config import TrackerConfig
from hand_tracking_samples_tpu.tracker.runtime import (apply_angles,
                                                       hand_model_enhancements,
                                                       physics_params)

T = 8


@pytest.fixture(scope="module")
def setup(hand_model):
    bank = load_animbank(DEFAULT_ANIMBANK)
    rng = np.random.RandomState(0)
    poses = jnp.asarray(bank[rng.randint(0, len(bank), T)])
    states = BodyState(pose=poses,
                       linear_momentum=jnp.zeros((T, 17, 3)),
                       angular_momentum=jnp.zeros((T, 17, 3)))
    params = physics_params(TrackerConfig())
    from hand_tracking_samples_tpu.physics.fused_fit import _model_np
    model_np = _model_np(hand_model)
    P = rp.pose_planes(poses, hand_model.tensorinv_massless,
                       hand_model.massinv)
    return states, params, model_np, P


def _vec(planes):
    """3-list of (R, T) -> (T, R, 3)."""
    return np.stack([np.asarray(p) for p in planes], -1).transpose(1, 0, 2)


def _sc(plane):
    return np.asarray(plane).T


def test_joint_linear(hand_model, setup):
    states, params, model_np, P = setup
    ref = jax.vmap(lambda s: joint_linear_rows(s, hand_model))(states)
    b0, b1, n, r0, r1, td, tsnb, fmin, fmax, fcoef, act = \
        rp.joint_lin_geometry(P, model_np)
    assert np.abs(_vec(n) - np.asarray(ref.normal)).max() == 0
    assert np.abs(_vec(r0) - np.asarray(ref.r0)).max() < 1e-7
    assert np.abs(_vec(r1) - np.asarray(ref.r1)).max() < 1e-7
    assert np.abs(_sc(td) - np.asarray(ref.targetdist)).max() < 1e-6
    assert (b0 == np.asarray(ref.b0[0])).all()
    assert (b1 == np.asarray(ref.b1[0])).all()


def test_enhancement_ranges_and_joint_angular(hand_model, setup):
    states, params, model_np, P = setup
    _, rmin_ref, rmax_ref = jax.vmap(
        lambda s: hand_model_enhancements(s, hand_model, params))(states)
    rmin, rmax = rp.enhancement_ranges(P, model_np)
    assert np.abs(_vec(rmin) - np.asarray(rmin_ref)).max() == 0
    assert np.abs(_vec(rmax) - np.asarray(rmax_ref)).max() == 0

    ref = jax.vmap(lambda s, lo, hi: joint_angular_rows(
        s, hand_model, params, lo, hi))(states, rmin_ref, rmax_ref)
    b0, b1, axis, spins, mints, maxts, act = rp.joint_ang_geometry(
        P, model_np, params, rmin, rmax)
    assert np.abs(_vec(axis) - np.asarray(ref.axis)).max() < 1e-6
    # spins are O(60) rad/s; residual is ~1 ulp relative through arccos/sin
    assert np.abs(_sc(spins) - np.asarray(ref.targetspin)).max() < 1e-4
    assert np.abs(_sc(mints) - np.asarray(ref.mintorque)).max() == 0
    assert (_sc(act) == np.asarray(ref.active)).all()
    assert (b0 == np.asarray(ref.b0[0])).all()
    assert (b1 == np.asarray(ref.b1[0])).all()


def test_apply_angles_and_armdir(hand_model, setup):
    states, params, model_np, P = setup
    from hand_tracking_samples_tpu.cnn.labels import CNNAnalysis
    from hand_tracking_samples_tpu.maths.quat import qrot
    rng = np.random.RandomState(1)
    clen = rng.rand(T, 5).astype(np.float32) * 1.5
    palmq = rng.rand(T, 4).astype(np.float32) - 0.5
    palmq /= np.linalg.norm(palmq, axis=-1, keepdims=True)
    camq = rng.rand(T, 4).astype(np.float32) - 0.5
    camq /= np.linalg.norm(camq, axis=-1, keepdims=True)
    campose = jnp.concatenate([jnp.zeros((T, 3)), jnp.asarray(camq)], -1)
    ana = CNNAnalysis(
        crays=jnp.zeros((T, 8, 4)), image_points=jnp.zeros((T, 8, 2)),
        confidence=jnp.zeros((T, 8)), vals=jnp.zeros((T, 16)),
        wristroll=jnp.zeros(T), pitch=jnp.zeros(T), tilt=jnp.zeros(T),
        palmq=jnp.asarray(palmq), finger_clenched=jnp.asarray(clen))
    ref = jax.vmap(lambda s, a, cp: apply_angles(
        s, hand_model, a, cp, params, 10000.0))(states, ana, campose)

    palmq_t = [jnp.asarray(palmq[:, c])[None, :] for c in range(4)]
    camq_t = [jnp.asarray(camq[:, c])[None, :] for c in range(4)]
    dax, dspin, dmint, dmaxt, dact = rp.apply_angles_drive(
        P, palmq_t, camq_t, 10000.0, params)
    cb0, cb1, cax, cspin, cmint, cmaxt, cact = rp.apply_angles_cones(
        P, jnp.asarray(clen).T, model_np, params)
    ax = [jnp.concatenate([dax[c], cax[c]], 0) for c in range(3)]
    spins = jnp.concatenate([dspin, cspin], 0)
    assert np.abs(_vec(ax) - np.asarray(ref.axis)).max() < 1e-4
    assert np.abs(_sc(spins) - np.asarray(ref.targetspin)).max() < 2e-4
    assert np.abs(_sc(jnp.concatenate([dmint, cmint], 0))
                  - np.asarray(ref.mintorque)).max() == 0
    assert np.abs(_sc(jnp.concatenate([dmaxt, cmaxt], 0))
                  - np.asarray(ref.maxtorque)).max() == 0

    armdir = jax.vmap(lambda cq: qrot(cq, jnp.asarray([0.0, -1, 0])))(
        jnp.asarray(camq))
    enh_rows, _, _ = jax.vmap(lambda s, ad: hand_model_enhancements(
        s, hand_model, params, armdir=ad))(states, armdir)
    mb0, mb1, max_, mspin, mmint, mmaxt, mact = rp.armdir_cone(
        P, camq_t, params)
    assert np.abs(_vec(max_) - np.asarray(enh_rows.axis)).max() < 1e-5
    assert np.abs(_sc(mspin) - np.asarray(enh_rows.targetspin)).max() < 1e-4


def test_contact_geometry_matches_rows(hand_model, setup):
    """contact_geometry (planes epilogue) vs _rows_from_fields on the same
    kernel fields — must be bit-identical (same math, different layout)."""
    states, params, model_np, P = setup
    from hand_tracking_samples_tpu.physics.contact_kernel import (
        contact_fields, kernel_supported)
    from hand_tracking_samples_tpu.physics.contacts import (CONTACT_POINTS,
                                                            _rows_from_fields)
    assert kernel_supported(hand_model)
    fields = contact_fields(states.pose, states.linear_momentum,
                            states.angular_momentum, hand_model, params,
                            CONTACT_POINTS)
    pairs = np.asarray(hand_model.collide_pairs)
    ref = _rows_from_fields(*fields, pairs, params, 0.6, CONTACT_POINTS, T)
    b0, b1, n, r0, r1, td, tsnb, fmin, fmax, fcoef, act = \
        rp.contact_geometry(fields, pairs, params, 0.6, CONTACT_POINTS)
    assert np.abs(_vec(n) - np.asarray(ref.normal)).max() == 0
    assert np.abs(_vec(r0) - np.asarray(ref.r0)).max() == 0
    assert np.abs(_vec(r1) - np.asarray(ref.r1)).max() == 0
    assert np.abs(_sc(td) - np.asarray(ref.targetdist)).max() == 0
    assert np.abs(_sc(tsnb) - np.asarray(ref.targetspeednobias)).max() == 0
    assert (_sc(act) == np.asarray(ref.active)).all()
    assert (b0 == np.asarray(ref.b0[0])).all()


def test_rkupdateq_planes(hand_model, setup):
    states, params, model_np, P = setup
    from hand_tracking_samples_tpu.physics.solver import rkupdateq
    rng = np.random.RandomState(2)
    ang = jnp.asarray(rng.randn(T, 17, 3).astype(np.float32) * 0.01)
    tinv = (np.asarray(hand_model.tensorinv_massless)
            * np.asarray(hand_model.massinv)[:, None, None])
    ref = jax.vmap(jax.vmap(rkupdateq, in_axes=(0, 0, 0, None)),
                   in_axes=(0, None, 0, None))(
        states.pose[..., 3:7], jnp.asarray(tinv), ang, params.deltaT)
    ang_t = jnp.transpose(ang, (2, 1, 0))
    got = rp.rkupdateq_planes(P.q, tinv, [ang_t[c] for c in range(3)],
                              params.deltaT)
    assert np.abs(_vec(got[:3])
                  - np.asarray(ref[..., :3])).max() < 1e-5
    gw = np.asarray(got[3]).T
    assert np.abs(gw - np.asarray(ref[..., 3])).max() < 1e-5
