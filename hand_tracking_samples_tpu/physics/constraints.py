"""Constraint-row factories, matching the reference factories exactly
(third_party/physics.h:313-414) but emitting fixed-shape masked row blocks.

Every factory takes the current BodyState + static model data and returns
LinearRows / AngularRows.  Data-dependent *structure* in the reference
(equality vs. range limits, the y-axis frame-swap special case) becomes
masked alternatives selected with jnp.where, so shapes stay static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maths.pose import pose_apply, pose_inverse, pose_mul, pose_quat
from ..maths.quat import (orth, qconj, qmul, qrot, quat_from_to, qxdir, qydir,
                          qzdir, safenormalize, qmat)
from .solver import AngularRows, BodyState, FLT_MAX, LinearRows

DEG = 3.14 / 180.0  # the reference uses 3.14 (not pi) for degree conversion


def _pose_of(state: BodyState, idx):
    return state.pose[idx]


def _maybe(state: BodyState, idx):
    """Pose of body idx, or identity when idx < 0 (world)."""
    p = state.pose[jnp.maximum(idx, 0)]
    ident = jnp.zeros(7, p.dtype).at[6].set(1.0)
    return jnp.where(idx >= 0, p, ident)


def constrain_along_direction(state, b0, p0, b1, p1, axisw, minforce, maxforce,
                              active=True):
    """physics.h:328 — 1 row. p0/p1 in local space; world r computed here."""
    w0 = pose_apply(_maybe(state, b0), p0)
    w1 = pose_apply(_maybe(state, b1), p1)
    targetdist = jnp.sum((w1 - w0) * axisw, axis=-1)
    q0 = pose_quat(_maybe(state, b0))
    q1 = pose_quat(_maybe(state, b1))
    r0 = jnp.where(b0 >= 0, qrot(q0, p0), p0)
    r1 = jnp.where(b1 >= 0, qrot(q1, p1), p1)
    n = jnp.shape(targetdist) or ()
    mk = lambda x: jnp.atleast_1d(jnp.asarray(x, jnp.float32))
    return LinearRows(
        b0=jnp.atleast_1d(jnp.asarray(b0, jnp.int32)),
        b1=jnp.atleast_1d(jnp.asarray(b1, jnp.int32)),
        normal=jnp.atleast_2d(axisw), r0=jnp.atleast_2d(r0), r1=jnp.atleast_2d(r1),
        targetdist=mk(targetdist), targetspeednobias=mk(0.0),
        fmin=mk(jnp.minimum(minforce, maxforce)),
        fmax=mk(jnp.maximum(minforce, maxforce)),
        friction_master=jnp.zeros_like(jnp.atleast_1d(jnp.asarray(b0, jnp.int32))),
        friction_coef=mk(0.0),
        active=jnp.atleast_1d(jnp.asarray(active, bool)))


def constrain_along_direction_deadzone(state, b0, p0, b1, p1, axisw, radius,
                                       fmin, fmax, active=True):
    """physics.h:332-340 — 2 rows forming a dead zone of given radius."""
    w0 = pose_apply(_maybe(state, b0), p0)
    w1 = pose_apply(_maybe(state, b1), p1)
    d = jnp.sum((w1 - w0) * axisw, axis=-1)
    q0 = pose_quat(_maybe(state, b0))
    q1 = pose_quat(_maybe(state, b1))
    r0 = jnp.where(b0 >= 0, qrot(q0, p0), p0)
    r1 = jnp.where(b1 >= 0, qrot(q1, p1), p1)
    i32 = lambda x: jnp.asarray([x, x], jnp.int32)
    f32 = lambda a, b: jnp.asarray([a, b], jnp.float32)
    return LinearRows(
        b0=i32(b0), b1=i32(b1),
        normal=jnp.stack([axisw, axisw]), r0=jnp.stack([r0, r0]),
        r1=jnp.stack([r1, r1]),
        targetdist=jnp.stack([d + radius, d - radius]),
        targetspeednobias=f32(0.0, 0.0),
        fmin=f32(0.0, fmin), fmax=f32(fmax, 0.0),
        friction_master=jnp.zeros(2, jnp.int32), friction_coef=f32(0.0, 0.0),
        active=jnp.asarray([active, active], bool))


def constrain_position_nailed(state, b0, p0, b1, p1, active=True):
    """physics.h:342-346 — 3 rows along world x/y/z."""
    w0 = pose_apply(_maybe(state, b0), p0)
    w1 = pose_apply(_maybe(state, b1), p1)
    d = w1 - w0
    q0 = pose_quat(_maybe(state, b0))
    q1 = pose_quat(_maybe(state, b1))
    r0 = jnp.where(b0 >= 0, qrot(q0, p0), p0)
    r1 = jnp.where(b1 >= 0, qrot(q1, p1), p1)
    eye = jnp.eye(3, dtype=jnp.float32)
    rep = lambda x: jnp.broadcast_to(x, (3,) + jnp.shape(x)[0:]) if jnp.ndim(x) else jnp.full(3, x)
    return LinearRows(
        b0=jnp.full(3, b0, jnp.int32) if jnp.ndim(b0) == 0 else jnp.broadcast_to(b0, (3,)),
        b1=jnp.full(3, b1, jnp.int32) if jnp.ndim(b1) == 0 else jnp.broadcast_to(b1, (3,)),
        normal=eye,
        r0=jnp.broadcast_to(r0, (3, 3)), r1=jnp.broadcast_to(r1, (3, 3)),
        targetdist=d, targetspeednobias=jnp.zeros(3, jnp.float32),
        fmin=jnp.full(3, -FLT_MAX), fmax=jnp.full(3, FLT_MAX),
        friction_master=jnp.zeros(3, jnp.int32),
        friction_coef=jnp.zeros(3, jnp.float32),
        active=jnp.full(3, active, bool))


def constrain_under_plane(state, b, verts, vert_mask, plane, maxforce,
                          active=True):
    """physics.h:347-350 — keep the body's support point under `plane`.
    verts: (V,3) local (COM-frame) collision verts of body b."""
    q = pose_quat(_pose_of(state, b))
    dloc = qrot(qconj(q), plane[:3])
    dots = verts @ dloc
    dots = jnp.where(vert_mask, dots, -jnp.inf)
    p1 = verts[jnp.argmax(dots)]
    return constrain_along_direction(
        state, jnp.int32(-1), plane[:3] * -plane[3], b, p1, -plane[:3],
        0.0, maxforce, active=active)


def constrain_angular_drive(state, b0, b1, target_q, maxtorque, params,
                            active=True):
    """physics.h:313-326 — 3 rows driving relative orientation to target."""
    q0 = jnp.where(b0 >= 0, pose_quat(_maybe(state, b0)),
                   jnp.asarray([0.0, 0, 0, 1]))
    q1 = jnp.where(b1 >= 0, pose_quat(_maybe(state, b1)),
                   jnp.asarray([0.0, 0, 0, 1]))
    dq = qmul(q1, qconj(qmul(q0, target_q)))
    dq = jnp.where(dq[3] < 0, -dq, dq)
    axis = safenormalize(dq[:3])
    binormal = orth(axis)
    normal = jnp.cross(axis, binormal)
    spin0 = (-params.biasfactorjoint
             * (jnp.arccos(jnp.clip(dq[3], -1.0, 1.0)) * 2.0) / params.deltaT)
    mk = lambda x: jnp.asarray(x, jnp.float32)
    return AngularRows(
        b0=jnp.full(3, b0, jnp.int32), b1=jnp.full(3, b1, jnp.int32),
        axis=jnp.stack([axis, binormal, normal]),
        targetspin=jnp.stack([spin0, mk(0.0), mk(0.0)]),
        mintorque=jnp.full(3, -maxtorque, jnp.float32),
        maxtorque=jnp.full(3, maxtorque, jnp.float32),
        active=jnp.full(3, active, bool))


def constrain_cone_angle(state, b0, n0, b1, n1, limitangle_degrees, params,
                         active=True):
    """physics.h:402-414 — 1 row limiting the angle between two body axes."""
    equality = (limitangle_degrees == 0.0)
    a0 = jnp.where(b0 >= 0, qrot(pose_quat(_maybe(state, b0)), n0), n0)
    a1 = qrot(pose_quat(_maybe(state, b1)), n1)
    axis = safenormalize(jnp.cross(a1, a0))
    rbangle = jnp.arccos(jnp.clip(jnp.sum(a0 * a1, -1), 0.0, 1.0))
    dangle = rbangle - limitangle_degrees * 3.14 / 180.0
    bias = jnp.where(equality, params.biasfactorjoint, 1.0)
    targetspin = bias * dangle / params.deltaT
    mint = jnp.where(limitangle_degrees > 0.0, 0.0, -FLT_MAX)
    mk1 = lambda x: jnp.atleast_1d(jnp.asarray(x, jnp.float32))
    return AngularRows(
        b0=jnp.atleast_1d(jnp.asarray(b0, jnp.int32)),
        b1=jnp.atleast_1d(jnp.asarray(b1, jnp.int32)),
        axis=jnp.atleast_2d(axis), targetspin=mk1(targetspin),
        mintorque=mk1(mint), maxtorque=mk1(FLT_MAX),
        active=jnp.atleast_1d(jnp.asarray(active, bool)))


def constrain_cone_angle_batch(state, b0, n0, b1, n1, limitangle_degrees,
                               params, active=True):
    """K cone rows in one call (same math as constrain_cone_angle, all
    elementwise over the leading K axis) — collapses the per-row Python
    loops of apply_angles / hand_model_enhancements into one HLO set.

    b0/b1 (K,) int32; n0/n1 (K,3); limitangle_degrees (K,) float."""
    b0 = jnp.asarray(b0, jnp.int32)
    b1 = jnp.asarray(b1, jnp.int32)
    lim = jnp.asarray(limitangle_degrees, jnp.float32)
    equality = lim == 0.0
    q0 = jax.vmap(lambda b: pose_quat(_maybe(state, b)))(b0)
    q1 = jax.vmap(lambda b: pose_quat(_maybe(state, b)))(b1)
    a0 = jnp.where((b0 >= 0)[:, None], jax.vmap(qrot)(q0, n0), n0)
    a1 = jax.vmap(qrot)(q1, n1)
    axis = jax.vmap(safenormalize)(jnp.cross(a1, a0))
    rbangle = jnp.arccos(jnp.clip(jnp.sum(a0 * a1, -1), 0.0, 1.0))
    dangle = rbangle - lim * 3.14 / 180.0
    bias = jnp.where(equality, params.biasfactorjoint, 1.0)
    targetspin = bias * dangle / params.deltaT
    mint = jnp.where(lim > 0.0, 0.0, -FLT_MAX)
    K = b0.shape[0]
    return AngularRows(
        b0=b0, b1=b1, axis=axis, targetspin=targetspin,
        mintorque=mint, maxtorque=jnp.full(K, FLT_MAX),
        active=jnp.broadcast_to(jnp.asarray(active, bool), (K,)))


def constrain_angular_range(state, b0, b1, jointframe, limitmin_deg,
                            limitmax_deg, params):
    """physics.h:351-399 ConstrainAngularRange(W): 6 masked row slots
    (2 per axis; equality limits use slot A only).

    Returns AngularRows with exactly 6 rows.  The y-testing frame-swap
    special case (physics.h:358-362) is folded in by conditionally rotating
    the joint frames and permuting the limits before the row math.
    """
    q0 = pose_quat(_maybe(state, b0))
    q1 = pose_quat(_maybe(state, b1))
    jb0 = jnp.where(b0 >= 0, qmul(q0, jointframe), jointframe)
    jf1 = jnp.where(b1 >= 0, q1, jnp.asarray([0.0, 0, 0, 1]))

    jmin0 = limitmin_deg * DEG
    jmax0 = limitmax_deg * DEG
    swap = (jmin0[0] == 0) & (jmax0[0] == 0) & (jmin0[2] < jmax0[2])
    cb = jnp.asarray([0.0, -1.0, 0.0, 1.0]) / jnp.sqrt(2.0)
    jb0 = jnp.where(swap, qmul(jb0, cb), jb0)
    jf1 = jnp.where(swap, qmul(jf1, cb), jf1)
    perm = jnp.asarray([2, 1, 0])
    jmin = jnp.where(swap, limitmin_deg[perm] * DEG, jmin0)
    jmax = jnp.where(swap, limitmax_deg[perm] * DEG, jmax0)
    jmin = jnp.where(swap, jmin.at[2].set(0.0), jmin)
    jmax = jnp.where(swap, jmax.at[2].set(0.0), jmax)

    r = qmul(qconj(jb0), jf1)
    s = quat_from_to(jnp.asarray([0.0, 0.0, 1.0]), qzdir(r))
    t = qmul(qconj(s), r)
    dt = params.deltaT

    xd, yd, zd = qxdir(jf1), qydir(jf1), qzdir(jf1)

    # --- x axis ---
    x_eq = jmax[0] == jmin[0]
    x_on = x_eq | (jmax[0] - jmin[0] < 360.0 * DEG)
    xa_spin = 2.0 * (-s[0] + jnp.sin(jmin[0] / 2.0)) / dt
    xb_spin = 2.0 * (s[0] - jnp.sin(jmax[0] / 2.0)) / dt
    xa_min = jnp.where(x_eq, -FLT_MAX, 0.0)

    # --- y axis ---
    y_eq = jmax[1] == jmin[1]
    ya_spin = jnp.where(
        y_eq,
        params.biasfactorjoint * 2.0 * (-s[1] + jmin[1]) / dt,
        2.0 * (-s[1] + jnp.sin(jmin[1] / 2.0)) / dt)
    yb_spin = 2.0 * (s[1] - jnp.sin(jmax[1] / 2.0)) / dt
    ya_min = jnp.where(y_eq, -FLT_MAX, 0.0)

    # --- z axis ---
    z_eq = jmin[2] == jmax[2]
    za_spin = jnp.where(
        z_eq,
        params.biasfactorjoint * 2.0 * (-t[2]) / dt,
        2.0 * (-t[2] + jnp.sin(jmin[2] / 2.0)) / dt)
    zb_spin = 2.0 * (t[2] - jnp.sin(jmax[2] / 2.0)) / dt
    za_min = jnp.where(z_eq, -FLT_MAX, 0.0)

    axes = jnp.stack([xd, -xd, yd, -yd, zd, -zd])
    spins = jnp.stack([xa_spin, xb_spin, ya_spin, yb_spin, za_spin, zb_spin])
    mints = jnp.stack([xa_min, jnp.float32(0.0), ya_min, jnp.float32(0.0),
                       za_min, jnp.float32(0.0)])
    act = jnp.stack([x_on, x_on & ~x_eq,
                     jnp.asarray(True), ~y_eq,
                     jnp.asarray(True), ~z_eq])
    return AngularRows(
        b0=jnp.full(6, b0, jnp.int32), b1=jnp.full(6, b1, jnp.int32),
        axis=axes, targetspin=spins, mintorque=mints,
        maxtorque=jnp.full(6, FLT_MAX), active=act)


def relative_angular_rows(state, refpose, b0, b1, params, active=True):
    """physmodel.h:410-432 RelativeAngularConstraints for one (parent, child)
    pair: 3 rows along the parent's rotation-matrix axes driving the relative
    pose toward refpose's relative pose."""
    ref_rel = pose_mul(pose_inverse(refpose[b0]), refpose[b1])
    cur_rel = pose_mul(pose_inverse(_pose_of(state, b0)), _pose_of(state, b1))
    dq_pose = pose_mul(pose_inverse(ref_rel), cur_rel)
    dq = pose_quat(dq_pose)
    q0 = pose_quat(_pose_of(state, b0))
    m = qmat(q0)  # columns = qxdir/qydir/qzdir; linalg qmat(q)[a] is column a
    axes = m.swapaxes(-1, -2)  # rows = the 3 column vectors
    spins = -dq[:3] * 2.0 / params.deltaT
    return AngularRows(
        b0=jnp.full(3, b0, jnp.int32), b1=jnp.full(3, b1, jnp.int32),
        axis=axes, targetspin=spins,
        mintorque=jnp.full(3, -FLT_MAX), maxtorque=jnp.full(3, FLT_MAX),
        active=jnp.full(3, active, bool))
