"""Tracks-last constraint-row factories + class prep (the PGS-kernel feed).

The per-track factories (physics/constraints.py, model/hand.py) are correct
and bit-faithful, but under the tracks vmap they emit hundreds of small
(T, R, 3)-shaped HLOs whose minor dim of 3 pads catastrophically on the
128-lane VPU.  This module recomputes the SAME algebra directly in the
tracks-last component-plane layout every hot kernel already uses — every
tensor is (rows, T) with tracks on lanes, vectors are 3 separate planes, and
all body references are static (joint topology, contact pair list), so every
"gather" is constant indexing.

Produces, per PairClassPlan (physics/pgs_kernel.py), the exact
(n_phases, nch*W, T) channel planes `_prep_lin_class`/`_prep_ang_class`
build from per-track rows — same math, same masking, same channel order —
so the Pallas solve kernel consumes identical inputs.

Reference semantics per factory:
  * joint nailed rows      physics.h:342-346 via physmodel.h:328-334
  * joint angular ranges   physics.h:351-399 via physmodel.h:321-327
  * HandModelEnhancements  handtrack.h:402-441 (range mutation + arm cone)
  * ApplyAngles            handtrack.h:203-216
  * contact rows           physics.h:451-489 (fields from the contact kernel)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .solver import FLT_MAX
from .contacts import _rot_planes

DEG = 3.14 / 180.0


# ---------------------------------------------------------------------------
# plane algebra helpers (vectors = lists of 3 planes, quats = lists of 4)
# ---------------------------------------------------------------------------

def p_cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def p_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def p_qconj(q):
    return [-q[0], -q[1], -q[2], q[3]]


def p_qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return [aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz]


def p_qrot(q, v):
    """qrot as maths.quat.qrot: v + w*t + cross(qv, t), t = 2*cross(qv, v)."""
    qv = q[0:3]
    w = q[3]
    t = [2.0 * c for c in p_cross(qv, v)]
    ct = p_cross(qv, t)
    return [v[c] + w * t[c] + ct[c] for c in range(3)]


def p_norm(v):
    return jnp.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])


def p_safenormalize(v):
    """maths.quat.safenormalize: +z for the zero vector."""
    n = p_norm(v)
    zero = n == 0.0
    inv = 1.0 / jnp.where(zero, 1.0, n)
    return [jnp.where(zero, 0.0, v[0] * inv),
            jnp.where(zero, 0.0, v[1] * inv),
            jnp.where(zero, 1.0, v[2] * inv)]


def p_orth(v):
    """maths.quat.orth: first-max argmax over |components|, zeroed, crossed."""
    ax, ay, az = jnp.abs(v[0]), jnp.abs(v[1]), jnp.abs(v[2])
    i0 = (ax >= ay) & (ax >= az)
    i1 = (~i0) & (ay >= az)
    i2 = ~(i0 | i1)
    u = [jnp.where(i0, 0.0, 1.0), jnp.where(i1, 0.0, 1.0),
         jnp.where(i2, 0.0, 1.0)]
    c = p_cross(u, v)
    inv = 1.0 / p_norm(c)
    return [cc * inv for cc in c]


def p_qzdir(q):
    x, y, z, w = q
    return [(z * x + y * w) * 2, (y * z - x * w) * 2,
            w * w - x * x - y * y + z * z]


def p_qydir(q):
    x, y, z, w = q
    return [(x * y - z * w) * 2, w * w - x * x + y * y - z * z,
            (y * z + x * w) * 2]


def p_qxdir(q):
    x, y, z, w = q
    return [w * w + x * x - y * y - z * z, (x * y + z * w) * 2,
            (z * x - y * w) * 2]


def const_plane(x, T):
    return jnp.broadcast_to(jnp.float32(x), (1, T))


# ---------------------------------------------------------------------------
# pose planes
# ---------------------------------------------------------------------------

class PosePlanes(NamedTuple):
    """Tracks-last view of a (T, B, 7) pose batch + derived quantities."""
    tr: list      # 3 x (B, T)
    q: list       # 4 x (B, T)
    iinv: list    # iinv[i][j] 3x3 of (B, T) — world inertia^-1 * massinv
    T: int
    B: int


def pose_planes(pose_b, tinv_massless, massinv) -> PosePlanes:
    """pose_b (T, B, 7) -> planes.  iinv is computed by the EXISTING
    pgs_kernel._batched_world_iinv (bit-identical to the shipped prep) and
    transposed into planes — the 9 (T, B) transposes are trivial."""
    from .pgs_kernel import _batched_world_iinv
    T, B = pose_b.shape[0], pose_b.shape[1]
    pt = jnp.transpose(pose_b, (1, 2, 0))               # (B, 7, T)
    tr = [pt[:, c] for c in range(3)]
    q = [pt[:, 3 + c] for c in range(4)]
    iinv_tb = _batched_world_iinv(pose_b[..., 3:7],
                                  jnp.asarray(tinv_massless),
                                  jnp.asarray(massinv))  # (T, B, 3, 3)
    it = jnp.transpose(iinv_tb, (2, 3, 1, 0))           # (3, 3, B, T)
    iinv = [[it[i, j] for j in range(3)] for i in range(3)]
    return PosePlanes(tr=tr, q=q, iinv=iinv, T=T, B=B)


def take(x, idx):
    """Static-index row gather: x (B, T), idx scalar/array of host ints."""
    return x[np.asarray(idx)]


# ---------------------------------------------------------------------------
# class prep: geometry channels -> the kernel's 23/14-channel phase planes
# ---------------------------------------------------------------------------

def _gather_static(x, b, on):
    """x (B,T) -> (R,T) rows at host indices b, zeroed where b<0."""
    b = np.asarray(b)
    out = x[np.maximum(b, 0)]
    if (b < 0).any():
        out = out * jnp.asarray((b >= 0).astype(np.float32))[:, None]
    return out


def prep_lin_channels(P: PosePlanes, b0, b1, massinv, dt, n, r0, r1, td,
                      tsnb, fminF, fmaxF, fcoef, act):
    """The 23 channels of pgs_kernel._prep_lin_class, tracks-last.

    b0/b1 host (R,) ints; n/r0/r1 3-lists of (R,T); scalars (R,T) planes.
    act is a float 0/1 plane (active mask).  Returns list of 23 (R,T)."""
    mi = np.asarray(massinv)
    b0 = np.asarray(b0)
    b1 = np.asarray(b1)
    mi0 = jnp.asarray(np.where(b0 >= 0, mi[np.maximum(b0, 0)], 0.0),
                      jnp.float32)[:, None]
    mi1 = jnp.asarray(np.where(b1 >= 0, mi[np.maximum(b1, 0)], 0.0),
                      jnp.float32)[:, None]
    I0 = [[_gather_static(P.iinv[i][j], b0, True) for j in range(3)]
          for i in range(3)]
    I1 = [[_gather_static(P.iinv[i][j], b1, True) for j in range(3)]
          for i in range(3)]
    na = [n[c] * act for c in range(3)]
    J0 = p_cross(r0, na)
    J1 = p_cross(r1, na)
    K0 = [sum(I0[i][j] * J0[j] for j in range(3)) for i in range(3)]
    K1 = [sum(I1[i][j] * J1[j] for j in range(3)) for i in range(3)]
    denom = (mi0 + p_dot(p_cross(K0, r0), na)
             + mi1 + p_dot(p_cross(K1, r1), na))
    ok = (act > 0) & (denom != 0)
    dinv = jnp.where(ok, 1.0 / jnp.where(ok, denom, 1.0), 0.0)
    tsm = td / dt * act
    tsp = jnp.minimum(tsm, tsnb * act)
    T = act.shape[-1]
    R = act.shape[0]
    return (na + J0 + J1 + K0 + K1
            + [dinv, tsm, tsp, fminF * dt * act, fmaxF * dt * act,
               fcoef * act,
               jnp.broadcast_to(mi0, (R, T)), jnp.broadcast_to(mi1, (R, T))])


def prep_ang_channels(P: PosePlanes, b0, b1, dt, axis, targetspin, mint,
                      maxt, act_b):
    """The 14 channels of pgs_kernel._prep_ang_class, tracks-last.
    act_b is a bool plane; targetspin == -FLT_MAX rows are skipped."""
    b0 = np.asarray(b0)
    b1 = np.asarray(b1)
    I0 = [[_gather_static(P.iinv[i][j], b0, True) for j in range(3)]
          for i in range(3)]
    I1 = [[_gather_static(P.iinv[i][j], b1, True) for j in range(3)]
          for i in range(3)]
    K0 = [sum(I0[i][j] * axis[j] for j in range(3)) for i in range(3)]
    K1 = [sum(I1[i][j] * axis[j] for j in range(3)) for i in range(3)]
    denom = p_dot(axis, K0) + p_dot(axis, K1)
    skip = targetspin == -FLT_MAX
    ok = act_b & ~skip & (denom != 0)
    stt = jnp.where(ok, 1.0 / jnp.where(ok, denom, 1.0), 0.0)
    act = (act_b & ~skip).astype(jnp.float32)
    tsm = targetspin * act
    tsp = jnp.where(mint < 0, 0.0, jnp.minimum(targetspin, 0.0)) * act
    mintD = jnp.maximum(mint * dt, -FLT_MAX)
    maxtD = jnp.minimum(maxt * dt, FLT_MAX)
    return ([axis[c] * act for c in range(3)] + K0 + K1
            + [stt, tsm, tsp, mintD * act, maxtD * act + (1.0 - act)])


def phase_planes_t(chans, cls, Tp):
    """channels: list of (R, T) -> (n_phases, nch*W, Tp), the exact layout of
    pgs_kernel._phase_planes (row_index gather, -1 -> zeros)."""
    T = chans[0].shape[-1]
    nch = len(chans)
    x = jnp.stack(chans, axis=1)                        # (R, nch, T)
    ridx = np.asarray(cls.row_index)
    safe = np.maximum(ridx, 0)
    g = x[safe]                                         # (P*W, nch, T)
    if (ridx < 0).any():
        g = g * jnp.asarray((ridx >= 0).astype(np.float32))[:, None, None]
    g = g.reshape(cls.n_phases, cls.W, nch, T)
    g = g.transpose(0, 2, 1, 3).reshape(cls.n_phases, nch * cls.W, T)
    if T != Tp:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, Tp - T)))
    return g


# ---------------------------------------------------------------------------
# joint factories (physmodel.h:321-334)
# ---------------------------------------------------------------------------

def joint_lin_geometry(P: PosePlanes, model_np):
    """Nailed joint rows (3 per joint, physics.h:342-346): returns
    (b0, b1, n, r0, r1, td, tsnb, fmin, fmax, fcoef, act) with (48, T) planes.
    Row j*3+k is joint j's world-axis-k row."""
    j0 = np.asarray(model_np["joint_rbi0"])
    j1 = np.asarray(model_np["joint_rbi1"])
    p0 = np.asarray(model_np["joint_p0"], np.float32)   # (J, 3)
    p1 = np.asarray(model_np["joint_p1"], np.float32)
    J = j0.shape[0]
    T = P.T

    q0 = [take(P.q[c], j0) for c in range(4)]           # (J, T)
    q1 = [take(P.q[c], j1) for c in range(4)]
    tr0 = [take(P.tr[c], j0) for c in range(3)]
    tr1 = [take(P.tr[c], j1) for c in range(3)]
    p0c = [jnp.asarray(p0[:, c])[:, None] for c in range(3)]
    p1c = [jnp.asarray(p1[:, c])[:, None] for c in range(3)]
    r0 = p_qrot(q0, p0c)                                # (J, T) x3
    r1 = p_qrot(q1, p1c)
    w0 = [tr0[c] + r0[c] for c in range(3)]
    w1 = [tr1[c] + r1[c] for c in range(3)]
    d = [w1[c] - w0[c] for c in range(3)]               # td per axis row

    def inter3(xs):
        """3 x (J, T) -> (3J, T) rows j*3+k."""
        return jnp.stack(xs, axis=1).reshape(3 * J, T)

    eye = np.eye(3, dtype=np.float32)
    n = [inter3([jnp.broadcast_to(jnp.float32(eye[k][c]), (J, T))
                 for k in range(3)]) for c in range(3)]
    r0_r = [inter3([r0[c]] * 3) for c in range(3)]
    r1_r = [inter3([r1[c]] * 3) for c in range(3)]
    td = inter3(d)
    z = jnp.zeros((3 * J, T), jnp.float32)
    act = jnp.ones((3 * J, T), jnp.float32)
    return (np.repeat(j0, 3), np.repeat(j1, 3), n, r0_r, r1_r, td, z,
            jnp.full((3 * J, T), -FLT_MAX), jnp.full((3 * J, T), FLT_MAX),
            z, act)


def enhancement_ranges(P: PosePlanes, model_np):
    """HandModelEnhancements' per-frame joint-range mutation
    (handtrack.h:417-440), tracks-last.  Returns (rmin, rmax) as
    3-lists of (J, T) planes (one per x/y/z limit component)."""
    rmin0 = np.asarray(model_np["joint_rangemin"], np.float32)  # (J, 3)
    rmax0 = np.asarray(model_np["joint_rangemax"], np.float32)
    J = rmin0.shape[0]
    T = P.T
    rmin = [jnp.broadcast_to(jnp.asarray(rmin0[:, c])[:, None], (J, T))
            for c in range(3)]
    rmax = [jnp.broadcast_to(jnp.asarray(rmax0[:, c])[:, None], (J, T))
            for c in range(3)]

    # distal x-range pinned to half the upper knuckle angle
    db = np.asarray([7, 10, 13, 16])
    z2 = p_qzdir([take(P.q[c], db - 2) for c in range(4)])   # (4, T)
    z1 = p_qzdir([take(P.q[c], db - 1) for c in range(4)])
    ang = jnp.arccos(jnp.clip(p_dot(z2, z1), 0.0, 1.0)) * 180.0 / 3.14159 / 2.0

    def setrows(plane, rows, val):
        oh = np.zeros((J, len(rows)), np.float32)
        for k, r in enumerate(rows):
            oh[r, k] = 1.0
        ohm = jnp.asarray(oh)
        keep = 1.0 - ohm.sum(axis=1, keepdims=True)
        return plane * keep + ohm @ val

    rmin[0] = setrows(rmin[0], db - 1, ang)
    rmax[0] = setrows(rmax[0], db - 1, ang)

    # abduction gating on curl
    kb = np.asarray([14, 11, 8, 5])
    klo = np.asarray([-30.0, -10.0, -10.0, -10.0], np.float32)
    khi = np.asarray([10.0, 10.0, 10.0, 20.0], np.float32)
    cos40 = np.cos(40.0 * 3.14 / 180.0)
    y1 = p_qydir([P.q[c][1:2] for c in range(4)])            # (1, T)
    yk = p_qydir([take(P.q[c], kb) for c in range(4)])       # (4, T)
    up = p_dot([y1[c] for c in range(3)], yk) > cos40        # (4, T)
    lo = jnp.where(up, jnp.asarray(klo)[:, None], -0.0)
    hi = jnp.where(up, jnp.asarray(khi)[:, None], 0.0)
    rmin[1] = setrows(rmin[1], kb - 1, lo)
    rmax[1] = setrows(rmax[1], kb - 1, hi)
    return rmin, rmax


def joint_ang_geometry(P: PosePlanes, model_np, params, rmin, rmax):
    """ConstrainAngularRange (physics.h:351-399) for all joints, tracks-last.
    rmin/rmax: 3-lists of (J, T) degree planes (post-enhancement).
    Returns (b0, b1, axis, targetspin, mintorque, maxtorque, act) with
    (6J, T) planes, rows j*6+a."""
    j0 = np.asarray(model_np["joint_rbi0"])
    j1 = np.asarray(model_np["joint_rbi1"])
    jf = np.asarray(model_np["joint_frame"], np.float32)     # (J, 4)
    J = j0.shape[0]
    T = P.T
    dt = params.deltaT
    bias = params.biasfactorjoint

    q0 = [take(P.q[c], j0) for c in range(4)]
    q1 = [take(P.q[c], j1) for c in range(4)]
    jfc = [jnp.asarray(jf[:, c])[:, None] for c in range(4)]
    jb0 = p_qmul(q0, jfc)
    jf1 = q1

    jmin0 = [rmin[c] * DEG for c in range(3)]
    jmax0 = [rmax[c] * DEG for c in range(3)]
    swap = (jmin0[0] == 0) & (jmax0[0] == 0) & (jmin0[2] < jmax0[2])
    cbv = np.asarray([0.0, -1.0, 0.0, 1.0], np.float32) / np.sqrt(2.0)
    cb = [jnp.broadcast_to(jnp.float32(cbv[c]), (J, T)) for c in range(4)]
    jb0s = p_qmul(jb0, cb)
    jf1s = p_qmul(jf1, cb)
    jb0 = [jnp.where(swap, jb0s[c], jb0[c]) for c in range(4)]
    jf1 = [jnp.where(swap, jf1s[c], jf1[c]) for c in range(4)]
    # perm [2,1,0] with z zeroed in the swapped frame
    jmin = [jnp.where(swap, jmin0[2], jmin0[0]), jmin0[1],
            jnp.where(swap, 0.0, jmin0[2])]
    jmax = [jnp.where(swap, jmax0[2], jmax0[0]), jmax0[1],
            jnp.where(swap, 0.0, jmax0[2])]

    r = p_qmul(p_qconj(jb0), jf1)
    # s = quat_from_to((0,0,1), qzdir(r)); t = qconj(s) * r
    zr = p_qzdir(r)
    nrm = p_norm(zr)
    v1 = [zr[c] / nrm for c in range(3)]
    # v0 = (0,0,1): cross(v0, v1) = (-v1y, v1x, 0); d = v1z
    d = v1[2]
    s2 = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, 1e-30))
    s_main = [-v1[1] / s2, v1[0] / s2, jnp.zeros_like(d), s2 * 0.5]
    # orth((0,0,1)) = normalize(cross((1,1,0),(0,0,1))) = (1,-1,0)/sqrt(2)
    r2c = 1.0 / np.sqrt(2.0, dtype=np.float32)
    deg180 = d <= -1.0
    s = [jnp.where(deg180, jnp.float32(r2c), s_main[0]),
         jnp.where(deg180, jnp.float32(-r2c), s_main[1]),
         jnp.where(deg180, 0.0, s_main[2]),
         jnp.where(deg180, 0.0, s_main[3])]
    t = p_qmul(p_qconj(s), r)

    xd = p_qxdir(jf1)
    yd = p_qydir(jf1)
    zd = p_qzdir(jf1)

    x_eq = jmax[0] == jmin[0]
    x_on = x_eq | (jmax[0] - jmin[0] < 360.0 * DEG)
    xa_spin = 2.0 * (-s[0] + jnp.sin(jmin[0] / 2.0)) / dt
    xb_spin = 2.0 * (s[0] - jnp.sin(jmax[0] / 2.0)) / dt
    xa_min = jnp.where(x_eq, -FLT_MAX, 0.0)

    y_eq = jmax[1] == jmin[1]
    ya_spin = jnp.where(y_eq, bias * 2.0 * (-s[1] + jmin[1]) / dt,
                        2.0 * (-s[1] + jnp.sin(jmin[1] / 2.0)) / dt)
    yb_spin = 2.0 * (s[1] - jnp.sin(jmax[1] / 2.0)) / dt
    ya_min = jnp.where(y_eq, -FLT_MAX, 0.0)

    z_eq = jmin[2] == jmax[2]
    za_spin = jnp.where(z_eq, bias * 2.0 * (-t[2]) / dt,
                        2.0 * (-t[2] + jnp.sin(jmin[2] / 2.0)) / dt)
    zb_spin = 2.0 * (t[2] - jnp.sin(jmax[2] / 2.0)) / dt
    za_min = jnp.where(z_eq, -FLT_MAX, 0.0)

    zero = jnp.zeros((J, T), jnp.float32)
    tru = jnp.ones((J, T), bool)

    def inter6(xs):
        return jnp.stack(xs, axis=1).reshape(6 * J, T)

    axis = [inter6([xd[c], -xd[c], yd[c], -yd[c], zd[c], -zd[c]])
            for c in range(3)]
    spins = inter6([xa_spin, xb_spin, ya_spin, yb_spin, za_spin, zb_spin])
    mints = inter6([xa_min, zero, ya_min, zero, za_min, zero])
    act = inter6([x_on, x_on & ~x_eq, tru, ~y_eq, tru, ~z_eq])
    return (np.repeat(j0, 6), np.repeat(j1, 6), axis, spins, mints,
            jnp.full((6 * J, T), FLT_MAX), act)


# ---------------------------------------------------------------------------
# ApplyAngles (handtrack.h:203-216) + enhancement arm cone (handtrack.h:430)
# ---------------------------------------------------------------------------

def _cone_rows(a0, a1, limit_deg, params):
    """constrain_cone_angle's row math on (K, T) planes, limit > 0 (range)."""
    axis = p_safenormalize(p_cross(a1, a0))
    rbangle = jnp.arccos(jnp.clip(p_dot(a0, a1), 0.0, 1.0))
    dangle = rbangle - limit_deg * 3.14 / 180.0
    targetspin = dangle / params.deltaT      # bias = 1 (limit > 0)
    return axis, targetspin


def apply_angles_drive(P: PosePlanes, palmq, camq, drive_force, params):
    """The palm angular drive (3 rows, pair (-1, 1)).  palmq/camq: 4-lists of
    (1, T) planes; drive_force a python float."""
    target = p_qmul(camq, palmq)
    q1 = [P.q[c][1:2] for c in range(4)]
    dq = p_qmul(q1, p_qconj(target))
    neg = dq[3] < 0
    dq = [jnp.where(neg, -dq[c], dq[c]) for c in range(4)]
    axis = p_safenormalize(dq[0:3])
    binormal = p_orth(axis)
    normal = p_cross(axis, binormal)
    spin0 = (-params.biasfactorjoint
             * (jnp.arccos(jnp.clip(dq[3], -1.0, 1.0)) * 2.0) / params.deltaT)
    T = P.T
    zero = jnp.zeros((1, T), jnp.float32)

    def cat(xs):
        return jnp.concatenate(xs, axis=0)

    ax = [cat([axis[c], binormal[c], normal[c]]) for c in range(3)]
    spins = cat([spin0, zero, zero])
    mint = jnp.full((3, T), -drive_force, jnp.float32)
    maxt = jnp.full((3, T), drive_force, jnp.float32)
    act = jnp.ones((3, T), bool)
    return ax, spins, mint, maxt, act


def apply_angles_cones(P: PosePlanes, clenched, model_np, params,
                       coneangle=10.0):
    """The 9 finger cones (pair (1, b1) each, U=1).  clenched: (5, T)."""
    jf = np.asarray(model_np["joint_frame"], np.float32)
    T = P.T
    zero = jnp.zeros((1, T), jnp.float32)
    a0 = clenched[0:1]
    n0s = [[jnp.cos(a0), zero, jnp.sin(a0)]]
    b1s = [4]
    for finger in (1, 2, 3, 4):
        a = clenched[finger:finger + 1]
        n0s.append([zero, -jnp.sin(a), jnp.cos(a)])
        b1s.append(3 + finger * 3)
        jfq = [jnp.broadcast_to(jnp.float32(jf[1 + finger * 3, c]), (1, T))
               for c in range(4)]
        inner = [zero, -jnp.sin(a / 2.0), jnp.cos(a / 2.0)]
        n0s.append(p_qrot(jfq, p_qrot(jfq, inner)))
        b1s.append(2 + finger * 3)
    K = len(b1s)
    n0 = [jnp.concatenate([n[c] for n in n0s], axis=0) for c in range(3)]
    q1 = [jnp.broadcast_to(P.q[c][1:2], (K, T)) for c in range(4)]
    a0w = p_qrot(q1, n0)
    qb = [take(P.q[c], np.asarray(b1s)) for c in range(4)]
    # a1 = qrot(q, (0,0,1)) — the factory's qrot expansion, NOT the qzdir
    # polynomial (fp-different; arccos amplifies the ulps near alignment)
    zaxis = [jnp.zeros((K, T), jnp.float32), jnp.zeros((K, T), jnp.float32),
             jnp.ones((K, T), jnp.float32)]
    a1w = p_qrot(qb, zaxis)
    axis, spins = _cone_rows(a0w, a1w, coneangle, params)
    return (np.full(K, 1), np.asarray(b1s), axis, spins,
            jnp.zeros((K, T), jnp.float32), jnp.full((K, T), FLT_MAX),
            jnp.ones((K, T), bool))


def armdir_cone(P: PosePlanes, camq, params):
    """hand_model_enhancements' arm cone: pair (-1, 0), limit 70deg.
    armdir = qrot(camq, (0,-1,0))."""
    T = P.T
    zero = jnp.zeros((1, T), jnp.float32)
    armdir = p_qrot(camq, [zero, jnp.full((1, T), -1.0), zero])
    a1 = p_qrot([P.q[c][0:1] for c in range(4)],
                [zero, zero, jnp.ones((1, T), jnp.float32)])
    axis, spins = _cone_rows(armdir, a1, 70.0, params)
    return (np.asarray([-1]), np.asarray([0]), axis, spins,
            jnp.zeros((1, T), jnp.float32), jnp.full((1, T), FLT_MAX),
            jnp.ones((1, T), bool))


# ---------------------------------------------------------------------------
# contact rows from kernel fields (physics.h:451-489 epilogue, tracks-last)
# ---------------------------------------------------------------------------

def contact_geometry(fields, pairs, params, friction, n_points):
    """contacts._rows_from_fields without the (T, R) detour: same scalar
    math, rows stay (NP*3Pt, T) planes.  fields = (n, seps, vdotn, r0, r1,
    pt_active) as returned by contact_kernel.contact_fields."""
    n, seps, vdotn, r0, r1, pt_active = fields
    NP = pairs.shape[0]
    Pt = n_points
    T = seps.shape[-1]
    minsep = params.driftmax * 0.25
    gterm = jnp.linalg.norm(params.gravity) * params.falltime_to_ballistic
    bouncevel = jnp.maximum(0.0, (-vdotn - gterm) * params.restitution)
    targetdist = jnp.minimum((seps - minsep) * params.biasfactorpositive,
                             seps)
    cn = [-n[c] for c in range(3)]
    cnorm = jnp.sqrt(sum(cn[c] * cn[c] for c in range(3)))
    ncn = [cn[c] / jnp.maximum(cnorm, 1e-30) for c in range(3)]
    s2 = jnp.sqrt(jnp.maximum((1.0 + ncn[2]) * 2.0, 1e-30))
    deg180 = ncn[2] <= -1.0
    r2 = jnp.float32(1.0) / jnp.sqrt(jnp.float32(2.0))
    qqx = jnp.where(deg180, r2, -ncn[1] / s2)
    qqy = jnp.where(deg180, -r2, ncn[0] / s2)
    qqz = jnp.zeros_like(qqx)
    qqw = jnp.where(deg180, 0.0, s2 * 0.5)
    Rq = _rot_planes(qqx, qqy, qqz, qqw)
    tangent = [Rq[c][0] for c in range(3)]
    binormal = [Rq[c][1] for c in range(3)]

    U = 3 * Pt
    zero = jnp.zeros((NP, Pt, T), jnp.float32)

    def inter(x0, x1, x2):
        """(NP, Pt, T) triples -> (NP*3Pt, T) rows i*3Pt + pt*3 + u."""
        return jnp.stack([x0, x1, x2], axis=2).reshape(NP * U, T)

    def bc(x):
        """(NP, T) -> (NP, Pt, T)."""
        return jnp.broadcast_to(x[:, None, :], (NP, Pt, T))

    n_r = [inter(bc(n[c]), bc(binormal[c]), bc(tangent[c])) for c in range(3)]
    r0_r = [inter(r0[c], r0[c], r0[c]) for c in range(3)]
    r1_r = [inter(r1[c], r1[c], r1[c]) for c in range(3)]
    td = inter(targetdist, zero, zero)
    tsnb = inter(-bouncevel, zero, zero)
    actf = pt_active.astype(jnp.float32)
    act = inter(actf, actf, actf)
    fmin = jnp.zeros((NP * U, T), jnp.float32)
    fmax = jnp.broadcast_to(jnp.asarray(
        np.tile(np.asarray([FLT_MAX, 0.0, 0.0], np.float32), NP * Pt)
    )[:, None], (NP * U, T))
    fcoef = jnp.broadcast_to(jnp.asarray(
        np.tile(np.asarray([0.0, friction, friction], np.float32), NP * Pt)
    )[:, None], (NP * U, T))
    b0 = np.repeat(pairs[:, 0], U)
    b1 = np.repeat(pairs[:, 1], U)
    return b0, b1, n_r, r0_r, r1_r, td, tsnb, fmin, fmax, fcoef, act


# ---------------------------------------------------------------------------
# pose integration (physics.h:522-531), tracks-last
# ---------------------------------------------------------------------------

def _diffq_planes(q, tinv, ang):
    """solver._diffq on planes: q 4 x (B,T), tinv (B,3,3) host, ang 3x(B,T)."""
    nrm = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    qn = [q[c] / nrm for c in range(4)]
    R = _rot_planes(qn[0], qn[1], qn[2], qn[3])
    A = [[sum(R[i][k] * tinv[:, k, j][:, None] for k in range(3))
          for j in range(3)] for i in range(3)]
    iinv = [[sum(A[i][k] * R[j][k] for k in range(3)) for j in range(3)]
            for i in range(3)]
    half = [sum(iinv[i][j] * ang[j] for j in range(3)) * 0.5
            for i in range(3)]
    # qmul((halfspin, 0), qn)
    hx, hy, hz = half
    bx, by, bz, bw = qn
    return [bw * hx + hy * bz - hz * by,
            bw * hy - hx * bz + hz * bx,
            bw * hz + hx * by - hy * bx,
            -hx * bx - hy * by - hz * bz]


def rkupdateq_planes(q, tinv, ang, dt):
    """solver.rkupdateq on planes (RK4 + normalize)."""
    d1 = _diffq_planes(q, tinv, ang)
    q2 = [q[c] + d1[c] * (dt / 2) for c in range(4)]
    d2 = _diffq_planes(q2, tinv, ang)
    q3 = [q[c] + d2[c] * (dt / 2) for c in range(4)]
    d3 = _diffq_planes(q3, tinv, ang)
    q4 = [q[c] + d3[c] * dt for c in range(4)]
    d4 = _diffq_planes(q4, tinv, ang)
    out = [q[c] + d1[c] * (dt / 6) + d2[c] * (dt / 3) + d3[c] * (dt / 3)
           + d4[c] * (dt / 6) for c in range(4)]
    nrm = jnp.sqrt(out[0] * out[0] + out[1] * out[1] + out[2] * out[2]
                   + out[3] * out[3])
    return [out[c] / nrm for c in range(4)]
