"""Sequential-impulse rigid-body solver, re-designed for TPU.

Implements the exact solve semantics of the reference engine
(third_party/physics.h:543-587 `PhysicsUpdate`): damp + integrate forces,
16 Gauss-Seidel sweeps over all constraint rows (linears then angulars,
in emission order), RK4 quaternion pose integration, bias removal, 4
post-stabilisation sweeps, pose commit.

TPU-first design decisions:
  * Rows are struct-of-arrays with static budgets and an `active` mask; body
    references are indices (-1 = world) instead of pointers.
  * Body orientations are constant during a solve (the reference only writes
    poses in rbupdatepose at the end), so every per-row geometric quantity
    (lever arms r0/r1, world axis, Iinv-projected Jacobians, denominators)
    is precomputed once.  Each Gauss-Seidel row step is then a handful of
    dot products on the two bodies' momenta.
  * The in-order row recurrence is kept exactly (a lax.scan over rows inside
    a fori_loop over sweeps); throughput comes from vmapping whole tracks,
    not from reordering rows, so convergence matches the reference.
  * No data-dependent shapes anywhere: inactive rows solve a zero-limit
    constraint which is an arithmetic no-op.

All functions are pure and jit/vmap-safe.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..maths.quat import qmul, qnormalize, qrot

FLT_MAX = jnp.float32(3.4028235e38)


class PhysicsParams(NamedTuple):
    """File-scope tunables of physics.h:34-47 as a pytree."""
    deltaT: jnp.ndarray = jnp.float32(1.0 / 60.0)
    restitution: jnp.ndarray = jnp.float32(0.4)
    gravity: jnp.ndarray = jnp.zeros(3, jnp.float32)          # handtrack.h:837
    coloumb: jnp.ndarray = jnp.float32(0.6)
    biasfactorjoint: jnp.ndarray = jnp.float32(0.3)
    biasfactorpositive: jnp.ndarray = jnp.float32(0.3)
    biasfactornegative: jnp.ndarray = jnp.float32(0.3)
    falltime_to_ballistic: jnp.ndarray = jnp.float32(0.2)
    driftmax: jnp.ndarray = jnp.float32(0.03 / 8.0)           # handtrack.h:838
    damping: jnp.ndarray = jnp.float32(0.15)


class BodyState(NamedTuple):
    """Dynamic state of all bodies of one track. pose = (B,7) pos+quat."""
    pose: jnp.ndarray          # (B, 7)
    linear_momentum: jnp.ndarray   # (B, 3)
    angular_momentum: jnp.ndarray  # (B, 3)

    @property
    def position(self):
        return self.pose[..., :3]

    @property
    def orientation(self):
        return self.pose[..., 3:7]


class BodyParams(NamedTuple):
    """Static inertial properties (from HandModelArrays)."""
    massinv: jnp.ndarray             # (B,)
    tensorinv_massless: jnp.ndarray  # (B, 3, 3)
    damping: jnp.ndarray             # (B,)
    gravscale: jnp.ndarray           # (B,)
    start_pose: jnp.ndarray          # (B, 7) for NaN reset


class LinearRows(NamedTuple):
    """LimitLinear rows (physics.h:270-308), world-space precomputed form.

    r0/r1 are world-rotated lever arms (qrot(orientation, position_local));
    targetdist is converted to targetspeed at solve start exactly like
    PhysicsUpdate (physics.h:553-554).
    """
    b0: jnp.ndarray        # (R,) int32, -1 = world
    b1: jnp.ndarray        # (R,)
    normal: jnp.ndarray    # (R, 3)
    r0: jnp.ndarray        # (R, 3)
    r1: jnp.ndarray        # (R, 3)
    targetdist: jnp.ndarray        # (R,)
    targetspeednobias: jnp.ndarray  # (R,)
    fmin: jnp.ndarray      # (R,) force limits (already min/max sorted)
    fmax: jnp.ndarray      # (R,)
    friction_master: jnp.ndarray   # (R,) int32 offset to sibling row; 0 = none
    friction_coef: jnp.ndarray     # (R,)
    active: jnp.ndarray    # (R,) bool

    @staticmethod
    def empty(n: int):
        z = jnp.zeros(n, jnp.float32)
        z3 = jnp.zeros((n, 3), jnp.float32)
        return LinearRows(
            b0=jnp.full(n, -1, jnp.int32), b1=jnp.full(n, -1, jnp.int32),
            normal=z3, r0=z3, r1=z3, targetdist=z, targetspeednobias=z,
            fmin=z, fmax=z, friction_master=jnp.zeros(n, jnp.int32),
            friction_coef=z, active=jnp.zeros(n, bool))


class AngularRows(NamedTuple):
    """LimitAngular rows (physics.h:239-266)."""
    b0: jnp.ndarray        # (R,) int32, -1 = world
    b1: jnp.ndarray        # (R,)
    axis: jnp.ndarray      # (R, 3) world space
    targetspin: jnp.ndarray  # (R,)
    mintorque: jnp.ndarray   # (R,)
    maxtorque: jnp.ndarray   # (R,)
    active: jnp.ndarray      # (R,) bool

    @staticmethod
    def empty(n: int):
        z = jnp.zeros(n, jnp.float32)
        return AngularRows(
            b0=jnp.full(n, -1, jnp.int32), b1=jnp.full(n, -1, jnp.int32),
            axis=jnp.zeros((n, 3), jnp.float32), targetspin=z,
            mintorque=jnp.full(n, -FLT_MAX), maxtorque=jnp.full(n, FLT_MAX),
            active=jnp.zeros(n, bool))


def concat_linear(*rows: LinearRows) -> LinearRows:
    return LinearRows(*[jnp.concatenate(xs) for xs in zip(*rows)])


def concat_angular(*rows: AngularRows) -> AngularRows:
    return AngularRows(*[jnp.concatenate(xs) for xs in zip(*rows)])


# ---------------------------------------------------------------------------
# quaternion integration (physics.h:202-218)
# ---------------------------------------------------------------------------

def _world_iinv(q, tinv_massless, massinv):
    """Iinv = R * tinv * R^T * massinv (physics.h:518)."""
    # rotate matrix: columns are qrot of columns
    R = jnp.stack([qrot(q, jnp.eye(3, dtype=q.dtype)[i]) for i in range(3)], axis=-1)
    return R @ tinv_massless @ R.swapaxes(-1, -2) * massinv[..., None, None]


def _diffq(q, tinv, angular):
    qn = qnormalize(q)
    R = jnp.stack([qrot(qn, jnp.eye(3, dtype=q.dtype)[i]) for i in range(3)], axis=-1)
    iinv = R @ tinv @ R.swapaxes(-1, -2)
    halfspin = (iinv @ angular[..., None])[..., 0] * 0.5
    return qmul(jnp.concatenate([halfspin, jnp.zeros_like(halfspin[..., :1])], -1), qn)


def rkupdateq(q, tinv, angular, dt):
    d1 = _diffq(q, tinv, angular)
    d2 = _diffq(q + d1 * (dt / 2), tinv, angular)
    d3 = _diffq(q + d2 * (dt / 2), tinv, angular)
    d4 = _diffq(q + d3 * dt, tinv, angular)
    return qnormalize(q + d1 * (dt / 6) + d2 * (dt / 3) + d3 * (dt / 3) + d4 * (dt / 6))


# ---------------------------------------------------------------------------
# the solve
# ---------------------------------------------------------------------------

def _gather_body(arr, idx):
    """arr (B,3), idx scalar int (-1 = world -> zeros)."""
    v = arr[jnp.maximum(idx, 0)]
    return jnp.where(idx >= 0, v, jnp.zeros_like(v))


def physics_update(state: BodyState, bodies: BodyParams,
                   linears: LinearRows, angulars: AngularRows,
                   params: PhysicsParams,
                   iterations: int = 16, iterations_post: int = 4) -> BodyState:
    """One PhysicsUpdate (physics.h:543-587). Contact rows, if any, must
    already be appended to `linears` (see physics/contacts.py)."""
    dt = params.deltaT
    B = state.pose.shape[0]

    # ---- rbinitvelocity (physics.h:500-519) ----
    dampleftover = jnp.power(1.0 - jnp.maximum(bodies.damping, params.damping), dt)
    lin = state.linear_momentum * dampleftover[:, None]
    ang = state.angular_momentum * dampleftover[:, None]
    mass = 1.0 / bodies.massinv
    lin = lin + params.gravity * (mass * bodies.gravscale * dt)[:, None]
    q = state.orientation
    iinv = jax.vmap(_world_iinv)(q, bodies.tensorinv_massless, bodies.massinv)  # (B,3,3)

    # ---- precompute per-row constants ----
    def row_consts_linear(r: LinearRows):
        mi0 = jnp.where(r.b0 >= 0, bodies.massinv[jnp.maximum(r.b0, 0)], 0.0)
        mi1 = jnp.where(r.b1 >= 0, bodies.massinv[jnp.maximum(r.b1, 0)], 0.0)
        I0 = iinv[jnp.maximum(r.b0, 0)] * (r.b0 >= 0).astype(jnp.float32)[:, None, None]
        I1 = iinv[jnp.maximum(r.b1, 0)] * (r.b1 >= 0).astype(jnp.float32)[:, None, None]
        J0 = jnp.cross(r.r0, r.normal)          # angular jacobians
        J1 = jnp.cross(r.r1, r.normal)
        K0 = (I0 @ J0[..., None])[..., 0]       # Iinv * cross(r, n)
        K1 = (I1 @ J1[..., None])[..., 0]
        denom = (mi0 + jnp.einsum("rk,rk->r", jnp.cross(K0, r.r0), r.normal)
                 + mi1 + jnp.einsum("rk,rk->r", jnp.cross(K1, r.r1), r.normal))
        denominv = jnp.where(r.active & (denom != 0), 1.0 / denom, 0.0)
        return mi0, mi1, J0, J1, K0, K1, denominv

    lc = row_consts_linear(linears)

    def row_consts_angular(r: AngularRows):
        I0 = iinv[jnp.maximum(r.b0, 0)] * (r.b0 >= 0).astype(jnp.float32)[:, None, None]
        I1 = iinv[jnp.maximum(r.b1, 0)] * (r.b1 >= 0).astype(jnp.float32)[:, None, None]
        K0 = (I0 @ r.axis[..., None])[..., 0]
        K1 = (I1 @ r.axis[..., None])[..., 0]
        denom = (jnp.einsum("rk,rk->r", r.axis, K0)
                 + jnp.einsum("rk,rk->r", r.axis, K1))
        spintotorque = jnp.where(r.active & (denom != 0), 1.0 / denom, 0.0)
        return K0, K1, spintotorque

    ac = row_consts_angular(angulars)

    targetspeed0 = linears.targetdist / dt  # physics.h:553-554

    n_lin = linears.b0.shape[0]
    n_ang = angulars.b0.shape[0]

    def sweep(carry, targetspeed, targetspin):
        lin, ang, isum, torq = carry

        # --- linear rows in order (physics.h:558-559) ---
        lin_xs = (linears.b0, linears.b1, linears.normal, *lc,
                  targetspeed, linears.fmin, linears.fmax,
                  linears.friction_master, linears.friction_coef,
                  linears.active, jnp.arange(linears.b0.shape[0]))

        def lin_step(c, xs):
            lin, ang, isum = c
            (b0, b1, n, mi0, mi1, J0, J1, K0, K1, dinv, ts,
             fmin, fmax, fmaster, fcoef, act, ridx) = xs
            l0, a0 = _gather_body(lin, b0), _gather_body(ang, b0)
            l1, a1 = _gather_body(lin, b1), _gather_body(ang, b1)
            vn = (jnp.dot(l1, n) * mi1 + jnp.dot(a1, K1)
                  - jnp.dot(l0, n) * mi0 - jnp.dot(a0, K0))
            impulse = (-ts - vn) * dinv
            # friction rows read the master row's accumulated normal impulse;
            # physics.h:292 sets forcelimit.y = coef*master_sum/dt which the
            # clamp then multiplies back by dt -> bound is coef*master_sum.
            master_sum = isum[jnp.maximum(ridx + fmaster, 0)]
            f_hi = fcoef * master_sum
            hi = jnp.where(fmaster != 0, f_hi, fmax * dt)
            lo = jnp.where(fmaster != 0, -f_hi, fmin * dt)
            impulse = jnp.minimum(impulse, hi - isum[ridx])
            impulse = jnp.maximum(impulse, lo - isum[ridx])
            impulse = jnp.where(act, impulse, 0.0)
            dl = n * impulse
            w0 = (b0 >= 0)
            w1 = (b1 >= 0)
            lin = lin.at[jnp.maximum(b0, 0)].add(jnp.where(w0, -dl, 0.0))
            ang = ang.at[jnp.maximum(b0, 0)].add(jnp.where(w0, -J0 * impulse, 0.0))
            lin = lin.at[jnp.maximum(b1, 0)].add(jnp.where(w1, dl, 0.0))
            ang = ang.at[jnp.maximum(b1, 0)].add(jnp.where(w1, J1 * impulse, 0.0))
            isum = isum.at[ridx].add(impulse)
            return (lin, ang, isum), None

        if n_lin:
            (lin, ang, isum), _ = jax.lax.scan(lin_step, (lin, ang, isum), lin_xs)

        # --- angular rows in order (physics.h:560-561) ---
        ang_xs = (angulars.b0, angulars.b1, angulars.axis, *ac, targetspin,
                  angulars.mintorque, angulars.maxtorque, angulars.active,
                  jnp.arange(angulars.b0.shape[0]))

        def ang_step(c, xs):
            ang, torq = c
            (b0, b1, axis, K0, K1, stt, ts, mint, maxt, act, ridx) = xs
            a0 = _gather_body(ang, b0)
            a1 = _gather_body(ang, b1)
            currentspin = jnp.dot(a1, K1) - jnp.dot(a0, K0)
            dtorque = (ts - currentspin) * stt
            dtorque = jnp.minimum(dtorque, maxt * dt - torq[ridx])
            dtorque = jnp.maximum(dtorque, mint * dt - torq[ridx])
            dtorque = jnp.where(act & (ts != -FLT_MAX), dtorque, 0.0)
            w0 = (b0 >= 0)
            w1 = (b1 >= 0)
            ang = ang.at[jnp.maximum(b0, 0)].add(jnp.where(w0, -axis * dtorque, 0.0))
            ang = ang.at[jnp.maximum(b1, 0)].add(jnp.where(w1, axis * dtorque, 0.0))
            torq = torq.at[ridx].add(dtorque)
            return (ang, torq), None

        if n_ang:
            (ang, torq), _ = jax.lax.scan(ang_step, (ang, torq), ang_xs)
        return (lin, ang, isum, torq)

    isum = jnp.zeros_like(linears.targetdist)
    torq = jnp.zeros_like(angulars.targetspin)

    def main_iter(_, carry):
        return sweep(carry, targetspeed0, angulars.targetspin)

    lin, ang, isum, torq = jax.lax.fori_loop(
        0, iterations, main_iter, (lin, ang, isum, torq))

    # ---- rbcalcnextpose (physics.h:522-531) ----
    pos_next = state.position + lin * (bodies.massinv * dt)[:, None]
    q_next = jax.vmap(rkupdateq, in_axes=(0, 0, 0, None))(
        q, bodies.tensorinv_massless * bodies.massinv[:, None, None], ang, dt)

    # ---- RemoveBias (physics.h:570-573) ----
    ts_nobias = jnp.minimum(targetspeed0, linears.targetspeednobias)
    spin_nobias = jnp.where(angulars.mintorque < 0, 0.0,
                            jnp.minimum(angulars.targetspin, 0.0))
    spin_nobias = jnp.where(angulars.targetspin == -FLT_MAX,
                            angulars.targetspin, spin_nobias)

    def post_iter(_, carry):
        return sweep(carry, ts_nobias, spin_nobias)

    lin, ang, isum, torq = jax.lax.fori_loop(
        0, iterations_post, post_iter, (lin, ang, isum, torq))

    # ---- rbupdatepose: commit pose computed BEFORE bias removal ----
    new_pose = jnp.concatenate([pos_next, q_next], axis=-1)
    return BodyState(pose=new_pose, linear_momentum=lin, angular_momentum=ang)


def sanity_check(state: BodyState, bodies: BodyParams) -> BodyState:
    """physmodel.h:437-442: reset any body whose state went NaN."""
    bad = (jnp.isnan(state.pose).any(-1) | jnp.isnan(state.linear_momentum).any(-1)
           | jnp.isnan(state.angular_momentum).any(-1))
    pose = jnp.where(bad[:, None], bodies.start_pose, state.pose)
    lm = jnp.where(bad[:, None], 0.0, state.linear_momentum)
    am = jnp.where(bad[:, None], 0.0, state.angular_momentum)
    return BodyState(pose, lm, am)
