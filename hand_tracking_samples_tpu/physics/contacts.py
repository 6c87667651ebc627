"""Bone-to-bone contact generation, TPU-shaped.

The reference generates up to 5 contact points per colliding pair with an
iterative GJK contact patch (third_party/gjk.h:608-643, physics.h:451-489) —
branchy, sequential, and a poor fit for the MXU.  Bones are small convex
hulls with precomputed face planes, so face-plane separation (SAT over face
axes, omitting edge-edge axes) is a tight approximation at hand scales: for
each statically non-ignored pair we take the face axis of either hull that
maximises separation, the other hull's deepest vertex as the contact point,
and emit the same three rows the reference emits per contact (normal row
with positive-bias target + two friction rows slaved to it,
physics.h:463-489).  Pairs further apart than `physics_driftmax` are masked.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maths.pose import pose_apply, pose_inverse, pose_mul, pose_quat
from ..maths.quat import qconj, qrot, quat_from_to, qxdir, qydir
from .solver import BodyState, FLT_MAX, LinearRows, PhysicsParams


def _face_separation(planes, plane_mask, pose_self, verts_other, mask_other,
                     pose_other):
    """Max-separation face of `self` against `other`'s verts.
    Returns (separation, world normal of that face, world deepest vert)."""
    rel = pose_mul(pose_inverse(pose_self), pose_other)
    v = qrot(rel[3:7][None, :], verts_other) + rel[None, :3]   # (V,3) in self
    d = jnp.einsum("pk,vk->pv", planes[:, :3], v) + planes[:, 3:4]
    d = jnp.where(mask_other[None, :], d, jnp.inf)
    dmin = d.min(axis=1)
    dmin = jnp.where(plane_mask, dmin, -jnp.inf)
    face = jnp.argmax(dmin)
    sep = dmin[face]
    vid = jnp.argmin(jnp.where(mask_other, d[face], jnp.inf))
    n_world = qrot(pose_quat(pose_self), planes[face, :3])
    deepest_world = pose_apply(pose_other, verts_other[vid])
    return sep, n_world, deepest_world


def _pair_contact(state: BodyState, model, a, b):
    """Returns (separation, n pointing a->b, contact on a, contact on b),
    all world space."""
    pa, pb = state.pose[a], state.pose[b]
    sep_a, n_a, vb_w = _face_separation(
        model.planes[a], model.plane_mask[a], pa,
        model.verts[b], model.vert_mask[b], pb)
    sep_b, n_b, va_w = _face_separation(
        model.planes[b], model.plane_mask[b], pb,
        model.verts[a], model.vert_mask[a], pa)
    use_a = sep_a >= sep_b
    sep = jnp.where(use_a, sep_a, sep_b)
    n = jnp.where(use_a, n_a, -n_b)
    p1w = jnp.where(use_a, vb_w, va_w + n * sep)   # on b
    p0w = jnp.where(use_a, vb_w - n * sep, va_w)   # on a
    return sep, n, p0w, p1w


def contact_rows(state: BodyState, model, params: PhysicsParams,
                 friction: float = 0.6) -> LinearRows:
    """ConstrainContacts analog: [normal, binormal-friction,
    tangent-friction] per statically collidable pair, masked by separation.

    The bounce-velocity term uses the pre-solve momenta; the reference
    computes it after rbinitvelocity's damping, a <1% difference that
    vanishes with the tracker's zero gravity and zeroed momenta.
    """
    pairs = model.collide_pairs
    minsep = params.driftmax * 0.25
    gterm = jnp.linalg.norm(params.gravity) * params.falltime_to_ballistic

    def one(pair):
        a, b = pair[0], pair[1]
        sep, n, p0w, p1w = _pair_contact(state, model, a, b)
        active = sep < params.driftmax

        def vel_at(idx, pw):
            r = pw - state.pose[idx, :3]
            q = state.pose[idx, 3:7]
            iinv_l = model.tensorinv_massless[idx] * model.massinv[idx]
            spin = qrot(q, iinv_l @ qrot(qconj(q), state.angular_momentum[idx]))
            return jnp.cross(spin, r) + state.linear_momentum[idx] * model.massinv[idx]

        v = vel_at(a, p0w) - vel_at(b, p1w)        # physics.h:473 (v0 - v1)
        cnormal = -n                               # gjk contact normal b->a
        bouncevel = jnp.maximum(
            0.0, (-jnp.sum(cnormal * v) - gterm) * params.restitution)
        targetdist = jnp.minimum((sep - minsep) * params.biasfactorpositive, sep)
        r0 = p0w - state.pose[a, :3]
        r1 = p1w - state.pose[b, :3]
        q = quat_from_to(jnp.asarray([0.0, 0.0, 1.0]), cnormal)
        tangent, binormal = qxdir(q), qydir(q)
        f32 = jnp.float32
        return dict(
            b0=jnp.full(3, a, jnp.int32), b1=jnp.full(3, b, jnp.int32),
            normal=jnp.stack([n, binormal, tangent]),
            r0=jnp.broadcast_to(r0, (3, 3)), r1=jnp.broadcast_to(r1, (3, 3)),
            targetdist=jnp.stack([targetdist, f32(0.0), f32(0.0)]),
            targetspeednobias=jnp.stack([-bouncevel, f32(0.0), f32(0.0)]),
            fmin=jnp.zeros(3, jnp.float32),
            fmax=jnp.asarray([FLT_MAX, 0.0, 0.0], jnp.float32),
            friction_master=jnp.asarray([0, -1, -2], jnp.int32),
            friction_coef=jnp.asarray([0.0, friction, friction], jnp.float32),
            active=jnp.full(3, active, bool))

    cols = jax.vmap(one)(pairs)
    flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in cols.items()}
    return LinearRows(**flat)
