"""Bone-to-bone contact generation, TPU-shaped.

The reference generates up to 5 contact points per colliding pair with an
iterative GJK contact patch (third_party/gjk.h:608-643, physics.h:451-489) —
branchy, sequential, and a poor fit for the MXU.  Bones are small convex
hulls with precomputed face planes, so the separating direction is found by
face-axis SAT *tightened with a few support-direction refinement steps*
(face axes alone miss edge-edge closest features and under-estimate
separation, activating contacts the reference's true-GJK gate rejects —
measured on the clenched-fist golden, tests/test_contacts_golden.py).  Per
colliding pair we then emit a contact manifold: the up-to-`n_points` deepest
vertices of the other hull under the winning face (the flat-face analog of
the reference's 4-jiggle patch), each with the same three rows the reference
emits per contact (normal row with positive-bias target + two friction rows
slaved to it, physics.h:463-489).  Points further apart than
`physics_driftmax` are masked.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maths.pose import pose_apply, pose_inverse, pose_mul, pose_quat
from ..maths.quat import qconj, qrot, quat_from_to, qxdir, qydir
from .solver import BodyState, FLT_MAX, LinearRows, PhysicsParams

CONTACT_POINTS = 4   # manifold size per pair (reference patch: up to 5)


def _face_separation(planes, plane_mask, pose_self, verts_other, mask_other,
                     pose_other):
    """Max-separation face of `self` against `other`'s verts.
    Returns (separation, world normal of that face, per-vert dists (V,))."""
    rel = pose_mul(pose_inverse(pose_self), pose_other)
    v = qrot(rel[3:7][None, :], verts_other) + rel[None, :3]   # (V,3) in self
    d = jnp.einsum("pk,vk->pv", planes[:, :3], v) + planes[:, 3:4]
    d = jnp.where(mask_other[None, :], d, jnp.inf)
    dmin = d.min(axis=1)
    dmin = jnp.where(plane_mask, dmin, -jnp.inf)
    face = jnp.argmax(dmin)
    sep = dmin[face]
    n_world = qrot(pose_quat(pose_self), planes[face, :3])
    return sep, n_world, d[face]


def _support(verts, mask, pose, n_world):
    """Support point of a hull along world direction n (world coords)."""
    nl = qrot(qconj(pose_quat(pose)), n_world)
    dots = jnp.where(mask, verts @ nl, -jnp.inf)
    return pose_apply(pose, verts[jnp.argmax(dots)])


def _refined_separation(state, model, a, b, n0, refine_iters: int = 3):
    """Tighten the separation lower bound along iterated support directions
    (the closest-direction iteration for separated convex bodies).  Any
    direction gives a valid lower bound, so the max over iterates only ever
    improves the face-SAT estimate; penetrating pairs keep the face axis."""
    pa, pb = state.pose[a], state.pose[b]

    def sep_along(n):
        sa = _support(model.verts[a], model.vert_mask[a], pa, n)
        sb = _support(model.verts[b], model.vert_mask[b], pb, -n)
        return jnp.dot(sb - sa, n), sa, sb

    best = jnp.float32(-jnp.inf)
    n = n0
    best_n = n0
    for _ in range(refine_iters):
        s, sa, sb = sep_along(n)
        take = s > best
        best = jnp.where(take, s, best)
        best_n = jnp.where(take, n, best_n)
        d = sb - sa
        n = d / jnp.maximum(jnp.linalg.norm(d), 1e-20)
    s, _, _ = sep_along(n)
    take = s > best
    return jnp.where(take, s, best), jnp.where(take, n, best_n)


def contact_rows(state: BodyState, model, params: PhysicsParams,
                 friction: float = 0.6,
                 n_points: int = CONTACT_POINTS) -> LinearRows:
    """ConstrainContacts analog: n_points x [normal, binormal-friction,
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
        pa, pb = state.pose[a], state.pose[b]
        sep_a, n_a, dv_a = _face_separation(
            model.planes[a], model.plane_mask[a], pa,
            model.verts[b], model.vert_mask[b], pb)
        sep_b, n_b, dv_b = _face_separation(
            model.planes[b], model.plane_mask[b], pb,
            model.verts[a], model.vert_mask[a], pa)
        use_a = sep_a >= sep_b
        sep_face = jnp.where(use_a, sep_a, sep_b)
        n = jnp.where(use_a, n_a, -n_b)        # points a -> b

        # activation gate: the refined bound kills edge-edge false positives
        sep_gate, _ = _refined_separation(state, model, a, b, n)
        active_pair = sep_gate < params.driftmax

        # manifold: the n_points deepest verts of the loser hull under the
        # winning face (face-clip analog of the reference's jiggled patch)
        dv = jnp.where(use_a, dv_a, dv_b)            # (V,) face dists
        neg_d, vidx = jax.lax.top_k(-dv, n_points)
        seps = -neg_d                                # ascending depth order
        verts_w_b = pose_apply(pb[None], model.verts[b])
        verts_w_a = pose_apply(pa[None], model.verts[a])
        deep_w = jnp.where(use_a, verts_w_b[vidx], verts_w_a[vidx])  # (P,3)
        p1w = jnp.where(use_a, deep_w, deep_w + n[None, :] * seps[:, None])
        p0w = jnp.where(use_a, deep_w - n[None, :] * seps[:, None], deep_w)
        pt_active = active_pair & (seps < params.driftmax)   # (P,)

        def vel_at(idx, pw):
            r = pw - state.pose[idx, :3]
            q = state.pose[idx, 3:7]
            iinv_l = model.tensorinv_massless[idx] * model.massinv[idx]
            spin = qrot(q, iinv_l @ qrot(qconj(q), state.angular_momentum[idx]))
            return jnp.cross(spin[None], r) + state.linear_momentum[idx] * model.massinv[idx]

        v = vel_at(a, p0w) - vel_at(b, p1w)          # (P,3) physics.h:473
        cnormal = -n
        bouncevel = jnp.maximum(
            0.0, (-(v @ cnormal) - gterm) * params.restitution)    # (P,)
        targetdist = jnp.minimum((seps - minsep) * params.biasfactorpositive,
                                 seps)
        r0 = p0w - state.pose[a, :3]
        r1 = p1w - state.pose[b, :3]
        q = quat_from_to(jnp.asarray([0.0, 0.0, 1.0]), cnormal)
        tangent, binormal = qxdir(q), qydir(q)
        P = n_points
        zero = jnp.zeros(P, jnp.float32)

        def inter(x0, x1, x2):
            """(P,...) triples -> (3P,...) interleaved [n, fb, ft] per point."""
            return jnp.stack([x0, x1, x2], axis=1).reshape((3 * P,) + x0.shape[1:])

        return dict(
            b0=jnp.full(3 * P, a, jnp.int32), b1=jnp.full(3 * P, b, jnp.int32),
            normal=inter(jnp.broadcast_to(n, (P, 3)),
                         jnp.broadcast_to(binormal, (P, 3)),
                         jnp.broadcast_to(tangent, (P, 3))),
            r0=inter(r0, r0, r0), r1=inter(r1, r1, r1),
            targetdist=inter(targetdist, zero, zero),
            targetspeednobias=inter(-bouncevel, zero, zero),
            fmin=jnp.zeros(3 * P, jnp.float32),
            fmax=inter(jnp.full(P, FLT_MAX), zero, zero),
            friction_master=inter(jnp.zeros(P, jnp.int32),
                                  jnp.full(P, -1, jnp.int32),
                                  jnp.full(P, -2, jnp.int32)),
            friction_coef=inter(zero, jnp.full(P, friction),
                                jnp.full(P, friction)),
            active=inter(pt_active, pt_active, pt_active))

    cols = jax.vmap(one)(pairs)
    flat = {k: v.reshape((-1,) + v.shape[2:]) for k, v in cols.items()}
    return LinearRows(**flat)
