"""Fused PGS fit: tracks-last factories + prep + Pallas solve + integration.

The kernel-path FitPointCloud (model/hand.py:_fit_point_cloud_pgs) builds
constraint rows with per-track factories under the tracks vmap — hundreds of
(T, R, 3)-shaped HLOs — then re-lays them out into the solve kernel's
tracks-last phase planes.  This module replaces the whole row pipeline for
the batched case with physics/row_planes.py (same algebra, native planes
layout), feeds the SAME (n_phases, nch*W, T) tensors to the SAME Pallas
kernel, and integrates poses tracks-last.

Public entry `fused_fit` is a jax.custom_batching.custom_vmap like
physics_update_pgs: unbatched (CPU tests, single track) it falls back to the
existing per-track factories + the colored solver — the parity baseline —
so batched-vs-unbatched equivalence pins the planes rewrite.

Reference semantics: physmodel.h:345-356 FitPointCloud row order
[caller singles][cloud singles][joint nailed][contacts]; angulars
[ApplyAngles][arm cone][joint ranges] (handtrack.h:658-688) or
[joint ranges] alone for the main-thread fit (handtrack.h:769-783).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import row_planes as rp
from .colored import SingleBodyLinear
from .contacts import CONTACT_POINTS
from .solver import BodyState, PhysicsParams
from .pgs_kernel import (_batched_world_iinv, _pad_tracks, _pallas_solve,
                         _prep_singles, _interpret, _tblk, _PLANS)

_FUSED: dict = {}

BPK = 24     # ops/cloud_rows.BP — the packed block's body padding


def _cloud_singles_planes(packed, dt, Tp):
    """packed (T, 12, BPK*C) solve-prep channels from
    ops/cloud_rows.cloud_rows_solve_ph -> (C, 14*BPK, Tp) singles planes,
    value-equal to _prep_singles of the reconstructed SingleBodyLinear
    (n/J1/K1/dinv/tsm computed in-kernel with the same FMA expressions; the
    tsp/force channels derived here with the same ops)."""
    T = packed.shape[0]
    C = packed.shape[2] // BPK
    x = packed.reshape(T, 12, BPK, C)
    tsm = x[:, 10]
    tsp = jnp.minimum(tsm, 0.0)                    # tsnb = 0 for cloud rows
    f = x[:, 11] * dt                              # scale * dt (0 if empty)
    chans = jnp.concatenate(
        [x[:, 0:11], tsp[:, None], (-f)[:, None], f[:, None]],
        axis=1)                                    # (T, 14, BPK, C)
    planes = chans.transpose(3, 1, 2, 0).reshape(C, 14 * BPK, T)
    return _pad_tracks(planes, Tp)


def _model_np(model):
    keys = ["joint_rbi0", "joint_rbi1", "joint_p0", "joint_p1", "joint_frame",
            "joint_rangemin", "joint_rangemax"]
    return {k: np.asarray(getattr(model, k)) for k in keys}


def _unbatched_rows(state, model, params, mode, drive_force, aa,
                    use_contacts):
    """The per-track factory path (parity baseline): returns
    (lin_rows list, ang_rows list) matching the plan's classes."""
    from ..model.hand import joint_linear_rows, joint_angular_rows
    from ..tracker.runtime import apply_angles, hand_model_enhancements
    from .contacts import contact_rows

    if mode == "dyn":
        _, rmin, rmax = hand_model_enhancements(state, model, params,
                                                armdir=None)
        extra_ang = []
    else:
        palmq, clenched, camq = aa
        from ..cnn.labels import CNNAnalysis
        analysis = CNNAnalysis(
            crays=jnp.zeros((8, 4)), image_points=jnp.zeros((8, 2)),
            confidence=jnp.zeros(8), vals=jnp.zeros(16),
            wristroll=jnp.float32(0), pitch=jnp.float32(0),
            tilt=jnp.float32(0), palmq=palmq, finger_clenched=clenched)
        camera_pose = jnp.concatenate([jnp.zeros(3), camq])
        extra_ang = []
        if mode == "ms_angles":
            aa_rows = apply_angles(state, model, analysis, camera_pose,
                                   params, drive_force)
            extra_ang.append(jax.tree.map(lambda x: x[:3], aa_rows))
            extra_ang.append(jax.tree.map(lambda x: x[3:], aa_rows))
        from ..maths.quat import qrot
        from ..maths.pose import pose_quat
        armdir = qrot(pose_quat(camera_pose), jnp.asarray([0.0, -1, 0]))
        enh, rmin, rmax = hand_model_enhancements(state, model, params,
                                                  armdir)
        extra_ang.append(enh)

    lin_rows = [joint_linear_rows(state, model)]
    if use_contacts:
        lin_rows.append(contact_rows(state, model, params))
    ang_rows = extra_ang + [joint_angular_rows(state, model, params,
                                               rmin, rmax)]
    return lin_rows, ang_rows


def _get_fused(plan_key: str, iterations: int, iterations_post: int,
               mode: str, drive_force: float, model, cloud_slots: int):
    key = (plan_key, iterations, iterations_post, mode, drive_force,
           cloud_slots)
    if key in _FUSED:
        return _FUSED[key]
    plan = _PLANS[plan_key]
    model_np = _model_np(model)
    model_np["massinv"] = np.asarray(model.massinv)
    model_np["tensorinv_massless"] = np.asarray(model.tensorinv_massless)
    pairs_np = np.asarray(model.collide_pairs)
    use_contacts = len(plan.lin_classes) > 1

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fit(state, bodies, single_rows, cloud, aa, params):
        from .colored import (StaticPairAngular, StaticPairLinear,
                              physics_update_colored)
        lin_rows, ang_rows = _unbatched_rows(state, model, params, mode,
                                             drive_force, aa, use_contacts)
        if cloud is not None:
            # unbatched parity fallback: the 16-channel reference-shaped
            # reconstruction + colored solve
            from ..ops.cloud_rows import cloud_rows_packed_ph
            ph, origin, scale_b = cloud
            sb_cloud, _ = cloud_rows_packed_ph(state, model, ph, origin,
                                               scale_b, cloud_slots)
            single_rows = (sb_cloud if single_rows is None else
                           jax.tree.map(
                               lambda a, b: jnp.concatenate([a, b], axis=0),
                               single_rows, sb_cloud))
        lin_blocks = []
        if plan.CS:
            lin_blocks.append(single_rows)
        for cls, rows in zip(plan.lin_classes, lin_rows):
            rows = rows._replace(b0=jnp.asarray(cls.b0),
                                 b1=jnp.asarray(cls.b1))
            lin_blocks.append(StaticPairLinear(
                rows, jnp.asarray(cls.gidx), jnp.asarray(cls.gmask),
                jnp.asarray(cls.onehot0), jnp.asarray(cls.onehot1)))
        ang_blocks = []
        for cls, rows in zip(plan.ang_classes, ang_rows):
            rows = rows._replace(b0=jnp.asarray(cls.b0),
                                 b1=jnp.asarray(cls.b1))
            ang_blocks.append(StaticPairAngular(
                rows, jnp.asarray(cls.gidx), jnp.asarray(cls.gmask),
                jnp.asarray(cls.onehot0), jnp.asarray(cls.onehot1)))
        return physics_update_colored(state, bodies, lin_blocks, ang_blocks,
                                      params, iterations=iterations,
                                      iterations_post=iterations_post)

    @fit.def_vmap
    def fit_vmap(axis_size, in_batched, state, bodies, single_rows,
                 cloud, aa, params):
        T = axis_size
        (sb_state, sb_bodies, sb_single, sb_cloud, sb_aa,
         sb_params) = in_batched

        def bc(tree, tb):
            return jax.tree.map(
                lambda x, b: x if b else
                jnp.broadcast_to(jnp.asarray(x), (T,) + jnp.shape(x)),
                tree, tb)

        state = bc(state, sb_state)
        if single_rows is not None:
            single_rows = bc(single_rows, sb_single)
        if cloud is not None:
            cloud = bc(cloud, sb_cloud)
        aa = bc(aa, sb_aa) if aa is not None else None
        bodies_u = jax.tree.map(lambda x, b: x[0] if b else x, bodies,
                                sb_bodies)
        params_u = jax.tree.map(lambda x, b: x[0] if b else x, params,
                                sb_params)
        out = _fused_batched(plan, iterations, iterations_post, mode,
                             drive_force, model, model_np, pairs_np,
                             use_contacts, cloud_slots, state, bodies_u,
                             single_rows, cloud, aa, params_u)
        return out, jax.tree.map(lambda _: True, out)

    _FUSED[key] = fit
    return fit


def _fused_batched(plan, iterations, iterations_post, mode, drive_force,
                   model, model_np, pairs_np, use_contacts, cloud_slots,
                   state, bodies, single_rows, cloud, aa, params):
    """The tracks-last batched rule."""
    dt = params.deltaT
    T, B = state.pose.shape[0], state.pose.shape[1]
    Tp = -(-T // _tblk(plan)) * _tblk(plan)
    bp = plan.bp
    hmi = model_np["massinv"]
    htinv = model_np["tensorinv_massless"]

    P = rp.pose_planes(state.pose, bodies.tensorinv_massless, bodies.massinv)
    iinv_tb = _batched_world_iinv(state.pose[..., 3:7],
                                  bodies.tensorinv_massless, bodies.massinv)

    # ---- momenta planes (rbinitvelocity, physics.h:500-519) ----
    dampleftover = jnp.power(
        1.0 - jnp.maximum(bodies.damping, params.damping), dt)
    lin0 = state.linear_momentum * dampleftover[None, :, None]
    ang0 = state.angular_momentum * dampleftover[None, :, None]
    mass = 1.0 / bodies.massinv
    lin0 = lin0 + params.gravity[None, None, :] * (
        mass * bodies.gravscale * dt)[None, :, None]

    def mom_planes(linm, angm):
        x = jnp.concatenate([linm, angm], axis=-1)      # (T, B, 6)
        x = jnp.pad(x, ((0, 0), (0, bp - B), (0, 0)))
        x = x.transpose(2, 1, 0)
        return _pad_tracks(x.reshape(6 * bp, T), Tp)

    mom0 = mom_planes(lin0, ang0)
    mi = _pad_tracks(jnp.broadcast_to(
        jnp.pad(bodies.massinv, (0, bp - B))[:, None], (bp, T)), Tp)

    # ---- singles ----
    # caller blocks (ray/chamber, a handful of slots) go through the XLA
    # prep; the packed cloud block arrives as the kernel's solve-prep
    # channels and needs only ONE transpose to the planes layout (slot
    # order preserved: [caller blocks][cloud], as the reference emits them)
    s_parts = []
    if single_rows is not None:
        s_parts.append(_prep_singles(single_rows, iinv_tb, bodies.massinv,
                                     dt, Tp, bp))
    if cloud is not None:
        from ..ops.cloud_rows import cloud_rows_solve_ph
        ph, origin, scale_b = cloud
        packed, _ = jax.vmap(
            lambda s, p, o, sc: cloud_rows_solve_ph(
                s, model, p, o, sc, cloud_slots, dt))(
            state, ph, origin, scale_b)                  # (T, 12, BPK*C)
        s_parts.append(_cloud_singles_planes(packed, dt, Tp))
    s_all = (jnp.concatenate(s_parts, axis=0) if len(s_parts) > 1
             else s_parts[0] if s_parts else None)
    if plan.CS:
        assert s_all is not None and s_all.shape[0] == plan.CS, (
            plan.key, None if s_all is None else s_all.shape)

    # ---- pair-class channels, tracks-last ----
    lin_chans = []
    # joints
    (jb0, jb1, n, r0, r1, td, tsnb, fmin, fmax, fcoef, act) = \
        rp.joint_lin_geometry(P, model_np)
    lin_chans.append(rp.prep_lin_channels(
        P, jb0, jb1, hmi, dt, n, r0, r1, td, tsnb, fmin, fmax, fcoef, act))
    if use_contacts:
        # contacts (fields from the VMEM contact kernel)
        from .contact_kernel import contact_fields
        fields = contact_fields(state.pose, state.linear_momentum,
                                state.angular_momentum, model, params,
                                CONTACT_POINTS)
        (cb0, cb1, n, r0, r1, td, tsnb, fmin, fmax, fcoef, act) = \
            rp.contact_geometry(fields, pairs_np, params, 0.6,
                                CONTACT_POINTS)
        lin_chans.append(rp.prep_lin_channels(
            P, cb0, cb1, hmi, dt, n, r0, r1, td, tsnb, fmin, fmax, fcoef,
            act))

    ang_chans = []
    if mode == "dyn":
        rmin, rmax = rp.enhancement_ranges(P, model_np)
    else:
        palmq_b, clenched_b, camq_b = aa                 # (T,4),(T,5),(T,4)
        palmq = [palmq_b[:, c][None, :] for c in range(4)]
        camq = [camq_b[:, c][None, :] for c in range(4)]
        clenched = clenched_b.T                          # (5, T)
        if mode == "ms_angles":
            dax, dspin, dmint, dmaxt, dact = rp.apply_angles_drive(
                P, palmq, camq, drive_force, params)
            ang_chans.append(rp.prep_ang_channels(
                P, np.asarray([-1] * 3), np.asarray([1] * 3), dt, dax, dspin,
                dmint, dmaxt, dact))
            (qb0, qb1, cax, cspin, cmint, cmaxt, cact) = \
                rp.apply_angles_cones(P, clenched, model_np, params)
            ang_chans.append(rp.prep_ang_channels(
                P, qb0, qb1, dt, cax, cspin, cmint, cmaxt, cact))
        (mb0, mb1, max_, mspin, mmint, mmaxt, mact) = \
            rp.armdir_cone(P, camq, params)
        ang_chans.append(rp.prep_ang_channels(
            P, mb0, mb1, dt, max_, mspin, mmint, mmaxt, mact))
        rmin, rmax = rp.enhancement_ranges(P, model_np)
    (ab0, ab1, axis, spins, mints, maxts, aact) = rp.joint_ang_geometry(
        P, model_np, params, rmin, rmax)
    ang_chans.append(rp.prep_ang_channels(
        P, ab0, ab1, dt, axis, spins, mints, maxts, aact))

    assert len(lin_chans) == len(plan.lin_classes), (mode, plan.key)
    assert len(ang_chans) == len(plan.ang_classes), (mode, plan.key)
    lin_planes = [rp.phase_planes_t(ch, cls, Tp)
                  for ch, cls in zip(lin_chans, plan.lin_classes)]
    ang_planes = [rp.phase_planes_t(ch, cls, Tp)
                  for ch, cls in zip(ang_chans, plan.ang_classes)]
    import os
    zp = os.environ.get("HTS_ZERO_PLANES")
    if zp:
        # perf-experiment ONLY (mirrors pgs_kernel._solve_batched): zero the
        # pair-row planes with a cheap pose-dependent scalar so XLA drops the
        # factories AND prep — attributes their cost by subtraction.
        # Values: "1"/"all" (every class), "contacts" (the contact lin class
        # only), "joints" (joint lin class), "ang" (all angular classes).
        z = state.pose[0, 0, 0] * 0.0
        zero = lambda x: jnp.broadcast_to(z, x.shape)
        if zp in ("1", "all"):
            lin_planes = [zero(x) for x in lin_planes]
            ang_planes = [zero(x) for x in ang_planes]
        elif zp == "contacts" and len(lin_planes) > 1:
            lin_planes = [lin_planes[0]] + [zero(x) for x in lin_planes[1:]]
        elif zp == "joints":
            lin_planes = [zero(lin_planes[0])] + lin_planes[1:]
        elif zp == "ang":
            ang_planes = [zero(x) for x in ang_planes]
    lin_G = [jnp.asarray(c.gather) for c in plan.lin_classes]
    lin_S = [jnp.asarray(c.scatter) for c in plan.lin_classes]
    ang_G = [jnp.asarray(c.gather) for c in plan.ang_classes]
    ang_S = [jnp.asarray(c.scatter) for c in plan.ang_classes]

    out = _pallas_solve(plan, iterations, iterations_post, mom0, mi, s_all,
                        lin_planes, lin_G, lin_S, ang_planes, ang_G, ang_S,
                        interpret=_interpret())          # (2, 6BP, Tp)

    # ---- pose integration, tracks-last (physics.h:522-531) ----
    m0 = out[0].reshape(6, bp, Tp)[:, :B, :T]
    mf = out[1].reshape(6, bp, Tp)[:, :B, :T]
    mi_dt = jnp.asarray(hmi)[:, None] * dt
    pos_next = [P.tr[c] + m0[c] * mi_dt for c in range(3)]
    tinv_mi = htinv * hmi[:, None, None]
    q_next = rp.rkupdateq_planes(P.q, tinv_mi, [m0[3 + c] for c in range(3)],
                                 dt)
    pose = jnp.stack(pos_next + q_next, axis=0)          # (7, B, T)
    pose = pose.transpose(2, 1, 0)                       # (T, B, 7)
    lin_f = jnp.stack([mf[c] for c in range(3)], axis=0).transpose(2, 1, 0)
    ang_f = jnp.stack([mf[3 + c] for c in range(3)], axis=0).transpose(2, 1, 0)
    return BodyState(pose=pose, linear_momentum=lin_f, angular_momentum=ang_f)


def fused_fit(state: BodyState, bodies, single_rows: SingleBodyLinear, aa,
              plan, params: PhysicsParams, iterations: int = 16,
              iterations_post: int = 4, mode: str = "dyn",
              drive_force: float = 0.0, model=None,
              cloud=None, cloud_slots: int = 0) -> BodyState:
    """One FitPointCloud solve on the fused tracks-last path.

    single_rows: caller singles (C_small, B, ...) or None.
    cloud: (ph (8, N), origin (3,), scale_per_body (B,)) — the point planes
    carrier; the batched rule packs it with the 12-channel solve-prep kernel
    (ops/cloud_rows.cloud_rows_solve_ph) straight into the solve planes, the
    unbatched parity fallback with the 16-channel reference reconstruction.
    Slot order is [single_rows][cloud] and the total must equal plan.CS.
    aa: None for mode="dyn", else (palmq (4,), finger_clenched (5,),
    camera_q (4,)).  mode: "dyn" | "ms_angles" | "ms_noangles".
    drive_force: the ApplyAngles palm-drive torque limit (static).
    """
    fit = _get_fused(plan.key, iterations, iterations_post, mode,
                     float(drive_force), model, cloud_slots)
    return fit(state, bodies, single_rows, cloud, aa, params)
