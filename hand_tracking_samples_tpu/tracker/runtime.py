"""HandTracker runtime: the system API (include/handtrack.h:509-846).

One pure function per reference entry point, all jit/vmap/scan-safe:

  * update()            — per-frame tracking step (handtrack.h:748-785)
  * update_cnn_model()  — segmentation + CNN + heavy refit (handtrack.h:693)
  * kickstart()         — synchronous CNN re-init (handtrack.h:743)
  * slowfit()           — annotation-grade stable fit (handtrack.h:786-821)
  * multi_step_sim()    — staged constraint schedule (handtrack.h:642-690)
  * hand_model_enhancements, pose_from_scratch, unibody_fit, apply_angles

Design deltas from the reference, both explicit in TrackerConfig:
  * The reference runs the CNN in a background thread at whatever rate the
    CPU manages, double-buffering the model (handtrack.h:45-48, 515-521).
    On TPU the CNN is ~free, so by default it runs synchronously every frame
    (cnn_every_frame); the two-model copy becomes a functional fork.
  * Dynamic point counts become a fixed budget with a validity mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..cnn.labels import CNNAnalysis, analyze_cnn_output
from ..cnn.model import forward as cnn_forward
from ..fitting.cloud import (cloud_chamber_rows, cloud_constraint_rows,
                             fit_error, scale_cloud_forces)
from ..imaging.camera import DCamera
from ..imaging.image_ops import compact_points, point_cloud
from ..maths.pose import (pose_apply, pose_inverse, pose_mul, pose_quat)
from ..maths.quat import qconj, qmul, qrot, quat_from_axis_angle, quat_from_to, qxdir, qydir, qzdir
from ..model.bake import FEATURE_BONES, FEATURE_OFFSETS
from ..model.hand import (body_params, fit_point_cloud, fix_positions,
                          get_pose_user, initial_state)
from ..physics.constraints import (constrain_along_direction_deadzone,
                                   constrain_angular_drive,
                                   constrain_cone_angle,
                                   constrain_cone_angle_batch,
                                   relative_angular_rows)
from ..physics.contacts import contact_rows
from ..physics.solver import (AngularRows, BodyParams, BodyState, LinearRows,
                              PhysicsParams, concat_angular, concat_linear,
                              physics_update, sanity_check)
from ..segment.handsegment import cnn_input_from_segment, hand_segment_vr
from .config import TrackerConfig

DEG2RAD = 3.14159 / 180.0


def _use_fused() -> bool:
    """Kernel-path row pipeline: fused tracks-last planes (default) vs the
    per-track factories (HTS_FUSED=0, kept for A/B and bisection)."""
    import os
    return os.environ.get("HTS_FUSED", "1") == "1"


def _full_precision(fn):
    """TPU matmuls default to bf16 inputs; geometry/solver contractions need
    f32 (mm-scale parity).  Explicit bf16 casts (e.g. CNN compute_dtype)
    are unaffected — precision only applies to f32 operands."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)
    return wrapped


class TrackerState(NamedTuple):
    body: BodyState
    prev_frame_error: jnp.ndarray   # f32 scalar
    initializing: jnp.ndarray       # i32 scalar


class CnnDebug(NamedTuple):
    """Last CNN inputs/outputs, for visualization parity with
    get_last_segment / get_cnn_difference (handtrack.h:618-640)."""
    cnn_input: jnp.ndarray     # (64, 64) float
    cnn_output: jnp.ndarray    # (2304,)
    image_points: jnp.ndarray  # (8, 2)
    segment_cam_pose: jnp.ndarray


def scale_tracker(model, config: TrackerConfig, s: float):
    """HandTracker::scale (handtrack.h:591): resize the hand model and the
    segmentation diameter together.  Host-side (rebuilds model arrays)."""
    import dataclasses
    import numpy as np
    from ..model.bake import HandModelArrays, scale_model
    host = HandModelArrays(*[np.asarray(x) for x in model.tree_flatten()[0]])
    scaled = scale_model(host, s)
    scaled = jax.tree.map(jnp.asarray, scaled)
    return scaled, dataclasses.replace(
        config, segment_scale=config.segment_scale * s)


def make_tracker_state(model) -> TrackerState:
    return TrackerState(body=initial_state(model),
                        prev_frame_error=jnp.float32(0.0),
                        initializing=jnp.int32(0))


def physics_params(config: TrackerConfig) -> PhysicsParams:
    """Physics globals as the HandTracker ctor sets them (handtrack.h:837-838)."""
    return PhysicsParams(gravity=jnp.zeros(3, jnp.float32),
                         driftmax=jnp.float32(0.03 / 8.0))


# ---------------------------------------------------------------------------
# HandModelEnhancements (handtrack.h:402-441)
# ---------------------------------------------------------------------------

def hand_model_enhancements(body: BodyState, model, params,
                            armdir=None, tiepinkyringmid: bool = False,
                            fingerhold: int = 0):
    """Returns (angular rows, rangemin, rangemax) with the per-frame joint
    range mutations applied.  armdir=None means the zero vector (no cone)."""
    q = body.orientation
    rmin = jnp.asarray(model.joint_rangemin)
    rmax = jnp.asarray(model.joint_rangemax)

    # distal joints: x-range pinned to half the upper knuckle angle
    # (batched over the 4 fingers — one arccos instead of four)
    db = jnp.asarray([7, 10, 13, 16])
    z2 = jax.vmap(qzdir)(q[db - 2])
    z1 = jax.vmap(qzdir)(q[db - 1])
    ang = jnp.arccos(jnp.clip(jnp.sum(z2 * z1, -1), 0.0, 1.0)) \
        * 180.0 / 3.14159 / 2.0
    rmin = rmin.at[db - 1, 0].set(ang)
    rmax = rmax.at[db - 1, 0].set(ang)

    rows = []
    if tiepinkyringmid:
        for b in (15, 14, 12, 11):
            rows.append(constrain_cone_angle(
                body, jnp.int32(b), jnp.asarray([0.0, 1, 0]),
                jnp.int32(b - 3), jnp.asarray([0.0, 1, 0]), 10.0, params))
    if armdir is not None:
        rows.append(constrain_cone_angle(
            body, jnp.int32(-1), armdir, jnp.int32(0),
            jnp.asarray([0.0, 0, 1]), 70.0, params))
    if fingerhold & 1:
        rows.append(constrain_cone_angle(
            body, jnp.int32(1), jnp.asarray([-1.0, 0, 0]), jnp.int32(4),
            jnp.asarray([0.0, 0, 1]), 10.0, params))
    for finger in (1, 2, 3, 4):
        if fingerhold & (1 << finger):
            rows.append(constrain_cone_angle(
                body, jnp.int32(1), jnp.asarray([0.0, 0, -1]),
                jnp.int32(3 + finger * 3), jnp.asarray([0.0, 0, 1]), 10.0,
                params))

    # abduction gating on curl (handtrack.h:434-440), batched over knuckles
    kb = jnp.asarray([14, 11, 8, 5])
    klo = jnp.asarray([-30.0, -10.0, -10.0, -10.0])
    khi = jnp.asarray([10.0, 10.0, 10.0, 20.0])
    cos40 = jnp.cos(40.0 * 3.14 / 180.0)
    up = jnp.sum(qydir(q[1])[None, :] * jax.vmap(qydir)(q[kb]), -1) > cos40
    rmin = rmin.at[kb - 1, 1].set(jnp.where(up, klo, -0.0))
    rmax = rmax.at[kb - 1, 1].set(jnp.where(up, khi, 0.0))

    ang = concat_angular(*rows) if rows else AngularRows.empty(0)
    return ang, rmin, rmax


# ---------------------------------------------------------------------------
# CNNOutputAnalysis::ApplyAngles (handtrack.h:203-216)
# ---------------------------------------------------------------------------

def apply_angles(body: BodyState, model, analysis: CNNAnalysis, camera_pose,
                 params, drive_force, coneangle: float = 10.0) -> AngularRows:
    drive = constrain_angular_drive(
        body, jnp.int32(-1), jnp.int32(1),
        qmul(pose_quat(camera_pose), analysis.palmq), drive_force, params)
    # the 10 finger cones as ONE batched factory call (order preserved:
    # thumb a0, then per finger [knuckle cone, mid cone])
    zero = jnp.float32(0.0)
    a0 = analysis.finger_clenched[0]
    n0s = [jnp.stack([jnp.cos(a0), zero, jnp.sin(a0)])]
    b1s = [4]
    for finger in (1, 2, 3, 4):
        a = analysis.finger_clenched[finger]
        n0s.append(jnp.stack([zero, -jnp.sin(a), jnp.cos(a)]))
        b1s.append(3 + finger * 3)
        jf = jnp.asarray(model.joint_frame[1 + finger * 3])
        n0s.append(qrot(jf, qrot(jf, jnp.stack(
            [zero, -jnp.sin(a / 2.0), jnp.cos(a / 2.0)]))))
        b1s.append(2 + finger * 3)
    K = len(b1s)
    cones = constrain_cone_angle_batch(
        body, jnp.full(K, 1, jnp.int32), jnp.stack(n0s),
        jnp.asarray(b1s, jnp.int32),
        jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (K, 3)),
        jnp.full(K, coneangle, jnp.float32), params)
    return concat_angular(drive, cones)


# ---------------------------------------------------------------------------
# PoseFromScratch (handtrack.h:473-506)
# ---------------------------------------------------------------------------

def pose_from_scratch(body: BodyState, model, analysis: CNNAnalysis,
                      points, point_mask, camera_pose) -> BodyState:
    crays = analysis.crays
    palmray = crays[0, :3] + crays[1, :3] + crays[2, :3]
    palmray = palmray / jnp.maximum(jnp.linalg.norm(palmray), 1e-20)
    c = jnp.cross(points, palmray[None, :])
    w = 1.0 / (1e-6 + jnp.sum(c * c, axis=-1))
    w = jnp.where(point_mask, w, 0.0)
    wsum = 1e-11 + w.sum()
    pcom = (points * w[:, None]).sum(0) / wsum

    st = jnp.asarray(model.start_pose)
    pose = st
    p1 = jnp.concatenate([pcom, qmul(pose_quat(camera_pose), analysis.palmq)])
    dp = pose_mul(p1, pose_inverse(pose[1]))
    pose = jax.vmap(lambda p: pose_mul(dp, p))(pose)

    for finger in (1, 2, 3, 4):
        a = analysis.finger_clenched[finger]
        jf = jnp.asarray(model.joint_frame[1 + finger * 3])
        for k, mult in ((2, 0.5), (3, 1.0), (4, 1.25)):
            b = k + finger * 3
            newq = qmul(jf, qmul(pose[b, 3:7], quat_from_axis_angle(
                jnp.asarray([1.0, 0, 0]), a * mult)))
            pose = pose.at[b, 3:7].set(newq)

    out = BodyState(pose=pose,
                    linear_momentum=jnp.zeros_like(body.linear_momentum),
                    angular_momentum=jnp.zeros_like(body.angular_momentum))
    return fix_positions(out, model)


# ---------------------------------------------------------------------------
# UnibodyFit (handtrack.h:444-470)
# ---------------------------------------------------------------------------

_UNIBODY_HALF = 0.1
# solid cube of side 0.2, unit mass: I = diag(s^2/6) with s=0.2
_UNIBODY_TINV = jnp.eye(3) * (6.0 / (0.2 * 0.2))


def unibody_fit(body: BodyState, model, params, points, point_mask,
                camera_position, unibody_force: float = 0.1,
                iterations: int = 16, iterations_post: int = 4,
                use_kernel: bool = False) -> BodyState:
    # takesubsample(pts) inside UnibodyFit (handtrack.h:453): stride-4 mask,
    # compacted to its exact maximum count so the solve loop stays short
    from ..imaging.image_ops import compact_points
    vsub = point_mask & ((jnp.cumsum(point_mask) - 1) % 4 == 0)
    upts, umask = compact_points(points, vsub, max(points.shape[0] // 4, 64))
    uni_pose = jnp.concatenate([body.pose[1, :3], body.pose[1, 3:7]])
    ustate = BodyState(pose=uni_pose[None], linear_momentum=jnp.zeros((1, 3)),
                       angular_momentum=jnp.zeros((1, 3)))
    ubody = BodyParams(
        massinv=jnp.ones(1), tensorinv_massless=_UNIBODY_TINV[None],
        damping=jnp.zeros(1), gravscale=jnp.ones(1),
        start_pose=uni_pose[None])
    if use_kernel:
        # fused correspondence + row build in VMEM (rows already retargeted
        # to the unibody), then the VMEM-resident sequential-slot solve: the
        # XLA correspondence alone costs ~25x the whole solve at these counts
        from ..ops.cloud_rows import cloud_rows_unibody
        from ..physics.pgs_kernel import build_unibody_plan, physics_update_pgs
        blk = cloud_rows_unibody(body, model, upts, umask, camera_position,
                                 uni_pose[:3], unibody_force)
        plan = build_unibody_plan(blk.targetdist.shape[0])
        out = physics_update_pgs(ustate, ubody, blk, [], [], plan, params,
                                 iterations=iterations,
                                 iterations_post=iterations_post)
    else:
        rows = cloud_constraint_rows(body, model, upts, umask,
                                     origin=camera_position,
                                     use_kernel=False)
        # retarget rows to the unibody (handtrack.h:457-461)
        bpose = body.pose[rows.b1]
        p1_world = pose_apply(bpose, qrot(qconj(pose_quat(bpose)), rows.r1))
        r1_new = p1_world - uni_pose[:3]
        rows = rows._replace(
            b0=jnp.full_like(rows.b0, -1), b1=jnp.zeros_like(rows.b1),
            r1=r1_new,
            fmin=rows.fmin * unibody_force, fmax=rows.fmax * unibody_force)
        # all rows act on the one body, so the single-body colored block
        # keeps the exact sequential order with 4x fewer loop steps
        from ..physics.colored import (pack_single_body_linear,
                                       physics_update_colored)
        blk = pack_single_body_linear(rows, 1, rows.b0.shape[0])
        out = physics_update_colored(ustate, ubody, [blk], [], params,
                                     iterations=iterations,
                                     iterations_post=iterations_post)
    dp = pose_mul(out.pose[0], pose_inverse(body.pose[1]))
    pose = jax.vmap(lambda p: pose_mul(dp, p))(body.pose)
    return sanity_check(body._replace(pose=pose), body_params(model))


# ---------------------------------------------------------------------------
# MultiStepSim (handtrack.h:642-690)
# ---------------------------------------------------------------------------

def multi_step_sim(body: BodyState, model, analysis: CNNAnalysis,
                   points, point_mask, camera_pose, config: TrackerConfig,
                   params, schedule=None, points_ph=None) -> BodyState:
    colored = schedule is not None
    kernel = config.solver == "kernel"
    fused = kernel and _use_fused()
    use_ph = kernel and config.use_pallas and points_ph is not None
    bp = body_params(model)
    body = sanity_check(body, bp)
    if use_ph:
        point_mask = points_ph[4] > 0.5
    npts = jnp.maximum(point_mask.sum(), 1)
    cloudforce = jnp.minimum(config.cloudforce_max_point,
                             config.cloudforce_max_sum / npts)
    contacts_fn = (lambda s: contact_rows(s, model, params)) \
        if config.physics_use_collision else None

    # takesubsample(vpts) (handtrack.h:679): stride-4 of valid, compacted to
    # the exact maximum (ceil(budget/4), lane-aligned) so correspondence runs
    # on a quarter of the slots — the subsample of a full budget cloud never
    # exceeds this, so nothing is dropped.  Loop-invariant (poses don't
    # change the cloud) — computed once.
    vsub = point_mask & ((jnp.cumsum(point_mask) - 1) % 4 == 0)
    N_in = points_ph.shape[1] if use_ph else points.shape[0]
    q = -(-N_in // 4)                             # ceil(budget / 4)
    msub_budget = max(-(-q // 128) * 128, 128)    # lane-aligned
    if use_ph:
        from ..imaging.image_ops import compact_planes
        mph_all = compact_planes(points_ph, vsub, msub_budget)
        mpts_all = mmask_all = None
    else:
        mph_all = None
        mpts_all, mmask_all = compact_points(points, vsub, msub_budget)

    for s in range(config.steps):
        angulars = []
        ang_blocks = []
        extra_ang = []
        has_angles = s < config.steps_keyangles or config.angles_only
        if has_angles and not fused:
            aa = apply_angles(body, model, analysis, camera_pose, params,
                              10000.0 if s < config.steps_palmangle else 0.0)
            if kernel:
                # the multistep plan splits ApplyAngles into the palm-drive
                # unit (3 rows) and the 9 finger-cone units
                extra_ang.append(jax.tree.map(lambda x: x[:3], aa))
                extra_ang.append(jax.tree.map(lambda x: x[3:], aa))
            elif colored:
                from ..physics.schedule import pair_angular
                ang_blocks.append(pair_angular(aa, schedule.apply_angles))
            else:
                angulars.append(aa)
        linears = []
        single_blocks = []
        if s < config.steps_keypoints and not config.angles_only:
            start = 3 if config.steps_keyangles else 0
            for i in range(max(start, 3), 8):
                ok = ((analysis.finger_clenched[i - 3] < 3.14 / 2.0)
                      & (analysis.crays[i, 3] >= config.min_cray_prob))
                q = quat_from_to(jnp.asarray([0.0, 0, 1]), analysis.crays[i, :3])
                bone = int(FEATURE_BONES[i])
                # feature offsets are already in the physics (COM) frame —
                # Skin() applies them to GetPose() poses (handtrack.h:82)
                offset = jnp.asarray(FEATURE_OFFSETS[i])
                for axis in (qxdir(q), qydir(q)):
                    linears.append(constrain_along_direction_deadzone(
                        body, jnp.int32(-1), camera_pose[:3],
                        jnp.int32(bone), offset, axis, 0.01,
                        -100000.0, 100000.0, active=ok))
            if colored or kernel:
                from ..physics.colored import pack_single_body_linear
                single_blocks.append(pack_single_body_linear(
                    concat_linear(*linears), body.pose.shape[0], 4))
                linears = []
        has_cloud = config.steps_cloudstart <= s and not config.angles_only
        cloud_ms = None
        if has_cloud:
            mpts, mmask = mpts_all, mmask_all
            if use_ph and fused:
                # the cloud rides the planes carrier into the fused solve,
                # which packs it with the 12-channel solve-prep kernel (no
                # SingleBodyLinear round trip per step)
                scale_b = cloudforce * jnp.where(
                    jnp.arange(body.pose.shape[0]) == 0, 0.1, 1.0)
                cloud_ms = (mph_all, camera_pose[:3], scale_b)
            elif use_ph:
                from ..ops.cloud_rows import cloud_rows_packed_ph
                scale_b = cloudforce * jnp.where(
                    jnp.arange(body.pose.shape[0]) == 0, 0.1, 1.0)
                blk, _ = cloud_rows_packed_ph(body, model, mph_all,
                                              camera_pose[:3], scale_b,
                                              config.cloud_rows_per_body)
                single_blocks.append(blk)
            elif kernel and config.use_pallas:
                from ..ops.cloud_rows import cloud_rows_packed
                scale_b = cloudforce * jnp.where(
                    jnp.arange(body.pose.shape[0]) == 0, 0.1, 1.0)
                blk, _ = cloud_rows_packed(body, model, mpts, mmask,
                                           camera_pose[:3], scale_b,
                                           config.cloud_rows_per_body)
                single_blocks.append(blk)
            else:
                cloud = cloud_constraint_rows(body, model, mpts, mmask,
                                              origin=camera_pose[:3],
                                              use_kernel=config.use_pallas)
                scale = cloudforce * jnp.where(cloud.b1 == 0, 0.1, 1.0)
                cloud = scale_cloud_forces(cloud, scale)
                if colored or kernel:
                    from ..physics.colored import pack_single_body_linear
                    single_blocks.append(pack_single_body_linear(
                        cloud, body.pose.shape[0], config.cloud_rows_per_body))
                else:
                    linears.append(cloud)

        fused_inputs = None
        if fused:
            rmin = rmax = None
            fused_inputs = {
                "mode": "ms_angles" if has_angles else "ms_noangles",
                "aa": (analysis.palmq, analysis.finger_clenched,
                       pose_quat(camera_pose)),
                "drive_force": (10000.0 if s < config.steps_palmangle
                                else 0.0),
                "cloud": cloud_ms,
            }
        else:
            armdir = qrot(pose_quat(camera_pose), jnp.asarray([0.0, -1, 0]))
            enh, rmin, rmax = hand_model_enhancements(body, model, params,
                                                      armdir)
            if kernel:
                extra_ang.append(enh)
            elif colored:
                from ..physics.schedule import pair_angular
                ang_blocks.append(pair_angular(enh, schedule.enh_cone))
            else:
                angulars.append(enh)

        plan = None
        if kernel:
            from ..physics.pgs_kernel import build_multistep_plan
            cs = sum(int(b.targetdist.shape[0]) for b in single_blocks)
            if cloud_ms is not None:
                cs += config.cloud_rows_per_body
            plan = build_multistep_plan(model, cs, has_angles,
                                        config.contacts_mode,
                                        bool(config.physics_use_collision))

        body = fit_point_cloud(
            body, model, params,
            points=jnp.zeros((0, 3), jnp.float32),
            point_mask=jnp.zeros((0,), bool),
            linears=concat_linear(*linears) if linears else None,
            angulars=concat_angular(*angulars) if angulars else None,
            microforce=config.microforce,
            rangemin=rmin, rangemax=rmax,
            iterations=config.physics_iterations,
            iterations_post=config.physics_iterations_post,
            contacts_fn=contacts_fn,
            schedule=schedule, single_blocks=single_blocks,
            angular_pair_blocks=ang_blocks,
            cloud_slots=config.cloud_rows_per_body,
            use_kernel=config.use_pallas, pgs_plan=plan,
            extra_ang_class_rows=extra_ang, fused_inputs=fused_inputs)
        body = body._replace(linear_momentum=jnp.zeros_like(body.linear_momentum),
                             angular_momentum=jnp.zeros_like(body.angular_momentum))
    return sanity_check(body, bp)


# ---------------------------------------------------------------------------
# Reset branch (PoseFromScratch + unibody passes), batch-gated.
#
# Per track the reference's reset is an if (handtrack.h:712-719).  Under
# vmap a lax.cond lowers to select — every track would pay the kickstart
# (pose_from_scratch + steps_unibody solves, the most expensive stage of the
# heavy frame) every CNN frame even though resets are rare.  custom_vmap
# lets the batched rule hoist the decision to one scalar `any(pred)`
# lax.cond: steady state skips the whole reset computation at runtime; when
# any track resets, all compute it and the per-track `where` keeps exact
# per-track semantics.  (Same pattern as physics.contacts._get_entry.)
# ---------------------------------------------------------------------------

_RESET_ENTRIES: dict = {}


def _get_reset_entry(config: TrackerConfig, use_ph: bool = False):
    """use_ph: `points` is the (8, N) planes carrier; it is converted to
    (N, 3) INSIDE the reset branch, so the steady-state any-pred skip also
    skips the relayout."""
    key = (config.steps_unibody, config.unibody_force,
           config.physics_iterations, config.physics_iterations_post,
           config.use_pallas, use_ph)
    if key in _RESET_ENTRIES:
        return _RESET_ENTRIES[key]

    from jax.custom_batching import custom_vmap

    def _reset(body, model, analysis, points, point_mask, camera_pose,
               params):
        if use_ph:
            from ..ops.cloud_kernel import planes_points
            points, point_mask = planes_points(points)
        b = pose_from_scratch(body, model, analysis, points, point_mask,
                              camera_pose)
        for _ in range(key[0]):
            b = unibody_fit(b, model, params, points, point_mask,
                            camera_pose[:3], key[1], key[2], key[3],
                            use_kernel=key[4])
        return b

    @custom_vmap
    def maybe_reset(pred, body, model, analysis, points, point_mask,
                    camera_pose, params):
        return jax.lax.cond(
            pred,
            lambda b: _reset(b, model, analysis, points, point_mask,
                             camera_pose, params),
            lambda b: b, body)

    @maybe_reset.def_vmap
    def maybe_reset_vmap(axis_size, in_batched, pred, body, model, analysis,
                         points, point_mask, camera_pose, params):
        T = axis_size
        (pred_b, body_b, model_b, analysis_b, points_b, mask_b, cam_b,
         params_b) = in_batched

        def bc(tree, tb):
            return jax.tree.map(
                lambda x, b: x if b else
                jnp.broadcast_to(jnp.asarray(x), (T,) + jnp.shape(x)),
                tree, tb)

        pred = bc(pred, pred_b)
        body = bc(body, body_b)
        analysis = bc(analysis, analysis_b)
        points = bc(points, points_b)
        point_mask = bc(point_mask, mask_b)
        camera_pose = bc(camera_pose, cam_b)
        # model/params are per-model constants (never batched in practice)
        model_u = jax.tree.map(lambda x, b: x[0] if b else x, model, model_b)
        params_u = jax.tree.map(lambda x, b: x[0] if b else x, params,
                                params_b)

        def do_block(pred_b, bd, analysis_b, points_b, mask_b, cam_b):
            TB = pred_b.shape[0]

            def do(bdd):
                new = jax.vmap(
                    lambda b, a, p, m, c: _reset(b, model_u, a, p, m, c,
                                                 params_u))(
                    bdd, analysis_b, points_b, mask_b, cam_b)
                pick = lambda n, o: jnp.where(
                    pred_b.reshape((TB,) + (1,) * (n.ndim - 1)), n, o)
                return jax.tree.map(pick, new, bdd)

            return jax.lax.cond(jnp.any(pred_b), do, lambda bdd: bdd, bd)

        # shard the any-pred gate over 64-track blocks: resets are rare but
        # with hundreds of tracks SOME track resets most heavy frames, so a
        # whole-batch cond degenerates to always-on (the reset branch is
        # ~17 ms/frame at T=512 on-chip).  Per-block conds skip the blocks
        # with no resetting track.  (r5: 128 -> 64 halves the tracks that
        # pay a firing block; device trace cond.* 10.2 -> measure.)
        TB = 64
        if T % TB == 0 and T > TB:
            G = T // TB
            rs = lambda tree: jax.tree.map(
                lambda x: x.reshape((G, TB) + x.shape[1:]), tree)
            out = jax.lax.map(
                lambda xs: do_block(*xs),
                (rs(pred), rs(body), rs(analysis), rs(points),
                 rs(point_mask), rs(camera_pose)))
            out = jax.tree.map(
                lambda x: x.reshape((T,) + x.shape[2:]), out)
        else:
            out = do_block(pred, body, analysis, points, point_mask,
                           camera_pose)
        return out, jax.tree.map(lambda _: True, out)

    _RESET_ENTRIES[key] = maybe_reset
    return maybe_reset


# ---------------------------------------------------------------------------
# update_cnn_model (handtrack.h:693-746)
# ---------------------------------------------------------------------------

def _cnn_frame_inputs(cnn_params, depth, cam: DCamera, config: TrackerConfig,
                      cloud=None):
    """Shared CNN-frame prologue: segment, net forward, decode, cloud.
    Returns (seg, analysis, cnn_input, cnn_output, vpts, vmask).  On the
    kernel path vpts is the (8, N) planes carrier ph (vmask = its row 4);
    otherwise (N, 3) points."""
    drange = (0.1, config.drangey)
    seg = hand_segment_vr(depth, cam, 0xF, drange, config.segment_scale)
    hcam = seg.cam.sub(4)
    cnn_input = cnn_input_from_segment(seg.depth, cam.depth_scale, drange)
    cnn_output = cnn_forward(cnn_params, cnn_input[None])[0]
    analysis = analyze_cnn_output(cnn_output, hcam)

    if cloud is not None:
        vpts, vmask = cloud
    elif _planes_path(config):
        from ..imaging.image_ops import cloud_from_depth_planes
        vpts = cloud_from_depth_planes(depth, cam, drange[0], drange[1],
                                       config.subsample_fraction,
                                       config.point_budget)
        vmask = vpts[4] > 0.5
    else:
        from ..imaging.image_ops import cloud_from_depth
        vpts, vmask = cloud_from_depth(depth, cam, drange[0], drange[1],
                                       config.subsample_fraction,
                                       config.point_budget)
        if config.mirror_plane:
            from ..imaging.image_ops import mirror_plane_split
            vpts, vmask = mirror_plane_split(
                vpts, vmask, jnp.asarray(config.mirror_plane, jnp.float32))
    return seg, analysis, cnn_input, cnn_output, vpts, vmask


def _planes_path(config: TrackerConfig) -> bool:
    """The cloud rides the (8, N) planes carrier end-to-end on the fused
    kernel path (no (N, 3) relayouts); mirror/voxel variants and the
    reference-shaped solvers keep the (N, 3) contract."""
    return (config.solver == "kernel" and config.use_pallas
            and not config.subsample_voxel and not config.mirror_plane)


@_full_precision
def update_cnn_model(state: TrackerState, model, cnn_params, depth,
                     cam: DCamera, config: TrackerConfig, params,
                     schedule=None, cloud=None):
    """The background-thread body, as a pure function.  Returns
    (new TrackerState, CnnDebug).  `cloud`: optional precomputed
    (points, mask) from the caller's own cloud_from_depth of the same frame
    (update() passes its own — avoids building the cloud twice per frame)."""
    seg, analysis, cnn_input, cnn_output, vpts, vmask = _cnn_frame_inputs(
        cnn_params, depth, cam, config, cloud)
    use_ph = _planes_path(config) and vpts.ndim == 2 and vpts.shape[0] == 8
    vph = vpts if use_ph else None

    olderror = fit_error(state.body, model, vpts, vmask, depth, cam,
                         config.bone_sum_error_scale,
                         use_kernel=config.use_pallas, points_ph=vph)

    do_reset = jnp.asarray(config.angles_only) | (olderror > config.full_reset_on_error)
    other = _get_reset_entry(config, use_ph)(do_reset, state.body, model,
                                             analysis, vpts, vmask,
                                             seg.cam.pose, params)
    other = multi_step_sim(other, model, analysis, vpts, vmask, seg.cam.pose,
                           config, params, schedule=schedule, points_ph=vph)
    newerror = fit_error(other, model, vpts, vmask, depth, cam,
                         config.bone_sum_error_scale,
                         use_kernel=config.use_pallas, points_ph=vph)

    prev = jnp.where(newerror > olderror, 0.0,
                     state.prev_frame_error + (olderror - newerror))
    init_take = ((vmask.sum() > config.min_point_num)
                 & (state.initializing > 0))
    if config.init_take_gated:
        init_take = init_take & (newerror <= olderror)
    take = (init_take
            | jnp.asarray(config.always_take_cnn)
            | jnp.asarray(config.angles_only)
            | (prev > config.accum_error_threshold))
    prev = jnp.where(prev > config.accum_error_threshold, 0.0, prev)
    initializing = jnp.maximum(state.initializing - 1, 0)

    body = state.body._replace(
        pose=jnp.where(take, other.pose, state.body.pose))
    dbg = CnnDebug(cnn_input=cnn_input, cnn_output=cnn_output,
                   image_points=analysis.image_points,
                   segment_cam_pose=seg.cam.pose)
    return TrackerState(body, prev, initializing), dbg


def kickstart(state: TrackerState, model, cnn_params, depth, cam, config,
              params):
    """handtrack.h:743: run the CNN synchronously and take its pose."""
    cfg = config
    new, dbg = update_cnn_model(state, model, cnn_params, depth, cam, cfg,
                                params)
    # kickstart always takes the pose (SetPose of the returned pose; the
    # returned pose is only non-empty under `take`, so this is identical)
    return new, dbg


# palm-frame flips that span the edge-on / clenched view ambiguities the CNN
# cannot resolve from one 64x64 crop: identity, and pi about each local axis
_HYP_FLIPS = jnp.asarray([[0.0, 0.0, 0.0, 1.0],
                          [1.0, 0.0, 0.0, 0.0],
                          [0.0, 1.0, 0.0, 0.0],
                          [0.0, 0.0, 1.0, 0.0]], jnp.float32)


@_full_precision
def kickstart_multi(state: TrackerState, model, cnn_params, depth,
                    cam: DCamera, config: TrackerConfig, params,
                    n_hyp: int = 4, lm_weight: float = 0.1):
    """Multi-hypothesis re-acquisition (TPU-framework addition; the
    reference's kickstart, handtrack.h:743, is the n_hyp=1 column).

    The net's palm orientation is ambiguous on edge-on and clenched views —
    the dominant cold-start failure is a stable wrong-basin pose.  Run the
    full reset path (PoseFromScratch + unibody passes + MultiStepSim) from
    n_hyp palm-frame hypotheses and keep the lowest-FitError body.  Cost is
    n_hyp x one heavy frame, paid only at acquisition."""
    seg, analysis, cnn_input, cnn_output, vpts, vmask = _cnn_frame_inputs(
        cnn_params, depth, cam, config)
    if _planes_path(config) and vpts.ndim == 2 and vpts.shape[0] == 8:
        from ..ops.cloud_kernel import planes_points
        vph = vpts
        vpts, vmask = planes_points(vph)
    else:
        vph = None

    def fit_one(flip):
        a = analysis._replace(palmq=qmul(analysis.palmq, flip))
        b = pose_from_scratch(state.body, model, a, vpts, vmask,
                              seg.cam.pose)
        for _ in range(config.steps_unibody):
            b = unibody_fit(b, model, params, vpts, vmask, seg.cam.pose[:3],
                            config.unibody_force, config.physics_iterations,
                            config.physics_iterations_post,
                            use_kernel=config.use_pallas)
        b = multi_step_sim(b, model, a, vpts, vmask, seg.cam.pose, config,
                           params, points_ph=vph)
        err = fit_error(b, model, vpts, vmask, depth, cam,
                        config.bone_sum_error_scale,
                        use_kernel=config.use_pallas, points_ph=vph)
        # landmark-ray disagreement: the net's feature rays are hypothesis-
        # independent evidence; a wrong-basin fit can match the cloud (low
        # FitError) but puts thumb/finger features on the wrong rays
        fw = jax.vmap(lambda bone, off: pose_apply(b.pose[bone], off))(
            jnp.asarray(FEATURE_BONES, jnp.int32),
            jnp.asarray(FEATURE_OFFSETS))                     # (8, 3)
        d = fw - seg.cam.pose[:3]
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            1e-20)
        agree = jnp.sum(d * a.crays[:, :3], axis=-1)          # (8,)
        err_lm = jnp.sum(jnp.maximum(a.crays[:, 3], 0.0) * (1.0 - agree))
        return b, err + lm_weight * err_lm

    bodies, errs = jax.vmap(fit_one)(_HYP_FLIPS[:n_hyp])
    k = jnp.argmin(errs)
    body = jax.tree.map(lambda x: x[k], bodies)
    dbg = CnnDebug(cnn_input=cnn_input, cnn_output=cnn_output,
                   image_points=analysis.image_points,
                   segment_cam_pose=seg.cam.pose)
    return TrackerState(body, jnp.float32(0.0), state.initializing), dbg


# ---------------------------------------------------------------------------
# update (handtrack.h:748-785)
# ---------------------------------------------------------------------------

BOUNDARY_OUTDIRS = ((-1.0, -0.25, 0.0), (-1.0, -1.0, 0.0), (0.0, -1.0, 0.0),
                    (1.0, -1.0, 0.0), (1.0, -0.25, 0.0))  # handtrack.h:776


@_full_precision
def update(state: TrackerState, model, cnn_params, depth, cam: DCamera,
           config: TrackerConfig, params=None, schedule=None, run_cnn=None):
    """Per-frame tracking step.  Returns (state, user poses (17,7), debug).
    run_cnn overrides config.cnn_every_frame for this call (static bool) —
    the cadence hook used by parallel.tracks.track_sequences."""
    if params is None:
        params = physics_params(config)
    colored = config.solver == "colored"
    kernel = config.solver == "kernel"
    if colored and schedule is None:
        from ..physics.schedule import build_hand_schedule
        schedule = build_hand_schedule(model, config.contacts_mode)
    if not colored:
        schedule = None
    plan = None
    if kernel:
        from ..physics.pgs_kernel import build_dynamics_plan
        cs = config.cloud_rows_per_body + (len(BOUNDARY_OUTDIRS)
                                           if config.boundary_planes else 0)
        plan = build_dynamics_plan(model, cs, config.contacts_mode,
                                   bool(config.physics_use_collision))
    ph = None
    if config.subsample_voxel:
        pts_all, mask_all = point_cloud(depth, cam, 0.1, config.drangey)
        from ..imaging.image_ops import voxel_subsample
        vp, vm = voxel_subsample(pts_all, mask_all, config.subsample_size,
                                 config.subsample_fraction)
        points, mask = compact_points(vp, vm, config.point_budget)
    elif _planes_path(config):
        # the cloud rides the channel-major planes carrier end-to-end; the
        # (N, 3) view is derived once for the chamber's containing-plane
        # scan (kept on the reference-shaped path for exact row parity)
        from ..imaging.image_ops import cloud_from_depth_planes
        from ..ops.cloud_kernel import planes_points
        ph = cloud_from_depth_planes(depth, cam, 0.1, config.drangey,
                                     config.subsample_fraction,
                                     config.point_budget)
        points, mask = planes_points(ph)
    else:
        from ..imaging.image_ops import cloud_from_depth
        points, mask = cloud_from_depth(depth, cam, 0.1, config.drangey,
                                        config.subsample_fraction,
                                        config.point_budget)
    if config.mirror_plane:
        from ..imaging.image_ops import mirror_plane_split
        points, mask = mirror_plane_split(
            points, mask, jnp.asarray(config.mirror_plane, jnp.float32))
    npts = mask.sum()

    dbg = None
    if config.cnn_every_frame if run_cnn is None else run_cnn:
        # the heavy pass uses the same cloud_from_depth cloud as this frame's
        # main pass unless the voxel subsampler replaced it
        cloud = ((ph, ph[4] > 0.5) if ph is not None else
                 None if config.subsample_voxel else (points, mask))
        state, dbg = update_cnn_model(state, model, cnn_params, depth, cam,
                                      config, params, schedule=schedule,
                                      cloud=cloud)

    body = state.body
    contacts_fn = (lambda s: contact_rows(s, model, params)) \
        if config.physics_use_collision else None
    fused = kernel and _use_fused()
    if not config.angles_only:
        for _ in range(config.mainthreadpasses):
            if fused:
                enh = rmin = rmax = None
            else:
                enh, rmin, rmax = hand_model_enhancements(body, model,
                                                          params, armdir=None)
            linears = None
            single_blocks = []
            if config.boundary_planes:
                chamber = cloud_chamber_rows(
                    body, model, points, mask, BOUNDARY_OUTDIRS,
                    jnp.zeros(3), jnp.asarray([0.0, 0, 1]), 10.0,
                    active=npts > config.min_point_num)
                if colored or kernel:
                    from ..fitting.cloud import rows_to_single_block
                    single_blocks.append(rows_to_single_block(
                        chamber, (len(BOUNDARY_OUTDIRS), body.pose.shape[0])))
                else:
                    linears = chamber
            body = fit_point_cloud(
                body, model, params, points, mask,
                linears=linears, angulars=enh if not (colored or kernel)
                else None,
                microforce=config.microforce,
                rangemin=rmin, rangemax=rmax,
                iterations=config.physics_iterations,
                iterations_post=config.physics_iterations_post,
                contacts_fn=contacts_fn,
                schedule=schedule, single_blocks=single_blocks,
                cloud_slots=config.cloud_rows_per_body,
                use_kernel=config.use_pallas, pgs_plan=plan,
                fused_inputs={"mode": "dyn"} if fused else None,
                points_ph=ph)

    initializing = jnp.where(npts < config.min_point_num, 50,
                             state.initializing)
    state = TrackerState(body, state.prev_frame_error, initializing)
    return state, get_pose_user(body, model), dbg


# ---------------------------------------------------------------------------
# slowfit (handtrack.h:786-821) — annotation-grade fit
# ---------------------------------------------------------------------------

@_full_precision
def slowfit(state: TrackerState, model, points, mask, config: TrackerConfig,
            params, hold: int = 0, refpose=None, steps: int = 6,
            crays=None, select_bone: int | None = None, spoint=None,
            rbpoint=None):
    """handtrack.h:786-821, incl. the annotation-fixer extras: optional CNN
    landmark rays (`crays` (8,4)) and a dragged-bone nail (`select_bone`
    pulled so local `rbpoint` meets world `spoint`)."""
    body = state.body
    contacts_fn = (lambda s: contact_rows(s, model, params)) \
        if config.physics_use_collision else None
    for st in range(steps):
        enh, rmin, rmax = hand_model_enhancements(body, model, params,
                                                  armdir=None)
        angulars = [enh]
        ray_rows = []
        if crays is not None and st < 5:  # handtrack.h:802-807
            for i in range(8):
                q = quat_from_to(jnp.asarray([0.0, 0, 1]), crays[i, :3])
                bone = int(FEATURE_BONES[i])
                offset = jnp.asarray(FEATURE_OFFSETS[i])
                for axis in (qxdir(q), qydir(q)):
                    ray_rows.append(constrain_along_direction_deadzone(
                        body, jnp.int32(-1), jnp.zeros(3), jnp.int32(bone),
                        offset, axis, 0.01, -100000.0, 100000.0))
        if select_bone is not None:  # handtrack.h:809-810
            from ..physics.constraints import constrain_position_nailed
            ray_rows.append(constrain_position_nailed(
                body, jnp.int32(-1), spoint, jnp.int32(select_bone), rbpoint))
        if hold and refpose is not None:
            # ignore wrist->palm joint (hold==1 skips joints 0..3's? the
            # reference filter: (&j != &joints[0] && hold==2) || (&j > &joints[3])
            # host copies: joint body ids are trace-time structure, and
            # indexing the closed-over jnp array inside jit yields a tracer
            import numpy as _np
            j0 = _np.asarray(model.joint_rbi0)
            j1 = _np.asarray(model.joint_rbi1)
            hold_rows = []
            for j in range(j0.shape[0]):
                keep = (j != 0 and hold == 2) or (j > 3)
                if keep:
                    hold_rows.append(relative_angular_rows(
                        body, refpose, int(j0[j]), int(j1[j]), params))
            if hold_rows:
                angulars.append(concat_angular(*hold_rows))
        linears = ray_rows
        if st < steps - 1:
            cloud = cloud_constraint_rows(body, model, points, mask,
                                          use_kernel=config.use_pallas)
            decay = config.microforce * (1.0 * (steps - st) / steps)
            scale = decay * jnp.where(
                cloud.b1 == 0, 0.1 * float(st < steps - 2), 1.0)
            linears.append(scale_cloud_forces(cloud, scale))
        linears = concat_linear(*linears) if linears else None
        body = fit_point_cloud(
            body, model, params,
            points=jnp.zeros((0, 3), jnp.float32),
            point_mask=jnp.zeros((0,), bool),
            linears=linears, angulars=concat_angular(*angulars),
            iterations=config.physics_iterations,
            iterations_post=config.physics_iterations_post,
            contacts_fn=contacts_fn)
    return state._replace(body=body)
