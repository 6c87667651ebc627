"""Articulated hand model runtime ops: joint rows, pose conversion, fitting.

The dynamic counterpart of model/bake.py — everything here is jit/vmap-safe
and consumes the baked HandModelArrays.  Mirrors PhysModel's runtime surface
(include/physmodel.h:321-442): GetAngularConstraints / GetLinearConstraints /
FitPointCloud / GetPose(User) / SetPose / Reset / FixPositions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fitting.cloud import cloud_constraint_rows, scale_cloud_forces
from ..maths.quat import qrot
from ..physics.constraints import (constrain_angular_range,
                                   constrain_position_nailed)
from ..physics.solver import (AngularRows, BodyParams, BodyState, LinearRows,
                              PhysicsParams, concat_angular, concat_linear,
                              physics_update, sanity_check)

PHYSICS_WEAK_FORCE = 0.4  # physmodel.h:234


def body_params(model) -> BodyParams:
    return BodyParams(
        massinv=model.massinv,
        tensorinv_massless=model.tensorinv_massless,
        damping=model.damping,
        gravscale=model.gravscale,
        start_pose=model.start_pose,
    )


def initial_state(model) -> BodyState:
    B = model.start_pose.shape[0]
    return BodyState(
        pose=jnp.asarray(model.start_pose),
        linear_momentum=jnp.zeros((B, 3), jnp.float32),
        angular_momentum=jnp.zeros((B, 3), jnp.float32),
    )


def joint_linear_rows(state: BodyState, model) -> LinearRows:
    """GetLinearConstraints (physmodel.h:328-334): 3 nailed rows per joint,
    in joint order. 16 joints -> 48 rows."""
    def per_joint(b0, b1, p0, p1):
        return constrain_position_nailed(state, b0, b1=b1, p0=p0, p1=p1)

    rows = jax.vmap(per_joint)(model.joint_rbi0, model.joint_rbi1,
                               model.joint_p0, model.joint_p1)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rows)


def joint_angular_rows(state: BodyState, model, params: PhysicsParams,
                       rangemin=None, rangemax=None) -> AngularRows:
    """GetAngularConstraints (physmodel.h:321-327): 6 masked slots per joint.
    rangemin/rangemax override the baked ranges (HandModelEnhancements mutates
    them per frame, handtrack.h:417-440)."""
    rmin = model.joint_rangemin if rangemin is None else rangemin
    rmax = model.joint_rangemax if rangemax is None else rangemax

    def per_joint(b0, b1, jf, lo, hi):
        return constrain_angular_range(state, b0, b1, jf, lo, hi, params)

    rows = jax.vmap(per_joint)(model.joint_rbi0, model.joint_rbi1,
                               model.joint_frame, rmin, rmax)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rows)


def fit_point_cloud(state: BodyState, model, params: PhysicsParams,
                    points, point_mask, linears: LinearRows | None = None,
                    angulars: AngularRows | None = None,
                    microforce: float = 1.0, origin=None,
                    rangemin=None, rangemax=None,
                    iterations: int = 16, iterations_post: int = 4,
                    contacts_fn=None, schedule=None, single_blocks=None,
                    angular_pair_blocks=None, cloud_slots: int = 128,
                    use_kernel: bool = False, pgs_plan=None,
                    extra_ang_class_rows=None, fused_inputs=None,
                    points_ph=None) -> BodyState:
    """FitPointCloud (physmodel.h:345-356).

    Row order matches the reference: [caller linears][cloud rows][joint
    nailed rows][contact rows]; angulars: [caller angulars][joint ranges].

    When `schedule` (a HandSchedule) is given, the colored fast solver is
    used: caller rows arrive as `single_blocks` (SingleBodyLinear, in order)
    and `angular_pair_blocks`; contacts are generated internally when
    `contacts_fn` is truthy.

    When `pgs_plan` (a pgs_kernel.SolvePlan) is given, the solve runs in the
    VMEM-resident Pallas kernel (same schedule semantics as colored; batched
    under vmap).  extra_ang_class_rows are per-class AngularRows matching the
    plan's leading angular classes (e.g. the ApplyAngles rows).
    """
    if fused_inputs is not None:
        return _fit_point_cloud_fused(
            state, model, params, points, point_mask, microforce, origin,
            iterations, iterations_post, pgs_plan, single_blocks or [],
            cloud_slots, use_kernel, fused_inputs, points_ph)
    if pgs_plan is not None:
        return _fit_point_cloud_pgs(
            state, model, params, points, point_mask, microforce, origin,
            rangemin, rangemax, iterations, iterations_post,
            contacts_fn is not None, pgs_plan, single_blocks or [],
            extra_ang_class_rows or [], cloud_slots, use_kernel, points_ph)
    if schedule is not None:
        return _fit_point_cloud_colored(
            state, model, params, points, point_mask, microforce, origin,
            rangemin, rangemax, iterations, iterations_post,
            contacts_fn is not None, schedule, single_blocks or [],
            angular_pair_blocks or [], cloud_slots, use_kernel)
    lin_blocks = [joint_linear_rows(state, model)]
    if points.shape[0] > 0:
        cloud = cloud_constraint_rows(state, model, points, point_mask,
                                      origin=origin, use_kernel=use_kernel)
        # weak force on wrist/palm/thumb-base bodies (physmodel.h:347)
        weak = (cloud.b1 <= 2).astype(jnp.float32)
        scale = (weak * PHYSICS_WEAK_FORCE + (1.0 - weak)) * microforce
        lin_blocks.insert(0, scale_cloud_forces(cloud, scale))
    if linears is not None:
        lin_blocks.insert(0, linears)
    lin = concat_linear(*lin_blocks)

    ang_blocks = [joint_angular_rows(state, model, params, rangemin, rangemax)]
    if angulars is not None:
        ang_blocks.insert(0, angulars)
    ang = concat_angular(*ang_blocks)

    if contacts_fn is not None:
        lin = concat_linear(lin, contacts_fn(state))

    bp = body_params(model)
    new = physics_update(state, bp, lin, ang, params,
                         iterations=iterations, iterations_post=iterations_post)
    return sanity_check(new, bp)


def _fit_point_cloud_colored(state, model, params, points, point_mask,
                             microforce, origin, rangemin, rangemax,
                             iterations, iterations_post, use_contacts,
                             schedule, single_blocks, angular_pair_blocks,
                             cloud_slots, use_kernel=False):
    from ..physics.colored import pack_single_body_linear, physics_update_colored
    from ..physics.contacts import contact_rows
    from ..physics.schedule import pair_angular, pair_linear

    B = state.pose.shape[0]
    lin_blocks = list(single_blocks)
    if points.shape[0] > 0:
        cloud = cloud_constraint_rows(state, model, points, point_mask,
                                      origin=origin, use_kernel=use_kernel)
        weak = (cloud.b1 <= 2).astype(jnp.float32)
        scale = (weak * PHYSICS_WEAK_FORCE + (1.0 - weak)) * microforce
        cloud = scale_cloud_forces(cloud, scale)
        lin_blocks.append(pack_single_body_linear(cloud, B, cloud_slots))
    nailed = joint_linear_rows(state, model)
    lin_blocks.append(pair_linear(nailed, schedule.joint_lin))
    if use_contacts:
        contacts = contact_rows(state, model, params)
        lin_blocks.append(pair_linear(contacts, schedule.contact))
    ang_blocks = list(angular_pair_blocks)
    ja = joint_angular_rows(state, model, params, rangemin, rangemax)
    ang_blocks.append(pair_angular(ja, schedule.joint_ang))
    bp = body_params(model)
    new = physics_update_colored(state, bp, lin_blocks, ang_blocks, params,
                                 iterations=iterations,
                                 iterations_post=iterations_post)
    return sanity_check(new, bp)


def _fit_point_cloud_fused(state, model, params, points, point_mask,
                           microforce, origin, iterations, iterations_post,
                           plan, single_blocks, cloud_slots, use_kernel,
                           fused_inputs, points_ph=None):
    """Kernel path via the fused tracks-last row pipeline
    (physics/fused_fit.py): same row schedule, factories computed in the
    solve's native planes layout under vmap."""
    import jax as _jax
    from ..physics.fused_fit import fused_fit
    from ..physics.colored import pack_single_body_linear
    from ..fitting.cloud import cloud_constraint_rows, scale_cloud_forces

    B = state.pose.shape[0]
    sb = list(single_blocks)
    cloud = fused_inputs.get("cloud")
    if cloud is None and use_kernel and points_ph is not None:
        # the cloud rides the planes carrier into fused_fit, which packs it
        # with the 12-channel solve-prep kernel straight into the solve
        # planes (no SingleBodyLinear round trip)
        scale_b = jnp.where(jnp.arange(B) <= 2, PHYSICS_WEAK_FORCE,
                            1.0) * microforce
        o = jnp.zeros(3, jnp.float32) if origin is None else origin
        cloud = (points_ph, o, scale_b)
    elif cloud is None and points.shape[0] > 0:
        if use_kernel:
            from ..ops.cloud_rows import cloud_rows_packed
            scale_b = jnp.where(jnp.arange(B) <= 2, PHYSICS_WEAK_FORCE,
                                1.0) * microforce
            o = jnp.zeros(3, jnp.float32) if origin is None else origin
            blk, _ = cloud_rows_packed(state, model, points, point_mask, o,
                                       scale_b, cloud_slots)
            sb.append(blk)
        else:
            crows = cloud_constraint_rows(state, model, points, point_mask,
                                          origin=origin,
                                          use_kernel=use_kernel)
            weak = (crows.b1 <= 2).astype(jnp.float32)
            scale = (weak * PHYSICS_WEAK_FORCE + (1.0 - weak)) * microforce
            crows = scale_cloud_forces(crows, scale)
            sb.append(pack_single_body_linear(crows, B, cloud_slots))
    single = (_jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *sb)
              if sb else None)
    bp = body_params(model)
    new = fused_fit(state, bp, single, fused_inputs.get("aa"), plan, params,
                    iterations=iterations, iterations_post=iterations_post,
                    mode=fused_inputs["mode"],
                    drive_force=fused_inputs.get("drive_force", 0.0),
                    model=model, cloud=cloud,
                    cloud_slots=cloud_slots if cloud is not None else 0)
    return sanity_check(new, bp)


def _fit_point_cloud_pgs(state, model, params, points, point_mask,
                         microforce, origin, rangemin, rangemax,
                         iterations, iterations_post, use_contacts,
                         plan, single_blocks, extra_ang_class_rows,
                         cloud_slots, use_kernel=False, points_ph=None):
    from ..physics.colored import SingleBodyLinear, pack_single_body_linear
    from ..physics.contacts import contact_rows
    from ..physics.pgs_kernel import physics_update_pgs

    B = state.pose.shape[0]
    sb = list(single_blocks)
    if use_kernel and points_ph is not None:
        from ..ops.cloud_rows import cloud_rows_packed_ph
        scale_b = jnp.where(jnp.arange(B) <= 2, PHYSICS_WEAK_FORCE,
                            1.0) * microforce
        o = jnp.zeros(3, jnp.float32) if origin is None else origin
        blk, _ = cloud_rows_packed_ph(state, model, points_ph, o,
                                      scale_b, cloud_slots)
        sb.append(blk)
    elif points.shape[0] > 0:
        if use_kernel:
            from ..ops.cloud_rows import cloud_rows_packed
            scale_b = jnp.where(jnp.arange(B) <= 2, PHYSICS_WEAK_FORCE,
                                1.0) * microforce
            o = jnp.zeros(3, jnp.float32) if origin is None else origin
            blk, _ = cloud_rows_packed(state, model, points, point_mask, o,
                                       scale_b, cloud_slots)
            sb.append(blk)
        else:
            cloud = cloud_constraint_rows(state, model, points, point_mask,
                                          origin=origin, use_kernel=use_kernel)
            weak = (cloud.b1 <= 2).astype(jnp.float32)
            scale = (weak * PHYSICS_WEAK_FORCE + (1.0 - weak)) * microforce
            cloud = scale_cloud_forces(cloud, scale)
            sb.append(pack_single_body_linear(cloud, B, cloud_slots))
    single = (jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *sb)
              if sb else None)
    lin_rows = [joint_linear_rows(state, model)]
    if use_contacts:
        lin_rows.append(contact_rows(state, model, params))
    ang_rows = list(extra_ang_class_rows)
    ang_rows.append(joint_angular_rows(state, model, params,
                                       rangemin, rangemax))
    import os as _os
    if _os.environ.get("HTS_ZERO_ROWS"):
        # perf-experiment ONLY (bounds the row-factory/prep cost): replace
        # every non-cloud row's dynamic fields with a cheap pose-dependent
        # zero so XLA drops the factories + prep without constant-folding
        z = state.pose[0, 0] * 0.0
        zero = lambda rows: jax.tree.map(
            lambda x: jnp.broadcast_to(
                (z if x.dtype == jnp.float32 else
                 jnp.zeros((), x.dtype)), x.shape), rows)
        lin_rows = [zero(r) for r in lin_rows]
        ang_rows = [zero(r) for r in ang_rows]
    bp = body_params(model)
    new = physics_update_pgs(state, bp, single, lin_rows, ang_rows, plan,
                             params, iterations=iterations,
                             iterations_post=iterations_post)
    return sanity_check(new, bp)


# ---------------------------------------------------------------------------
# pose conversions (physmodel.h:433-436)
# ---------------------------------------------------------------------------

def get_pose_user(state: BodyState, model):
    """Rig-space poses: position - qrot(q, com) (physics.h:142-143)."""
    pos = state.position - qrot(state.orientation, model.com)
    return jnp.concatenate([pos, state.orientation], axis=-1)


def set_pose_user(state: BodyState, model, poses_user):
    pos = poses_user[..., :3] + qrot(poses_user[..., 3:7], model.com)
    return state._replace(pose=jnp.concatenate([pos, poses_user[..., 3:7]], -1))


def set_pose(state: BodyState, poses):
    return state._replace(pose=poses)


def reset_state(model) -> BodyState:
    return initial_state(model)


def drive_pose_rows(state: BodyState, model, target_poses, params,
                    maxtorque: float = 1.0):
    """DrivePose (physmodel.h:368-374): angular drives toward the relative
    orientations of `target_poses` (17,7). 3 rows per joint."""
    from ..maths.quat import qconj, qmul
    from ..physics.constraints import constrain_angular_drive

    def per_joint(b0, b1):
        target = qmul(qconj(target_poses[b0, 3:7]), target_poses[b1, 3:7])
        return constrain_angular_drive(state, b0, b1, target, maxtorque,
                                       params)

    rows = jax.vmap(per_joint)(model.joint_rbi0, model.joint_rbi1)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rows)


def drive_base_pose_rows(state: BodyState, model, params,
                         maxtorque: float = 1.0):
    """DriveBasePose (physmodel.h:375-381): drive joints to their frames."""
    from ..physics.constraints import constrain_angular_drive

    def per_joint(b0, b1, jf):
        return constrain_angular_drive(state, b0, b1, jf, maxtorque, params)

    rows = jax.vmap(per_joint)(model.joint_rbi0, model.joint_rbi1,
                               model.joint_frame)
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), rows)


def generic_update(state: BodyState, model, params) -> BodyState:
    """GenericUpdate (physmodel.h:335-341): joint-constraint-only step."""
    lin = joint_linear_rows(state, model)
    ang = joint_angular_rows(state, model, params)
    bp = body_params(model)
    return sanity_check(physics_update(state, bp, lin, ang, params), bp)


def fix_orientations(state: BodyState, model, params) -> BodyState:
    """FixOrientations (physmodel.h:394-403): snap child orientations back
    inside their joint ranges by applying each violated range row's
    correction directly."""
    from ..maths.quat import qmul, qnormalize, quat_from_axis_angle
    from ..physics.constraints import constrain_angular_range

    pose = state.pose
    for j in range(int(model.joint_rbi0.shape[0])):
        b0 = int(model.joint_rbi0[j])
        b1 = int(model.joint_rbi1[j])
        st = state._replace(pose=pose)
        rows = constrain_angular_range(
            st, jnp.int32(b0), jnp.int32(b1), model.joint_frame[j],
            model.joint_rangemin[j], model.joint_rangemax[j], params)
        for a in range(6):
            viol = ((rows.targetspin[a] * rows.maxtorque[a] > 0)
                    | (rows.targetspin[a] * rows.mintorque[a] > 0))
            viol = viol & rows.active[a]
            dq = quat_from_axis_angle(
                rows.axis[a], rows.targetspin[a] * params.deltaT)
            newq = qnormalize(qmul(dq, pose[b1, 3:7]))
            pose = pose.at[b1, 3:7].set(jnp.where(viol, newq, pose[b1, 3:7]))
    return state._replace(pose=pose)


def set_bone_pose_hierarchy_w(state: BodyState, model, params, bid: int,
                              qw) -> BodyState:
    """SetBonePoseHierarchyW (physmodel.h:357-367): set one bone's world
    orientation and propagate the delta to its descendants, then repair
    ranges and positions.  bid is a static python int (the joint tree is
    static, so the descendant set is computed on the host)."""
    from ..maths.quat import qconj, qmul

    j0 = [int(x) for x in model.joint_rbi0]
    j1 = [int(x) for x in model.joint_rbi1]

    def parent(i):
        p = i
        for a, b in zip(j0, j1):
            if a == i or b == i:
                p = min(p, min(a, b))
        return -1 if p == i else p

    # descendants of bid in hierarchy order
    n = state.pose.shape[0]
    desc = [bid]
    changed = True
    while changed:
        changed = False
        for c in range(n):
            if c not in desc and parent(c) in desc:
                desc.append(c)
                changed = True

    pose = state.pose
    dq = qmul(jnp.asarray(qw), qconj(pose[bid, 3:7]))
    for c in desc:
        pose = pose.at[c, 3:7].set(qmul(dq, pose[c, 3:7]))
    out = state._replace(pose=pose)
    out = fix_orientations(out, model, params)
    return fix_positions(out, model)


def fix_positions(state: BodyState, model) -> BodyState:
    """physmodel.h:404-408 FixPositions: top-down snap of joint attachment
    points. Joints are ordered parent-before-child in the hand model, so a
    sequential scan over the 16 joints reproduces the ordered update."""
    def step(pose, j):
        b0, b1, p0, p1 = j
        user0 = pose[b0, :3] - qrot(pose[b0, 3:7], model.com[b0])
        user1 = pose[b1, :3] - qrot(pose[b1, 3:7], model.com[b1])
        w0 = user0 + qrot(pose[b0, 3:7], p0)
        w1 = user1 + qrot(pose[b1, 3:7], p1)
        pose = pose.at[b1, :3].add(w0 - w1)
        return pose, None

    # note FixPositions uses joint.p0/p1 in *rig* coordinates (pre-COM)
    p0_rig = model.joint_p0 + model.com[model.joint_rbi0]
    p1_rig = model.joint_p1 + model.com[model.joint_rbi1]
    pose, _ = jax.lax.scan(
        step, state.pose,
        (model.joint_rbi0, model.joint_rbi1, p0_rig, p1_rig))
    return state._replace(pose=pose)
