"""Point-cloud <-> articulated-model correspondence and fitting rows.

TPU-native rewrite of the correspondence machinery in include/physmodel.h:
  * closest()  (physmodel.h:127-162): for every point, the winning plane among
    [17 bounding-sphere candidate planes, 17 hull most-above planes], chosen
    exactly like the reference's two sequential scans (first minimum wins).
    Vectorised as one (N, 34) argmin — the reference's sphere-radius pruning
    is a pure optimisation that never changes the winner, so it is dropped.
  * CloudConstraint(s) (physmodel.h:163-181) incl. the directed back-side
    ray handling via a slab-method ConvexHitCheck.
  * FitError (handtrack.h:369-399).
  * containing_plane / cloud_chamber boundary planes (physmodel.h:183-193,
    486-496), with the sequential extreme-point scan replaced by an angular
    argmax (equivalent for the camera-frustum geometry it is used on).

Points are fixed-budget arrays with a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..maths.pose import pose_apply, pose_inverse, pose_quat
from ..maths.quat import qconj, qrot, safenormalize
from ..physics.solver import BodyState, FLT_MAX, LinearRows


def _hull_dots(state: BodyState, model, points):
    """dot(plane, (local_point, 1)) for all (body, point, plane): (B, N, P).
    Laid out body-major so the contraction is one batched (N,4)x(4,P) matmul
    per body — MXU-shaped, and nothing (N,B,P,4)-sized is ever materialised."""
    pos = state.position                      # (B,3)
    q = state.orientation                     # (B,4)
    local = qrot(qconj(q)[:, None, :], points[None, :, :] - pos[:, None, :])
    ph = jnp.concatenate([local, jnp.ones_like(local[..., :1])], -1)  # (B,N,4)
    return jax.lax.dot_general(
        ph, model.planes,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (B, N, P)


def _hull_best(state: BodyState, model, points, origin, use_kernel):
    """Per (body, point) most-above plane value/index (+ ray-clip reductions
    and the world plane sets when use_kernel).  Returns (hull_vals (B,N),
    pidx (B,N), slab or None, planes_w or None)."""
    if use_kernel:
        from ..ops.correspondence import hull_reductions, world_planes
        o = jnp.zeros(3, points.dtype) if origin is None else origin
        planes_w = world_planes(state.pose, model)
        hull_vals, pidx, te, tx, miss = hull_reductions(
            state.pose, model, points, o, planes_w=planes_w)
        return hull_vals, pidx, (te, tx, miss), planes_w
    dots = _hull_dots(state, model, points)                   # (B,N,P)
    pidx = jnp.argmax(dots, axis=-1)                          # (B,N)
    hull_vals = jnp.take_along_axis(dots, pidx[..., None], axis=-1)[..., 0]
    return hull_vals, pidx, None, None


def closest_vals(state: BodyState, model, points):
    """Winning (body, value) per point — closest_planes without the plane
    gather or ray-clip reductions.  All FitError needs (handtrack.h:372-383);
    the hull side is one batched MXU matmul (_hull_dots)."""
    B = model.planes.shape[0]
    pos = state.position
    d = points[:, None, :] - pos[None, :, :]                  # (N,B,3)
    n = safenormalize(d)
    w = -jnp.einsum("bk,nbk->nb", pos, n) - model.radius_inner[None, :]
    sphere_vals = jnp.einsum("nbk,nk->nb", n, points) + w     # (N,B)
    dots = _hull_dots(state, model, points)                   # (B,N,P)
    hull_vals = dots.max(axis=-1).swapaxes(0, 1)              # (N,B)
    vals = jnp.concatenate([sphere_vals, hull_vals], axis=1)  # (N,2B)
    k = jnp.argmin(vals, axis=1)
    body = jnp.where(k >= B, k - B, k).astype(jnp.int32)
    return body, jnp.take_along_axis(vals, k[:, None], 1)[:, 0]


def closest_planes(state: BodyState, model, points, point_mask,
                   hull_best=None, use_kernel: bool = False):
    """For each point: (winning body index, winning world plane (4,), value).

    model: HandModelArrays (jnp). points: (N,3). Returns (N,), (N,4), (N,).
    """
    B = model.planes.shape[0]
    pos = state.position                      # (B,3)
    q = state.orientation                     # (B,4)

    # sphere candidates (physmodel.h:141-150)
    d = points[:, None, :] - pos[None, :, :]                  # (N,B,3)
    n = safenormalize(d)
    w = -jnp.einsum("bk,nbk->nb", pos, n) - model.radius_inner[None, :]
    sphere_planes = jnp.concatenate([n, w[..., None]], axis=-1)  # (N,B,4)
    sphere_vals = jnp.einsum("nbk,nk->nb", n, points) + w        # (N,B)

    # hull most-above planes (physmodel.h:127-135)
    if hull_best is None:
        hull_best = _hull_best(state, model, points, None, use_kernel)
    hull_vals, pidx, _, planes_w = hull_best
    if planes_w is not None:
        # world plane sets already computed once — just gather the winners
        hull_planes = jax.vmap(lambda pw, ix: pw[ix, :4])(planes_w, pidx)
        hull_planes = hull_planes.swapaxes(0, 1)              # (N,B,4)
    else:
        best_local = jax.vmap(lambda pl, ix: pl[ix])(model.planes, pidx)
        # transform to world (Pose::TransformPlane)
        wn = qrot(q[:, None, :], best_local[..., :3])         # (B,N,3)
        ww = best_local[..., 3] - jnp.einsum("bk,bnk->bn", pos, wn)
        hull_planes = jnp.concatenate([wn, ww[..., None]], -1).swapaxes(0, 1)
    hull_vals = hull_vals.swapaxes(0, 1)                      # (N,B)

    vals = jnp.concatenate([sphere_vals, hull_vals], axis=1)      # (N,2B)
    planes = jnp.concatenate([sphere_planes, hull_planes], axis=1)
    # initial pmin has value FLT_MAX with rbmin NULL; candidates tie-break to
    # the earliest index, matching the reference's strict-< scans.
    k = jnp.argmin(vals, axis=1)
    body = jnp.where(k >= B, k - B, k).astype(jnp.int32)
    plane = jnp.take_along_axis(planes, k[:, None, None], 1)[:, 0]
    val = jnp.take_along_axis(vals, k[:, None], 1)[:, 0]
    return body, plane, val


def convex_hit_check(planes, plane_mask, p, v0, v1):
    """geometric.h:275-302 ConvexHitCheck against body pose p (slab method).
    Returns (hit, impact_world)."""
    l0 = pose_apply(pose_inverse(p), v0)
    l1 = pose_apply(pose_inverse(p), v1)
    d0 = planes[:, :3] @ l0 + planes[:, 3]
    d1 = planes[:, :3] @ l1 + planes[:, 3]
    d0 = jnp.where(plane_mask, d0, -1.0)
    d1 = jnp.where(plane_mask, d1, -1.0)
    miss = jnp.any((d0 >= 0) & (d1 >= 0))
    denom = d0 - d1
    t = jnp.where(denom != 0, d0 / jnp.where(denom == 0, 1.0, denom), 0.0)
    t_enter = jnp.max(jnp.where((d0 >= 0) & (d1 < 0), t, 0.0))
    t_exit = jnp.min(jnp.where((d0 <= 0) & (d1 > 0), t, 1.0))
    hit = ~miss & (t_enter <= t_exit)
    impact_l = l0 + (l1 - l0) * t_enter
    return hit, pose_apply(p, impact_l)


def cloud_constraint_rows(state: BodyState, model, points, point_mask,
                          origin=None, directed: bool = True,
                          use_kernel: bool = False) -> LinearRows:
    """CloudConstraints (physmodel.h:163-181): one row per point slot.
    Force limits are the caller's job (they differ per call site)."""
    if origin is None:
        origin = jnp.zeros(3, points.dtype)
    hull_best = _hull_best(state, model, points, origin, use_kernel)
    body, plane, val = closest_planes(state, model, points, point_mask,
                                      hull_best=hull_best)
    bpose = state.pose[body]                                   # (N,7)

    # default branch: attach at the point projected onto the winning plane.
    # The reference stores p1 in body-local coords and re-rotates it for the
    # lever arm (physmodel.h:168-173); local->world round trips cancel, so
    # attachment points stay in world space here.
    attach_w = points - plane[:, :3] * val[:, None]
    n_default = plane[:, :3]

    if directed:
        dirn = (points - origin) / jnp.linalg.norm(
            points - origin, axis=-1, keepdims=True)
        front = jnp.einsum("nk,nk->n", points - origin, plane[:, :3]) > 0
        if hull_best[2] is not None:
            t_enter, t_exit, miss = hull_best[2]
            hit_all = (miss == 0) & (t_enter <= t_exit)
        else:
            # slab ray clip origin->point, reusing the point dots: d1 = dots
            # of the segment end (the point itself); d0 = the origin's.
            dots = _hull_dots(state, model, points)
            olocal = pose_apply(pose_inverse(state.pose), origin)  # (B,3)
            d0 = (jnp.einsum("bpk,bk->bp", model.planes[..., :3], olocal)
                  + model.planes[..., 3])                          # (B,P)
            d0 = jnp.where(model.plane_mask, d0, -1.0)[:, None, :]  # (B,1,P)
            d1 = jnp.where(model.plane_mask[:, None, :], dots, -1.0)
            miss = jnp.any((d0 >= 0) & (d1 >= 0), axis=-1)         # (B,N)
            denom = d0 - d1
            t = jnp.where(denom != 0, d0 / jnp.where(denom == 0, 1.0, denom), 0.0)
            t_enter = jnp.max(jnp.where((d0 >= 0) & (d1 < 0), t, 0.0), axis=-1)
            t_exit = jnp.min(jnp.where((d0 <= 0) & (d1 > 0), t, 1.0), axis=-1)
            hit_all = ~miss & (t_enter <= t_exit)                  # (B,N)
        nidx = jnp.arange(points.shape[0])
        hit = hit_all[body, nidx]
        te = t_enter[body, nidx]
        impact = origin + (points - origin) * te[:, None]
        use_ray = front & hit
        w1 = jnp.where(use_ray[:, None], impact, attach_w)
        n = jnp.where(use_ray[:, None], dirn, n_default)
    else:
        w1, n = attach_w, n_default

    # ConstrainAlongDirection(NULL, v, rb, p1, n, -1, 1) built inline:
    targetdist = jnp.einsum("nk,nk->n", w1 - points, n)
    r1 = w1 - bpose[:, :3]
    N = points.shape[0]
    return LinearRows(
        b0=jnp.full(N, -1, jnp.int32), b1=body,
        normal=n, r0=points, r1=r1,
        targetdist=targetdist,
        targetspeednobias=jnp.zeros(N, jnp.float32),
        fmin=jnp.full(N, -1.0, jnp.float32), fmax=jnp.full(N, 1.0, jnp.float32),
        friction_master=jnp.zeros(N, jnp.int32),
        friction_coef=jnp.zeros(N, jnp.float32),
        active=point_mask)


def scale_cloud_forces(rows: LinearRows, per_row_scale) -> LinearRows:
    """Apply per-row force-limit scaling (the various call sites multiply the
    +-1 base limits by different factors, e.g. physmodel.h:347)."""
    return rows._replace(fmin=rows.fmin * per_row_scale,
                         fmax=rows.fmax * per_row_scale)


def fit_error(state: BodyState, model, points, point_mask, depth, depth_cam,
              bone_sum_error_scale: float = 4.0, use_kernel: bool = False,
              points_ph=None):
    """handtrack.h:369-399 FitError.  The correspondence is vals-only (no
    plane gather / ray-clip reductions); use_kernel runs it in VMEM
    (ops.cloud_rows.cloud_vals — the XLA hull contraction is a K=4 matmul
    the MXU pads to a 128-deep pass).  points_ph: the (8, N) planes carrier
    (mask in row 4) — preferred on the kernel path (no (N, 3) relayout)."""
    B = model.planes.shape[0]
    if use_kernel and points_ph is not None:
        from ..ops.cloud_rows import cloud_vals_ph
        body, val = cloud_vals_ph(state, model, points_ph)
        point_mask = points_ph[4] > 0.5
    elif use_kernel:
        from ..ops.cloud_rows import cloud_vals
        body, val = cloud_vals(state, model, points, point_mask)
    else:
        body, val = closest_vals(state, model, points)
    contrib = jnp.where(point_mask, val, -jnp.inf)
    # per-body max as a masked reduction over a (B, N) one-hot — a scatter-max
    # (.at[body].max) costs ~10x more than the whole correspondence on TPU.
    # (An in-kernel per-body masked lane max was measured SLOWER: the
    # cross-lane reduce cost +1.6 ms/call vs this fused XLA epilogue.)
    oh = jnp.arange(B, dtype=body.dtype)[:, None] == body[None, :]
    pointerror = jnp.where(oh, contrib[None, :], -jnp.inf).max(axis=1)
    point_error_sum = jnp.maximum(pointerror, 0.0).sum()

    local = pose_apply(pose_inverse(depth_cam.pose), state.position)  # (B,3)
    px = depth_cam.projectz(local)
    pi = px.astype(jnp.int32)
    dim = depth.shape  # (H, W)
    inside = ((pi[:, 0] >= 0) & (pi[:, 0] <= dim[1] - 1)
              & (pi[:, 1] >= 0) & (pi[:, 1] <= dim[0] - 1))
    piq = jnp.clip(pi, 0, jnp.asarray([dim[1] - 1, dim[0] - 1]))
    # 17-point gather: cheaper than a one-hot pick here (the pick would
    # stream the whole image through the u16 bf16-plane split for 17 rows)
    dvals = depth[piq[:, 1], piq[:, 0]].astype(jnp.float32) * depth_cam.depth_scale
    bone_error = jnp.clip(dvals - local[:, 2], 0.0, 0.01)
    bone_error_sum = jnp.where(inside, bone_error, 0.0).sum()
    return point_error_sum + bone_error_sum * bone_sum_error_scale


def containing_plane(points, point_mask, outdir, origin, viewdir):
    """physmodel.h:183-193.  The reference's order-dependent scan is an
    angular extreme search; computed here as an argmax of angle around the
    tangent axis, which is equivalent for points within a half-space of the
    initial direction (always true for camera-frustum clouds)."""
    best0 = viewdir - outdir + origin
    tangent = jnp.cross(best0, outdir)
    b0 = best0 - origin
    th = tangent / jnp.maximum(jnp.linalg.norm(tangent), 1e-20)
    u = b0 - th * jnp.dot(b0, th)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-20)
    wv = jnp.cross(th, u)
    dp = points - origin
    ang = jnp.arctan2(dp @ wv, dp @ u)
    ang = jnp.where(point_mask, ang, -jnp.inf)
    take_pt = jnp.any(point_mask & (ang > 0))
    best = jnp.where(take_pt, points[jnp.argmax(ang)], best0)
    n = jnp.cross(tangent, best)
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-20)
    return jnp.concatenate([n, -jnp.dot(n, origin)[None]])


def cloud_chamber_rows(state: BodyState, model, points, point_mask, outdirs,
                       origin, viewdir, maxforce: float, active=True) -> LinearRows:
    """physmodel.h:486-496: for each outdir, a containing plane and one
    under-plane row per body. Returns len(outdirs)*B rows."""
    from ..physics.constraints import constrain_under_plane
    B = model.planes.shape[0]
    rows = []
    for outdir in outdirs:
        cplane = containing_plane(points, point_mask, jnp.asarray(outdir, jnp.float32),
                                  origin, viewdir)
        r = jax.vmap(lambda b: constrain_under_plane(
            state, b, model.verts[b], model.vert_mask[b], cplane, maxforce,
            active=active))(jnp.arange(B, dtype=jnp.int32))
        rows.append(jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), r))
    from ..physics.solver import concat_linear
    return concat_linear(*rows)


def rows_to_single_block(rows: LinearRows, layout):
    """Reshape structurally single-body rows (b0 = world) whose emission
    order is slot-major/body-minor into a SingleBodyLinear (C, B) block.
    layout = (C, B).  Exact iff row k*B+b targets body b (true for the
    chamber rows: dir-major, body-minor)."""
    from ..physics.colored import SingleBodyLinear
    C, B = layout
    rs = lambda x: x.reshape((C, B) + x.shape[1:])
    return SingleBodyLinear(
        normal=rs(rows.normal), r1=rs(rows.r1),
        targetdist=rs(rows.targetdist),
        targetspeednobias=rs(rows.targetspeednobias),
        fmin=rs(rows.fmin), fmax=rs(rows.fmax), active=rs(rows.active))
