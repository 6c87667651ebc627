"""Synthetic depth rendering: ray-cast the hand model into a depth image.

TPU rewrite of the synthetic-hand-tracker's software path (FakeDepth,
synthetic-tracker.cpp:69-76 + PhysModel::HitCheck, physmodel.h:287-294):
for every pixel, cast a ray from the camera origin to deproject(p, 4m) and
take the nearest convex-hull entry over all 17 bones — no GL needed.  One
batched slab test of shape (pixels, bones, planes); vmappable over frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..imaging.camera import DCamera
from ..maths.pose import pose_apply, pose_inverse
from ..maths.quat import qrot


def fake_depth(poses, model, cam: DCamera) -> jnp.ndarray:
    """poses: (B, 7) bone poses (physics frame). Returns (H, W) uint16."""
    W, H = cam.dim
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ends = cam.deprojectz(jnp.stack([xs, ys], -1), jnp.full((H, W), 4.0))
    ends = ends.reshape(-1, 3)                          # (N, 3) ray endpoints

    def per_body(tmin, b):
        # scan (not vmap) over bodies so only one (N, P) slab is live at a
        # time — a vmapped version materialises bodies*pixels*planes floats,
        # which for batched rendering blows past HBM.
        inv = pose_inverse(poses[b])
        l0 = pose_apply(inv, jnp.zeros(3))              # origin in bone frame
        dirl = qrot(inv[3:7], ends)                     # ends rotated
        l1 = dirl + inv[None, :3]
        planes = model.planes[b]
        pmask = model.plane_mask[b]
        d0 = planes[:, :3] @ l0 + planes[:, 3]          # (P,)
        d1 = jnp.einsum("pk,nk->np", planes[:, :3], l1) + planes[None, :, 3]
        d0 = jnp.where(pmask, d0, -1.0)[None, :]
        d1 = jnp.where(pmask[None, :], d1, -1.0)
        miss = jnp.any((d0 >= 0) & (d1 >= 0), axis=1)
        denom = d0 - d1
        t = jnp.where(denom != 0, d0 / jnp.where(denom == 0, 1.0, denom), 0.0)
        t_enter = jnp.max(jnp.where((d0 >= 0) & (d1 < 0), t, 0.0), axis=1)
        t_exit = jnp.min(jnp.where((d0 <= 0) & (d1 > 0), t, 1.0), axis=1)
        hit = ~miss & (t_enter <= t_exit)
        return jnp.minimum(tmin, jnp.where(hit, t_enter, 1.0)), None

    tmin, _ = jax.lax.scan(per_body, jnp.ones(ends.shape[0]),
                           jnp.arange(poses.shape[0]))
    depth_m = tmin * 4.0                                  # ray z = 4*t
    return (depth_m / cam.depth_scale).astype(jnp.uint16).reshape(H, W)


SYNTH_CAM = dict(dim=(320, 240), focal=(305.0, 305.0), principal=(160.0, 120.0),
                 depth_scale=0.001)  # synthetic-tracker.cpp:98


def synth_camera() -> DCamera:
    return DCamera.make(**SYNTH_CAM)
