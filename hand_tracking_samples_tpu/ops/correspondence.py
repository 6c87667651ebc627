"""Pallas kernel: fused point->hull correspondence + ray-clip reductions.

The hot loop of the cloud fit (physmodel.h:137-174) needs, per (body, point):
the most-above hull plane (value + index) and, for the directed back-side
handling, the slab-clip entry/exit parameters of the camera ray.  Doing this
in XLA materialises a (tracks, bodies, points, planes) tensor and re-reads it
for every reduction; this kernel computes the plane dots as one MXU matmul
tile per body and folds all four reductions in VMEM, so only (bodies, points)
sized results ever reach HBM.

Shapes (one track): local_h (B, K, N) homogeneous local points (K=8, xyz1 in
the first 4 lanes), planes (B, P, K) padded planes (padding rows have
w=-1e9 so they never win and never clip), d0 (B, P) ray-origin plane dots.
Outputs: hull_val (B,N), pidx (B,N) i32, t_enter (B,N), t_exit (B,N),
miss (B,N) i32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLK = 512


def _kernel(planes_ref, d0_ref, local_ref, hull_val_ref, pidx_ref,
            t_enter_ref, t_exit_ref, miss_ref):
    B = planes_ref.shape[0]
    for b in range(B):
        planes = planes_ref[b]                       # (P, K)
        loc = local_ref[b]                           # (K, Nblk)
        dots = jnp.dot(planes, loc, preferred_element_type=jnp.float32)
        # most-above plane (value + first-max index)
        hull_val_ref[b, :] = jnp.max(dots, axis=0)
        pidx_ref[b, :] = jnp.argmax(dots, axis=0).astype(jnp.int32)
        # slab clip of the segment origin->point: d0 (P,1) vs d1=dots (P,N)
        d0 = d0_ref[b][:, None]                      # (P, 1)
        d1 = dots
        miss = jnp.any((d0 >= 0) & (d1 >= 0), axis=0)
        denom = d0 - d1
        t = jnp.where(denom != 0, d0 / jnp.where(denom == 0, 1.0, denom), 0.0)
        t_enter_ref[b, :] = jnp.max(
            jnp.where((d0 >= 0) & (d1 < 0), t, 0.0), axis=0)
        t_exit_ref[b, :] = jnp.min(
            jnp.where((d0 <= 0) & (d1 > 0), t, 1.0), axis=0)
        miss_ref[b, :] = miss.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def correspondence_reductions(local_h, planes, d0):
    """local_h (B, K, N) f32; planes (B, P, K); d0 (B, P).
    Returns hull_val, pidx, t_enter, t_exit, miss — all (B, N)."""
    B, K, N = local_h.shape
    P = planes.shape[1]
    assert N % N_BLK == 0, (
        f"point budget {N} must be a multiple of {N_BLK} when use_pallas=True "
        f"(TrackerConfig.point_budget)")
    grid = (N // N_BLK,)
    out_shape = [
        jax.ShapeDtypeStruct((B, N), jnp.float32),
        jax.ShapeDtypeStruct((B, N), jnp.int32),
        jax.ShapeDtypeStruct((B, N), jnp.float32),
        jax.ShapeDtypeStruct((B, N), jnp.float32),
        jax.ShapeDtypeStruct((B, N), jnp.int32),
    ]
    out_spec = pl.BlockSpec((B, N_BLK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, P, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K, N_BLK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
    )(planes, d0, local_h)


def hull_reductions(state_pose, model, points, origin):
    """Convenience wrapper: builds kernel inputs from body poses (B,7),
    HandModelArrays and points (N,3).  N must be a multiple of N_BLK
    (point budgets are sized accordingly).  Returns (B,N) reductions."""
    from ..maths.pose import pose_apply, pose_inverse
    from ..maths.quat import qconj, qrot

    pos = state_pose[:, :3]
    q = state_pose[:, 3:7]
    local = qrot(qconj(q)[:, None, :], points[None, :, :] - pos[:, None, :])
    B, N, _ = local.shape
    K = 8
    lh = jnp.zeros((B, N, K), jnp.float32)
    lh = lh.at[..., :3].set(local).at[..., 3].set(1.0)
    local_h = lh.swapaxes(1, 2)                       # (B, K, N)

    P = model.planes.shape[1]
    pk = jnp.zeros((B, P, K), jnp.float32).at[..., :4].set(model.planes)

    olocal = pose_apply(pose_inverse(state_pose), jnp.broadcast_to(origin, (B, 3)))
    d0 = (jnp.einsum("bpk,bk->bp", model.planes[..., :3], olocal)
          + model.planes[..., 3])
    d0 = jnp.where(model.plane_mask, d0, -1.0)
    return correspondence_reductions(local_h, pk, d0)
