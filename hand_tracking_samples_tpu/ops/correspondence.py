"""Pallas kernel: fused point->hull correspondence + ray-clip reductions.

The hot loop of the cloud fit (physmodel.h:137-174) needs, per (body, point):
the most-above hull plane (value + index) and, for the directed back-side
handling, the slab-clip entry/exit parameters of the camera ray.  Doing this
in XLA materialises a (tracks, bodies, points, planes) tensor and re-reads it
for every reduction; this kernel computes the plane dots as one MXU matmul
tile per body and folds all four reductions in VMEM, so only (bodies, points)
sized results ever reach HBM.

Hulls are evaluated in WORLD space: the per-body plane sets (B, P, 4) are
transformed once per solve (tiny), so the homogeneous point tile (8, N) is
shared by all bodies — the (B, K, N) per-body local-point tensor of the
naive formulation never exists.  dot(plane_world, [p;1]) equals the
reference's local-frame dot exactly up to rotation rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..maths.quat import qrot
from ..physics.pgs_kernel import _interpret

N_BLK = 512


def _kernel(planes_ref, d0_ref, pts_ref, hull_val_ref, pidx_ref,
            t_enter_ref, t_exit_ref, miss_ref):
    B = planes_ref.shape[0]
    pts = pts_ref[:]                                 # (K, Nblk) shared
    for b in range(B):
        planes = planes_ref[b]                       # (P, K) world planes
        dots = jnp.dot(planes, pts, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
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
def correspondence_reductions(pts_h, planes, d0):
    """pts_h (K, N) f32 homogeneous world points; planes (B, P, K) world
    planes; d0 (B, P) ray-origin plane dots.
    Returns hull_val, pidx, t_enter, t_exit, miss — all (B, N)."""
    K, N = pts_h.shape
    B, P, _ = planes.shape
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
            pl.BlockSpec((K, N_BLK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        interpret=_interpret(),
    )(planes, d0, pts_h)


def world_planes(state_pose, model):
    """Per-body hull planes in world space (Pose::TransformPlane), padded to
    K=8 lanes; padding/masked planes get w = -1e9 so they never win or clip.
    Returns (B, P, 8)."""
    pos = state_pose[:, :3]
    q = state_pose[:, 3:7]
    wn = qrot(q[:, None, :], model.planes[..., :3])            # (B, P, 3)
    ww = model.planes[..., 3] - jnp.einsum("bk,bpk->bp", pos, wn)
    ww = jnp.where(model.plane_mask, ww, -1e9)
    B, P = ww.shape
    pk = jnp.zeros((B, P, 8), jnp.float32)
    return pk.at[..., :3].set(wn * model.plane_mask[..., None]).at[..., 3].set(ww)


def hull_reductions(state_pose, model, points, origin, planes_w=None):
    """Convenience wrapper: world-plane transform (tiny) + shared homogeneous
    point tile.  N must be a multiple of N_BLK.  Returns (B,N) reductions."""
    if planes_w is None:
        planes_w = world_planes(state_pose, model)
    N = points.shape[0]
    pts_h = jnp.zeros((8, N), jnp.float32)
    pts_h = pts_h.at[0:3].set(points.T).at[3].set(1.0)
    d0 = (jnp.einsum("bpk,k->bp", planes_w[..., :3], origin)
          + planes_w[..., 3])
    d0 = jnp.where(model.plane_mask, d0, -1.0)
    return correspondence_reductions(pts_h, planes_w[..., :8], d0)
