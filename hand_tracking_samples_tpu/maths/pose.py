"""Rigid-transform (Pose) operations as flat arrays.

A pose is an array (..., 7): position (3) followed by orientation quaternion
(4, xyzw).  Matches the reference `Pose` value type (geometric.h:111-125).
Keeping poses as flat arrays (not a pytree of two leaves) makes stacking 17
bones into a (17, 7) array natural and keeps solver state compact.
"""
from __future__ import annotations

import jax.numpy as jnp

from .quat import qconj, qmul, qrot

__all__ = [
    "pose", "identity_pose", "pose_pos", "pose_quat", "pose_inverse",
    "pose_mul", "pose_apply", "transform_plane",
]


def pose(position, orientation):
    return jnp.concatenate([jnp.asarray(position), jnp.asarray(orientation)], axis=-1)


def identity_pose(shape=(), dtype=jnp.float32):
    base = jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


def pose_pos(p):
    return p[..., :3]


def pose_quat(p):
    return p[..., 3:7]


def pose_inverse(p):
    """geometric.h:119 Pose::inverse."""
    q = qconj(pose_quat(p))
    return pose(qrot(q, -pose_pos(p)), q)


def pose_mul(a, b):
    """Pose composition a*b (geometric.h:123)."""
    return pose(pose_apply(a, pose_pos(b)), qmul(pose_quat(a), pose_quat(b)))


def pose_apply(p, v):
    """Transform point v by pose p (geometric.h:122)."""
    return pose_pos(p) + qrot(pose_quat(p), v)


def transform_plane(p, plane):
    """geometric.h:124 TransformPlane: plane (..., 4) -> world plane."""
    n = qrot(pose_quat(p), plane[..., :3])
    w = plane[..., 3] - jnp.sum(pose_pos(p) * n, axis=-1)
    return jnp.concatenate([n, w[..., None]], axis=-1)
