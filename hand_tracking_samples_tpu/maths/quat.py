"""Quaternion math, vectorised for JAX/TPU.

Semantics follow the reference linalg/geometric conventions
(/root/reference/third_party/linalg.h, geometric.h): quaternions are
(x, y, z, w) arrays, `qrot(q, v) = q * (v,0) * conj(q)`, `qmat` columns are
(qxdir, qydir, qzdir).  All functions broadcast over leading axes so they can
be vmapped/jitted freely.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "qconj", "qmul", "qrot", "qxdir", "qydir", "qzdir", "qmat",
    "quat_from_axis_angle", "quat_from_to", "quat_from_mat", "qnormalize",
    "orth", "safenormalize", "rotation_quat",
]


def qconj(q):
    """Quaternion conjugate (x,y,z,w) -> (-x,-y,-z,w)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def qmul(a, b):
    """Hamilton product a*b; convention of linalg.h qmul (column-action q*v*q^-1)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def qxdir(q):
    """First column of the rotation matrix of q (linalg.h qxdir)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        w * w + x * x - y * y - z * z,
        (x * y + z * w) * 2,
        (z * x - y * w) * 2,
    ], axis=-1)


def qydir(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        (x * y - z * w) * 2,
        w * w - x * x + y * y - z * z,
        (y * z + x * w) * 2,
    ], axis=-1)


def qzdir(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        (z * x + y * w) * 2,
        (y * z - x * w) * 2,
        w * w - x * x - y * y + z * z,
    ], axis=-1)


def qmat(q):
    """3x3 rotation matrix; columns are qxdir/qydir/qzdir.

    Returned with shape (..., 3, 3) such that matvec `qmat(q) @ v == qrot(q, v)`.
    Note linalg.h stores matrices column-major (m[col][row]); here we return the
    conventional row-major matrix for jnp matmul use.
    """
    cols = jnp.stack([qxdir(q), qydir(q), qzdir(q)], axis=-1)  # (...,3(row),3(col))
    return cols


def qrot(q, v):
    """Rotate vector v by quaternion q (qmat(q) * v)."""
    # Direct expansion avoids building the matrix.
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def safenormalize(v):
    """normalize, returning +z for the zero vector (geometric.h:58)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    z = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(n == 0.0, z, v / jnp.where(n == 0.0, 1.0, n))


def quat_from_axis_angle(axis, angle):
    """QuatFromAxisAngle (geometric.h:102); axis assumed unit length."""
    angle = jnp.asarray(angle)
    half = angle[..., None] * 0.5
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


# Alias matching linalg.h rotation_quat(axis, angle)
rotation_quat = quat_from_axis_angle


def orth(v):
    """geometric.h:312 Orth: unit vector orthogonal to v."""
    absv = jnp.abs(v)
    imax = jnp.argmax(absv, axis=-1)
    u = jnp.ones_like(v)
    u = jnp.where(jnp.arange(3) == imax[..., None], 0.0, u)
    c = jnp.cross(u, v)
    return c / jnp.linalg.norm(c, axis=-1, keepdims=True)


def quat_from_to(v0, v1):
    """Shortest-arc quaternion taking v0 to v1 (geometric.h:319)."""
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    c = jnp.cross(v0, v1)
    d = jnp.sum(v0 * v1, axis=-1, keepdims=True)
    s = jnp.sqrt(jnp.maximum((1.0 + d) * 2.0, 1e-30))
    q = jnp.concatenate([c / s, s * 0.5], axis=-1)
    # 180-degree case: rotate about any orthogonal axis
    a = orth(v0)
    q180 = jnp.concatenate([a, jnp.zeros_like(d)], axis=-1)
    return jnp.where(d <= -1.0, q180, q)


def quat_from_mat(m):
    """geometric.h:67 quatfrommat. m is (...,3,3) row-major (matvec convention),
    i.e. m[..., :, j] is column j, matching linalg's m[j] column access."""
    # linalg m[i][j] is column i, row j -> our m[..., j, i]
    def e(i, j):
        return m[..., j, i]

    magw = e(0, 0) + e(1, 1) + e(2, 2)
    wvsz = magw > e(2, 2)
    magzw = jnp.where(wvsz, magw, e(2, 2))
    prezw = jnp.where(wvsz[..., None], jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray([-1.0, -1.0, 1.0]))
    postzw = jnp.where(wvsz[..., None], jnp.asarray([0.0, 0, 0, 1]), jnp.asarray([0.0, 0, 1, 0]))

    xvsy = e(0, 0) > e(1, 1)
    magxy = jnp.where(xvsy, e(0, 0), e(1, 1))
    prexy = jnp.where(xvsy[..., None], jnp.asarray([1.0, -1.0, -1.0]), jnp.asarray([-1.0, 1.0, -1.0]))
    postxy = jnp.where(xvsy[..., None], jnp.asarray([1.0, 0, 0, 0]), jnp.asarray([0.0, 1, 0, 0]))

    zwvsxy = magzw > magxy
    pre = jnp.where(zwvsxy[..., None], prezw, prexy)
    post = jnp.where(zwvsxy[..., None], postzw, postxy)

    t = pre[..., 0] * e(0, 0) + pre[..., 1] * e(1, 1) + pre[..., 2] * e(2, 2) + 1.0
    s = 1.0 / jnp.sqrt(t) / 2.0
    qp = jnp.stack([
        (pre[..., 1] * e(1, 2) - pre[..., 2] * e(2, 1)) * s,
        (pre[..., 2] * e(2, 0) - pre[..., 0] * e(0, 2)) * s,
        (pre[..., 0] * e(0, 1) - pre[..., 1] * e(1, 0)) * s,
        t * s,
    ], axis=-1)
    return qmul(qp, post)
