"""Display meshes: subdivided bone geometry and vanity-bone rendering data.

Covers the reference's render-mesh path (third_party/mesh.h, PhysModel's
meshes/sdmeshes, handtrack.h:592-616 vanity bones) for the offline
visualization story: posed meshes exported as OBJ (or consumed by notebooks)
instead of drawn into a GL window.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..geometry.subdiv import catmull_clark, fan_triangulate


def load_display_meshes(json_path: str, subdiv: int = 2):
    """Load control cages (model_hand.json or vanity_bones.json) and apply
    Catmull-Clark like dosubdiv / load_bone_meshes (physmodel.h:255-259,
    handtrack.h:599-616).  Returns list of (verts (V,3), tris (T,3))."""
    js = json.load(open(json_path))
    cages = js["controlcages"] if isinstance(js, dict) else js
    out = []
    for cage in cages:
        v, f = np.asarray(cage["verts"], np.float64), cage["faces"]
        for _ in range(subdiv):
            v, f = catmull_clark(v, f)
        out.append((v.astype(np.float32), fan_triangulate(f)))
    return out


def smooth_normals(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (MeshSmoothish, mesh.h:179)."""
    n = np.zeros_like(verts)
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    fn = np.cross(b - a, c - b)
    for k in range(3):
        np.add.at(n, tris[:, k], fn)
    l = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(l, 1e-20)


def pose_mesh(verts: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Transform mesh verts by a (7,) pose (rig/user space)."""
    from ..maths.quat import qrot
    import jax.numpy as jnp
    return np.asarray(qrot(jnp.asarray(pose[3:7]), jnp.asarray(verts))
                      + pose[:3])


def export_obj(path: str, meshes, poses_user=None):
    """Write posed bone meshes as one OBJ (offline viz artifact).

    meshes: list of (verts, tris); poses_user: (n,7) user-frame poses (from
    get_pose_user) or None for rest pose."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        off = 1
        for i, (v, t) in enumerate(meshes):
            vv = pose_mesh(v, np.asarray(poses_user[i])) \
                if poses_user is not None else v
            f.write(f"o bone_{i}\n")
            for p in vv:
                f.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            for tri in t:
                f.write(f"f {tri[0]+off} {tri[1]+off} {tri[2]+off}\n")
            off += len(vv)


def skin_dualquat(verts, weights, bone_ids, poses):
    """Dual-quaternion skinning (mesh.h:69): blend bone transforms per vertex.

    verts (V,3), weights (V,K), bone_ids (V,K) int, poses (B,7).
    Returns skinned verts (V,3)."""
    import jax.numpy as jnp
    from ..maths.quat import qmul, qrot

    q = poses[:, 3:7]                     # (B,4) real part
    t = poses[:, :3]
    # dual part: 0.5 * (t,0) * q
    tq = jnp.concatenate([t, jnp.zeros_like(t[:, :1])], -1)
    dual = 0.5 * qmul(tq, q)
    qv = q[bone_ids]                      # (V,K,4)
    dv = dual[bone_ids]
    # hemispherize against the first influence
    sign = jnp.sign(jnp.sum(qv * qv[:, :1], axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    qb = jnp.sum(qv * sign * weights[..., None], axis=1)
    db = jnp.sum(dv * sign * weights[..., None], axis=1)
    norm = jnp.linalg.norm(qb, axis=-1, keepdims=True)
    qb = qb / norm
    db = db / norm
    # translation = 2 * dual * conj(real)
    from ..maths.quat import qconj
    tb = 2.0 * qmul(db, qconj(qb))[:, :3]
    return qrot(qb, jnp.asarray(verts)) + tb
