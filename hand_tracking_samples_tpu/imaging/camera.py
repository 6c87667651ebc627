"""Depth-camera intrinsics/extrinsics as a JAX pytree.

Mirrors the reference DCamera (include/misc_image.h:30-62): pinhole
project/deproject at unit focal-pixel convention, derived-camera algebra
(camsub/camcrop/scaling), plus the camera pose used by resampling.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..maths.pose import identity_pose


class DCamera(NamedTuple):
    dim: tuple            # (W, H) static python ints
    focal: jnp.ndarray    # (2,)
    principal: jnp.ndarray  # (2,)
    depth_scale: jnp.ndarray  # scalar
    pose: jnp.ndarray     # (7,)

    @staticmethod
    def make(dim, focal=None, principal=None, depth_scale=0.001, pose=None):
        dim = (int(dim[0]), int(dim[1]))
        if focal is None:  # DCamera(int2 dim) ctor: focal = dim
            focal = jnp.asarray(dim, jnp.float32)
        if principal is None:
            principal = jnp.asarray(dim, jnp.float32) / 2.0
        if pose is None:
            pose = identity_pose()
        return DCamera(dim, jnp.asarray(focal, jnp.float32),
                       jnp.asarray(principal, jnp.float32),
                       jnp.asarray(depth_scale, jnp.float32),
                       jnp.asarray(pose, jnp.float32))

    @staticmethod
    def default_320x240():
        """The reference's default intrinsics (misc_image.h:32-34)."""
        return DCamera.make((320, 240), (241.811768, 241.811768),
                            (162.830505, 118.740089), 0.001)

    def deprojectz(self, p, d):
        """p (...,2) pixel, d (...) depth -> (...,3) camera-space point."""
        x = (p[..., 0] - self.principal[0]) / self.focal[0]
        y = (p[..., 1] - self.principal[1]) / self.focal[1]
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1) * d[..., None]

    def projectz(self, v):
        """v (...,3) -> (...,2) pixel coordinates."""
        return v[..., :2] / v[..., 2:3] * self.focal + self.principal

    def fov(self):
        """misc_image.h:53 (degrees not applied; radians like the reference's
        atan2 sum), with the DS4 half-pixel convention."""
        import jax.numpy as jnp
        w, h = self.dim
        fx = (jnp.arctan2(self.principal[0] + 0.5, self.focal[0])
              + jnp.arctan2(w - self.principal[0] - 0.5, self.focal[0]))
        fy = (jnp.arctan2(self.principal[1] + 0.5, self.focal[1])
              + jnp.arctan2(h - self.principal[1] - 0.5, self.focal[1]))
        return jnp.stack([fx, fy])

    def deproject_extents(self):
        """misc_image.h:52: xy corners of the z=1 plane."""
        import jax.numpy as jnp
        ul = self.deprojectz(jnp.zeros(2), jnp.float32(1.0))[:2]
        lr = self.deprojectz(jnp.asarray(self.dim, jnp.float32),
                             jnp.float32(1.0))[:2]
        return jnp.stack([ul, lr])

    def crop(self, offset, dim):
        """camcrop (misc_image.h:59)."""
        import jax.numpy as jnp
        return self._replace(dim=(int(dim[0]), int(dim[1])),
                             principal=self.principal
                             - jnp.asarray(offset, jnp.float32))

    def sub(self, s: int):
        """camsub (misc_image.h:60): dims/focal/principal divided by s."""
        return self._replace(dim=(self.dim[0] // s, self.dim[1] // s),
                             focal=self.focal / s, principal=self.principal / s)

    def scaled(self, s: int):
        return self._replace(dim=(self.dim[0] * s, self.dim[1] * s),
                             focal=self.focal * s, principal=self.principal * s)


jax.tree_util.register_pytree_node(
    DCamera,
    lambda c: ((c.focal, c.principal, c.depth_scale, c.pose), c.dim),
    lambda dim, xs: DCamera(dim, *xs),
)
