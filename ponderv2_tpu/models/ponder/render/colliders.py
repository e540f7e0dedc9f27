"""Scene colliders: ray near/far bounds (reference scene_colliders.py:25-120)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ....utils.registry import Registry

COLLIDERS = Registry("colliders")


@COLLIDERS.register_module()
class AABBBoxCollider:
    """Slab-test intersection with an axis-aligned box.

    ``near_plane`` clamps the entry distance (rays starting inside the box get
    near = near_plane). Box is ((3,) min, (3,) max) — for the unit-cube scenes
    this is (0,0,0)-(1,1,1).
    """

    def __init__(self, near_plane: float = 0.05, bbox_min=(0.0, 0.0, 0.0),
                 bbox_max=(1.0, 1.0, 1.0)):
        self.near_plane = near_plane
        self.bbox_min = jnp.asarray(bbox_min, jnp.float32)
        self.bbox_max = jnp.asarray(bbox_max, jnp.float32)

    def __call__(
        self, origins: jnp.ndarray, directions: jnp.ndarray,
        bbox_min=None, bbox_max=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """origins/directions (..., 3) -> (nears (...), fars (...))."""
        bmin = self.bbox_min if bbox_min is None else bbox_min
        bmax = self.bbox_max if bbox_max is None else bbox_max
        inv_d = 1.0 / jnp.where(jnp.abs(directions) < 1e-10,
                                jnp.sign(directions) * 1e-10 + 1e-10, directions)
        t0 = (bmin - origins) * inv_d
        t1 = (bmax - origins) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        nears = jnp.maximum(t_near, self.near_plane)
        fars = jnp.maximum(t_far, nears + 1e-4)
        return nears, fars


@COLLIDERS.register_module()
class NearFarCollider:
    def __init__(self, near_plane: float = 0.05, far_plane: float = 2.0):
        self.near_plane = near_plane
        self.far_plane = far_plane

    def __call__(self, origins, directions, **_):
        shape = origins.shape[:-1]
        return (
            jnp.full(shape, self.near_plane, jnp.float32),
            jnp.full(shape, self.far_plane, jnp.float32),
        )
