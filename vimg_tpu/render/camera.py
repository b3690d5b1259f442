"""Thin-lens camera with depth of field.

Semantics match reference src/tl_camera.cpp:25-53 (physical image plane from
vfov + aspect, aperture-disk origin jitter, focal-plane retarget, cam->world
transform, normalized directions) but fully batched: one call generates a
whole wavefront of primary rays.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.core import warps
from vimg_tpu.core.math import normalize
from vimg_tpu.core.raycone import primary_cone_spread


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    """Camera parameters. ``cam2world`` is a (4,4) row-major matrix."""
    cam2world: jax.Array           # (4, 4) float32
    vfov_deg: jax.Array            # () float32 — differentiable
    aperture_radius: jax.Array     # () float32
    focal_dist: jax.Array          # () float32
    width: int = field(default=512, metadata=dict(static=True))
    height: int = field(default=512, metadata=dict(static=True))

    @staticmethod
    def make(cam2world, width, height, vfov_deg, aperture_radius=0.0,
             focal_dist=1.0):
        return Camera(
            cam2world=jnp.asarray(cam2world, jnp.float32),
            vfov_deg=jnp.asarray(vfov_deg, jnp.float32),
            aperture_radius=jnp.asarray(aperture_radius, jnp.float32),
            focal_dist=jnp.asarray(focal_dist, jnp.float32),
            width=int(width), height=int(height))


def generate_rays(cam: Camera, px, py, lens_r1, lens_r2):
    """Primary rays for continuous pixel coords (px, py), batched.

    px/py follow the reference convention: x in [0, W), y in [0, H) with
    y = 0 the *bottom* row (the film writes row H-1-y).

    Returns (origin, direction, cone_width, cone_spread) — all (...,3)/(...,).
    """
    theta = cam.vfov_deg * (math.pi / 180.0)
    img_h = 2.0 * jnp.tan(theta / 2.0)
    img_w = img_h * (cam.width / cam.height)

    x_dir = img_w * (px / cam.width) - img_w / 2.0
    y_dir = img_h * (py / cam.height) - img_h / 2.0
    ray_dir = normalize(jnp.stack(
        [x_dir, y_dir, -jnp.ones_like(x_dir)], axis=-1))
    origin = jnp.zeros_like(ray_dir)

    # depth of field: jitter origin on the aperture disk, aim through the
    # focal plane point (reference tl_camera.cpp:37-44)
    has_dof = cam.aperture_radius > 0.0
    disk = warps.sample_disk(lens_r1, lens_r2) * cam.aperture_radius
    dof_origin = jnp.concatenate([disk, jnp.zeros_like(disk[..., :1])], axis=-1)
    ft = cam.focal_dist / jnp.abs(ray_dir[..., 2])
    focal_p = ray_dir * ft[..., None]
    dof_dir = normalize(focal_p - dof_origin)
    origin = jnp.where(has_dof, dof_origin, origin)
    ray_dir = jnp.where(has_dof, dof_dir, ray_dir)

    # camera -> world
    rot = cam.cam2world[:3, :3]
    trans = cam.cam2world[:3, 3]
    world_o = origin @ rot.T + trans
    world_d = normalize(ray_dir @ rot.T)

    spread = primary_cone_spread(theta, float(cam.height))
    # derive from px so the values inherit shard_map varying axes
    cone_width = x_dir * 0.0
    cone_spread = spread + cone_width
    return world_o, world_d, cone_width, cone_spread


def look_at_matrix(look_from, look_to, up):
    from vimg_tpu.core.math import look_at
    return look_at(look_from, look_to, up)
