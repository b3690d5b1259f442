"""Ray cones for texture LOD (RT Gems 1 ch.20 / RT Gems 2 ch.10 style).

Vectorized re-derivation of reference include/ray.h:44-174. A cone is the
pair (width, spread_angle) carried per ray as two float arrays.
"""
from __future__ import annotations

import jax.numpy as jnp

from vimg_tpu.core.math import dot, normalize


def primary_cone_spread(vfov_rad, pixel_height):
    """Spread angle of a primary-ray cone (reference ray.h:44-48)."""
    return jnp.arctan(2.0 * jnp.tan(vfov_rad / 2.0) / pixel_height)


def _fsign(x):
    return jnp.where(x > 0.0, 1.0, -1.0)


def spread_angle_from_curvature(mean_curvature, cone_width, ray_dir, normal):
    """Surface-induced spread angle (reference ray.h:52-63)."""
    dn = -dot(ray_dir, normal)
    dn = jnp.where(jnp.abs(dn) < 1e-5, _fsign(dn) * 1e-5, dn)
    return mean_curvature * cone_width / dn


def propagate_reflect(width, spread, surface_spread_angle, hit_dist):
    """Cone update on reflection/continuation (reference ray.h:66-71)."""
    new_width = jnp.abs(spread * hit_dist + width)
    new_spread = spread + surface_spread_angle
    return new_width, new_spread


def _refract_tir_2d(d, n, eta):
    """2D refraction; on TIR falls back to the tangential projection
    (reference ray.h:73-83 + fallback at ray.h:131-141)."""
    nd = d[..., 0] * n[..., 0] + d[..., 1] * n[..., 1]
    k = 1.0 - eta * eta * (1.0 - nd * nd)
    tir = k < 0.0
    refr = d * eta[..., None] - n * (eta * nd + jnp.sqrt(jnp.maximum(k, 0.0)))[..., None]
    tangential = d - n * nd[..., None]
    tlen = jnp.sqrt(jnp.maximum(
        tangential[..., 0] ** 2 + tangential[..., 1] ** 2, 1e-20))
    fallback = tangential / tlen[..., None]
    return jnp.where(tir[..., None], fallback, refr)


def _rot2d_pm(v, angle):
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    cx = c * v[..., 0]
    sy = s * v[..., 1]
    sx = s * v[..., 0]
    cy = c * v[..., 1]
    plus = jnp.stack([cx - sy, sx + cy], axis=-1)
    minus = jnp.stack([cx + sy, -sx + cy], axis=-1)
    return plus, minus


def _ortho2d(v):
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def propagate_refract(width, spread, ray_in_dir, surface_spread_angle, eta,
                      refracted_dir):
    """Cone update through refraction, via the reference's 2D construction
    (ray.h:96-174). Batched over leading dims; eta is a float array."""
    denom = eta[..., None] * refracted_dir + ray_in_dir
    normal = -normalize(denom)

    x_axis = normalize(ray_in_dir - normal * dot(normal, ray_in_dir)[..., None])
    y_axis = normal

    def proj2(v):
        return jnp.stack([dot(v, x_axis), dot(v, y_axis)], axis=-1)

    refr2 = proj2(refracted_dir)
    inc2 = proj2(ray_in_dir)
    inc2_ortho = _ortho2d(inc2)

    width_sign = jnp.where(width > 0.0, 1.0, -1.0)
    inc2_u, inc2_l = _rot2d_pm(inc2, spread * width_sign * 0.5)

    tu = inc2_ortho * (width * 0.5)[..., None]
    tl = -tu

    hp_u_x = tu[..., 0] + inc2_u[..., 0] * (-tu[..., 1] / inc2_u[..., 1])
    hp_l_x = tl[..., 0] + inc2_l[..., 0] * (-tl[..., 1] / inc2_l[..., 1])

    normal_sign = jnp.where(hp_u_x > hp_l_x, 1.0, -1.0)

    n2 = jnp.stack([jnp.zeros_like(width), jnp.ones_like(width)], axis=-1)
    n2_u, n2_l = _rot2d_pm(n2, -surface_spread_angle * normal_sign * 0.5)

    r2_u = _refract_tir_2d(inc2_u, n2_u, eta)
    r2_l = _refract_tir_2d(inc2_l, n2_l, eta)

    cross_ul = r2_u[..., 0] * r2_l[..., 1] - r2_u[..., 1] * r2_l[..., 0]
    sign_a = jnp.where(cross_ul * normal_sign < 0.0, 1.0, -1.0)
    d_ul = jnp.clip(r2_u[..., 0] * r2_l[..., 0] + r2_u[..., 1] * r2_l[..., 1],
                    -1.0, 1.0)
    new_spread = jnp.arccos(d_ul) * sign_a
    new_spread = jnp.where(jnp.isnan(new_spread), 0.0, new_spread)

    refr_ortho = _ortho2d(refr2)

    def _dot2(a, b):
        return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]

    new_width = (-hp_u_x * r2_u[..., 1]) / _dot2(refr_ortho, _ortho2d(r2_u))
    new_width = new_width + (hp_l_x * r2_l[..., 1]) / _dot2(refr_ortho, _ortho2d(r2_l))
    # guard NaNs from degenerate 2D frames (e.g. normal incidence)
    new_width = jnp.where(jnp.isnan(new_width), jnp.abs(spread) * 0.0 + jnp.abs(width), new_width)
    return new_width, new_spread
