"""Sampling warps: map uniform randoms to directions/points.

Semantics match reference include/rng/sampling.h:15-79; all functions are
batched over leading dims (r1, r2 are float arrays of identical shape).
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi
INV_PI = 1.0 / jnp.pi
INV_4PI = 1.0 / (4.0 * jnp.pi)


def sample_disk(r1, r2):
    """Uniform point on the unit disk -> (..., 2)."""
    r = jnp.sqrt(r1)
    phi = TWO_PI * r2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_sphere(r1, r2):
    """Uniform direction on the unit sphere -> (..., 3); pdf = 1/(4 pi)."""
    phi = TWO_PI * r1
    cos_t = 2.0 * r2 - 1.0
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)


def sample_sphere_cap(r1, r2, cos_theta_max):
    """Uniform direction in cone around +z with half-angle acos(cos_theta_max).

    pdf = 1 / (2 pi (1 - cos_theta_max)) in solid angle.
    """
    phi = TWO_PI * r1
    cos_t = cos_theta_max + (1.0 - cos_theta_max) * r2  # lerp(cos_max, 1, r2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)


def sample_hemisphere(r1, r2):
    """Uniform direction on the +z hemisphere; pdf = 1/(2 pi)."""
    phi = TWO_PI * r1
    cos_t = r2
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)


def sample_hemisphere_cosine(r1, r2):
    """Cosine-weighted direction on +z hemisphere; pdf = cos(theta)/pi."""
    phi = TWO_PI * r1
    cos_t = jnp.sqrt(r2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1)


def sample_triangle_uv(r1, r2):
    """Uniform barycentric (u, v) on a triangle.

    Matches the reference's low-distortion warp (src/geometry/triangle.cpp:
    200-213): if r1 < r2: u = r1/2, v = r2 - u else v = r2/2, u = r1 - v.
    """
    lt = r1 < r2
    u_a = r1 * 0.5
    v_a = r2 - u_a
    v_b = r2 * 0.5
    u_b = r1 - v_b
    u = jnp.where(lt, u_a, u_b)
    v = jnp.where(lt, v_a, v_b)
    return u, v
