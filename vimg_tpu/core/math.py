"""Vector math over SoA batches of 3-vectors, shaped ``(..., 3)``.

All functions are pure jax.numpy and broadcast over leading batch dims.
Reference semantics: include/hit_utils.h (ONB, Gram-Schmidt, get_axis) and
include/ray.h of atom501/v-img, re-derived for vectorized TPU execution.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8
INF = jnp.inf


def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack(jnp.broadcast_arrays(
        jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)), axis=-1)


def dot(a, b):
    """Batched dot product along the last axis, keepdims=False.

    3-vectors use explicit component adds: a reduce over a size-3 minor
    axis lowers to a slow TPU reduce fusion (~80x worse, measured)."""
    p = a * b
    if p.shape[-1] == 3:
        return p[..., 0] + p[..., 1] + p[..., 2]
    if p.shape[-1] == 2:
        return p[..., 0] + p[..., 1]
    return jnp.sum(p, axis=-1)


def dotk(a, b):
    """Batched dot product, keepdims=True (broadcast-friendly)."""
    return dot(a, b)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def length2(a):
    return dot(a, a)


def length(a):
    return jnp.sqrt(length2(a))


def normalize(a):
    """Normalize; safe for zero vectors (returns 0)."""
    n2 = dot(a, a)[..., None]
    return a * jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-38)), 0.0)


def reflect(wi, n):
    """Mirror reflect ``wi`` (pointing toward surface) about normal n.

    Matches reference ``reflect_dir`` (src/material/dielectric.cpp:5-8).
    """
    return wi - 2.0 * dotk(wi, n) * n


def pow5(x):
    x2 = x * x
    return x2 * x2 * x


def luminance(col):
    """Rec.709 luminance (reference include/color_utils.h:9-11)."""
    return dot(col, jnp.asarray([0.212671, 0.715160, 0.072169], col.dtype))


# ---------------------------------------------------------------------------
# Orthonormal basis. Branchless Duff et al. style frame (reference
# include/hit_utils.h:43-59), vectorized with jnp.where instead of branches.
# ---------------------------------------------------------------------------

def onb_from_normal(n):
    """Build tangent/bitangent for unit normal n. Returns (u, v) each (...,3).

    The full frame is (u, v, n). Matches reference ``get_axis`` semantics
    including the n.z < -0.9999999 singular case.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    # guard denominator: at the singular pole we take the fallback anyway
    a = 1.0 / jnp.maximum(1.0 + nz, 1e-7)
    b = -nx * ny * a
    u_reg = jnp.stack([1.0 - nx * nx * a, b, -nx], axis=-1)
    v_reg = jnp.stack([b, 1.0 - ny * ny * a, -ny], axis=-1)
    sing = (nz < -0.9999999)[..., None]
    u_sing = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], n.dtype), u_reg.shape)
    v_sing = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0], n.dtype), v_reg.shape)
    u = jnp.where(sing, u_sing, u_reg)
    v = jnp.where(sing, v_sing, v_reg)
    return u, v


def onb_to_world(u, v, w, vec):
    """Local (tangent-space) direction -> world. reference xform_with_onb."""
    return (u * vec[..., 0:1] + v * vec[..., 1:2] + w * vec[..., 2:3])


def world_to_onb(u, v, w, vec):
    """World direction -> local frame coords. reference project_onto_onb."""
    return jnp.stack([dot(vec, u), dot(vec, v), dot(vec, w)], axis=-1)


def gram_schmidt(v, w):
    """v minus its projection on unit vector w (reference GramSchmidt)."""
    return v - dotk(v, w) * w


def tgather(table, idx, limit=64):
    """Row-gather from a SMALL table without TPU per-lane gathers.

    Profiling showed a (1M,)-lane gather from a 10-row table costs ~9 ms on
    the v5e VPU while an unrolled select chain costs ~0.1 ms. For tables
    with more rows than ``limit`` this falls back to a regular gather.
    Works for (N,), (N, K) and (N, K, L) tables with integer idx (...,).
    """
    n = table.shape[0]
    if n > limit or n == 0:
        return table[idx]
    extra = table.ndim - 1
    out = jnp.zeros(idx.shape + table.shape[1:], table.dtype)
    for k in range(n):
        m = (idx == k).reshape(idx.shape + (1,) * extra)
        out = jnp.where(m, table[k], out)
    return out


# ---------------------------------------------------------------------------
# 4x4 homogeneous transforms (host-side scene setup mostly, but jittable).
# ---------------------------------------------------------------------------

def xform_point(m, p):
    """Apply 4x4 matrix (row-major ndarray (4,4)) to points (...,3)."""
    r = p @ m[:3, :3].T + m[:3, 3]
    w = dotk(p, m[3, :3][None]) + m[3, 3] if m.shape == (4, 4) else 1.0
    # affine transforms in all our loaders: w == 1
    return r


def xform_dir(m, d):
    """Apply rotation/scale part of a 4x4 matrix to directions (...,3)."""
    return d @ m[:3, :3].T


def look_at(look_from, look_to, up):
    """Camera-to-world matrix, reference camToWorld (src/tl_camera.cpp:55-62).

    Returns a numpy-compatible (4,4) row-major matrix M so that
    world = M @ [cam, 1].
    """
    import numpy as np
    look_from = np.asarray(look_from, np.float32)
    look_to = np.asarray(look_to, np.float32)
    up = np.asarray(up, np.float32)

    def _norm(v):
        return v / np.linalg.norm(v)

    z = _norm(look_from - look_to)
    x = _norm(np.cross(up, z))
    y = _norm(np.cross(z, x))
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = x
    m[:3, 1] = y
    m[:3, 2] = z
    m[:3, 3] = look_from
    return m
