"""Component-triple 3-vector math for Pallas TPU kernels.

Inside a TPU kernel the minor-most dimension must be lane-shaped (128); a
trailing size-3 vector axis would tile catastrophically. Vectors are
therefore carried as three separate (rows, 128) component arrays wrapped in
a ``V3`` NamedTuple with arithmetic operators, so ported shading code reads
like the (B, 3) original (see vimg_tpu/core/math.py for the XLA-side
equivalents and the reference pointers).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp


class V3(NamedTuple):
    x: Any
    y: Any
    z: Any

    # -- arithmetic (V3 op V3 componentwise; V3 op scalar broadcasts) -------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def splat(c, like):
    """Constant (python/scalar) -> V3 broadcast against ``like`` (an array)."""
    one = jnp.ones_like(like)
    return V3(one * c[0], one * c[1], one * c[2])


def full(shape, c, dtype=jnp.float32):
    return V3(jnp.full(shape, c[0], dtype), jnp.full(shape, c[1], dtype),
              jnp.full(shape, c[2], dtype))


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def length2(a: V3):
    return dot(a, a)


def length(a: V3):
    return jnp.sqrt(dot(a, a))


def normalize(a: V3) -> V3:
    """Safe normalize (zero vector -> zero). Bit-identical to
    core.math.normalize (1/sqrt, NOT rsqrt — rsqrt rounds differently and
    ulp deltas flip shadow/one-sided epsilon races vs the XLA renderers)."""
    n2 = dot(a, a)
    s = jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-38)), 0.0)
    return a * s


def where(m, a: V3, b: V3) -> V3:
    return V3(jnp.where(m, a.x, b.x), jnp.where(m, a.y, b.y),
              jnp.where(m, a.z, b.z))


def bsel(m, a, b):
    """Boolean select: Mosaic can't lower select_n on i1 vectors (it emits
    an unsupported i8->i1 trunci), so use logic ops for bool operands."""
    return (m & a) | (~m & b)


def maxc(a: V3):
    """Componentwise max (for Russian roulette)."""
    return jnp.maximum(a.x, jnp.maximum(a.y, a.z))


def luminance(col: V3):
    """Rec.709 luminance (reference include/color_utils.h:9-11)."""
    return col.x * 0.212671 + col.y * 0.715160 + col.z * 0.072169


def reflect(wi: V3, n: V3) -> V3:
    """Mirror reflect wi (toward surface) about n (reference reflect_dir)."""
    return wi - n * (2.0 * dot(wi, n))


def onb_from_normal(n: V3):
    """Branchless Duff-style frame (reference include/hit_utils.h:43-59);
    mirrors core.math.onb_from_normal exactly. Returns (u, v)."""
    a = 1.0 / jnp.maximum(1.0 + n.z, 1e-7)
    b = -n.x * n.y * a
    u = V3(1.0 - n.x * n.x * a, b, -n.x)
    v = V3(b, 1.0 - n.y * n.y * a, -n.y)
    sing = n.z < -0.9999999
    zero = jnp.zeros_like(n.x)
    u = where(sing, V3(zero, zero - 1.0, zero), u)
    v = where(sing, V3(zero - 1.0, zero, zero), v)
    return u, v


def onb_to_world(u: V3, v: V3, w: V3, local: V3) -> V3:
    return u * local.x + v * local.y + w * local.z


def world_to_onb(u: V3, v: V3, w: V3, vec: V3) -> V3:
    return V3(dot(vec, u), dot(vec, v), dot(vec, w))


def pow5(x):
    x2 = x * x
    return x2 * x2 * x


def powf(base, expo):
    """base**expo for base > 0 (TPU Pallas has no pow primitive)."""
    return jnp.exp(jnp.log(jnp.maximum(base, 1e-30)) * expo)
