"""Stateless counter-based RNG for TPU path tracing.

The reference threads a mutable PCG32 state through every sample
(include/rng/pcg_rand.h, reseeded per pixel at include/integrators.h:116).
Mutable per-lane state is hostile to SPMD/XLA, so we use a counter-based
hash: every random draw is keyed by ``(pixel, sample, bounce, draw)`` and
computed independently — embarrassingly parallel, order-independent, and
trivially resumable (the key IS the checkpoint).

Hash: PCG4D (Jarzynski & Olano, "Hash Functions for GPU Rendering", JCGT
2020) — 4 uint32 in, 4 uint32 out, excellent statistical quality, only
integer VPU ops. The R2 quasi-random pixel-offset sequence
(include/rng/sampling.h:228-239) is kept for parity.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def pcg4d(a, b, c, d):
    """PCG4D hash: four uint32 counters -> four decorrelated uint32."""
    x = jnp.asarray(a, _U32)
    y = jnp.asarray(b, _U32)
    z = jnp.asarray(c, _U32)
    w = jnp.asarray(d, _U32)
    mul = _U32(1664525)
    add = _U32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    w = w * mul + add
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _u32_to_unit_float(u):
    """uint32 -> float32 in [0, 1) using the top 24 bits (exactly uniform)."""
    return (u >> _U32(8)).astype(jnp.float32) * jnp.float32(5.9604645e-08)  # 2^-24


def uniform4(pixel, sample, bounce, draw):
    """Four independent U[0,1) floats for the given counter key.

    All args broadcastable integer arrays. Returns tuple of 4 float arrays.
    """
    x, y, z, w = pcg4d(pixel, sample, bounce, draw)
    return (_u32_to_unit_float(x), _u32_to_unit_float(y),
            _u32_to_unit_float(z), _u32_to_unit_float(w))


def uniform2(pixel, sample, bounce, draw):
    r1, r2, _, _ = uniform4(pixel, sample, bounce, draw)
    return r1, r2


def uniform1(pixel, sample, bounce, draw):
    return uniform4(pixel, sample, bounce, draw)[0]


# Purpose/draw ids — unique stream per (bounce, purpose) pair.
class Draw:
    CAMERA_LENS = 0
    LIGHT_PICK = 1
    LIGHT_SAMPLE = 2
    BSDF_LOBE = 3
    BSDF_SAMPLE = 4
    BSDF_FRESNEL = 5
    ROULETTE = 6
    AA_JITTER = 7


def r2_sequence(n):
    """R2 quasi-random 2D point for index n (float32 fract arithmetic,
    matching reference include/rng/sampling.h:228-239)."""
    g = 1.32471795724474602596
    a1 = jnp.float32(1.0 - 1.0 / g)
    a2 = jnp.float32(1.0 - 1.0 / (g * g))
    nf = jnp.asarray(n, jnp.float32)
    x = a1 * nf
    y = a2 * nf
    return x - jnp.floor(x), y - jnp.floor(y)
