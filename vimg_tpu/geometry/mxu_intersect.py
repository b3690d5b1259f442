"""MXU-native brute-force intersection: ray/primitive tests as one matmul.

TPU v5e's FLOPs live in the MXU (systolic array), not the VPU. Per-lane
geometry math caps at ~200 Gflop/s, but a ray/triangle test factors into
dot products with *per-triangle constants*:

  n  = e1 x e2                 (plane normal)
  t  = (p0.n - ro.n) / rd.n
  m1 = (e2 x n)/|n|^2, m2 = (n x e1)/|n|^2    (barycentric dual basis)
  u  = (ro + t rd - p0).m1,  v = (ro + t rd - p0).m2

With X = [ro | rd | 1] (B, 7) and a weight matrix W (7, 6T) whose columns
are (n,0,-p0.n), (0,n,0), (m1,0,-p0.m1), (0,m1,0), (m2,0,-p0.m2),
(0,m2,0) per triangle, ONE matmul X @ W computes every numerator/
denominator for every (ray, triangle) pair on the MXU; a short fused
elementwise pass recovers (t, u, v) and the closest hit. Spheres get
ro.c / rd.c columns the same way. Precision: HIGHEST (bf16x3 passes,
~f32 accuracy).

This replaces include/simd_hit.h's AVX2 2-wide tests with 128x128
systolic-array-wide tests — the reference's ILP idea at MXU scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.intersect import HitResult
from vimg_tpu.scene import ir

COLS = 6  # matmul columns per primitive


def build_tables(scene: ir.Scene):
    nt = scene.n_tris()
    ns = scene.n_spheres()
    P = nt + ns
    W = np.zeros((7, COLS * P), np.float32)
    aux = np.zeros((P, 4), np.float32)   # spheres: |c|^2 - r^2, r^2
    if nt:
        v = np.asarray(scene.verts)
        tidx = np.asarray(scene.tri_vidx)
        p0 = v[tidx[:, 0]].astype(np.float64)
        e1 = v[tidx[:, 1]].astype(np.float64) - p0
        e2 = v[tidx[:, 2]].astype(np.float64) - p0
        n = np.cross(e1, e2)
        n2 = np.maximum((n * n).sum(1, keepdims=True), 1e-30)
        m1 = np.cross(e2, n) / n2
        m2 = np.cross(n, e1) / n2
        for i in range(nt):
            c = COLS * i
            W[0:3, c + 0] = n[i]
            W[6, c + 0] = -(p0[i] @ n[i])
            W[3:6, c + 1] = n[i]
            W[0:3, c + 2] = m1[i]
            W[6, c + 2] = -(p0[i] @ m1[i])
            W[3:6, c + 3] = m1[i]
            W[0:3, c + 4] = m2[i]
            W[6, c + 4] = -(p0[i] @ m2[i])
            W[3:6, c + 5] = m2[i]
    if ns:
        cen = np.asarray(scene.sph_center, np.float64)
        rad = np.asarray(scene.sph_radius, np.float64)
        for j in range(ns):
            i = nt + j
            c = COLS * i
            W[0:3, c + 0] = cen[j]     # ro . c
            W[3:6, c + 1] = cen[j]     # rd . c
            aux[i, 0] = (cen[j] @ cen[j]) - rad[j] * rad[j]
            aux[i, 1] = rad[j] * rad[j]
    return jnp.asarray(W), jnp.asarray(aux)


@functools.partial(jax.jit, static_argnames=("nt", "ns", "any_hit"))
def mxu_intersect(W, aux, ro, rd, minT, maxT, nt, ns, any_hit=False):
    """Closest-hit (or any-hit) of a ray batch against all primitives."""
    B = ro.shape[0]
    P = nt + ns
    X = jnp.concatenate([ro, rd, jnp.ones((B, 1), ro.dtype)], axis=1)
    Y = jax.lax.dot_general(
        X, W, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # (B, 6P)
    Y = Y.reshape(B, P, COLS)

    minT_b = minT[:, None]
    maxT_b = maxT[:, None]

    out_t = jnp.full((B, P), jnp.inf)
    if nt:
        Yt = Y[:, :nt, :]
        num = Yt[..., 0]          # ro.n - p0.n  (plane residual)
        den = Yt[..., 1]          # rd.n
        t = -num / jnp.where(den == 0.0, 1e-30, den)
        u = Yt[..., 2] + t * Yt[..., 3]
        v = Yt[..., 4] + t * Yt[..., 5]
        hit = ((den != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t >= minT_b) & (t <= maxT_b))
        tri_t = jnp.where(hit, t, jnp.inf)
        out_t = out_t.at[:, :nt].set(tri_t)
        tri_u = u
        tri_v = v
    if ns:
        Ys = Y[:, nt:, :]
        ro_c = Ys[..., 0]
        rd_c = Ys[..., 1]
        ro2 = jnp.sum(ro * ro, axis=1)[:, None]
        rd2 = jnp.sum(rd * rd, axis=1)[:, None]
        ro_rd = jnp.sum(ro * rd, axis=1)[:, None]
        a = rd2
        b_prime = rd_c - ro_rd
        cc = ro2 - 2.0 * ro_c + aux[None, nt:, 0]
        disc4 = b_prime * b_prime - a * cc          # = a^2 * (t-roots disc)
        has = disc4 >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc4, 0.0))
        sign = jnp.where(b_prime > 0.0, 1.0, -1.0)
        q = b_prime + sign * sq
        x0 = cc / jnp.where(q == 0.0, 1e-30, q)
        x1 = q / a
        t0 = jnp.minimum(x0, x1)
        t1 = jnp.maximum(x0, x1)
        t0_ok = (t0 >= minT_b) & (t0 <= maxT_b)
        t1_ok = (t1 >= minT_b) & (t1 <= maxT_b)
        st = jnp.where(t0_ok, t0, t1)
        s_hit = has & (t0_ok | t1_ok)
        out_t = out_t.at[:, nt:].set(jnp.where(s_hit, st, jnp.inf))

    best_t = jnp.min(out_t, axis=1)
    if any_hit:
        return jnp.isfinite(best_t)
    pid = jnp.argmin(out_t, axis=1).astype(jnp.int32)
    found = jnp.isfinite(best_t)
    if nt:
        onehot = (jnp.arange(nt, dtype=jnp.int32)[None, :] == pid[:, None])
        u_best = jnp.sum(jnp.where(onehot, tri_u, 0.0), axis=1)
        v_best = jnp.sum(jnp.where(onehot, tri_v, 0.0), axis=1)
    else:
        u_best = jnp.zeros((B,))
        v_best = jnp.zeros((B,))
    is_sph = pid >= nt
    return HitResult(
        t=jnp.where(found, best_t, jnp.inf),
        prim_type=jnp.where(is_sph, ir.PRIM_SPHERE, ir.PRIM_TRI)
        .astype(jnp.int32),
        prim_id=jnp.where(is_sph, pid - nt, pid).astype(jnp.int32),
        # barycentric convention: HitResult carries weights of (p0, p1)
        u=1.0 - u_best - v_best, v=u_best)


class MXUBruteForceTracer:
    """Brute-force tracer whose per-pair math rides the MXU."""

    def __init__(self, scene: ir.Scene):
        self.W, self.aux = build_tables(scene)
        self.nt = scene.n_tris()
        self.ns = scene.n_spheres()

    def closest(self, scene, ro, rd, minT, maxT):
        return mxu_intersect(self.W, self.aux, ro, rd, minT, maxT,
                             self.nt, self.ns)

    def occluded(self, scene, ro, rd, minT, maxT):
        return mxu_intersect(self.W, self.aux, ro, rd, minT, maxT,
                             self.nt, self.ns, any_hit=True)
