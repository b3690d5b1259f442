"""Pallas TPU kernel: fused brute-force scene intersection.

The jnp brute-force path materializes (rays x prims) intermediates in HBM —
bandwidth-bound. This kernel tiles the wavefront into (8, 128) VMEM blocks
and loops primitives from SMEM scalars, keeping every intermediate in
registers: one HBM read of the rays, one write of the hit record.

Primitives are packed host-side into a (P, 12) f32 table:
  triangles: p0(3) e1(3) e2(3) pad(3)   [e1 = p1-p0, e2 = p2-p0]
  spheres:   center(3) radius pad(8)
plus a (P,) int32 type/id table. The watertight permutation trick is
replaced by branchless max-axis selects (same as geometry/intersect.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimg_tpu.scene import ir

LANES = 128
SUBLANES = 8
BLOCK_ROWS = 256          # (256, 128) = 32768 rays per grid step
TILE = LANES * BLOCK_ROWS  # rays per grid step


def _pack_prims(scene: ir.Scene):
    """Host-side primitive table build (cached per scene arrays id)."""
    import numpy as np
    nt = scene.n_tris()
    ns = scene.n_spheres()
    P = nt + ns
    prims = np.zeros((P, 12), np.float32)
    ptype = np.zeros((P,), np.int32)
    if nt:
        v = np.asarray(scene.verts)
        tidx = np.asarray(scene.tri_vidx)
        p0 = v[tidx[:, 0]]
        prims[:nt, 0:3] = p0
        prims[:nt, 3:6] = v[tidx[:, 1]] - p0
        prims[:nt, 6:9] = v[tidx[:, 2]] - p0
    if ns:
        prims[nt:, 0:3] = np.asarray(scene.sph_center)
        prims[nt:, 3] = np.asarray(scene.sph_radius)
        ptype[nt:] = 1
    return jnp.asarray(prims), jnp.asarray(ptype).reshape(-1, 1), nt, ns


def _tri_test_tile(ro, rd, p0, e1, e2, minT, cur_t):
    """Möller–Trumbore over an (8,128) ray tile vs one triangle (scalars).

    Returns (t, u, v, hit). MT is algebraically equivalent to the
    watertight formulation for non-degenerate hits and needs no per-ray
    permutation; boundary behavior differs only at exact edges.
    """
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    p0x, p0y, p0z = p0
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2

    # h = cross(rd, e2)
    hx = rdy * e2z - rdz * e2y
    hy = rdz * e2x - rdx * e2z
    hz = rdx * e2y - rdy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    inv_a = 1.0 / jnp.where(a == 0.0, 1e-30, a)
    sx = rox - p0x
    sy = roy - p0y
    sz = roz - p0z
    u = (sx * hx + sy * hy + sz * hz) * inv_a
    # q = cross(s, e1)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = (rdx * qx + rdy * qy + rdz * qz) * inv_a
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_a
    hit = ((a != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= minT) & (t < cur_t))
    return t, u, v, hit


def _sphere_test_tile(ro, rd, c, radius, minT, cur_t):
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    fx = rox - c[0]
    fy = roy - c[1]
    fz = roz - c[2]
    a = rdx * rdx + rdy * rdy + rdz * rdz
    b_prime = -(fx * rdx + fy * rdy + fz * rdz)
    cc = fx * fx + fy * fy + fz * fz - radius * radius
    boa = b_prime / a
    tx = fx + boa * rdx
    ty = fy + boa * rdy
    tz = fz + boa * rdz
    disc = radius * radius - (tx * tx + ty * ty + tz * tz)
    has = disc >= 0.0
    sign = jnp.where(b_prime > 0.0, 1.0, -1.0)
    q = b_prime + sign * jnp.sqrt(a * jnp.maximum(disc, 0.0))
    x0 = cc / jnp.where(q == 0.0, 1e-30, q)
    x1 = q / a
    t0 = jnp.minimum(x0, x1)
    t1 = jnp.maximum(x0, x1)
    t0_ok = (t0 >= minT) & (t0 < cur_t)
    t1_ok = (t1 >= minT) & (t1 < cur_t)
    t = jnp.where(t0_ok, t0, t1)
    hit = has & (t0_ok | t1_ok)
    return t, hit


def _make_kernel(n_prims, any_hit):
    def kernel(prims_ref, ptype_ref, rox, roy, roz, rdx, rdy, rdz,
               minT_ref, maxT_ref, out_t, out_id, out_u, out_v):
        ro = (rox[:], roy[:], roz[:])
        rd = (rdx[:], rdy[:], rdz[:])
        minT = minT_ref[:]
        best_t = maxT_ref[:]
        best_id = jnp.full(best_t.shape, -1, jnp.int32)
        best_u = jnp.zeros_like(best_t)
        best_v = jnp.zeros_like(best_t)

        for p in range(n_prims):
            is_tri = ptype_ref[p, 0] == 0
            d0 = (prims_ref[p, 0], prims_ref[p, 1], prims_ref[p, 2])
            d1 = (prims_ref[p, 3], prims_ref[p, 4], prims_ref[p, 5])
            d2 = (prims_ref[p, 6], prims_ref[p, 7], prims_ref[p, 8])

            tt, tu, tv, t_hit = _tri_test_tile(ro, rd, d0, d1, d2, minT,
                                               best_t)
            st, s_hit = _sphere_test_tile(ro, rd, d0, prims_ref[p, 3],
                                          minT, best_t)
            t = jnp.where(is_tri, tt, st)
            # Mosaic cannot lower vector select on i1 — use logical ops
            hit = (t_hit & is_tri) | (s_hit & ~is_tri)
            best_id = jnp.where(hit, p, best_id)
            best_u = jnp.where(hit, jnp.where(is_tri, tu, 0.0), best_u)
            best_v = jnp.where(hit, jnp.where(is_tri, tv, 0.0), best_v)
            best_t = jnp.where(hit, t, best_t)

        out_t[:] = jnp.where(best_id >= 0, best_t, jnp.inf)
        out_id[:] = best_id
        out_u[:] = best_u
        out_v[:] = best_v

    return kernel


@functools.partial(jax.jit, static_argnames=("n_prims", "interpret"))
def _bf_pallas(prims, ptype, ro, rd, minT, maxT, n_prims, interpret=False):
    B = ro.shape[0]
    n_blocks = B // TILE
    assert n_blocks * TILE == B, f"batch {B} must be a multiple of {TILE}"

    def shape2(x):
        return x.reshape(n_blocks * BLOCK_ROWS, LANES)

    ray_cols = [shape2(ro[:, 0]), shape2(ro[:, 1]), shape2(ro[:, 2]),
                shape2(rd[:, 0]), shape2(rd[:, 1]), shape2(rd[:, 2]),
                shape2(minT), shape2(maxT)]

    grid = (n_blocks,)
    ray_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [ray_spec] * 4
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, LANES), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, LANES), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks * BLOCK_ROWS, LANES), jnp.float32),
    ]
    kernel = _make_kernel(n_prims, any_hit=False)
    out_t, out_id, out_u, out_v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)] + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(prims, ptype, *ray_cols)
    return (out_t.reshape(B), out_id.reshape(B), out_u.reshape(B),
            out_v.reshape(B))


class PallasBruteForceTracer:
    """Drop-in tracer using the fused Pallas kernel (TPU) with automatic
    padding to the tile size. Falls back to interpret mode off-TPU."""

    def __init__(self, scene: ir.Scene, interpret=None):
        self.prims, self.ptype, self.nt, self.ns = _pack_prims(scene)
        self.n_prims = self.nt + self.ns
        if interpret is None:
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.interpret = interpret

    def _run(self, scene, ro, rd, minT, maxT):
        B = ro.shape[0]
        Bp = ((B + TILE - 1) // TILE) * TILE
        if Bp != B:
            pad = Bp - B
            ro = jnp.concatenate([ro, jnp.zeros((pad, 3))])
            rd = jnp.concatenate([rd, jnp.ones((pad, 3))])
            minT = jnp.concatenate([minT, jnp.zeros((pad,))])
            maxT = jnp.concatenate([maxT, jnp.zeros((pad,))])
        t, pid, u, v = _bf_pallas(self.prims, self.ptype, ro, rd, minT, maxT,
                                  self.n_prims, self.interpret)
        return t[:B], pid[:B], u[:B], v[:B]

    def closest(self, scene, ro, rd, minT, maxT):
        from vimg_tpu.geometry.intersect import HitResult
        t, pid, u, v = self._run(scene, ro, rd, minT, maxT)
        is_sphere = pid >= self.nt
        prim_id = jnp.where(is_sphere, pid - self.nt, pid)
        # MT returns weights of (p1, p2); HitResult wants (p0, p1)
        return HitResult(
            t=t,
            prim_type=jnp.where(is_sphere, ir.PRIM_SPHERE,
                                ir.PRIM_TRI).astype(jnp.int32),
            prim_id=jnp.maximum(prim_id, 0).astype(jnp.int32),
            u=1.0 - u - v, v=u)

    def occluded(self, scene, ro, rd, minT, maxT):
        t, pid, _, _ = self._run(scene, ro, rd, minT, maxT)
        return pid >= 0
