"""Batched ray-primitive intersection (pure jax.numpy, SoA).

- Triangles: watertight ray/triangle test (pbrt / Woop et al.), vectorized
  re-derivation of reference include/geometry/triangle.h:78-180. The f64
  re-evaluation on exact-zero edge functions (triangle.h:126-134) is
  consciously dropped: TPU has no fast f64; boundary hits are accepted when
  all edge signs agree (zeros count as agreeing).
- Spheres: numerically robust quadric (RT Gems 1 ch.7), matching reference
  include/geometry/sphere.h:53-100.

Brute-force all-primitives intersection is used for small scenes (the
analytic json scenes are <64 prims — on TPU a dense (rays x prims) test is
far faster than any divergent traversal); the BVH path handles meshes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vimg_tpu.core.math import cross, dot, dotk, normalize, onb_from_normal, tgather
from vimg_tpu.scene import ir

INF = jnp.inf


# ---------------------------------------------------------------------------
# primitive tests
# ---------------------------------------------------------------------------

def tri_intersect(ro, rd, p0, p1, p2, minT, maxT):
    """Watertight ray/triangle intersection, broadcasting rays vs tris.

    ro, rd: (..., 3); p0/p1/p2: (..., 3) broadcast-compatible.
    Returns (t, u, v, w, hit) with t = +inf on miss; (u, v, w) are the
    barycentric weights of (p0, p1, p2) as in reference triangle.cpp:23-25.
    """
    p0t = p0 - ro
    p1t = p1 - ro
    p2t = p2 - ro

    # permute so the largest |dir| component is z (watertightness). TPU
    # note: per-lane gathers (take_along_axis) along a size-3 axis are
    # catastrically slow on the VPU — use branchless 3-way selects instead.
    adx, ady, adz = jnp.abs(rd[..., 0]), jnp.abs(rd[..., 1]), jnp.abs(rd[..., 2])
    kz0 = (adx >= ady) & (adx >= adz)          # kz == 0
    kz1 = (~kz0) & (ady >= adz)                # kz == 1

    def _perm(v):
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        # kz=0 -> (kx,ky,kz)=(1,2,0); kz=1 -> (2,0,1); kz=2 -> (0,1,2)
        px = jnp.where(kz0, y, jnp.where(kz1, z, x))
        py = jnp.where(kz0, z, jnp.where(kz1, x, y))
        pz = jnp.where(kz0, x, jnp.where(kz1, y, z))
        return px, py, pz

    dx, dy, dz = _perm(rd)
    dx, dy, dz = (jnp.broadcast_to(dx, jnp.broadcast_shapes(dx.shape, p0t.shape[:-1])),
                  jnp.broadcast_to(dy, jnp.broadcast_shapes(dy.shape, p0t.shape[:-1])),
                  jnp.broadcast_to(dz, jnp.broadcast_shapes(dz.shape, p0t.shape[:-1])))
    p0x, p0y, p0z = _perm(p0t)
    p1x, p1y, p1z = _perm(p1t)
    p2x, p2y, p2z = _perm(p2t)

    sx = -dx / dz
    sy = -dy / dz
    sz = 1.0 / dz
    p0x = p0x + sx * p0z
    p0y = p0y + sy * p0z
    p1x = p1x + sx * p1z
    p1y = p1y + sy * p1z
    p2x = p2x + sx * p2z
    p2y = p2y + sy * p2z

    e0 = p1x * p2y - p1y * p2x
    e1 = p2x * p0y - p2y * p0x
    e2 = p0x * p1y - p0y * p1x

    same_sign = ~(((e0 < 0) | (e1 < 0) | (e2 < 0)) & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
    det = e0 + e1 + e2
    ok = same_sign & (det != 0.0)

    t_scaled = e0 * (p0z * sz) + e1 * (p1z * sz) + e2 * (p2z * sz)
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    t = t_scaled * inv_det
    ok = ok & (t >= minT) & (t <= maxT)

    # degenerate triangle rejection (reference triangle.h:88-96)
    degenerate = jnp.sum(cross(p2 - p0, p1 - p0) ** 2, axis=-1) == 0.0
    ok = ok & ~jnp.broadcast_to(degenerate, ok.shape)

    u = e0 * inv_det
    v = e1 * inv_det
    w = e2 * inv_det
    t = jnp.where(ok, t, INF)
    return t, u, v, w, ok


def sphere_intersect(ro, rd, center, radius, minT, maxT):
    """Robust ray/sphere intersection. Returns (t, hit), t = +inf on miss."""
    f = ro - center
    a = dot(rd, rd)
    b_prime = dot(-f, rd)
    c = dot(f, f) - radius * radius
    temp = f + (b_prime / a)[..., None] * rd
    disc = radius * radius - dot(temp, temp)
    has_root = disc >= 0.0

    sign = jnp.where(b_prime > 0, 1.0, -1.0)
    # double-where guard: sqrt'(0) = inf would leak NaN into gradients of
    # masked miss lanes (0 * inf); clamp the argument away from 0 on them
    disc_safe = jnp.where(has_root, jnp.maximum(a * disc, 1e-30), 1.0)
    q = b_prime + sign * jnp.sqrt(disc_safe)
    # q == 0 (grazing through origin-side) guarded
    x0 = c / jnp.where(q == 0.0, 1.0, q)
    x1 = q / a
    t0 = jnp.minimum(x0, x1)
    t1 = jnp.maximum(x0, x1)

    t0_ok = (t0 >= minT) & (t0 <= maxT)
    t1_ok = (t1 >= minT) & (t1 <= maxT)
    t = jnp.where(t0_ok, t0, t1)
    ok = has_root & (t0_ok | t1_ok)
    t = jnp.where(ok, t, INF)
    return t, ok


# ---------------------------------------------------------------------------
# brute-force scene intersection
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HitResult:
    t: jax.Array          # (B,) f32 — +inf on miss
    prim_type: jax.Array  # (B,) i32 (PRIM_TRI / PRIM_SPHERE)
    prim_id: jax.Array    # (B,) i32
    u: jax.Array          # (B,) barycentric weight of p0 (tris only)
    v: jax.Array          # (B,) barycentric weight of p1

    @property
    def hit(self):
        return jnp.isfinite(self.t)


def intersect_bruteforce(scene: ir.Scene, ro, rd, minT, maxT):
    """Closest hit against every primitive. ro/rd: (B, 3)."""
    B = ro.shape[0]
    best_t = jnp.full((B,), INF)
    best_type = jnp.zeros((B,), jnp.int32)
    best_id = jnp.zeros((B,), jnp.int32)
    best_u = jnp.zeros((B,))
    best_v = jnp.zeros((B,))

    if scene.n_tris() > 0:
        p = scene.verts[scene.tri_vidx]          # (T, 3, 3)
        t, u, v, w, ok = tri_intersect(
            ro[:, None, :], rd[:, None, :],
            p[None, :, 0], p[None, :, 1], p[None, :, 2],
            minT[:, None], maxT[:, None])        # (B, T)
        # min + one-hot select: pure reductions, no per-row gathers (slow
        # on the TPU VPU)
        tmin = jnp.min(t, axis=1)
        ti = jnp.argmin(t, axis=1).astype(jnp.int32)
        onehot = (jnp.arange(t.shape[1], dtype=jnp.int32)[None, :]
                  == ti[:, None])
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_type = jnp.where(better, ir.PRIM_TRI, best_type)
        best_id = jnp.where(better, ti, best_id)
        best_u = jnp.where(better, jnp.sum(jnp.where(onehot, u, 0.0), 1), best_u)
        best_v = jnp.where(better, jnp.sum(jnp.where(onehot, v, 0.0), 1), best_v)

    if scene.n_spheres() > 0:
        t, ok = sphere_intersect(
            ro[:, None, :], rd[:, None, :],
            scene.sph_center[None], scene.sph_radius[None],
            minT[:, None], maxT[:, None])        # (B, S)
        smin = jnp.min(t, axis=1)
        si = jnp.argmin(t, axis=1).astype(jnp.int32)
        better = smin < best_t
        best_t = jnp.where(better, smin, best_t)
        best_type = jnp.where(better, ir.PRIM_SPHERE, best_type)
        best_id = jnp.where(better, si, best_id)

    return HitResult(t=best_t, prim_type=best_type, prim_id=best_id,
                     u=best_u, v=best_v)


def occlude_bruteforce(scene: ir.Scene, ro, rd, minT, maxT):
    """Any-hit test: True where something blocks [minT, maxT]."""
    B = ro.shape[0]
    occluded = jnp.zeros((B,), bool)
    if scene.n_tris() > 0:
        p = scene.verts[scene.tri_vidx]
        t, *_ , ok = tri_intersect(
            ro[:, None, :], rd[:, None, :],
            p[None, :, 0], p[None, :, 1], p[None, :, 2],
            minT[:, None], maxT[:, None])
        occluded = occluded | jnp.any(ok, axis=1)
    if scene.n_spheres() > 0:
        t, ok = sphere_intersect(
            ro[:, None, :], rd[:, None, :],
            scene.sph_center[None], scene.sph_radius[None],
            minT[:, None], maxT[:, None])
        occluded = occluded | jnp.any(ok, axis=1)
    return occluded


# ---------------------------------------------------------------------------
# deferred shading data (reference "hit_info", triangle.cpp:13-151 and
# sphere.cpp:12-47) — computed once for the single surviving hit.
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HitInfo:
    mat_id: jax.Array     # (B,) i32
    p: jax.Array          # (B, 3) hit point
    n_s: jax.Array        # (B, 3) shading normal
    n_g: jax.Array        # (B, 3) geometric normal
    uv: jax.Array         # (B, 2)
    mr_uv: jax.Array      # (B, 2)
    tangent: jax.Array    # (B, 3) frame u
    bitangent: jax.Array  # (B, 3) frame v
    prim_area: jax.Array  # (B,) 2*tri_area (sphere: 1)
    uv_area: jax.Array    # (B,) uv-space area (sphere: 1e-6)
    curvature: jax.Array  # (B,) mean curvature
    light_id: jax.Array   # (B,) i32 index into the light table, -1 if none


def _tri_hit_info(scene: ir.Scene, ro, rd, hr: HitResult):
    tid = jnp.clip(hr.prim_id, 0, max(scene.n_tris() - 1, 0))
    vidx = tgather(scene.tri_vidx, tid)        # (B, 3)
    p0 = tgather(scene.verts, vidx[:, 0])
    p1 = tgather(scene.verts, vidx[:, 1])
    p2 = tgather(scene.verts, vidx[:, 2])
    u, v = hr.u, hr.v
    w = 1.0 - u - v

    e1 = p1 - p0
    e2 = p2 - p0
    n_g = normalize(cross(e1, e2))

    flags = tgather(scene.tri_flags, tid)
    has_n = (flags & ir.TRI_HAS_NORMALS) != 0
    n0 = tgather(scene.vnormals, vidx[:, 0])
    n1 = tgather(scene.vnormals, vidx[:, 1])
    n2 = tgather(scene.vnormals, vidx[:, 2])
    n_interp = normalize(u[:, None] * n0 + v[:, None] * n1 + w[:, None] * n2)
    n_s = jnp.where(has_n[:, None], n_interp, n_g)
    n0 = jnp.where(has_n[:, None], n0, n_g)
    n1 = jnp.where(has_n[:, None], n1, n_g)
    n2 = jnp.where(has_n[:, None], n2, n_g)

    hit_p = u[:, None] * p0 + v[:, None] * p1 + w[:, None] * p2

    # Static fast path: with no UV consumers, no anisotropy and no normal
    # maps, the tangent frame orientation is irrelevant (isotropic GGX) and
    # all UV/differential math is dead — use the cheap ONB.
    if not (scene.needs_uv or scene.has_aniso or scene.has_normal_maps):
        tangent, bitangent = onb_from_normal(n_s)
        uv = jnp.stack([u, v], axis=-1)
        if scene.needs_cones:
            dnds = n2 - n0
            dndt = n2 - n1
            curvature = (dot(dnds, tangent) + dot(dndt, bitangent)) / 2.0
        else:
            curvature = jnp.zeros_like(u)
        prim_area = jnp.sqrt(jnp.maximum(
            dot(cross(e1, e2), cross(e1, e2)), 0.0))
        return dict(mat_id=tgather(scene.tri_mat, tid), p=hit_p, n_s=n_s, n_g=n_g,
                    uv=uv, mr_uv=uv, tangent=tangent, bitangent=bitangent,
                    prim_area=prim_area, uv_area=jnp.zeros_like(u),
                    curvature=curvature)

    has_uv = (flags & ir.TRI_HAS_UV) != 0
    uv0 = jnp.where(has_uv[:, None], scene.vuv[vidx[:, 0]],
                    jnp.asarray([0.0, 0.0]))
    uv1 = jnp.where(has_uv[:, None], scene.vuv[vidx[:, 1]],
                    jnp.asarray([1.0, 0.0]))
    uv2 = jnp.where(has_uv[:, None], scene.vuv[vidx[:, 2]],
                    jnp.asarray([1.0, 1.0]))
    uv_interp = u[:, None] * uv0 + v[:, None] * uv1 + w[:, None] * uv2
    uv = jnp.where(has_uv[:, None], uv_interp, jnp.stack([u, v], axis=-1))

    has_mr = (flags & ir.TRI_HAS_UV_MR) != 0
    mr0 = scene.vuv_mr[vidx[:, 0]]
    mr1 = scene.vuv_mr[vidx[:, 1]]
    mr2 = scene.vuv_mr[vidx[:, 2]]
    mr_interp = u[:, None] * mr0 + v[:, None] * mr1 + w[:, None] * mr2
    mr_uv = jnp.where(has_mr[:, None], mr_interp, uv)

    # surface differentials dpdu/dpdv from the uv parametrization
    # (reference triangle.cpp:70-92)
    duvds = uv2 - uv0
    duvdt = uv2 - uv1
    det = duvds[:, 0] * duvdt[:, 1] - duvdt[:, 0] * duvds[:, 1]
    ok_det = (jnp.abs(det) > 1e-8) & ~jnp.isnan(det)
    safe_det = jnp.where(ok_det, det, 1.0)
    dsdu = duvdt[:, 1] / safe_det
    dtdu = -duvds[:, 1] / safe_det
    dsdv = duvdt[:, 0] / safe_det
    dtdv = -duvds[:, 0] / safe_det
    dpds = p2 - p0
    dpdt = p2 - p1
    dpdu = dpds * dsdu[:, None] + dpdt * dtdu[:, None]
    dpdv = dpds * dsdv[:, None] + dpdt * dtdv[:, None]
    au, av = onb_from_normal(n_s)
    dpdu = jnp.where(ok_det[:, None], dpdu, au)
    dpdv = jnp.where(ok_det[:, None], dpdv, av)
    dsdu = jnp.where(ok_det, dsdu, 0.0)
    dtdu = jnp.where(ok_det, dtdu, 0.0)
    dsdv = jnp.where(ok_det, dsdv, 0.0)
    dtdv = jnp.where(ok_det, dtdv, 0.0)

    # normal mapping (reference triangle.cpp:95-122)
    if scene.has_normal_maps:
        from vimg_tpu.core.math import gram_schmidt
        from vimg_tpu.textures.texture import normal_at_uv
        ntex = scene.mat_tex[scene.tri_mat[tid], 1]
        has_nm = ntex >= 0
        has_nmuv = (flags & ir.TRI_HAS_UV_NORMALMAP) != 0
        nm0 = jnp.where(has_nmuv[:, None], scene.vuv_nmap[vidx[:, 0]],
                        jnp.asarray([0.0, 0.0]))
        nm1 = jnp.where(has_nmuv[:, None], scene.vuv_nmap[vidx[:, 1]],
                        jnp.asarray([1.0, 0.0]))
        nm2 = jnp.where(has_nmuv[:, None], scene.vuv_nmap[vidx[:, 2]],
                        jnp.asarray([1.0, 1.0]))
        n_uv_interp = u[:, None] * nm0 + v[:, None] * nm1 + w[:, None] * nm2
        n_uv = jnp.where(has_nmuv[:, None], n_uv_interp,
                         jnp.stack([u, v], axis=-1))
        n_tan = normal_at_uv(scene, ntex, n_uv)
        au2, av2 = onb_from_normal(n_s)
        n_local = (au2 * n_tan[:, 0:1] + av2 * n_tan[:, 1:2]
                   + n_s * n_tan[:, 2:3])
        ulen = jnp.sqrt(jnp.maximum(dot(dpdu, dpdu), 1e-20))[:, None]
        vlen = jnp.sqrt(jnp.maximum(dot(dpdv, dpdv), 1e-20))[:, None]
        dpdu_nm = normalize(gram_schmidt(dpdu, n_local)) * ulen
        dpdv_nm = normalize(cross(n_local, dpdu_nm)) * vlen
        m = has_nm[:, None]
        dpdu = jnp.where(m, dpdu_nm, dpdu)
        dpdv = jnp.where(m, dpdv_nm, dpdv)
        n_s = jnp.where(m, n_local, n_s)

    tangent = normalize(dpdu - n_s * dotk(dpdu, n_s))
    bitangent = normalize(cross(n_s, tangent))

    # mean curvature from dn/du, dn/dv (reference triangle.cpp:129-136)
    dnds = n2 - n0
    dndt = n2 - n1
    dndu = dnds * dsdu[:, None] + dndt * dtdu[:, None]
    dndv = dnds * dsdv[:, None] + dndt * dtdv[:, None]
    curvature = (dot(dndu, tangent) + dot(dndv, bitangent)) / 2.0

    prim_area = jnp.sqrt(jnp.maximum(dot(cross(e1, e2), cross(e1, e2)), 0.0))
    uv_area = jnp.abs((uv1[:, 0] - uv0[:, 0]) * (uv2[:, 1] - uv0[:, 1])
                      - (uv2[:, 0] - uv0[:, 0]) * (uv1[:, 1] - uv0[:, 1]))
    mat_id = tgather(scene.tri_mat, tid)
    return dict(mat_id=mat_id, p=hit_p, n_s=n_s, n_g=n_g, uv=uv, mr_uv=mr_uv,
                tangent=tangent, bitangent=bitangent, prim_area=prim_area,
                uv_area=uv_area, curvature=curvature)


def _sphere_hit_info(scene: ir.Scene, ro, rd, hr: HitResult):
    sid = jnp.clip(hr.prim_id, 0, max(scene.n_spheres() - 1, 0))
    center = tgather(scene.sph_center, sid)
    radius = tgather(scene.sph_radius, sid)
    t = jnp.where(jnp.isfinite(hr.t), hr.t, 0.0)
    hit_p = ro + rd * t[:, None]
    n = normalize(hit_p - center)

    if scene.needs_uv:
        theta = jnp.arccos(jnp.clip(-n[:, 1], -1.0, 1.0))
        phi = jnp.arctan2(-n[:, 2], n[:, 0]) + jnp.pi
        u = phi / (2.0 * jnp.pi)
        v = theta / jnp.pi
        dpdu = jnp.stack([-radius * n[:, 1], radius * n[:, 0],
                          jnp.zeros_like(radius)], axis=-1)
        tangent = dpdu - n * dotk(dpdu, n)
        tlen2 = dot(tangent, tangent)
        au, _ = onb_from_normal(n)
        tangent = jnp.where((tlen2 > 1e-12)[:, None], normalize(tangent), au)
        bitangent = normalize(cross(n, tangent))
        uv = jnp.stack([u, v], axis=-1)
    else:
        tangent, bitangent = onb_from_normal(n)
        uv = n[..., :2] * 0.0   # derived from n so shard_map vma matches
    ones = 1.0 + n[..., 0] * 0.0
    return dict(mat_id=tgather(scene.sph_mat, sid), p=hit_p, n_s=n, n_g=n, uv=uv,
                mr_uv=uv, tangent=tangent, bitangent=bitangent,
                prim_area=ones, uv_area=ones * 1e-6,
                curvature=ones / radius)


def _light_id_of_prim(scene: ir.Scene, prim_type, prim_id):
    """Map (prim_type, prim_id) -> index in the light table (or -1).

    Lights are few; a dense compare over the light table is cheaper on TPU
    than any host-precomputed inverse map gather, and stays shape-static.
    """
    if scene.n_lights() == 0:
        return -jnp.ones_like(prim_id)
    lt = scene.light_type[None, :]            # (1, L)
    li = scene.light_idx[None, :]
    pt = prim_type[:, None]
    pi = prim_id[:, None]
    tri_match = (lt == ir.LIGHT_TRI) & (pt == ir.PRIM_TRI) & (li == pi)
    sph_match = (lt == ir.LIGHT_SPHERE) & (pt == ir.PRIM_SPHERE) & (li == pi)
    match = tri_match | sph_match             # (B, L)
    any_match = jnp.any(match, axis=1)
    idx = jnp.argmax(match, axis=1).astype(jnp.int32)
    return jnp.where(any_match, idx, -1)


def hit_info(scene: ir.Scene, ro, rd, hr: HitResult) -> HitInfo:
    """Compute full shading data for the surviving hits (deferred, like
    reference bvh.h:217-223). Results are undefined where ``hr.hit`` is
    False — callers must mask."""
    if scene.n_tris() > 0:
        tri = _tri_hit_info(scene, ro, rd, hr)
    else:
        tri = None
    if scene.n_spheres() > 0:
        sph = _sphere_hit_info(scene, ro, rd, hr)
    else:
        sph = None

    if tri is None:
        out = sph
    elif sph is None:
        out = tri
    else:
        is_sph = (hr.prim_type == ir.PRIM_SPHERE)
        out = {}
        for k in tri:
            m = is_sph[:, None] if tri[k].ndim == 2 else is_sph
            out[k] = jnp.where(m, sph[k], tri[k])

    light_id = _light_id_of_prim(scene, hr.prim_type, hr.prim_id)
    return HitInfo(light_id=light_id, **out)
