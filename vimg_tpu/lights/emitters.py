"""Next-event-estimation light sampling over the flat light table.

Reference: include/geometry/emitters.h (uniform light picker),
src/geometry/triangle.cpp:195-248 and src/geometry/sphere.cpp:60-139
(per-shape area sampling + surf_pdf), include/background.h (background
emitters). All vectorized: every ray picks and samples its light in one
fused batch; per-type results are combined by masks.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vimg_tpu.core.math import cross, dot, length2, normalize, tgather
from vimg_tpu.core.warps import INV_4PI, sample_sphere, sample_sphere_cap, sample_triangle_uv
from vimg_tpu.core.math import onb_from_normal, onb_to_world
from vimg_tpu.lights import envmap
from vimg_tpu.scene import ir


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LightSample:
    radiance: jax.Array  # (B, 3) emitted toward the shading point
    wi: jax.Array        # (B, 3) direction shading point -> light
    pdf: jax.Array       # (B,) pdf (area measure; solid angle for bg) incl. 1/L
    dist: jax.Array      # (B,) distance to the light point
    G: jax.Array         # (B,) geometry term cos/dist^2 (1 for bg)


def _emitted_one_sided(scene, mat_id, wi, n):
    emit = tgather(scene.mat_base, mat_id)
    front = dot(n, wi) < 0.0
    return jnp.where(front[..., None], emit, 0.0)


def _sample_tri(scene: ir.Scene, tri_id, look_from, r1, r2):
    vidx = tgather(scene.tri_vidx, tri_id)
    p0 = tgather(scene.verts, vidx[:, 0])
    p1 = tgather(scene.verts, vidx[:, 1])
    p2 = tgather(scene.verts, vidx[:, 2])
    e1 = p1 - p0
    e2 = p2 - p0
    n_tri = normalize(cross(e1, e2))

    flags = tgather(scene.tri_flags, tri_id)
    has_n = ((flags & ir.TRI_HAS_NORMALS) != 0)[:, None]
    n0 = jnp.where(has_n, tgather(scene.vnormals, vidx[:, 0]), n_tri)
    n1 = jnp.where(has_n, tgather(scene.vnormals, vidx[:, 1]), n_tri)
    n2 = jnp.where(has_n, tgather(scene.vnormals, vidx[:, 2]), n_tri)

    u, v = sample_triangle_uv(r1, r2)
    w = 1.0 - u - v
    hit_p = p0 * u[:, None] + p1 * v[:, None] + p2 * w[:, None]
    hit_n = normalize(n0 * u[:, None] + n1 * v[:, None] + n2 * w[:, None])

    dvec = hit_p - look_from
    dist2 = length2(dvec)
    wi = normalize(dvec)
    area = jnp.sqrt(jnp.maximum(length2(cross(e2, e1)), 0.0)) / 2.0
    pdf = 1.0 / jnp.maximum(area, 1e-20)
    G = jnp.abs(dot(hit_n, -wi)) / jnp.maximum(dist2, 1e-20)
    rad = _emitted_one_sided(scene, tgather(scene.tri_mat, tri_id), wi, hit_n)
    return rad, wi, pdf, jnp.sqrt(dist2), G


def _sample_sphere_light(scene: ir.Scene, sph_id, look_from, r1, r2):
    center = tgather(scene.sph_center, sph_id)
    radius = tgather(scene.sph_radius, sph_id)
    to_c = look_from - center
    d2 = length2(to_c)
    inside = d2 <= radius * radius

    # outside: uniform cone toward the sphere (reference sphere.cpp:88-113)
    cos_max = jnp.sqrt(jnp.clip(1.0 - (radius * radius) / jnp.maximum(d2, 1e-20),
                                0.0, 1.0))
    dir_c_lf = normalize(to_c)
    u_ax, v_ax = onb_from_normal(dir_c_lf)
    zdir = sample_sphere_cap(r1, r2, cos_max)
    p_out = normalize(onb_to_world(u_ax, v_ax, dir_c_lf, zdir)) * radius[:, None] + center

    # inside: uniform over the whole sphere (reference sphere.cpp:67-87)
    unit = sample_sphere(r1, r2)
    p_in = unit * radius[:, None] + center

    # the sampled point is part of the sampling WARP: detached estimator
    # semantics hold it fixed (otherwise grads w.r.t. look_from would flow
    # through the cone construction, whose sqrt(0) edge cases also poison
    # reverse-mode AD); G below stays differentiable via look_from only
    hit_p = jax.lax.stop_gradient(jnp.where(inside[:, None], p_in, p_out))
    n = normalize(hit_p - center)
    dvec = hit_p - look_from
    dist2 = length2(dvec)
    wi = normalize(dvec)
    G = jnp.abs(dot(n, -wi)) / jnp.maximum(dist2, 1e-20)

    sa = 4.0 * jnp.pi * radius * radius
    pdf_in = 1.0 / sa
    pdf_cone = 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_max, 1e-12))
    pdf_out = pdf_cone * G
    pdf = jnp.where(inside, pdf_in, pdf_out)
    rad = _emitted_one_sided(scene, tgather(scene.sph_mat, sph_id), wi, n)
    return rad, wi, pdf, jnp.sqrt(dist2), G


def _sample_background(scene: ir.Scene, r1, r2):
    if scene.has_envmap:
        rad, wi, pdf = envmap.env_sample(scene, r1, r2)
    else:
        wi = sample_sphere(r1, r2)
        pdf = jnp.full(r1.shape, INV_4PI)
        rad = jnp.broadcast_to(scene.bg_color, wi.shape)
    dist = jnp.full(r1.shape, jnp.inf)
    G = jnp.ones_like(r1)
    return rad, wi, pdf, dist, G


def sample_lights(scene: ir.Scene, look_from, pick_rand, r1, r2) -> LightSample:
    """Uniformly pick one light per ray and sample a point/direction on it.

    pdf includes the 1/num_lights pick probability
    (reference emitters.h:39-56).
    """
    L = scene.n_lights()
    idx = jnp.clip((pick_rand * L).astype(jnp.int32), 0, L - 1)
    ltype = tgather(scene.light_type, idx)
    lidx = tgather(scene.light_idx, idx)

    B = look_from.shape[0]
    rad = jnp.zeros((B, 3))
    wi = jnp.zeros((B, 3))
    pdf = jnp.zeros((B,))
    dist = jnp.zeros((B,))
    G = jnp.zeros((B,))

    # static gating: which light types exist is a per-scene-layout fact
    has_tri = scene.lights_have_tri
    has_sph = scene.lights_have_sphere
    has_bg = scene.lights_have_bg

    if has_tri:
        r = _sample_tri(scene, jnp.clip(lidx, 0, max(scene.n_tris() - 1, 0)),
                        look_from, r1, r2)
        m = ltype == ir.LIGHT_TRI
        rad, wi, pdf, dist, G = _mix((rad, wi, pdf, dist, G), r, m)
    if has_sph:
        r = _sample_sphere_light(
            scene, jnp.clip(lidx, 0, max(scene.n_spheres() - 1, 0)),
            look_from, r1, r2)
        m = ltype == ir.LIGHT_SPHERE
        rad, wi, pdf, dist, G = _mix((rad, wi, pdf, dist, G), r, m)
    if has_bg:
        r = _sample_background(scene, r1, r2)
        m = ltype == ir.LIGHT_BACKGROUND
        rad, wi, pdf, dist, G = _mix((rad, wi, pdf, dist, G), r, m)

    pdf = pdf / L
    return LightSample(radiance=rad, wi=wi, pdf=pdf, dist=dist, G=G)


def _mix(acc, new, mask):
    out = []
    for a, n in zip(acc, new):
        m = mask[..., None] if a.ndim == 2 else mask
        out.append(jnp.where(m, n, a))
    return tuple(out)


def surf_pdf(scene: ir.Scene, prim_type, prim_id, look_from, point_on_light,
             direction):
    """Area-measure pdf of a point on a hit emissive primitive (reference
    Triangle::surf_pdf / Sphere::surf_pdf). Used for MIS on BSDF hits."""
    B = prim_id.shape[0]
    pdf = jnp.zeros((B,))

    if scene.n_tris() > 0:
        tid = jnp.clip(prim_id, 0, scene.n_tris() - 1)
        vidx = tgather(scene.tri_vidx, tid)
        p0 = tgather(scene.verts, vidx[:, 0])
        p1 = tgather(scene.verts, vidx[:, 1])
        p2 = tgather(scene.verts, vidx[:, 2])
        area = jnp.sqrt(jnp.maximum(
            length2(cross(p2 - p0, p1 - p0)), 0.0)) / 2.0
        pdf = jnp.where(prim_type == ir.PRIM_TRI,
                        1.0 / jnp.maximum(area, 1e-20), pdf)

    if scene.n_spheres() > 0:
        sid = jnp.clip(prim_id, 0, scene.n_spheres() - 1)
        center = tgather(scene.sph_center, sid)
        radius = tgather(scene.sph_radius, sid)
        d2 = length2(look_from - center)
        inside = d2 <= radius * radius
        sa = 4.0 * jnp.pi * radius * radius
        cos_max = jnp.sqrt(jnp.clip(
            1.0 - (radius * radius) / jnp.maximum(d2, 1e-20), 0.0, 1.0))
        pdf_cone = 1.0 / (2.0 * jnp.pi * jnp.maximum(1.0 - cos_max, 1e-12))
        n = normalize(point_on_light - center)
        cosine = jnp.abs(dot(n, -direction))
        dist2 = length2(point_on_light - look_from)
        pdf_out = pdf_cone * cosine / jnp.maximum(dist2, 1e-20)
        spdf = jnp.where(inside, 1.0 / sa, pdf_out)
        pdf = jnp.where(prim_type == ir.PRIM_SPHERE, spdf, pdf)

    return pdf


def background_emit(scene: ir.Scene, direction, cone_spread):
    if scene.has_envmap:
        return envmap.env_emit(scene, direction, cone_spread)
    return jnp.broadcast_to(scene.bg_color, direction.shape)


def background_pdf(scene: ir.Scene, direction):
    if scene.has_envmap:
        return envmap.env_pdf(scene, direction)
    return jnp.full(direction.shape[:-1], INV_4PI)
