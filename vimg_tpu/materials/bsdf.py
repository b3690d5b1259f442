"""Unified SoA material dispatch.

The reference dispatches through C++ virtual calls on Material*
(include/material/material.h:25-72). On TPU we gather per-ray parameter rows
and evaluate every material family present in the scene branchlessly,
selecting by type mask. Families absent from a scene are skipped at trace
time via static Scene flags, so jit compiles only what the scene needs.

Conventions: ``wi`` is the ray direction toward the surface (reference
convention); ``dir_in = -wi``; ``wo`` points away from the surface.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vimg_tpu.core.math import dot, dotk, normalize, onb_to_world, tgather
from vimg_tpu.core.warps import sample_hemisphere_cosine
from vimg_tpu.geometry.intersect import HitInfo
from vimg_tpu.materials import disney
from vimg_tpu.scene import ir
from vimg_tpu.textures.texture import base_color_at_hit

INV_PI = 1.0 / jnp.pi


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ScatterSample:
    wo: jax.Array           # (B, 3)
    eta: jax.Array          # (B,) refraction eta (0 when not refracting)
    is_specular: jax.Array  # (B,) bool
    valid: jax.Array        # (B,) bool (False == absorbed / invalid)


def is_delta(scene: ir.Scene, mat_id):
    """Delta (un-NEE-able) materials: smooth dielectric only."""
    return tgather(scene.mat_type, mat_id) == ir.MAT_DIELECTRIC


def is_emissive(scene: ir.Scene, mat_id):
    return tgather(scene.mat_type, mat_id) == ir.MAT_DIFFUSE_LIGHT


def emitted(scene: ir.Scene, mat_id, ray_dir, n_s):
    """One-sided emission (reference diffuse_light.h:30-38)."""
    emit = tgather(scene.mat_base, mat_id)
    front = dot(n_s, ray_dir) < 0.0
    on = is_emissive(scene, mat_id) & front
    return jnp.where(on[..., None], emit, 0.0)


def _principled_frame(hit: HitInfo, dir_in):
    """Shading frame with the reference's two-sided flip
    (principled.cpp:8-12)."""
    flip = (dot(hit.n_s, dir_in) * dot(hit.n_g, dir_in)) < 0.0
    s = jnp.where(flip, -1.0, 1.0)[..., None]
    return hit.tangent * s, hit.bitangent * s, hit.n_s * s


def texture_inputs(scene: ir.Scene, mat_id, hit: HitInfo, cone_width,
                   ray_dir):
    """Fetch every per-hit texture input ONCE: base color (with ray-cone
    LOD) and the metal-rough factors. The wavefront superstep evaluates
    the BSDF three times per segment (NEE eval, sample, bounce eval) at
    the SAME hit; passing this dict as ``tex=`` to eval_pdf/sample_mat
    deduplicates the atlas gathers (the reference likewise reads the
    textures once per hit via the stored HitInfo, principled.cpp:15-20).
    """
    tex = dict(base_col=base_color_at_hit(scene, mat_id, hit, cone_width,
                                          ray_dir), mr=None)
    if scene.has_image_tex:
        from vimg_tpu.textures.texture import metal_rough_at_uv
        tex["mr"] = metal_rough_at_uv(
            scene, tgather(scene.mat_tex, mat_id)[..., 2], hit.mr_uv)
    return tex


def _principled_params(scene: ir.Scene, mat_id, hit: HitInfo, mr=None):
    """Gather per-ray principled scalars; metallic/roughness factors are
    multiplied by the metal-rough texture when present. ``mr`` is the
    precomputed texture factor pair (texture_inputs) or None to fetch."""
    sc = tgather(scene.mat_scalars, mat_id)  # (B, N_MAT_SCALARS)
    metallic = sc[..., ir.MS_METALLIC]
    roughness = sc[..., ir.MS_ROUGHNESS]
    if scene.has_image_tex:
        if mr is None:
            from vimg_tpu.textures.texture import metal_rough_at_uv
            mr = metal_rough_at_uv(
                scene, tgather(scene.mat_tex, mat_id)[..., 2], hit.mr_uv)
        metallic = metallic * mr[..., 0]
        roughness = roughness * mr[..., 1]
    return dict(
        eta=sc[..., ir.MS_IOR],
        spec_trans=sc[..., ir.MS_SPEC_TRANS],
        subsurface=sc[..., ir.MS_SUBSURFACE],
        specular=sc[..., ir.MS_SPECULAR],
        spec_tint=sc[..., ir.MS_SPEC_TINT],
        anisotropic=sc[..., ir.MS_ANISO],
        sheen=sc[..., ir.MS_SHEEN],
        sheen_tint=sc[..., ir.MS_SHEEN_TINT],
        clearcoat=sc[..., ir.MS_CLEARCOAT],
        clearcoat_gloss=sc[..., ir.MS_CLEARCOAT_GLOSS],
        metallic=metallic, roughness=roughness)


def _lobe_weights(p):
    """Lobe mixture weights (reference principled.cpp:28-38)."""
    w_diff = (1.0 - p["metallic"]) * (1.0 - p["spec_trans"])
    w_clear = 0.25 * p["clearcoat"]
    w_metal = 1.0 - p["spec_trans"] * (1.0 - p["metallic"])
    w_glass = (1.0 - p["metallic"]) * p["spec_trans"]
    total = jnp.maximum(w_diff + w_clear + w_metal + w_glass, 1e-12)
    return w_diff / total, w_clear / total, w_metal / total, w_glass / total


def _principled_eval_pdf(scene, mat_id, wi, wo, hit, regularize, base_col,
                         mr=None):
    """Full mixture eval+pdf (reference principled.h:100-205)."""
    dir_in = -wi
    fu, fv, fw = _principled_frame(hit, dir_in)
    p = _principled_params(scene, mat_id, hit, mr)
    half_vec = normalize(dir_in + wo)

    alphax, alphay = disney.anisotropic_alphas(p["roughness"], p["anisotropic"])
    alphax = disney.regularize_alpha(alphax, regularize)
    alphay = disney.regularize_alpha(alphay, regularize)
    G_in = disney.smith_g(dir_in, alphax, alphay, fu, fv, fw)
    G = G_in * disney.smith_g(wo, alphax, alphay, fu, fv, fw)

    # lobes whose controlling parameter is zero for EVERY material in the
    # scene are pruned at trace time (static Scene flags)
    zero1 = jnp.zeros_like(p["roughness"])
    zero3 = jnp.zeros_like(base_col)

    if scene.has_spec_trans:
        ev_glass, pdf_glass = disney.eval_pdf_rough_glass(
            dir_in, wo, hit.n_g, base_col, p["eta"], half_vec, fu, fv, fw,
            G, G_in, alphax, alphay)
    else:
        ev_glass, pdf_glass = zero3, zero1

    above = (dot(hit.n_g, dir_in) >= 0.0) & (dot(hit.n_g, wo) >= 0.0)
    under = dot(hit.n_g, dir_in) < 0.0

    if scene.has_sheen:
        ev_sheen, _ = disney.eval_pdf_sheen(dir_in, wo, base_col,
                                            p["sheen_tint"], half_vec, fw)
    else:
        ev_sheen = zero3
    ev_diff, pdf_diff = disney.eval_pdf_diffuse(
        dir_in, wo, base_col, p["subsurface"], p["roughness"], half_vec, fw)

    if scene.has_clearcoat:
        alpha_g = ((1.0 - p["clearcoat_gloss"]) * 0.1
                   + p["clearcoat_gloss"] * 0.001)
        alpha_g = disney.regularize_alpha(alpha_g, regularize)
        ev_clear, pdf_clear = disney.eval_pdf_clearcoat(
            dir_in, wo, alpha_g, half_vec, fu, fv, fw)
    else:
        ev_clear, pdf_clear = zero3, zero1

    ev_metal, pdf_metal = disney.eval_pdf_metal(
        dir_in, wo, base_col, p["spec_tint"], p["specular"], p["eta"],
        p["metallic"], half_vec, fu, fv, fw, G, G_in, alphax, alphay)

    # reflective lobes are zero below the surface (each reference lobe
    # checks dot(n_g, dir) < 0)
    zero = jnp.zeros_like(pdf_diff)
    am = above[..., None]
    ev_diff = jnp.where(am, ev_diff, 0.0)
    ev_sheen = jnp.where(am, ev_sheen, 0.0)
    ev_clear = jnp.where(am, ev_clear, 0.0)
    ev_metal = jnp.where(am, ev_metal, 0.0)
    pdf_diff = jnp.where(above, pdf_diff, zero)
    pdf_clear = jnp.where(above, pdf_clear, zero)
    pdf_metal = jnp.where(above, pdf_metal, zero)

    w_diff, w_clear, w_metal, w_glass = _lobe_weights(p)
    one_m = 1.0 - p["metallic"]
    ev_mix = (((1.0 - p["spec_trans"]) * one_m)[..., None] * ev_diff
              + (one_m * p["sheen"])[..., None] * ev_sheen
              + (0.25 * p["clearcoat"])[..., None] * ev_clear
              + (1.0 - p["spec_trans"] * one_m)[..., None] * ev_metal
              + (one_m * p["spec_trans"])[..., None] * ev_glass)
    pdf_mix = (w_diff * pdf_diff + w_clear * pdf_clear + w_metal * pdf_metal
               + w_glass * pdf_glass)

    ev_under = (one_m * p["spec_trans"])[..., None] * ev_glass
    ev = jnp.where(under[..., None], ev_under, ev_mix)
    pdf = jnp.where(under, pdf_glass, pdf_mix)
    return ev, pdf


def _principled_sample(scene, mat_id, wi, hit, rands, regularize, mr=None):
    dir_in = -wi
    fu, fv, fw = _principled_frame(hit, dir_in)
    p = _principled_params(scene, mat_id, hit, mr)
    r1, r2 = rands["u"], rands["v"]
    zero = jnp.zeros_like(r1)

    # diffuse lobe: cosine about the (flipped) shading frame
    d_dir, d_valid = disney.sample_diffuse_dir(
        fu, fv, fw, hit.n_g, r1, r2, sample_hemisphere_cosine)
    d_valid = d_valid & (dot(hit.n_g, dir_in) >= 0.0)

    if scene.has_clearcoat:
        c_dir, c_valid = disney.sample_clearcoat(
            dir_in, hit.n_g, p["clearcoat_gloss"], fu, fv, fw, r1, r2,
            regularize)
        c_valid = c_valid & (dot(hit.n_g, dir_in) >= 0.0)
    else:
        c_dir, c_valid = d_dir, d_valid   # weight 0 -> never picked

    m_dir, m_valid = disney.sample_metal(
        dir_in, hit.n_g, p["roughness"], p["anisotropic"], fu, fv, fw,
        r1, r2, regularize)
    m_valid = m_valid & (dot(hit.n_g, dir_in) >= 0.0)

    if scene.has_spec_trans:
        g_dir, g_eta, g_valid = disney.sample_rough_glass(
            dir_in, hit.n_g, p["eta"], p["anisotropic"], p["roughness"],
            fu, fv, fw, r1, r2, rands["fresnel"], regularize)
    else:
        # glass only reachable from under the surface; without
        # transmission those paths terminate
        g_dir, g_eta, g_valid = m_dir, zero, m_valid & False

    w_diff, w_clear, w_metal, w_glass = _lobe_weights(p)
    rnd = rands["lobe"]
    c1 = w_diff
    c2 = c1 + w_clear
    c3 = c2 + w_metal
    pick_diff = rnd <= c1
    pick_clear = (rnd > c1) & (rnd <= c2)
    pick_metal = (rnd > c2) & (rnd <= c3)
    # glass also forced when arriving from below the surface
    # (principled.cpp:23-26)
    under = dot(hit.n_g, dir_in) < 0.0
    pick_glass = (~(pick_diff | pick_clear | pick_metal)) | under
    pick_diff = pick_diff & ~under
    pick_clear = pick_clear & ~under
    pick_metal = pick_metal & ~under

    wo = jnp.where(pick_diff[..., None], d_dir,
         jnp.where(pick_clear[..., None], c_dir,
         jnp.where(pick_metal[..., None], m_dir, g_dir)))
    valid = jnp.where(pick_diff, d_valid,
            jnp.where(pick_clear, c_valid,
            jnp.where(pick_metal, m_valid, g_valid)))
    eta = jnp.where(pick_glass, g_eta, zero)
    is_spec = ~pick_diff
    return ScatterSample(wo=wo, eta=eta, is_specular=is_spec, valid=valid)


# ---------------------------------------------------------------------------
# public dispatch
# ---------------------------------------------------------------------------

def sample_mat(scene: ir.Scene, mat_id, wi, hit: HitInfo, rands,
               regularize, tex=None) -> ScatterSample:
    """Sample an outgoing direction per ray (reference Material::sample_mat).

    ``rands``: dict with keys 'lobe', 'u', 'v', 'fresnel' of (B,) floats.
    ``tex``: optional precomputed texture_inputs dict.
    """
    mt = tgather(scene.mat_type, mat_id)
    B = mat_id.shape[0]
    wo = jnp.zeros((B, 3))
    eta = jnp.zeros((B,))
    is_spec = jnp.zeros((B,), bool)
    valid = jnp.zeros((B,), bool)

    if scene.has_lambertian:
        front = dot(wi, hit.n_s) < 0.0
        n = jnp.where(front[..., None], hit.n_s, -hit.n_s)
        from vimg_tpu.core.math import onb_from_normal
        u, v = onb_from_normal(n)
        d = onb_to_world(u, v, n, sample_hemisphere_cosine(rands["u"], rands["v"]))
        m = mt == ir.MAT_LAMBERTIAN
        wo = jnp.where(m[..., None], d, wo)
        valid = jnp.where(m, front, valid)

    if scene.has_dielectric:
        d_wo, d_eta = _dielectric_sample(scene, mat_id, wi, hit, rands)
        m = mt == ir.MAT_DIELECTRIC
        wo = jnp.where(m[..., None], d_wo, wo)
        eta = jnp.where(m, d_eta, eta)
        is_spec = jnp.where(m, True, is_spec)
        valid = jnp.where(m, True, valid)

    # diffuse_light: base sample_mat -> absorbed (valid stays False)

    if scene.has_principled:
        ps = _principled_sample(scene, mat_id, wi, hit, rands, regularize,
                                mr=None if tex is None else tex["mr"])
        m = mt == ir.MAT_PRINCIPLED
        wo = jnp.where(m[..., None], ps.wo, wo)
        eta = jnp.where(m, ps.eta, eta)
        is_spec = jnp.where(m, ps.is_specular, is_spec)
        valid = jnp.where(m, ps.valid, valid)

    return ScatterSample(wo=normalize(wo), eta=eta, is_specular=is_spec,
                         valid=valid)


def _dielectric_sample(scene, mat_id, wi, hit, rands):
    """Smooth glass with Schlick reflectance (reference dielectric.cpp)."""
    ior = tgather(scene.mat_scalars, mat_id)[..., ir.MS_IOR]
    front = dot(wi, hit.n_s) < 0.0
    n = jnp.where(front[..., None], hit.n_s, -hit.n_s)
    cos_i = -dot(wi, n)
    randf = rands["fresnel"]

    def schlick(cosine, n1, n2):
        r0 = ((n1 - n2) / (n1 + n2)) ** 2
        return r0 + (1.0 - r0) * (1.0 - cosine) ** 5

    # entering: air -> dielectric
    eta_in = jnp.where(front, ior, 1.0 / ior)
    ratio = jnp.where(front, 1.0 / ior, ior)
    sin_t_sq = ratio * ratio * (1.0 - cos_i * cos_i)
    tir = sin_t_sq > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    refl_prob = jnp.where(front, schlick(cos_i, 1.0, ior),
                          jnp.where(tir, 1.1, schlick(cos_t, ior, 1.0)))
    do_reflect = refl_prob > randf

    refl = wi - 2.0 * dotk(wi, n) * n
    refr = ratio[..., None] * wi + (ratio * cos_i - cos_t)[..., None] * n
    wo = jnp.where(do_reflect[..., None], refl, refr)
    return wo, eta_in


def eval_pdf(scene: ir.Scene, mat_id, wi, wo, hit: HitInfo, regularize,
             cone_width=None, tex=None):
    """(f, pdf) pair (reference Material::eval_pdf_pair). Delta materials
    return (0, 0). ``tex``: optional precomputed texture_inputs dict."""
    mt = tgather(scene.mat_type, mat_id)
    B = mat_id.shape[0]
    f = jnp.zeros((B, 3))
    pdf = jnp.zeros((B,))
    base_col = tex["base_col"] if tex is not None else \
        base_color_at_hit(scene, mat_id, hit, cone_width, wi)

    if scene.has_lambertian:
        cospi = jnp.maximum(0.0, dot(wo, hit.n_s)) * INV_PI
        m = (mt == ir.MAT_LAMBERTIAN)[..., None]
        f = jnp.where(m, base_col * cospi[..., None], f)
        pdf = jnp.where(mt == ir.MAT_LAMBERTIAN, cospi, pdf)

    if scene.has_principled:
        ev, pp = _principled_eval_pdf(scene, mat_id, wi, wo, hit, regularize,
                                      base_col,
                                      mr=None if tex is None else tex["mr"])
        m = mt == ir.MAT_PRINCIPLED
        f = jnp.where(m[..., None], ev, f)
        pdf = jnp.where(m, pp, pdf)

    return f, pdf


def eval_div_pdf(scene: ir.Scene, mat_id, wi, wo, hit: HitInfo, regularize,
                 cone_width=None):
    """f/pdf with analytic cancellation where the reference has it
    (Lambertian -> albedo, dielectric -> 1)."""
    mt = tgather(scene.mat_type, mat_id)
    B = mat_id.shape[0]
    out = jnp.zeros((B, 3))
    base_col = base_color_at_hit(scene, mat_id, hit, cone_width, wi)

    if scene.has_lambertian:
        m = (mt == ir.MAT_LAMBERTIAN)[..., None]
        out = jnp.where(m, base_col, out)
    if scene.has_dielectric:
        m = (mt == ir.MAT_DIELECTRIC)[..., None]
        out = jnp.where(m, 1.0, out)
    if scene.has_principled:
        ev, pp = _principled_eval_pdf(scene, mat_id, wi, wo, hit, regularize,
                                      base_col)
        m = mt == ir.MAT_PRINCIPLED
        pp_d = jax.lax.stop_gradient(pp)  # detached-sampling estimator
        safe = jnp.where((pp_d > 0.0)[..., None],
                         ev / jnp.maximum(pp_d, 1e-20)[..., None], 0.0)
        out = jnp.where(m[..., None], safe, out)
    return out
