"""Material shading for the Pallas megakernel, in component-triple form.

Semantics are an exact port of vimg_tpu/materials/{bsdf,disney}.py (which
cite the reference files they re-derive: include/material/material.h,
include/material/disney_helpers/*.h, src/material/dielectric.cpp); only the
data layout changes — (B, 3) vectors become V3 triples of (rows, 128)
arrays so Mosaic tiles them onto the VPU. Per-lane material parameters
arrive pre-gathered in ``mp`` (see kernel.py); static scene flags gate
which families/lobes are compiled, identical to the XLA dispatch.

Directions follow the reference convention: ``wi`` is the ray direction
toward the surface, ``dir_in = -wi``; ``wo`` points away.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vimg_tpu.render.mega import v3
from vimg_tpu.render.mega.v3 import (V3, bsel, cross, dot, normalize,
                                     onb_from_normal, onb_to_world, pow5,
                                     powf, where, world_to_onb)

PI = float(jnp.pi)
INV_PI = 1.0 / PI
TWO_PI = 2.0 * PI

ALPHA_MIN = 1e-4
REG_MIN = 0.03       # reference MatConst::regularize_min
REG_MAX = 0.1        # reference MatConst::regularize_max
ROUGH_THRESH = 0.1   # reference MatConst::roughness_threshold


# ---------------------------------------------------------------------------
# warps (port of core/warps.py; reference include/rng/sampling.h:15-79)
# ---------------------------------------------------------------------------

def sample_disk(r1, r2):
    r = jnp.sqrt(r1)
    phi = TWO_PI * r2
    return r * jnp.cos(phi), r * jnp.sin(phi)


def sample_sphere(r1, r2) -> V3:
    phi = TWO_PI * r1
    cos_t = 2.0 * r2 - 1.0
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return V3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def sample_sphere_cap(r1, r2, cos_theta_max) -> V3:
    phi = TWO_PI * r1
    cos_t = cos_theta_max + (1.0 - cos_theta_max) * r2
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return V3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def sample_hemisphere_cosine(r1, r2) -> V3:
    phi = TWO_PI * r1
    cos_t = jnp.sqrt(r2)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    return V3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t)


def sample_triangle_uv(r1, r2):
    """Low-distortion triangle warp (reference triangle.cpp:200-213)."""
    lt = r1 < r2
    u = jnp.where(lt, r1 * 0.5, r1 - r2 * 0.5)
    v = jnp.where(lt, r2 - r1 * 0.5, r2 * 0.5)
    return u, v


# ---------------------------------------------------------------------------
# disney lobe helpers (port of materials/disney.py)
# ---------------------------------------------------------------------------

def regularize_alpha(alpha, regularize):
    widened = jnp.clip(2.0 * alpha, REG_MIN, REG_MAX)
    return jnp.where(regularize & (alpha < ROUGH_THRESH), widened, alpha)


def anisotropic_alphas(roughness, anisotropic, clamp_roughness=True):
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    r = jnp.clip(roughness, 0.01, 1.0) if clamp_roughness else roughness
    r2 = r * r
    return (jnp.maximum(ALPHA_MIN, r2 / aspect),
            jnp.maximum(ALPHA_MIN, r2 * aspect))


def smith_g(w: V3, alphax, alphay, fu, fv, fw):
    lx = dot(w, fu)
    ly = dot(w, fv)
    lz = dot(w, fw)
    lz2 = jnp.maximum(lz * lz, 1e-20)
    a = ((lx * alphax) ** 2 + (ly * alphay) ** 2) / lz2
    lam = (jnp.sqrt(1.0 + a) - 1.0) / 2.0
    return 1.0 / (1.0 + lam)


def ggx_d(local_h: V3, alphax, alphay):
    denom = (local_h.x ** 2) / (alphax * alphax) \
        + (local_h.y ** 2) / (alphay * alphay) + local_h.z ** 2
    return 1.0 / (PI * alphax * alphay * jnp.maximum(denom * denom, 1e-20))


def sample_vndf(local_dir_in: V3, alphax, alphay, r1, r2) -> V3:
    """Spherical-cap VNDF sampling (reference disney_common.h:16-52)."""
    sign = jnp.where(local_dir_in.z < 0.0, -1.0, 1.0)
    din = local_dir_in * sign
    hemi = normalize(V3(alphax * din.x, alphay * din.y, din.z))
    phi = TWO_PI * r1
    z = (1.0 - r2) * (1.0 + hemi.z) - hemi.z
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    c = V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z)
    h = c + hemi
    n = normalize(V3(alphax * h.x, alphay * h.y, jnp.maximum(0.0, h.z)))
    return n * sign


def fresnel_dielectric(n_dot_i, eta):
    """Exact unpolarized Fresnel; 1 on TIR (reference disney_common.h:55-69)."""
    n_dot_t_sq = 1.0 - (1.0 - n_dot_i * n_dot_i) / (eta * eta)
    tir = n_dot_t_sq < 0.0
    n_dot_t = jnp.sqrt(jnp.maximum(n_dot_t_sq, 0.0))
    ni = jnp.abs(n_dot_i)
    rs = (ni - eta * n_dot_t) / jnp.maximum(ni + eta * n_dot_t, 1e-12)
    rp = (eta * ni - n_dot_t) / jnp.maximum(eta * ni + n_dot_t, 1e-12)
    f = (rs * rs + rp * rp) / 2.0
    return jnp.where(tir, 1.0, f)


def _fd(n: V3, w: V3, fd90):
    return 1.0 + (fd90 - 1.0) * pow5(1.0 - jnp.maximum(dot(n, w), 0.0))


def eval_pdf_diffuse(dir_in, dir_out, base_col: V3, subsurface, roughness,
                     half_vec, fw):
    cos_out = jnp.maximum(dot(fw, dir_out), 0.0)
    cos_in = jnp.maximum(dot(fw, dir_in), 0.0)
    h_dot_out = jnp.maximum(dot(half_vec, dir_out), 0.0)
    fd90 = 0.5 + 2.0 * roughness * h_dot_out * h_dot_out
    base_diffuse = base_col * (INV_PI * _fd(fw, dir_in, fd90)
                               * _fd(fw, dir_out, fd90) * cos_out)
    fss90 = roughness * h_dot_out * h_dot_out
    fss = (_fd(fw, dir_in, fss90) * _fd(fw, dir_out, fss90)
           * (1.0 / jnp.maximum(cos_out + cos_in, 1e-7) - 0.5) + 0.5)
    ss_diffuse = base_col * ((1.25 * INV_PI) * fss * cos_out)
    ev = base_diffuse * (1.0 - subsurface) + ss_diffuse * subsurface
    return ev, cos_out * INV_PI


def eval_pdf_sheen(dir_in, dir_out, base_col: V3, sheen_tint, half_vec, fw):
    base_lum = v3.luminance(base_col)
    pos = base_lum > 0
    inv_lum = 1.0 / jnp.maximum(base_lum, 1e-12)
    c_tint = where(pos, base_col * inv_lum, v3.splat((1.0, 1.0, 1.0), base_lum))
    c_sheen = c_tint * sheen_tint + (1.0 - sheen_tint)
    cos_out = jnp.maximum(dot(fw, dir_out), 0.0)
    ev = c_sheen * (pow5(1.0 - jnp.maximum(dot(half_vec, dir_out), 0.0))
                    * cos_out)
    return ev, cos_out * INV_PI


def eval_pdf_metal(dir_in, dir_out, base_col: V3, spec_tint, specular, eta,
                   metallic, half_vec, fu, fv, fw, G, G_in, alphax, alphay):
    base_lum = v3.luminance(base_col)
    pos = base_lum > 0
    inv_lum = 1.0 / jnp.maximum(base_lum, 1e-12)
    c_tint = where(pos, base_col * inv_lum, v3.splat((1.0, 1.0, 1.0), base_lum))
    k_s = c_tint * spec_tint + (1.0 - spec_tint)
    r0 = ((eta - 1.0) ** 2) / ((eta + 1.0) ** 2)
    c0 = k_s * (specular * r0 * (1.0 - metallic)) + base_col * metallic
    fres = c0 + (1.0 - c0) * pow5(1.0 - dot(half_vec, dir_out))
    local_h = world_to_onb(fu, fv, fw, half_vec)
    d = ggx_d(local_h, alphax, alphay)
    inv4 = 1.0 / (4.0 * jnp.maximum(jnp.abs(dot(fw, dir_in)), 1e-12))
    ev = fres * (d * G * inv4)
    pdf = d * G_in * inv4
    return ev, pdf


def eval_pdf_clearcoat(dir_in, dir_out, alpha_g, half_vec, fu, fv, fw):
    r0 = ((1.5 - 1.0) ** 2) / ((1.5 + 1.0) ** 2)
    h_dot_out = jnp.abs(dot(half_vec, dir_out))
    fres = r0 + (1.0 - r0) * pow5(1.0 - h_dot_out)
    G = (smith_g(dir_in, 0.25, 0.25, fu, fv, fw)
         * smith_g(dir_out, 0.25, 0.25, fu, fv, fw))
    a2 = alpha_g * alpha_g
    hz = world_to_onb(fu, fv, fw, half_vec).z
    d = (a2 - 1.0) / (PI * jnp.log(a2) * (1.0 + (a2 - 1.0) * hz * hz))
    ev_s = (fres * d * G) / (4.0 * jnp.maximum(jnp.abs(dot(fw, dir_in)), 1e-12))
    pdf = (d * jnp.abs(dot(fw, half_vec))) / (4.0 * jnp.maximum(h_dot_out, 1e-12))
    return V3(ev_s, ev_s, ev_s), pdf


def eval_pdf_rough_glass(dir_in, dir_out, n_g, base_col: V3, mat_eta,
                         half_vec, fu, fv, fw, G, G_in, alphax, alphay):
    """Walter rough dielectric (reference disney_glass.h:186-235)."""
    in_geo = dot(dir_in, n_g)
    reflect = (in_geo * dot(n_g, dir_out)) >= 0.0
    eta = jnp.where(in_geo >= 0.0, mat_eta, 1.0 / mat_eta)

    gen_h = normalize(dir_in + dir_out * eta)
    h = where(reflect, half_vec, gen_h)

    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)
    local_h = world_to_onb(fu, fv, fw, h)
    d = ggx_d(local_h, alphax, alphay)
    n_in = dot(fw, dir_in)
    abs_n_in = jnp.maximum(jnp.abs(n_in), 1e-12)

    ev_refl = base_col * ((F * d * G) / (4.0 * abs_n_in))
    pdf_refl = (F * d * G_in) / (4.0 * abs_n_in)

    h_dot_out = dot(h, dir_out)
    sqrt_denom = h_dot_in + eta * h_dot_out
    sd2 = jnp.maximum(sqrt_denom * sqrt_denom, 1e-20)
    eta_factor = 1.0 / (eta * eta)
    sqrt_base = V3(jnp.sqrt(jnp.maximum(base_col.x, 0.0)),
                   jnp.sqrt(jnp.maximum(base_col.y, 0.0)),
                   jnp.sqrt(jnp.maximum(base_col.z, 0.0)))
    ev_refr = sqrt_base * (eta_factor * (1.0 - F) * d * G * eta * eta
                           * jnp.abs(h_dot_out * h_dot_in) / (abs_n_in * sd2))
    dh_dout = eta * eta * h_dot_out / sd2
    pdf_refr = (1.0 - F) * d * G_in * jnp.abs(
        dh_dout * h_dot_in / jnp.where(n_in == 0.0, 1e-12, n_in))

    ev = where(reflect, ev_refl, ev_refr)
    pdf = jnp.where(reflect, pdf_refl, pdf_refr)
    return ev, pdf


def sample_metal(dir_in, n_g, roughness, anisotropic, fu, fv, fw, r1, r2,
                 regularize):
    # reference metal *sampler* uses unclamped roughness^2 (disney_metal.h:
    # 95-99) while eval clamps — matched, see materials/disney.py
    alphax, alphay = anisotropic_alphas(roughness, anisotropic,
                                        clamp_roughness=False)
    alphax = regularize_alpha(alphax, regularize)
    alphay = regularize_alpha(alphay, regularize)
    local_in = world_to_onb(fu, fv, fw, dir_in)
    local_h = sample_vndf(local_in, alphax, alphay, r1, r2)
    h = normalize(onb_to_world(fu, fv, fw, local_h))
    refl = normalize(-dir_in + h * (2.0 * dot(dir_in, h)))
    valid = dot(refl, n_g) > 0.0
    return refl, valid


def sample_clearcoat(dir_in, n_g, clearcoat_gloss, fu, fv, fw, r1, r2,
                     regularize):
    alpha_g = (1.0 - clearcoat_gloss) * 0.1 + clearcoat_gloss * 0.001
    alpha_g = regularize_alpha(alpha_g, regularize)
    a2 = alpha_g * alpha_g
    cos2 = (1.0 - powf(a2, 1.0 - r1)) / (1.0 - a2)
    cos_e = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_e = jnp.sqrt(jnp.clip(1.0 - cos2, 0.0, 1.0))
    az = TWO_PI * r2
    local_h = V3(sin_e * jnp.cos(az), sin_e * jnp.sin(az), cos_e)
    flip = dot(fw, dir_in) < 0.0
    fu2 = where(flip, -fu, fu)
    fv2 = where(flip, -fv, fv)
    fw2 = where(flip, -fw, fw)
    h = normalize(onb_to_world(fu2, fv2, fw2, local_h))
    refl = normalize(-dir_in + h * (2.0 * dot(dir_in, h)))
    valid = dot(n_g, refl) > 0.0
    return refl, valid


def sample_rough_glass(dir_in, n_g, mat_eta, anisotropic, roughness,
                       fu, fv, fw, r1, r2, fres_rand, regularize):
    in_geo = dot(dir_in, n_g)
    eta = jnp.where(in_geo >= 0.0, mat_eta, 1.0 / mat_eta)
    alphax, alphay = anisotropic_alphas(roughness, anisotropic)
    alphax = regularize_alpha(alphax, regularize)
    alphay = regularize_alpha(alphay, regularize)
    local_in = world_to_onb(fu, fv, fw, dir_in)
    local_h = sample_vndf(local_in, alphax, alphay, r1, r2)
    h = onb_to_world(fu, fv, fw, local_h)
    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)

    do_reflect = fres_rand <= F
    refl = normalize(-dir_in + h * (2.0 * h_dot_in))
    refl_valid = (dot(refl, n_g) * in_geo) > 0.0

    h_dot_out_sq = 1.0 - (1.0 - h_dot_in * h_dot_in) / (eta * eta)
    h_flip = where(h_dot_in < 0.0, -h, h)
    h_dot_out = jnp.sqrt(jnp.maximum(h_dot_out_sq, 0.0))
    refr = (-dir_in) * (1.0 / eta) + h_flip * (jnp.abs(h_dot_in) / eta
                                               - h_dot_out)
    refr_valid = (h_dot_out_sq > 0.0) & ((dot(refr, n_g) * in_geo) < 0.0)
    # NaN-pdf guard on the generalized half vector (disney_glass.h:175-184)
    gen_h = normalize(dir_in + refr * eta)
    gh_dot_in = dot(gen_h, dir_in)
    refr_valid = refr_valid & (
        (1.0 - (1.0 - gh_dot_in ** 2) / (eta * eta)) > 0.0)

    dir_out = where(do_reflect, refl, refr)
    valid = bsel(do_reflect, refl_valid, refr_valid)
    eta_out = jnp.where(do_reflect, 0.0, eta)
    return dir_out, eta_out, valid


# ---------------------------------------------------------------------------
# principled mixture (port of materials/bsdf.py)
# ---------------------------------------------------------------------------

class Hit(NamedTuple):
    """Per-lane shading frame (megakernel keeps only what shading needs)."""
    n_s: V3
    n_g: V3
    tangent: V3
    bitangent: V3


def principled_frame(hit: Hit, dir_in):
    """Two-sided frame flip (reference principled.cpp:8-12)."""
    flip = (dot(hit.n_s, dir_in) * dot(hit.n_g, dir_in)) < 0.0
    s = jnp.where(flip, -1.0, 1.0)
    return hit.tangent * s, hit.bitangent * s, hit.n_s * s


def lobe_weights(p):
    """Mixture weights (reference principled.cpp:28-38)."""
    w_diff = (1.0 - p["metallic"]) * (1.0 - p["spec_trans"])
    w_clear = 0.25 * p["clearcoat"]
    w_metal = 1.0 - p["spec_trans"] * (1.0 - p["metallic"])
    w_glass = (1.0 - p["metallic"]) * p["spec_trans"]
    total = jnp.maximum(w_diff + w_clear + w_metal + w_glass, 1e-12)
    return w_diff / total, w_clear / total, w_metal / total, w_glass / total


def principled_eval_pdf(scene, p, wi, wo, hit: Hit, regularize):
    """Full mixture eval+pdf (reference principled.h:100-205). ``p`` holds
    the per-lane parameter arrays incl. base color V3 under 'base'."""
    dir_in = -wi
    fu, fv, fw = principled_frame(hit, dir_in)
    base_col = p["base"]
    half_vec = normalize(dir_in + wo)

    alphax, alphay = anisotropic_alphas(p["roughness"], p["anisotropic"])
    alphax = regularize_alpha(alphax, regularize)
    alphay = regularize_alpha(alphay, regularize)
    G_in = smith_g(dir_in, alphax, alphay, fu, fv, fw)
    G = G_in * smith_g(wo, alphax, alphay, fu, fv, fw)

    zero1 = jnp.zeros_like(p["roughness"])
    zero3 = V3(zero1, zero1, zero1)

    if scene.has_spec_trans:
        ev_glass, pdf_glass = eval_pdf_rough_glass(
            dir_in, wo, hit.n_g, base_col, p["eta"], half_vec, fu, fv, fw,
            G, G_in, alphax, alphay)
    else:
        ev_glass, pdf_glass = zero3, zero1

    above = (dot(hit.n_g, dir_in) >= 0.0) & (dot(hit.n_g, wo) >= 0.0)
    under = dot(hit.n_g, dir_in) < 0.0

    if scene.has_sheen:
        ev_sheen, _ = eval_pdf_sheen(dir_in, wo, base_col,
                                     p["sheen_tint"], half_vec, fw)
    else:
        ev_sheen = zero3
    ev_diff, pdf_diff = eval_pdf_diffuse(
        dir_in, wo, base_col, p["subsurface"], p["roughness"], half_vec, fw)

    if scene.has_clearcoat:
        alpha_g = ((1.0 - p["clearcoat_gloss"]) * 0.1
                   + p["clearcoat_gloss"] * 0.001)
        alpha_g = regularize_alpha(alpha_g, regularize)
        ev_clear, pdf_clear = eval_pdf_clearcoat(
            dir_in, wo, alpha_g, half_vec, fu, fv, fw)
    else:
        ev_clear, pdf_clear = zero3, zero1

    ev_metal, pdf_metal = eval_pdf_metal(
        dir_in, wo, base_col, p["spec_tint"], p["specular"], p["eta"],
        p["metallic"], half_vec, fu, fv, fw, G, G_in, alphax, alphay)

    zero = jnp.zeros_like(pdf_diff)
    ev_diff = where(above, ev_diff, zero3)
    ev_sheen = where(above, ev_sheen, zero3)
    ev_clear = where(above, ev_clear, zero3)
    ev_metal = where(above, ev_metal, zero3)
    pdf_diff = jnp.where(above, pdf_diff, zero)
    pdf_clear = jnp.where(above, pdf_clear, zero)
    pdf_metal = jnp.where(above, pdf_metal, zero)

    w_diff, w_clear, w_metal, w_glass = lobe_weights(p)
    one_m = 1.0 - p["metallic"]
    ev_mix = (ev_diff * ((1.0 - p["spec_trans"]) * one_m)
              + ev_sheen * (one_m * p["sheen"])
              + ev_clear * (0.25 * p["clearcoat"])
              + ev_metal * (1.0 - p["spec_trans"] * one_m)
              + ev_glass * (one_m * p["spec_trans"]))
    pdf_mix = (w_diff * pdf_diff + w_clear * pdf_clear + w_metal * pdf_metal
               + w_glass * pdf_glass)

    ev_under = ev_glass * (one_m * p["spec_trans"])
    ev = where(under, ev_under, ev_mix)
    pdf = jnp.where(under, pdf_glass, pdf_mix)
    return ev, pdf


def principled_sample(scene, p, wi, hit: Hit, rands, regularize):
    dir_in = -wi
    fu, fv, fw = principled_frame(hit, dir_in)
    r1, r2 = rands["u"], rands["v"]
    zero = jnp.zeros_like(r1)

    d_dir = onb_to_world(fu, fv, fw, sample_hemisphere_cosine(r1, r2))
    d_valid = dot(hit.n_g, d_dir) > 0.0
    above_in = dot(hit.n_g, dir_in) >= 0.0
    d_valid = d_valid & above_in

    if scene.has_clearcoat:
        c_dir, c_valid = sample_clearcoat(
            dir_in, hit.n_g, p["clearcoat_gloss"], fu, fv, fw, r1, r2,
            regularize)
        c_valid = c_valid & above_in
    else:
        c_dir, c_valid = d_dir, d_valid

    m_dir, m_valid = sample_metal(
        dir_in, hit.n_g, p["roughness"], p["anisotropic"], fu, fv, fw,
        r1, r2, regularize)
    m_valid = m_valid & above_in

    if scene.has_spec_trans:
        g_dir, g_eta, g_valid = sample_rough_glass(
            dir_in, hit.n_g, p["eta"], p["anisotropic"], p["roughness"],
            fu, fv, fw, r1, r2, rands["fresnel"], regularize)
    else:
        g_dir, g_eta, g_valid = m_dir, zero, m_valid & False

    w_diff, w_clear, w_metal, w_glass = lobe_weights(p)
    rnd = rands["lobe"]
    c1 = w_diff
    c2 = c1 + w_clear
    c3 = c2 + w_metal
    pick_diff = rnd <= c1
    pick_clear = (rnd > c1) & (rnd <= c2)
    pick_metal = (rnd > c2) & (rnd <= c3)
    under = ~above_in
    pick_glass = (~(pick_diff | pick_clear | pick_metal)) | under
    pick_diff = pick_diff & ~under
    pick_clear = pick_clear & ~under
    pick_metal = pick_metal & ~under

    wo = where(pick_diff, d_dir,
               where(pick_clear, c_dir,
                     where(pick_metal, m_dir, g_dir)))
    valid = bsel(pick_diff, d_valid,
                 bsel(pick_clear, c_valid,
                      bsel(pick_metal, m_valid, g_valid)))
    eta = jnp.where(pick_glass, g_eta, zero)
    is_spec = ~pick_diff
    return wo, eta, is_spec, valid


# ---------------------------------------------------------------------------
# unified dispatch (port of bsdf.sample_mat / bsdf.eval_pdf)
# ---------------------------------------------------------------------------

def dielectric_sample(p, wi, hit: Hit, rands):
    """Smooth glass with Schlick reflectance (reference dielectric.cpp)."""
    ior = p["eta"]
    front = dot(wi, hit.n_s) < 0.0
    n = where(front, hit.n_s, -hit.n_s)
    cos_i = -dot(wi, n)
    randf = rands["fresnel"]

    def schlick(cosine, r0):
        return r0 + (1.0 - r0) * pow5(1.0 - cosine)

    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    eta_in = jnp.where(front, ior, 1.0 / ior)
    ratio = jnp.where(front, 1.0 / ior, ior)
    sin_t_sq = ratio * ratio * (1.0 - cos_i * cos_i)
    tir = sin_t_sq > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t_sq, 0.0))
    refl_prob = jnp.where(front, schlick(cos_i, r0),
                          jnp.where(tir, 1.1, schlick(cos_t, r0)))
    do_reflect = refl_prob > randf

    refl = wi - n * (2.0 * dot(wi, n))
    refr = wi * ratio + n * (ratio * cos_i - cos_t)
    wo = where(do_reflect, refl, refr)
    return wo, eta_in


def sample_mat(scene, mp, wi, hit: Hit, rands, regularize):
    """Returns (wo V3, eta, is_specular, valid); ``mp`` carries the gathered
    per-lane params + family masks is_lamb/is_diel/is_light/is_prin."""
    zero = jnp.zeros_like(rands["u"])
    wo = V3(zero, zero, zero)
    eta = zero
    is_spec = zero > 1.0
    valid = zero > 1.0

    if scene.has_lambertian:
        front = dot(wi, hit.n_s) < 0.0
        n = where(front, hit.n_s, -hit.n_s)
        u, v = onb_from_normal(n)
        d = onb_to_world(u, v, n,
                         sample_hemisphere_cosine(rands["u"], rands["v"]))
        m = mp["is_lamb"]
        wo = where(m, d, wo)
        valid = bsel(m, front, valid)

    if scene.has_dielectric:
        d_wo, d_eta = dielectric_sample(mp, wi, hit, rands)
        m = mp["is_diel"]
        wo = where(m, d_wo, wo)
        eta = jnp.where(m, d_eta, eta)
        is_spec = is_spec | m
        valid = valid | m

    # diffuse_light: absorbed (valid stays False)

    if scene.has_principled:
        p_wo, p_eta, p_spec, p_valid = principled_sample(
            scene, mp, wi, hit, rands, regularize)
        m = mp["is_prin"]
        wo = where(m, p_wo, wo)
        eta = jnp.where(m, p_eta, eta)
        is_spec = bsel(m, p_spec, is_spec)
        valid = bsel(m, p_valid, valid)

    return normalize(wo), eta, is_spec, valid


def eval_pdf(scene, mp, wi, wo, hit: Hit, regularize):
    """(f V3, pdf). Delta materials return (0, 0)."""
    zero = jnp.zeros_like(mp["eta"])
    f = V3(zero, zero, zero)
    pdf = zero

    if scene.has_lambertian:
        cospi = jnp.maximum(0.0, dot(wo, hit.n_s)) * INV_PI
        m = mp["is_lamb"]
        f = where(m, mp["base"] * cospi, f)
        pdf = jnp.where(m, cospi, pdf)

    if scene.has_principled:
        ev, pp = principled_eval_pdf(scene, mp, wi, wo, hit, regularize)
        m = mp["is_prin"]
        f = where(m, ev, f)
        pdf = jnp.where(m, pp, pdf)

    return f, pdf
