"""Disney/Principled BSDF lobes, batched & branchless.

Re-derivation of reference include/material/disney_helpers/*.h (diffuse,
sheen, metal, clearcoat, rough glass, Smith G, spherical-cap VNDF sampling,
exact dielectric Fresnel). Every function maps over (B,) ray batches; all
control flow is jnp.where masks. Directions:

- ``dir_in``: unit vector from the surface toward the previous vertex
  (i.e. -ray_dir),
- ``dir_out``: sampled/evaluated outgoing direction,
- frame (fu, fv, fw): shading frame, fw = shading normal (possibly flipped).
"""
from __future__ import annotations

import jax.numpy as jnp

from vimg_tpu.core.math import dot, dotk, luminance, normalize, onb_to_world, pow5, world_to_onb

PI = jnp.pi
INV_PI = 1.0 / jnp.pi

ALPHA_MIN = 1e-4
REG_MIN = 0.03       # reference MatConst::regularize_min
REG_MAX = 0.1        # reference MatConst::regularize_max
ROUGH_THRESH = 0.1   # reference MatConst::roughness_threshold


def regularize_alpha(alpha, regularize):
    """Path regularization: roughen near-specular lobes after the first
    non-specular bounce (reference principled.h:135-142)."""
    widened = jnp.clip(2.0 * alpha, REG_MIN, REG_MAX)
    return jnp.where(regularize & (alpha < ROUGH_THRESH), widened, alpha)


def anisotropic_alphas(roughness, anisotropic, clamp_roughness=True):
    """(alphax, alphay) from roughness/anisotropy (reference principled.h:
    124-133). ``clamp_roughness`` applies the [0.01, 1] clamp used by the
    metal/glass lobes."""
    aspect = jnp.sqrt(1.0 - 0.9 * anisotropic)
    r = jnp.clip(roughness, 0.01, 1.0) if clamp_roughness else roughness
    r2 = r * r
    alphax = jnp.maximum(ALPHA_MIN, r2 / aspect)
    alphay = jnp.maximum(ALPHA_MIN, r2 * aspect)
    return alphax, alphay


def smith_g(w, alphax, alphay, fu, fv, fw):
    """Smith masking term G_w (reference disney_common.h:6-14)."""
    lx = dot(w, fu)
    ly = dot(w, fv)
    lz = dot(w, fw)
    lz2 = jnp.maximum(lz * lz, 1e-20)
    a = ((lx * alphax) ** 2 + (ly * alphay) ** 2) / lz2
    lam = (jnp.sqrt(1.0 + a) - 1.0) / 2.0
    return 1.0 / (1.0 + lam)


def ggx_d(local_h, alphax, alphay):
    """Anisotropic GGX normal distribution (reference disney_metal.h:27-41)."""
    hx, hy, hz = local_h[..., 0], local_h[..., 1], local_h[..., 2]
    denom = (hx * hx) / (alphax * alphax) + (hy * hy) / (alphay * alphay) + hz * hz
    return 1.0 / (PI * alphax * alphay * jnp.maximum(denom * denom, 1e-20))


def sample_vndf(local_dir_in, alphax, alphay, r1, r2):
    """Visible-normal sampling via spherical caps (Intel/Dupuy method,
    reference disney_common.h:16-52). Local frame; returns local half
    vector."""
    sign = jnp.where(local_dir_in[..., 2] < 0.0, -1.0, 1.0)
    din = local_dir_in * sign[..., None]
    hemi = normalize(jnp.stack([alphax * din[..., 0], alphay * din[..., 1],
                                din[..., 2]], axis=-1))
    phi = 2.0 * PI * r1
    z = (1.0 - r2) * (1.0 + hemi[..., 2]) - hemi[..., 2]
    sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    c = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z], axis=-1)
    h = c + hemi
    n = normalize(jnp.stack([alphax * h[..., 0], alphay * h[..., 1],
                             jnp.maximum(0.0, h[..., 2])], axis=-1))
    return n * sign[..., None]


def fresnel_dielectric(n_dot_i, eta):
    """Exact unpolarized dielectric Fresnel; 1.0 on TIR (reference
    disney_common.h:55-69)."""
    n_dot_t_sq = 1.0 - (1.0 - n_dot_i * n_dot_i) / (eta * eta)
    tir = n_dot_t_sq < 0.0
    n_dot_t = jnp.sqrt(jnp.maximum(n_dot_t_sq, 0.0))
    ni = jnp.abs(n_dot_i)
    rs = (ni - eta * n_dot_t) / jnp.maximum(ni + eta * n_dot_t, 1e-12)
    rp = (eta * ni - n_dot_t) / jnp.maximum(eta * ni + n_dot_t, 1e-12)
    f = (rs * rs + rp * rp) / 2.0
    return jnp.where(tir, 1.0, f)


def _fd(n, w, fd90):
    """Burley retro-diffuse factor (reference disney_diffuse.h:9-11)."""
    return 1.0 + (fd90 - 1.0) * pow5(1.0 - jnp.maximum(dot(n, w), 0.0))


# ---------------------------------------------------------------------------
# lobes: each returns (eval (B,3), pdf (B,)) given shared precomputation.
# Above/below-surface masks are applied by the caller (they are common).
# ---------------------------------------------------------------------------

def eval_pdf_diffuse(dir_in, dir_out, base_col, subsurface, roughness,
                     half_vec, fw):
    cos_out = jnp.maximum(dot(fw, dir_out), 0.0)
    cos_in = jnp.maximum(dot(fw, dir_in), 0.0)
    h_dot_out = jnp.maximum(dot(half_vec, dir_out), 0.0)
    fd90 = 0.5 + 2.0 * roughness * h_dot_out * h_dot_out
    base_diffuse = (base_col * INV_PI * (_fd(fw, dir_in, fd90)
                    * _fd(fw, dir_out, fd90) * cos_out)[..., None])
    fss90 = roughness * h_dot_out * h_dot_out
    fss = (_fd(fw, dir_in, fss90) * _fd(fw, dir_out, fss90)
           * (1.0 / jnp.maximum(cos_out + cos_in, 1e-7) - 0.5) + 0.5)
    ss_diffuse = base_col * (1.25 * INV_PI) * (fss * cos_out)[..., None]
    ev = ((1.0 - subsurface)[..., None] * base_diffuse
          + subsurface[..., None] * ss_diffuse)
    pdf = cos_out * INV_PI
    return ev, pdf


def eval_pdf_sheen(dir_in, dir_out, base_col, sheen_tint, half_vec, fw):
    base_lum = luminance(base_col)
    c_tint = jnp.where((base_lum > 0)[..., None],
                       base_col / jnp.maximum(base_lum, 1e-12)[..., None], 1.0)
    c_sheen = (1.0 - sheen_tint)[..., None] + sheen_tint[..., None] * c_tint
    cos_out = jnp.maximum(dot(fw, dir_out), 0.0)
    ev = c_sheen * (pow5(1.0 - jnp.maximum(dot(half_vec, dir_out), 0.0))
                    * cos_out)[..., None]
    return ev, cos_out * INV_PI


def eval_pdf_metal(dir_in, dir_out, base_col, spec_tint, specular, eta,
                   metallic, half_vec, fu, fv, fw, G, G_in, alphax, alphay):
    base_lum = luminance(base_col)
    c_tint = jnp.where((base_lum > 0)[..., None],
                       base_col / jnp.maximum(base_lum, 1e-12)[..., None], 1.0)
    k_s = (1.0 - spec_tint)[..., None] + spec_tint[..., None] * c_tint
    r0 = ((eta - 1.0) ** 2) / ((eta + 1.0) ** 2)
    c0 = ((specular * r0 * (1.0 - metallic))[..., None] * k_s
          + metallic[..., None] * base_col)
    fres = c0 + (1.0 - c0) * pow5(1.0 - dot(half_vec, dir_out))[..., None]
    local_h = world_to_onb(fu, fv, fw, half_vec)
    d = ggx_d(local_h, alphax, alphay)
    inv4 = 1.0 / (4.0 * jnp.maximum(jnp.abs(dot(fw, dir_in)), 1e-12))
    ev = fres * (d * G * inv4)[..., None]
    pdf = d * G_in * inv4
    return ev, pdf


def eval_pdf_clearcoat(dir_in, dir_out, alpha_g, half_vec, fu, fv, fw):
    r0 = ((1.5 - 1.0) ** 2) / ((1.5 + 1.0) ** 2)
    h_dot_out = jnp.abs(dot(half_vec, dir_out))
    fres = r0 + (1.0 - r0) * pow5(1.0 - h_dot_out)
    G = (smith_g(dir_in, 0.25, 0.25, fu, fv, fw)
         * smith_g(dir_out, 0.25, 0.25, fu, fv, fw))
    a2 = alpha_g * alpha_g
    local_h = world_to_onb(fu, fv, fw, half_vec)
    hz = local_h[..., 2]
    d = (a2 - 1.0) / (PI * jnp.log(a2) * (1.0 + (a2 - 1.0) * hz * hz))
    ev_s = (fres * d * G) / (4.0 * jnp.maximum(jnp.abs(dot(fw, dir_in)), 1e-12))
    pdf = (d * jnp.abs(dot(fw, half_vec))) / (4.0 * jnp.maximum(h_dot_out, 1e-12))
    return ev_s[..., None] * jnp.ones_like(half_vec), pdf


def eval_pdf_rough_glass(dir_in, dir_out, n_g, base_col, mat_eta, half_vec,
                         fu, fv, fw, G, G_in, alphax, alphay):
    """Walter-style rough dielectric (reference disney_glass.h:186-235).
    ``half_vec`` is the reflection half vector; the generalized refraction
    half vector is recomputed here."""
    in_geo = dot(dir_in, n_g)
    reflect = (in_geo * dot(n_g, dir_out)) >= 0.0
    eta = jnp.where(in_geo >= 0.0, mat_eta, 1.0 / mat_eta)

    gen_h = normalize(dir_in + dir_out * eta[..., None])
    h = jnp.where(reflect[..., None], half_vec, gen_h)

    h_dot_in = dot(h, dir_in)
    F = fresnel_dielectric(h_dot_in, eta)
    local_h = world_to_onb(fu, fv, fw, h)
    d = ggx_d(local_h, alphax, alphay)
    n_in = dot(fw, dir_in)
    abs_n_in = jnp.maximum(jnp.abs(n_in), 1e-12)

    ev_refl = base_col * ((F * d * G) / (4.0 * abs_n_in))[..., None]
    pdf_refl = (F * d * G_in) / (4.0 * abs_n_in)

    h_dot_out = dot(h, dir_out)
    sqrt_denom = h_dot_in + eta * h_dot_out
    sd2 = jnp.maximum(sqrt_denom * sqrt_denom, 1e-20)
    eta_factor = 1.0 / (eta * eta)
    ev_refr = (jnp.sqrt(jnp.maximum(base_col, 0.0))
               * (eta_factor * (1.0 - F) * d * G * eta * eta
                  * jnp.abs(h_dot_out * h_dot_in) / (abs_n_in * sd2))[..., None])
    dh_dout = eta * eta * h_dot_out / sd2
    pdf_refr = (1.0 - F) * d * G_in * jnp.abs(
        dh_dout * h_dot_in / jnp.where(n_in == 0.0, 1e-12, n_in))

    ev = jnp.where(reflect[..., None], ev_refl, ev_refr)
    pdf = jnp.where(reflect, pdf_refl, pdf_refr)
    return ev, pdf


# ---------------------------------------------------------------------------
# lobe samplers: return (dir_out, eta_out, is_specular, valid)
# ---------------------------------------------------------------------------

def sample_diffuse_dir(fu, fv, fw, n_g, r1, r2, from_warp):
    dir_out = onb_to_world(fu, fv, fw, from_warp(r1, r2))
    valid = dot(n_g, dir_out) > 0.0
    return dir_out, valid


def sample_metal(dir_in, n_g, roughness, anisotropic, fu, fv, fw, r1, r2,
                 regularize):
    alphax, alphay = anisotropic_alphas(roughness, anisotropic,
                                        clamp_roughness=False)
    # note: the reference metal *sampler* uses unclamped roughness^2
    # (disney_metal.h:95-99) while eval clamps — matched here.
    alphax = regularize_alpha(alphax, regularize)
    alphay = regularize_alpha(alphay, regularize)
    local_in = world_to_onb(fu, fv, fw, dir_in)
    local_h = sample_vndf(local_in, alphax, alphay, r1, r2)
    h = normalize(onb_to_world(fu, fv, fw, local_h))
    refl = normalize(-dir_in + 2.0 * dotk(dir_in, h) * h)
    valid = dot(refl, n_g) > 0.0
    return refl, valid


def sample_clearcoat(dir_in, n_g, clearcoat_gloss, fu, fv, fw, r1, r2,
                     regularize):
    alpha_g = (1.0 - clearcoat_gloss) * 0.1 + clearcoat_gloss * 0.001
    alpha_g = regularize_alpha(alpha_g, regularize)
    a2 = alpha_g * alpha_g
    cos2 = (1.0 - jnp.power(a2, 1.0 - r1)) / (1.0 - a2)
    cos_e = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_e = jnp.sqrt(jnp.clip(1.0 - cos2, 0.0, 1.0))
    az = 2.0 * PI * r2
    local_h = jnp.stack([sin_e * jnp.cos(az), sin_e * jnp.sin(az), cos_e],
                        axis=-1)
    flip = (dot(fw, dir_in) < 0.0)[..., None]
    fu2 = jnp.where(flip, -fu, fu)
    fv2 = jnp.where(flip, -fv, fv)
    fw2 = jnp.where(flip, -fw, fw)
    h = normalize(onb_to_world(fu2, fv2, fw2, local_h))
    refl = normalize(-dir_in + 2.0 * dotk(dir_in, h) * h)
    valid = dot(n_g, refl) > 0.0
    return refl, valid


def sample_rough_glass(dir_in, n_g, mat_eta, anisotropic, roughness,
                       fu, fv, fw, r1, r2, fres_rand, regularize):
    """Returns (dir_out, eta_out, valid). eta_out = 0 for reflection."""
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
    refl = normalize(-dir_in + 2.0 * dotk(dir_in, h) * h)
    refl_valid = (dot(refl, n_g) * in_geo) > 0.0

    h_dot_out_sq = 1.0 - (1.0 - h_dot_in * h_dot_in) / (eta * eta)
    h_flip = jnp.where((h_dot_in < 0.0)[..., None], -h, h)
    h_dot_out = jnp.sqrt(jnp.maximum(h_dot_out_sq, 0.0))
    refr = (-dir_in / eta[..., None]
            + (jnp.abs(h_dot_in) / eta - h_dot_out)[..., None] * h_flip)
    refr_valid = (h_dot_out_sq > 0.0) & ((dot(refr, n_g) * in_geo) < 0.0)
    # guard against NaN pdf on the generalized half-vector
    # (reference disney_glass.h:175-184)
    gen_h = normalize(dir_in + refr * eta[..., None])
    gh_dot_in = dot(gen_h, dir_in)
    refr_valid = refr_valid & ((1.0 - (1.0 - gh_dot_in ** 2) / (eta * eta)) > 0.0)

    dir_out = jnp.where(do_reflect[..., None], refl, refr)
    valid = jnp.where(do_reflect, refl_valid, refr_valid)
    eta_out = jnp.where(do_reflect, 0.0, eta)
    return dir_out, eta_out, valid
