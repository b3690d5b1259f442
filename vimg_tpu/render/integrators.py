"""Wavefront integrators: batched, mask-based re-derivations of the
reference's per-ray recursions.

- s_normal / g_normal (reference src/integrators/normals.cpp)
- material: forward path tracing, no NEE (src/integrators/mat_integrator.cpp)
- mis: NEE + BSDF sampling with the balance heuristic both ways
  (src/integrators/mis_integrator.cpp)

Each integrator maps a batch of (pixel, sample) ids to radiance. The bounce
loop is a ``lax.while_loop`` whose state is a SoA wavefront; early-return in
the reference becomes clearing the ``active`` mask. A bounded ``lax.scan``
variant backs the differentiable path (reverse-mode AD cannot cross
``while_loop``).

Known conscious divergence: the reference's MIS loop calls the base-class
``eval_pdf_pair`` for smooth Dielectric (returns eval=0 — glass goes black
under MIS, see material.h:56-60). We instead carry prev-bounce pdf/delta
flags and weight emissive hits with the canonical MIS rules, so glass works
under every integrator.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vimg_tpu.core import rng
from vimg_tpu.core.math import dot, length, normalize
from vimg_tpu.core.raycone import (propagate_reflect, propagate_refract,
                                   spread_angle_from_curvature)
from vimg_tpu.core.rng import Draw
from vimg_tpu.geometry import intersect
from vimg_tpu.lights import emitters
from vimg_tpu.materials import bsdf
from vimg_tpu.render import camera as cam_mod
from vimg_tpu.scene import ir

MIN_T = 1e-4                 # reference Ray.minT
SHADOW_EPS = 1e-4            # reference mis_integrator.cpp:62
ROULETTE_THRESHOLD = 5       # reference mis_integrator.cpp:31
ROULETTE_CLAMP = 0.95

# Detached-sampling gradient estimator: sampled directions, pdfs used as
# divisors/MIS weights, and RR decisions are stop_gradient'ed. E_p[f/p⊥] =
# ∫f for any fixed p, so ∇E = ∫∇f stays unbiased while autodiff never
# differentiates through the sampling warp or discrete choices. No-op for
# forward-only rendering.
_dt = jax.lax.stop_gradient


def _primary_rays(scene: ir.Scene, settings, pix, samp):
    """Pixel/sample ids -> camera rays, following the reference's pixel
    indexing (integrators.h:109-123): image_index = x + (H-1-y)*W, R2 AA
    offsets seeded by x + y + sample."""
    W, H = settings.width, settings.height
    x = (pix % W).astype(jnp.int32)
    y = (H - 1 - pix // W).astype(jnp.int32)
    ox, oy = rng.r2_sequence(x + y + samp)
    lens1, lens2 = rng.uniform2(pix, samp, 0, Draw.CAMERA_LENS)
    px = x.astype(jnp.float32) + ox
    py = y.astype(jnp.float32) + oy
    return cam_mod.generate_rays(scene.camera, px, py, lens1, lens2)


def _sky_gradient(rd):
    unit = normalize(rd)
    a = 0.5 * (unit[..., 1] + 1.0)
    white = jnp.asarray([1.0, 1.0, 1.0])
    blue = jnp.asarray([0.5, 0.7, 1.0])
    return (1.0 - a)[..., None] * white + a[..., None] * blue


def normal_integrator(scene, settings, tracer, pix, samp, shading=True):
    ro, rd, _, _ = _primary_rays(scene, settings, pix, samp)
    B = ro.shape[0]
    hr = tracer.closest(scene, ro, rd, jnp.full((B,), MIN_T),
                        jnp.full((B,), jnp.inf))
    hi = intersect.hit_info(scene, ro, rd, hr)
    n = hi.n_s if shading else hi.n_g
    col_hit = (n + 1.0) / 2.0
    return jnp.where(hr.hit[..., None], col_hit, _sky_gradient(rd))


def _balance(pdf1, pdf2):
    return pdf1 / jnp.maximum(pdf1 + pdf2, 1e-20)


def _geometric_term(look_from, point, normal):
    d = look_from - point
    dist2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20)
    dn = normalize(d)
    return jnp.abs(dot(normal, dn)) / dist2


def _roulette(throughput, eta_scale, rand):
    """Russian roulette continue/weight (reference mis_integrator.cpp:
    153-167). Returns (survive_mask, new_throughput)."""
    rr = _dt(throughput / eta_scale[..., None])
    max_val = jnp.minimum(jnp.max(rr, axis=-1), ROULETTE_CLAMP)
    survive = rand <= max_val
    new_tp = throughput / jnp.maximum(max_val, 1e-20)[..., None]
    return survive, new_tp


def material_integrator_loop(scene, settings, tracer, pix, samp,
                             bounded_depth=None):
    """Forward path tracing without NEE (reference mat_integrator.cpp)."""
    ro, rd, cone_w, cone_s = _primary_rays(scene, settings, pix, samp)
    B = ro.shape[0]
    # constants derived from ray data so shard_map varying axes match the
    # loop body's outputs
    zero = rd[..., 0] * 0.0
    zero3 = rd * 0.0

    state = dict(
        d=jnp.int32(0),
        ro=ro, rd=rd, cone_w=cone_w, cone_s=cone_s,
        throughput=1.0 + zero3,
        result=zero3,
        active=zero < 1.0,
        non_spec=zero > 1.0,
        eta_scale=1.0 + zero,
    )

    def body(s):
        d = s["d"]
        active = s["active"]
        hr = tracer.closest(scene, s["ro"], s["rd"], jnp.full((B,), MIN_T),
                            jnp.full((B,), jnp.inf))
        found = hr.hit & active
        missed = (~hr.hit) & active

        # miss -> background, path ends
        bg = emitters.background_emit(scene, s["rd"], s["cone_s"])
        result = s["result"] + jnp.where(missed[..., None],
                                         s["throughput"] * bg, 0.0)

        hi = intersect.hit_info(scene, s["ro"], s["rd"], hr)
        emitted_col = bsdf.emitted(scene, hi.mat_id, s["rd"], hi.n_s)

        b1, b2, b3, b4 = rng.uniform4(pix, samp, d, Draw.BSDF_SAMPLE)
        rands = {"lobe": b1, "u": b2, "v": b3, "fresnel": b4}
        sc = bsdf.sample_mat(scene, hi.mat_id, s["rd"], hi, rands,
                             s["non_spec"])

        absorbed = found & ~sc.valid
        result = result + jnp.where(absorbed[..., None],
                                    s["throughput"] * emitted_col, 0.0)

        cont = found & sc.valid
        non_spec = s["non_spec"] | (cont & ~sc.is_specular)

        # ray cone propagation (mat_integrator.cpp:36-50); dead weight
        # without any mip-mapped consumer
        refr = sc.eta != 0.0
        if scene.needs_cones:
            hit_dist = length(s["ro"] - hi.p)
            ssa = spread_angle_from_curvature(hi.curvature, s["cone_w"],
                                              s["rd"], hi.n_s)
            w_refl, s_refl = propagate_reflect(s["cone_w"], s["cone_s"],
                                               ssa * 2.0, hit_dist)
            w_refr, s_refr = propagate_refract(s["cone_w"], s["cone_s"],
                                               s["rd"], ssa, sc.eta, sc.wo)
            cone_w = jnp.where(refr, w_refr, w_refl)
            cone_s = jnp.where(refr, s_refr, s_refl)
        else:
            cone_w, cone_s = s["cone_w"], s["cone_s"]
        eta_scale = jnp.where(refr, s["eta_scale"] / (sc.eta * sc.eta),
                              s["eta_scale"])

        ratio = bsdf.eval_div_pdf(scene, hi.mat_id, s["rd"], sc.wo, hi,
                                  non_spec, cone_width=cone_w)
        throughput = jnp.where(cont[..., None],
                               s["throughput"] * (emitted_col + ratio),
                               s["throughput"])

        # russian roulette
        rr_rand = rng.uniform1(pix, samp, d, Draw.ROULETTE)
        survive, rr_tp = _roulette(throughput, eta_scale, rr_rand)
        do_rr = cont & (d > ROULETTE_THRESHOLD)
        throughput = jnp.where((do_rr & survive)[..., None], rr_tp, throughput)
        cont = cont & jnp.where(do_rr, survive, True)

        ro = jnp.where(cont[..., None], hi.p, s["ro"])
        rd = jnp.where(cont[..., None], sc.wo, s["rd"])

        return dict(d=d + 1, ro=ro, rd=rd, cone_w=cone_w, cone_s=cone_s,
                    throughput=throughput, result=result, active=cont,
                    non_spec=non_spec, eta_scale=eta_scale)

    state = _run_bounce_loop(body, state, settings, bounded_depth)
    return state["result"]


def _run_bounce_loop(body, state, settings, bounded_depth):
    """while_loop for pure rendering; lax.scan (reverse-mode differentiable)
    when a static bounce count is requested."""
    if bounded_depth is None:
        return jax.lax.while_loop(
            lambda s: (s["d"] < settings.max_depth) & jnp.any(s["active"]),
            body, state)
    out, _ = jax.lax.scan(lambda s, _: (body(s), None), state, None,
                          length=bounded_depth)
    return out


def mis_integrator_loop(scene, settings, tracer, pix, samp,
                        bounded_depth=None):
    """MIS path tracer (reference mis_integrator.cpp), wavefront form."""
    ro, rd, cone_w, cone_s = _primary_rays(scene, settings, pix, samp)
    B = ro.shape[0]
    minT = MIN_T + rd[..., 0] * 0.0
    infT = jnp.inf + rd[..., 0] * 0.0

    hr = tracer.closest(scene, ro, rd, minT, infT)
    hi = intersect.hit_info(scene, ro, rd, hr)
    zero = rd[..., 0] * 0.0
    zero3 = rd * 0.0

    # primary miss -> background directly (mis_integrator.cpp:36-38)
    bg = emitters.background_emit(scene, rd, cone_s)
    result = jnp.where((~hr.hit)[..., None], bg, zero3)

    # first hit emissive -> return emission (mis_integrator.cpp:39-42)
    emissive0 = bsdf.is_emissive(scene, hi.mat_id) & hr.hit
    em0 = bsdf.emitted(scene, hi.mat_id, rd, hi.n_s)
    result = result + jnp.where(emissive0[..., None], em0, 0.0)

    active = hr.hit & ~emissive0

    state = dict(
        d=jnp.int32(0), ro=ro, rd=rd, cone_w=cone_w, cone_s=cone_s,
        throughput=1.0 + zero3, result=result, active=active,
        non_spec=zero > 1.0, eta_scale=1.0 + zero,
        hit=hi,
    )

    n_lights = scene.n_lights()

    def body(s):
        d = s["d"]
        active = s["active"]
        hi = s["hit"]
        tp = s["throughput"]
        result = s["result"]

        mat_delta = bsdf.is_delta(scene, hi.mat_id)
        if scene.needs_cones:
            hit_dist = length(s["ro"] - hi.p)
            ssa = spread_angle_from_curvature(hi.curvature, s["cone_w"],
                                              s["rd"], hi.n_s)
            nee_cone_w, nee_cone_s = propagate_reflect(
                s["cone_w"], s["cone_s"], ssa * 2.0, hit_dist)
        else:
            nee_cone_w, nee_cone_s = s["cone_w"], s["cone_s"]

        # texture inputs fetched once per bounce (shared by the NEE
        # eval, BSDF sample and bounce eval — see bsdf.texture_inputs)
        tex = bsdf.texture_inputs(scene, hi.mat_id, hi, nee_cone_w,
                                  s["rd"])

        # ---- light sampling (NEE) -------------------------------------
        if n_lights > 0:
            pick, lr1, lr2, _rr = rng.uniform4(pix, samp, d,
                                               Draw.LIGHT_SAMPLE)
            ls = emitters.sample_lights(scene, hi.p, pick, lr1, lr2)
            # detached estimator: the sampling warp (wi), pdf divisor and
            # MIS weights are detached; the geometric term G stays
            # differentiable — it is part of the integrand (light falloff
            # w.r.t. the hit point), not of the sampling density
            ls = emitters.LightSample(radiance=ls.radiance, wi=_dt(ls.wi),
                                      pdf=_dt(ls.pdf), dist=_dt(ls.dist),
                                      G=ls.G)
            do_nee = active & ~mat_delta & (ls.pdf != 0.0)

            shadow_max = jnp.where(jnp.isfinite(ls.dist),
                                   ls.dist - SHADOW_EPS, infT)
            occl = tracer.occluded(scene, hi.p, ls.wi, minT, shadow_max)

            f, mpdf = bsdf.eval_pdf(scene, hi.mat_id, s["rd"], ls.wi, hi,
                                    s["non_spec"], cone_width=nee_cone_w,
                                    tex=tex)
            ok = do_nee & ~occl & (mpdf != 0.0) & ~jnp.isnan(mpdf)
            w = _dt(_balance(ls.pdf, _dt(mpdf) * ls.G))
            contrib = (tp * f * ls.radiance
                       * (w * ls.G / jnp.maximum(ls.pdf, 1e-20))[..., None])
            contrib = jnp.where(jnp.isnan(contrib), 0.0, contrib)
            result = result + jnp.where(ok[..., None], contrib, 0.0)

        # ---- BSDF sampling --------------------------------------------
        b1, b2, b3, b4 = rng.uniform4(pix, samp, d, Draw.BSDF_SAMPLE)
        rands = {"lobe": b1, "u": b2, "v": b3, "fresnel": b4}
        sc = bsdf.sample_mat(scene, hi.mat_id, s["rd"], hi, rands,
                             s["non_spec"], tex=tex)
        sc = bsdf.ScatterSample(wo=_dt(sc.wo), eta=_dt(sc.eta),
                                is_specular=sc.is_specular, valid=sc.valid)
        cont = active & sc.valid          # absorbed paths just stop
        non_spec = s["non_spec"] | (cont & ~sc.is_specular)

        refr = sc.eta != 0.0
        if scene.needs_cones:
            w_refr, s_refr = propagate_refract(s["cone_w"], s["cone_s"],
                                               s["rd"], ssa, sc.eta, sc.wo)
            cone_w = jnp.where(refr, w_refr, nee_cone_w)
            cone_s = jnp.where(refr, s_refr, nee_cone_s)
        else:
            cone_w, cone_s = nee_cone_w, nee_cone_s
        eta_scale = jnp.where(refr, s["eta_scale"] / (sc.eta * sc.eta),
                              s["eta_scale"])

        f2, pdf2 = bsdf.eval_pdf(scene, hi.mat_id, s["rd"], sc.wo, hi,
                                 non_spec, cone_width=cone_w, tex=tex)
        # NaN pdf suppression (mis_integrator.cpp:108-114)
        cont = cont & ~jnp.isnan(pdf2)

        # delta == smooth dielectric: eval/pdf == 1 analytically
        ratio = jnp.where(mat_delta[..., None], 1.0,
                          f2 / jnp.maximum(_dt(pdf2), 1e-20)[..., None])
        ratio = jnp.where(jnp.isnan(ratio) | jnp.isinf(ratio), 0.0, ratio)
        tp = jnp.where(cont[..., None], tp * ratio, tp)

        # ---- next bounce ----------------------------------------------
        nro = hi.p
        nrd = sc.wo
        hr2 = tracer.closest(scene, nro, nrd, minT, infT)
        hi2 = intersect.hit_info(scene, nro, nrd, hr2)

        found = cont & hr2.hit
        missed = cont & ~hr2.hit

        # emissive hit -> MIS-weighted emission, path ends
        hit_emissive = found & bsdf.is_emissive(scene, hi2.mat_id)
        em = bsdf.emitted(scene, hi2.mat_id, nrd, hi2.n_s)
        light_pdf = emitters.surf_pdf(scene, hr2.prim_type, hr2.prim_id,
                                      nro, hi2.p, nrd) / max(n_lights, 1)
        G2 = _geometric_term(nro, hi2.p, hi2.n_g)
        # pdf2*G2 can overflow to inf (GGX spike x grazing G2) and
        # _balance(inf, x) = NaN; clamping preserves the weight->1 limit
        w_hit = _dt(jnp.where(mat_delta | (pdf2 == 0.0), 1.0,
                              _balance(jnp.minimum(pdf2 * G2, 1e30),
                                       light_pdf)))
        result = result + jnp.where(hit_emissive[..., None],
                                    tp * w_hit[..., None] * em, 0.0)

        # miss -> env compensation (mis_integrator.cpp:173-186)
        if scene.bg_is_emissive:
            bgp = emitters.background_pdf(scene, nrd) / max(n_lights, 1)
            w_bg = _dt(jnp.where(mat_delta | (pdf2 == 0.0), 1.0,
                                 _balance(pdf2, bgp)))
            bg2 = emitters.background_emit(scene, nrd, cone_s)
            result = result + jnp.where(missed[..., None],
                                        tp * w_bg[..., None] * bg2, 0.0)

        carry_on = found & ~hit_emissive

        # russian roulette (after the bounce hit a non-light surface)
        rr_rand = rng.uniform1(pix, samp, d, Draw.ROULETTE)
        survive, rr_tp = _roulette(tp, eta_scale, rr_rand)
        do_rr = carry_on & (d > ROULETTE_THRESHOLD)
        tp = jnp.where((do_rr & survive)[..., None], rr_tp, tp)
        carry_on = carry_on & jnp.where(do_rr, survive, True)

        m3 = carry_on[..., None]
        new_hit = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                carry_on.reshape(carry_on.shape + (1,) * (new.ndim - 1)),
                new, old), hi2, hi)

        return dict(
            d=d + 1,
            ro=jnp.where(m3, nro, s["ro"]),
            rd=jnp.where(m3, nrd, s["rd"]),
            cone_w=jnp.where(carry_on, cone_w, s["cone_w"]),
            cone_s=jnp.where(carry_on, cone_s, s["cone_s"]),
            throughput=tp, result=result, active=carry_on,
            non_spec=non_spec, eta_scale=eta_scale, hit=new_hit)

    state = _run_bounce_loop(body, state, settings, bounded_depth)
    return state["result"]


INTEGRATORS = {
    "s_normal": functools.partial(normal_integrator, shading=True),
    "g_normal": functools.partial(normal_integrator, shading=False),
    "material": material_integrator_loop,
    "mis": mis_integrator_loop,
}


def trace_radiance(scene, settings, tracer, pix, samp, integrator=None,
                   bounded_depth=None):
    name = integrator or settings.integrator
    fn = INTEGRATORS[name]
    if name in ("s_normal", "g_normal"):
        return fn(scene, settings, tracer, pix, samp)
    return fn(scene, settings, tracer, pix, samp, bounded_depth=bounded_depth)
