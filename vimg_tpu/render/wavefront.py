"""Persistent-wavefront MIS renderer with lane refill.

The masked while_loop integrator (render/integrators.py) runs until the
LAST path of a batch dies: with mean path length ~4 and a Russian-roulette
tail of 60+ bounces, lane utilization is a few percent. This module keeps
every lane busy: each superstep advances every lane by one path segment and
immediately refills terminated lanes with fresh (pixel, sample) work from a
global counter — the TPU equivalent of persistent-threads wavefront path
tracing (and of the reference's tile work queue, integrators.h:57-101).

Per superstep (one jitted call, scene closed over):
  1. closest-trace each lane's pending ray (camera ray for fresh lanes,
     BSDF bounce ray for continuing lanes); resolve emissive/miss
     termination with the MIS weight carried from the sampling step
  2. NEE at the surviving hits (shadow trace + balance heuristic)
  3. sample the BSDF -> next pending ray; Russian roulette
  4. scatter-add finished paths to the film; refill lanes from the counter

State lives across supersteps as a donated pytree; the host loop only
checks a scalar "all done" flag.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.core import rng
from vimg_tpu.core.math import dot, length, normalize
from vimg_tpu.core.raycone import (propagate_reflect, propagate_refract,
                                   spread_angle_from_curvature)
from vimg_tpu.core.rng import Draw
from vimg_tpu.geometry import intersect
from vimg_tpu.lights import emitters
from vimg_tpu.materials import bsdf
from vimg_tpu.render.integrators import (MIN_T, ROULETTE_CLAMP,
                                         ROULETTE_THRESHOLD, SHADOW_EPS,
                                         _balance, _geometric_term,
                                         _primary_rays, _sky_gradient)
from vimg_tpu.scene import ir

_dt = jax.lax.stop_gradient

# lane-count sweep on v5e (disney_spheres, 32spp): per-segment cost grows
# superlinearly with lane count (scatter/cumsum machinery): 128k lanes ->
# 5.3 Mpaths/s, 512k -> 4.6, 1M -> 3.9, 2M -> 2.7. 128k is the sweet spot
# default; settings.batch_size overrides in either direction (mesh scenes
# amortize sort/dispatch better at larger batches — round-4 batch sweep,
# summarized in ROADMAP.md round-4 notes item 3).
MAX_LANES = 1 << 17

# primary pre-pass table cap: 52 B/path (first hit + camera ray + cone);
# 2^23 paths = 436 MB HBM. Bigger frames fall back to in-superstep
# primary tracing (or render in sample slabs).
PREPASS_MAX_TOTAL = 1 << 23


def morton_pixel_order(W, H):
    """Pixel ids (y*W + x) in Morton (Z-curve) order — the wavefront's
    work-dispensing order. The refill hands out (pixel, sample) work by a
    global counter; in raster order the in-flight set is a thin full-width
    strip, in Morton order it is a compact 2D block, so every downstream
    coherence mechanism (per-trace Morton sorts, tile unions in the
    cluster walk) sees a spatially tighter ray population. The TPU
    analogue of the reference's 8x8 tile work list (integrators.h:57-65)
    at frame scale."""
    xs = np.arange(W, dtype=np.uint32)
    ys = np.arange(H, dtype=np.uint32)
    X, Y = np.meshgrid(xs, ys)                 # (H, W)

    def spread(v):
        v = (v | (v << 8)) & np.uint32(0x00FF00FF)
        v = (v | (v << 4)) & np.uint32(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint32(0x33333333)
        v = (v | (v << 1)) & np.uint32(0x55555555)
        return v

    code = (spread(X) << np.uint32(1)) | spread(Y)
    pid = (Y.astype(np.int64) * W + X).ravel()
    order = np.argsort(code.ravel(), kind="stable")
    return pid[order].astype(np.int32)


def init_state(B, prepass=False):
    # NB: every field gets its OWN buffer (donation forbids aliased args)
    def z():
        return jnp.zeros((B,), jnp.float32)

    def z3():
        return jnp.zeros((B, 3), jnp.float32)

    def zi():
        return jnp.zeros((B,), jnp.int32)

    def zb():
        return jnp.zeros((B,), bool)

    extra = {}
    if prepass:
        # pre-traced first hit of the lane's pending camera ray (valid
        # only while ``fresh``) — gathered from the pre-pass table at
        # refill, consumed instead of tracing in the superstep
        extra = dict(pre_t=z(), pre_ptype=zi(), pre_pid=zi(),
                     pre_u=z(), pre_v=z())
    return dict(
        **extra,
        # lane bookkeeping
        alive=zb(),                # lane holds an in-flight path
        pix=zi(), samp=zi(), d=zi(),
        # pending ray (to be traced next superstep)
        ro=z3(), rd=z3(), cone_w=z(), cone_s=z(),
        fresh=zb(),                # pending ray is a camera ray
        throughput=z3() + 1.0, result=z3(),
        non_spec=zb(), eta_scale=z() + 1.0,
        prev_pdf=z(), prev_delta=zb(),
        next_work=jnp.int32(0),
        n_done=jnp.int32(0),
        samp_off=jnp.int32(0),
        # perf counters: path segments processed / shadow rays cast
        # (the reference has no ray counters — BASELINE.md asks for rays/s;
        # f32 is exact up to 16M per superstep increment, totals ~1e11 keep
        # ~7 significant digits which is plenty for a throughput metric)
        n_segments=jnp.float32(0),
        n_shadow=jnp.float32(0),
    )


def make_superstep(scene: ir.Scene, settings: ir.RenderSettings, tracer,
                   total_paths: int, ablate=frozenset(),
                   use_morton=False, use_prepass=False):
    """Returns superstep(state, accum, aux=None) -> (state, accum).

    ``ablate`` is a perf-diagnosis hook (tools/ablate_superstep.py): a set of
    stage names whose work is replaced by cheap stand-ins so on-chip timing
    isolates each stage's cost. Production callers leave it empty. Keys:
    film, cumsum, nee, shadow, beval, bsample, trace, hitinfo, bg.

    ``use_morton``: work ids map to pixels through ``aux["morton_pix"]``
    (see morton_pixel_order) instead of raster order.
    ``use_prepass``: fresh lanes consume first hits from the pre-pass
    table ``aux["pre_*"]`` instead of tracing their camera ray — the
    superstep's closest trace then only carries bounce rays (the round-4
    headroom item (c): primaries are tile-coherent and cheap in a
    dedicated pass; see trace_primaries).
    """
    ab = frozenset(ablate)
    spp = settings.spp
    n_lights = scene.n_lights()

    def refill(s, accum, finished, aux):
        """Retire finished lanes (scatter-add to film) and pull new work.

        The film is (3, H*W): per-channel 1-D scatter-adds. Profiling showed
        a (B,3)->(HW,3) scatter inside the while_loop gets a transposed
        T(4,128) layout costing 42 ms/superstep; three flat scatters cost
        ~1 ms total."""
        contrib = jnp.where(finished[:, None], s["result"], 0.0)
        if "film" in ab:   # keep contrib alive but skip the scatters
            accum = accum + jnp.sum(contrib) * 1e-30
        else:
            accum = accum.at[0, s["pix"]].add(contrib[:, 0])
            accum = accum.at[1, s["pix"]].add(contrib[:, 1])
            accum = accum.at[2, s["pix"]].add(contrib[:, 2])
        n_done = s["n_done"] + jnp.sum(finished, dtype=jnp.int32)

        free = finished | ~s["alive"]
        if "cumsum" in ab:  # static slot assignment (skips work; perf only)
            slot = jnp.arange(free.shape[0], dtype=jnp.int32)
        else:
            slot = jnp.cumsum(free.astype(jnp.int32)) - 1
        new_k = s["next_work"] + slot
        take = free & (new_k < total_paths)
        next_work = s["next_work"] + jnp.sum(take, dtype=jnp.int32)

        safe_k = jnp.where(take, new_k, 0)
        if use_morton:
            raw_pix = aux["morton_pix"][safe_k // spp]
        else:
            raw_pix = (safe_k // spp).astype(jnp.int32)
        new_pix = jnp.where(take, raw_pix, s["pix"])
        new_samp = jnp.where(take,
                             (new_k % spp).astype(jnp.int32) + s["samp_off"],
                             s["samp"])
        pre = {}
        if use_prepass:
            # ONE contiguous row gather: first hit + the stored camera
            # ray (not a recomputation: ray generation is only
            # ulp-reproducible across jit contexts, and hit & shading
            # must see the SAME ray)
            row = aux["pre_tab"][safe_k]          # (B, 16)
            ro = row[:, 5:8]
            rd = row[:, 8:11]
            cw = row[:, 11]
            cs = row[:, 12]
            vals = dict(pre_t=row[:, 0],
                        pre_ptype=row[:, 1].astype(jnp.int32),
                        pre_pid=row[:, 2].astype(jnp.int32),
                        pre_u=row[:, 3], pre_v=row[:, 4])
            pre = {f: jnp.where(take, vals[f], s[f]) for f in vals}
        else:
            ro, rd, cw, cs = _primary_rays(scene, settings, new_pix,
                                           new_samp)

        m = take[:, None]
        z = jnp.zeros_like(s["cone_w"])
        s = dict(
            s,
            **pre,
            alive=(s["alive"] & ~finished) | take,
            pix=new_pix, samp=new_samp,
            d=jnp.where(take, 0, s["d"]),
            ro=jnp.where(m, ro, s["ro"]),
            rd=jnp.where(m, rd, s["rd"]),
            cone_w=jnp.where(take, cw, s["cone_w"]),
            cone_s=jnp.where(take, cs, s["cone_s"]),
            fresh=jnp.where(take, True, s["fresh"]),
            throughput=jnp.where(m, 1.0, s["throughput"]),
            result=jnp.where(m, 0.0, s["result"]),
            non_spec=jnp.where(take, False, s["non_spec"]),
            eta_scale=jnp.where(take, 1.0, s["eta_scale"]),
            prev_pdf=jnp.where(take, 0.0, s["prev_pdf"]),
            prev_delta=jnp.where(take, False, s["prev_delta"]),
            next_work=next_work, n_done=n_done,
        )
        return s, accum

    def superstep(s, accum, aux=None):
        B = s["ro"].shape[0]
        alive = s["alive"]
        minT = MIN_T + s["cone_w"] * 0.0
        infT = jnp.inf + s["cone_w"] * 0.0

        n_alive = jnp.sum(alive, dtype=jnp.float32)
        s = dict(s, n_segments=s["n_segments"] + n_alive)

        # ---- 1. trace pending rays ------------------------------------
        if "trace" in ab:
            z1 = s["cone_w"] * 0.0
            hr = intersect.HitResult(
                t=1.0 + z1 + s["rd"][:, 0] * 1e-12,
                prim_type=jnp.full((B,), ir.PRIM_SPHERE, jnp.int32),
                prim_id=jnp.zeros((B,), jnp.int32),
                u=0.3 + z1, v=0.3 + z1)
        else:
            # dead lanes (exhausted work queue / tail) get maxT = -inf:
            # they keep no tree node live in the tile-union cluster walk
            # instead of re-tracing their stale rays at full cost (round-2
            # meshdiag: 39% occupancy => ~60% of traced lane-slots were
            # dead, and each polluted its tile's cluster union). With the
            # pre-pass, fresh lanes are inert too: their first hit is
            # already in the state (gathered from the pre table at refill)
            live_trace = alive & ~s["fresh"] if use_prepass else alive
            hr = tracer.closest(scene, s["ro"], s["rd"], minT,
                                jnp.where(live_trace, infT, -jnp.inf))
            if use_prepass:
                fr = s["fresh"]
                hr = intersect.HitResult(
                    t=jnp.where(fr, s["pre_t"], hr.t),
                    prim_type=jnp.where(fr, s["pre_ptype"], hr.prim_type),
                    prim_id=jnp.where(fr, s["pre_pid"], hr.prim_id),
                    u=jnp.where(fr, s["pre_u"], hr.u),
                    v=jnp.where(fr, s["pre_v"], hr.v))
        if "hitinfo" in ab:
            n = -s["rd"]
            hi = intersect.HitInfo(
                mat_id=jnp.zeros((B,), jnp.int32),
                p=s["ro"] + s["rd"] * hr.t[:, None], n_s=n, n_g=n,
                uv=n[:, :2] * 0.0, mr_uv=n[:, :2] * 0.0,
                tangent=jnp.stack([n[:, 1], -n[:, 0], n[:, 2] * 0.0], -1),
                bitangent=jnp.stack([n[:, 2] * 0.0, n[:, 2], -n[:, 1]], -1),
                prim_area=1.0 + hr.t * 0.0, uv_area=1e-6 + hr.t * 0.0,
                curvature=hr.t * 0.0,
                light_id=-jnp.ones((B,), jnp.int32))
        else:
            hi = intersect.hit_info(scene, s["ro"], s["rd"], hr)
        found = alive & hr.hit
        missed = alive & ~hr.hit

        emissive = found & bsdf.is_emissive(scene, hi.mat_id)
        em = bsdf.emitted(scene, hi.mat_id, s["rd"], hi.n_s)

        # MIS weight for hitting a light via BSDF sampling; fresh camera
        # rays and delta-previous-bounce use weight 1
        light_pdf = emitters.surf_pdf(scene, hr.prim_type, hr.prim_id,
                                      s["ro"], hi.p, s["rd"]) / max(n_lights, 1)
        G2 = _geometric_term(s["ro"], hi.p, hi.n_g)
        # clamp pdf*G2: overflow to inf makes _balance(inf, x) = NaN (the
        # physical limit of a huge BSDF pdf is weight -> 1)
        w_hit = jnp.where(s["fresh"] | s["prev_delta"] | (s["prev_pdf"] == 0.0),
                          1.0, _balance(jnp.minimum(
                              _dt(s["prev_pdf"]) * G2, 1e30), light_pdf))
        result = s["result"] + jnp.where(
            emissive[:, None], s["throughput"] * _dt(w_hit)[:, None] * em, 0.0)

        # background on miss: direct for fresh rays (mis_integrator.cpp:36-38),
        # MIS-weighted compensation otherwise (mis_integrator.cpp:173-186)
        if "bg" in ab:
            bg = s["rd"] * 0.0 + 0.1
            bgp = s["rd"][:, 0] * 0.0 + 0.25
        else:
            bg = emitters.background_emit(scene, s["rd"], s["cone_s"])
            bgp = emitters.background_pdf(scene, s["rd"]) / max(n_lights, 1)
        w_bg = jnp.where(s["fresh"] | s["prev_delta"] | (s["prev_pdf"] == 0.0),
                         1.0, _balance(_dt(s["prev_pdf"]), bgp))
        add_bg = missed & (s["fresh"] | scene.bg_is_emissive)
        result = result + jnp.where(
            add_bg[:, None], s["throughput"] * _dt(w_bg)[:, None] * bg, 0.0)

        terminated = missed | emissive
        cont = found & ~emissive

        # russian roulette on continuing paths (depth from path state)
        rr_rand = rng.uniform1(s["pix"], s["samp"], s["d"], Draw.ROULETTE)
        rr = _dt(s["throughput"] / s["eta_scale"][:, None])
        max_val = jnp.minimum(jnp.max(rr, axis=-1), ROULETTE_CLAMP)
        survive = rr_rand <= max_val
        do_rr = cont & (s["d"] > ROULETTE_THRESHOLD) & ~s["fresh"]
        throughput = jnp.where(
            (do_rr & survive)[:, None],
            s["throughput"] / jnp.maximum(max_val, 1e-20)[:, None],
            s["throughput"])
        rr_kill = do_rr & ~survive
        terminated = terminated | rr_kill
        cont = cont & ~rr_kill

        # ---- 2. NEE ----------------------------------------------------
        if scene.needs_cones:
            hit_dist = length(s["ro"] - hi.p)
            ssa = spread_angle_from_curvature(hi.curvature, s["cone_w"],
                                              s["rd"], hi.n_s)
            nee_cone_w, nee_cone_s = propagate_reflect(
                s["cone_w"], s["cone_s"], ssa * 2.0, hit_dist)
        else:
            nee_cone_w, nee_cone_s = s["cone_w"], s["cone_s"]

        mat_delta = bsdf.is_delta(scene, hi.mat_id)
        # fetch texture inputs ONCE per segment at the at-hit cone — the
        # NEE eval, BSDF sample and bounce eval below all shade the same
        # hit (the reference reads textures once per hit, principled.cpp:
        # 15-20; deduplicates ~2/3 of the atlas gathers on textured
        # scenes)
        tex = None if ("beval" in ab and "bsample" in ab) else \
            bsdf.texture_inputs(scene, hi.mat_id, hi, nee_cone_w, s["rd"])
        if n_lights > 0 and "nee" not in ab:
            pick, lr1, lr2, _ = rng.uniform4(s["pix"], s["samp"], s["d"],
                                             Draw.LIGHT_SAMPLE)
            ls = emitters.sample_lights(scene, hi.p, pick, lr1, lr2)
            # G stays differentiable: part of the integrand, not the
            # sampling density (see integrators.py NEE note)
            ls = emitters.LightSample(radiance=ls.radiance, wi=_dt(ls.wi),
                                      pdf=_dt(ls.pdf), dist=_dt(ls.dist),
                                      G=ls.G)
            do_nee = cont & ~mat_delta & (ls.pdf != 0.0)
            # lanes not shooting a shadow ray walk with -inf (see above)
            shadow_max = jnp.where(jnp.isfinite(ls.dist),
                                   ls.dist - SHADOW_EPS, infT)
            shadow_max = jnp.where(do_nee, shadow_max, -jnp.inf)
            if "shadow" in ab:
                occl = (ls.wi[:, 0] > 2.0)   # never true, depends on inputs
            else:
                occl = tracer.occluded(scene, hi.p, ls.wi, minT, shadow_max)
            s = dict(s, n_shadow=s["n_shadow"]
                     + jnp.sum(do_nee, dtype=jnp.float32))
            if "beval" in ab:
                mpdf = jnp.abs(dot(ls.wi, hi.n_s)) * (1.0 / jnp.pi)
                f = hi.n_s * 0.0 + mpdf[:, None] * 0.5
            else:
                f, mpdf = bsdf.eval_pdf(scene, hi.mat_id, s["rd"], ls.wi, hi,
                                        s["non_spec"], cone_width=nee_cone_w,
                                        tex=tex)
            ok = do_nee & ~occl & (mpdf != 0.0) & ~jnp.isnan(mpdf)
            w = _dt(_balance(ls.pdf, _dt(mpdf) * ls.G))
            contrib = (throughput * f * ls.radiance
                       * (w * ls.G / jnp.maximum(ls.pdf, 1e-20))[:, None])
            contrib = jnp.where(jnp.isnan(contrib), 0.0, contrib)
            result = result + jnp.where(ok[:, None], contrib, 0.0)

        # ---- 3. BSDF sampling -----------------------------------------
        b1, b2, b3, b4 = rng.uniform4(s["pix"], s["samp"], s["d"],
                                      Draw.BSDF_SAMPLE)
        rands = {"lobe": b1, "u": b2, "v": b3, "fresnel": b4}
        if "bsample" in ab:
            from vimg_tpu.core.math import onb_to_world
            from vimg_tpu.core.warps import sample_hemisphere_cosine
            d = onb_to_world(hi.tangent, hi.bitangent, hi.n_s,
                             sample_hemisphere_cosine(b2, b3))
            sc = bsdf.ScatterSample(wo=d, eta=b1 * 0.0,
                                    is_specular=b1 > 2.0, valid=b1 < 2.0)
        else:
            sc = bsdf.sample_mat(scene, hi.mat_id, s["rd"], hi, rands,
                                 s["non_spec"], tex=tex)
        sc = bsdf.ScatterSample(wo=_dt(sc.wo), eta=_dt(sc.eta),
                                is_specular=sc.is_specular, valid=sc.valid)
        absorbed = cont & ~sc.valid
        terminated = terminated | absorbed
        cont = cont & sc.valid
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

        if "beval" in ab:
            pdf2 = jnp.abs(dot(sc.wo, hi.n_s)) * (1.0 / jnp.pi)
            f2 = hi.n_s * 0.0 + pdf2[:, None] * 0.5
        else:
            f2, pdf2 = bsdf.eval_pdf(scene, hi.mat_id, s["rd"], sc.wo, hi,
                                     non_spec, cone_width=cone_w, tex=tex)
        nan_pdf = jnp.isnan(pdf2)
        terminated = terminated | (cont & nan_pdf)
        cont = cont & ~nan_pdf

        # delta materials are smooth dielectrics: eval/pdf == 1 analytically
        # (reference Dielectric::eval_div_pdf) — no need to re-evaluate
        ratio = jnp.where(mat_delta[:, None], 1.0,
                          f2 / jnp.maximum(_dt(pdf2), 1e-20)[:, None])
        ratio = jnp.where(jnp.isnan(ratio) | jnp.isinf(ratio), 0.0, ratio)
        throughput = jnp.where(cont[:, None], throughput * ratio, throughput)

        m = cont[:, None]
        s = dict(
            s,
            ro=jnp.where(m, hi.p, s["ro"]),
            rd=jnp.where(m, sc.wo, s["rd"]),
            cone_w=jnp.where(cont, cone_w, s["cone_w"]),
            cone_s=jnp.where(cont, cone_s, s["cone_s"]),
            fresh=jnp.where(alive, False, s["fresh"]),
            throughput=throughput, result=result,
            non_spec=non_spec, eta_scale=eta_scale,
            prev_pdf=jnp.where(cont, pdf2, s["prev_pdf"]),
            prev_delta=jnp.where(cont, mat_delta, s["prev_delta"]),
            d=jnp.where(cont, s["d"] + 1, s["d"]),
        )
        return refill(s, accum, terminated, aux)

    return superstep


def make_run(scene, settings, tracer, total_paths, B, max_supersteps=None,
             use_morton=False, use_prepass=False):
    """Jitted run-to-completion: the whole frame in ONE device call —
    supersteps loop on-device (no host syncs, no per-call arg overhead).
    ``aux`` (morton pixel order / pre-pass tables) rides as a jit ARGUMENT
    — the tables change per frame, so closing over them would bake them
    as constants and recompile every render."""
    superstep = make_superstep(scene, settings, tracer, total_paths,
                               use_morton=use_morton,
                               use_prepass=use_prepass)
    if max_supersteps is None:
        # safety valve far above any real superstep count
        max_supersteps = 70 * (total_paths // B + 1) + 8192

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(state, accum, aux):
        def cond(c):
            s, _, it = c
            return (s["n_done"] < total_paths) & (it < max_supersteps)

        def body(c):
            s, a, it = c
            s, a = superstep(s, a, aux)
            return s, a, it + 1

        s, a, it = jax.lax.while_loop(cond, body,
                                      (state, accum, jnp.int32(0)))
        return s, a, it

    return run


# --- primary pre-pass ------------------------------------------------------

_PREPASS_CACHE = {}


def trace_primaries(scene, settings, tracer, morton_pix, total,
                    sample_offset=0, chunk_B=None):
    """Trace every camera ray of the frame in (Morton pixel, sample) work
    order; returns a table indexed by work id holding the first hit
    ("pre_t", "pre_ptype", "pre_pid", "pre_u", "pre_v") AND the ray that
    produced it ("pre_ro", "pre_rd", "pre_cw", "pre_cs").

    Consecutive work ids share a pixel (spp-minor) and Morton-adjacent
    pixels (major), so each cluster-walk tile covers a tiny frustum —
    primaries trace at pixel-tile coherence (the megakernel's regime)
    instead of riding the superstep's mixed Morton-sorted batches.

    The rays ride in the table because camera-ray generation is only
    reproducible to ~1 ulp across jit contexts (XLA constant-folds
    different camera subexpressions per graph) — the refill gathers the
    EXACT ray the hit was traced with, so hit and shading state can
    never disagree (and fresh lanes skip the per-superstep camera math
    entirely).

    The table is ONE packed (total, 16) f32 array (ints bitcast) so the
    refill pays a single contiguous row gather per superstep instead of
    nine strided ones (measured: separate-field gathers cost more than
    the pre-pass saved)."""
    spp = settings.spp
    # default the chunk size to the caller's superstep batch so the
    # cluster kernel keeps the SAME (n_tiles, ...) config — a new tile
    # count would be a fresh cold Mosaic compile
    CB = chunk_B or min(1 << 20, -(-total // 8192) * 8192)
    n_chunks = -(-total // CB)

    key = (id(scene), id(tracer), settings, total, CB)
    hit = _PREPASS_CACHE.get(key)
    if hit is not None and hit[0] is scene and hit[1] is tracer:
        chunk = hit[2]
    else:
        @jax.jit
        def chunk(mpix, k0, samp_off):
            k = k0 + jnp.arange(CB, dtype=jnp.int32)
            valid = k < total
            ks = jnp.where(valid, k, 0)
            pix = mpix[ks // spp]
            samp = ks % spp + samp_off
            ro, rd, cw, cs = _primary_rays(scene, settings, pix, samp)
            z = ro[:, 0] * 0.0
            hr = tracer.closest(scene, ro, rd, MIN_T + z,
                                jnp.where(valid, jnp.inf, -jnp.inf),
                                sort=False)
            # int ids ride as exact f32 VALUES (ids < 2^24, the same
            # guard ClusterData enforces for its hit codes) — a bitcast
            # would make small ids f32 denormals, which TPU flushes to 0
            f32 = jnp.float32
            cols = [hr.t, hr.prim_type.astype(f32), hr.prim_id.astype(f32),
                    hr.u, hr.v,
                    ro[:, 0], ro[:, 1], ro[:, 2],
                    rd[:, 0], rd[:, 1], rd[:, 2], cw, cs,
                    z, z, z]                      # pad to 16 for alignment
            return jnp.stack(cols, axis=1)

        if len(_PREPASS_CACHE) > 16:
            _PREPASS_CACHE.clear()
        _PREPASS_CACHE[key] = (scene, tracer, chunk)

    outs = [chunk(morton_pix, jnp.int32(c * CB),
                  jnp.int32(sample_offset)) for c in range(n_chunks)]
    tab = outs[0] if n_chunks == 1 else jnp.concatenate(outs)
    return {"pre_tab": tab}


_RUN_CACHE = {}


def _cached_run(scene, settings, tracer, total, B, use_morton,
                use_prepass):
    """make_run rebuilds (and re-jits) the whole run-to-completion loop —
    10s of seconds of compile on mesh scenes. Cache the compiled fn per
    (scene, tracer, settings, shapes): repeat renders (slabs, benches,
    sweeps) must pay compile once. Holds scene/tracer refs so ids can't
    be reused while cached."""
    key = (id(scene), id(tracer), settings, total, B, use_morton,
           use_prepass)
    hit = _RUN_CACHE.get(key)
    if hit is not None and hit[0] is scene and hit[1] is tracer:
        return hit[2]
    run = make_run(scene, settings, tracer, total, B,
                   use_morton=use_morton, use_prepass=use_prepass)
    if len(_RUN_CACHE) > 16:
        _RUN_CACHE.clear()
    _RUN_CACHE[key] = (scene, tracer, run)
    return run


def _want_prepass(scene, tracer, total):
    """Opt-in (VIMG_PREPASS=1): measured on terrain-100k (r5_probe_a3)
    the pre-pass loses to Morton work order alone (0.83 vs 0.89 Mpaths/s)
    — Morton-ordered fresh lanes sort into near-free pure-camera tiles in
    the superstep trace anyway, so pre-tracing them saves less than the
    table machinery costs. Kept working+tested for regimes where the
    walk is leaf-dominated (exact parity: test_prepass_render_parity)."""
    import os
    if not os.environ.get("VIMG_PREPASS") or \
            os.environ.get("VIMG_NO_PREPASS"):
        return False
    return (getattr(tracer, "presortable", False)
            and scene.n_tris() > 64
            and scene.n_tris() < (1 << 24)   # ids ride as exact f32 values
            and total <= PREPASS_MAX_TOTAL)


def render_wavefront(scene: ir.Scene, settings: ir.RenderSettings,
                     tracer=None, progress=False, sample_offset=0,
                     return_stats=False):
    """Full-frame MIS render with the refill wavefront."""
    import os
    import time
    from vimg_tpu.geometry.trace import make_tracer
    tracer = tracer or make_tracer(scene)
    W, H, spp = settings.width, settings.height, settings.spp
    total = W * H * spp
    # an explicit batch_size is authoritative (mesh benches go past the
    # 128k analytic sweet spot); the unset (None) default gets the
    # MAX_LANES cap from the round-1 lane sweep
    cap = settings.batch_size if settings.batch_size is not None \
        else MAX_LANES
    B = min(cap, max(total // 2, 1024))

    use_morton = not os.environ.get("VIMG_NO_MORTON")
    use_prepass = _want_prepass(scene, tracer, total)

    t0 = time.time()
    aux = {}
    if use_morton or use_prepass:
        aux["morton_pix"] = jnp.asarray(morton_pixel_order(W, H))
    if use_prepass:
        cb = int(os.environ.get("VIMG_PREPASS_CHUNK", 0)) or B
        aux.update(trace_primaries(scene, settings, tracer,
                                   aux["morton_pix"], total,
                                   sample_offset, chunk_B=cb))
        if not use_morton:     # prepass work order is always Morton
            use_morton = True
    pre_dt = time.time() - t0

    state = init_state(B, prepass=use_prepass)
    state["samp_off"] = jnp.int32(sample_offset)
    accum = jnp.zeros((3, W * H), jnp.float32)
    run = _cached_run(scene, settings, tracer, total, B, use_morton,
                      use_prepass)

    state, accum, it = run(state, accum, aux)
    accum.block_until_ready()
    if progress:
        dt = time.time() - t0
        segs = float(state["n_segments"])
        shadow = float(state["n_shadow"])
        rays = segs + shadow
        print(f"Render Completed: {int(it)} supersteps, "
              f"{total / max(dt, 1e-9) / 1e6:.2f} Mpaths/s, "
              f"{rays / max(dt, 1e-9) / 1e6:.2f} Mrays/s "
              f"({segs / 1e6:.1f}M segments + {shadow / 1e6:.1f}M shadow"
              + (f"; prepass {pre_dt:.2f}s" if use_prepass else "") + ")")
    img = np.asarray(accum).T.reshape(H, W, 3) / spp
    if return_stats:
        return img, dict(supersteps=int(it),
                         segments=float(state["n_segments"]),
                         shadow_rays=float(state["n_shadow"]),
                         prepass_seconds=pre_dt if use_prepass else 0.0)
    return img
