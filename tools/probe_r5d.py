"""Round-5 probe D: where does the closest-trace 55 ms/superstep go?

The terrain ablation (r5 session) put the closest trace at 76% of the
wavefront superstep. This probe splits the walk cost on realistic
populations:
  - sort_cost:      closest with the production Morton sort vs sort=False
                    on pre-sorted rays (the argsort+takes+scatters share)
  - leaf split:     probe_leaf="noreads" (literal constants, garbage
                    results) vs "notests" (reads only) vs full kernel
  - sub_width=8:    finer leaf gating on the packed 8-tri sub-boxes

Populations: Morton-work-order camera rays (fresh-lane regime) and their
one-diffuse-bounce successors (bounce regime).

Usage: python tools/probe_r5d.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vimg_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

RESULTS = {}
OUT = "/root/repo/bench_records/r5_probe_d.json"
B = 1 << 17


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def bench(name, fn, *args, repeats=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    RESULTS[name] = dict(ms=round(best * 1e3, 2),
                         ns_per_lane=round(best / B * 1e9, 1),
                         compile_s=round(compile_s, 1))
    print(f"{name:28s} {best*1e3:8.2f} ms ({best/B*1e9:6.1f} ns/lane, "
          f"compile {compile_s:.0f}s)", flush=True)
    save()
    return out


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.geometry import intersect
    from vimg_tpu.materials import bsdf
    from vimg_tpu.core import rng as vrng
    from vimg_tpu.core.rng import Draw
    from vimg_tpu.core.math import onb_to_world
    from vimg_tpu.core.warps import sample_hemisphere_cosine
    from vimg_tpu.render.integrators import _primary_rays, MIN_T
    from vimg_tpu.render.wavefront import morton_pixel_order
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    print("backend:", jax.default_backend(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=64, max_depth=64,
                           integrator="mis")
    mpix = jnp.asarray(morton_pixel_order(512, 256))

    # population 1: Morton-work-order camera rays (one refill's worth)
    ks = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def gen(ks):
        pix = mpix[ks // 64]
        samp = ks % 64
        ro, rd, _, _ = _primary_rays(scene, st, pix, samp)
        return ro, rd, pix, samp

    ro_c, rd_c, pix, samp = gen(ks)
    z = ro_c[:, 0] * 0.0
    minT = MIN_T + z
    infT = jnp.inf + z

    tracers = {"prod": ClusterTracer(scene)}

    hr = bench("cam_closest_sorted",
               jax.jit(lambda ro, rd: tracers["prod"].closest(
                   scene, ro, rd, minT, infT)), ro_c, rd_c)
    bench("cam_closest_nosort",
          jax.jit(lambda ro, rd: tracers["prod"].closest(
              scene, ro, rd, minT, infT, sort=False)), ro_c, rd_c)

    # population 2: one cosine bounce off the camera hits
    @jax.jit
    def bounce(ro, rd, hr, pix, samp):
        hi = intersect.hit_info(scene, ro, rd, hr)
        r1, r2, _, _ = vrng.uniform4(pix, samp, samp * 0, Draw.BSDF_SAMPLE)
        d = onb_to_world(hi.tangent, hi.bitangent, hi.n_s,
                         sample_hemisphere_cosine(r1, r2))
        hit = jnp.isfinite(hr.t)
        return (jnp.where(hit[:, None], hi.p, ro),
                jnp.where(hit[:, None], d, rd),
                jnp.where(hit, jnp.inf, -jnp.inf))

    ro_b, rd_b, maxT_b = bounce(ro_c, rd_c, hr, pix, samp)
    bench("bounce_closest_sorted",
          jax.jit(lambda ro, rd, mx: tracers["prod"].closest(
              scene, ro, rd, minT, mx)), ro_b, rd_b, maxT_b)

    for label, kw in [("noreads", dict(probe_leaf="noreads")),
                      ("notests", dict(probe_leaf="notests")),
                      ("sub8", dict(sub_width=8))]:
        tr = ClusterTracer(scene, **kw)
        tracers[label] = tr
        bench(f"cam_closest_{label}",
              jax.jit(lambda ro, rd, tr=tr: tr.closest(
                  scene, ro, rd, minT, infT)), ro_c, rd_c)
        bench(f"bounce_closest_{label}",
              jax.jit(lambda ro, rd, mx, tr=tr: tr.closest(
                  scene, ro, rd, minT, mx)), ro_b, rd_b, maxT_b)

    # sub8 must be exact
    h8 = tracers["sub8"].closest(scene, ro_b, rd_b, minT, maxT_b)
    h0 = tracers["prod"].closest(scene, ro_b, rd_b, minT, maxT_b)
    RESULTS["sub8_exact"] = bool(
        jnp.all(jnp.where(jnp.isnan(h0.t), True, h0.t == h8.t))
        & jnp.all(h0.prim_id == h8.prim_id))
    print("sub8 exact:", RESULTS["sub8_exact"], flush=True)
    save()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
