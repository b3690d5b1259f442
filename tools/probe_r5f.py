"""Round-5 probe F: corrected closest-trace cost split (probe D redo).

Probe D's populations were wrong: work ids 0..B cover only the top-left
Morton corner of the frame — pure sky, zero hits — so its numbers
measured empty walks (and accidentally exposed a large fixed per-batch
cost). This probe uses a RANDOM subset of the frame's work ids (real
sky/terrain mix, like a refill) and adds:
  inert:        all lanes maxT=-inf — the _run wrapper + kernel floor
  sorted/nosort full closest on the mixed camera population
  bounce:       one-diffuse-bounce successors (live lanes only)
  noreads/notests/sub8/sub16 kernel variants on both populations
  trace_stats:  visits / live-leaf visits for the same populations

Usage: python tools/probe_r5f.py
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
OUT = "/root/repo/bench_records/r5_probe_f.json"
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
    print(f"{name:26s} {best*1e3:8.2f} ms ({best/B*1e9:6.1f} ns/lane, "
          f"compile {compile_s:.0f}s)", flush=True)
    save()
    return out


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.geometry import intersect
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

    total = 512 * 256 * 64
    ks = jnp.asarray(np.sort(np.random.RandomState(0)
                             .choice(total, B, replace=False))
                     .astype(np.int32))

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
    ninfT = -jnp.inf + z

    prod = ClusterTracer(scene)
    RESULTS["sub_width_default"] = prod.sub_width

    hr = bench("cam_sorted", jax.jit(
        lambda ro, rd: prod.closest(scene, ro, rd, minT, infT)),
        ro_c, rd_c)
    n_hits = int(jnp.isfinite(hr.t).sum())
    RESULTS["cam_hits"] = n_hits
    print("cam hits:", n_hits, "/", B, flush=True)
    save()

    bench("inert_floor", jax.jit(
        lambda ro, rd: prod.closest(scene, ro, rd, minT, ninfT)),
        ro_c, rd_c)
    bench("cam_nosort", jax.jit(
        lambda ro, rd: prod.closest(scene, ro, rd, minT, infT,
                                    sort=False)), ro_c, rd_c)

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
    bench("bounce_sorted", jax.jit(
        lambda ro, rd, mx: prod.closest(scene, ro, rd, minT, mx)),
        ro_b, rd_b, maxT_b)

    variants = [("noreads", dict(probe_leaf="noreads")),
                ("notests", dict(probe_leaf="notests")),
                ("sub16", dict(sub_width=16))]
    if prod.sub_width != 8:
        variants.append(("sub8", dict(sub_width=8)))
    for label, kw in variants:
        tr = ClusterTracer(scene, **kw)
        bench(f"cam_{label}", jax.jit(
            lambda ro, rd, tr=tr: tr.closest(scene, ro, rd, minT, infT)),
            ro_c, rd_c)
        bench(f"bounce_{label}", jax.jit(
            lambda ro, rd, mx, tr=tr: tr.closest(scene, ro, rd, minT, mx)),
            ro_b, rd_b, maxT_b)

    # walk statistics (pre-sorted like production)
    from vimg_tpu.geometry.cluster_trace import ray_sort_key

    def sorted_rays(ro, rd, maxT):
        key = ray_sort_key(ro, rd, *prod.bounds)
        key = jnp.where(maxT == -jnp.inf, jnp.int32(2 ** 31 - 1), key)
        p = jnp.argsort(key)
        return jnp.take(ro, p, 0), jnp.take(rd, p, 0), jnp.take(maxT, p)

    for name, (ro, rd, mx) in dict(
            cam=(ro_c, rd_c, infT), bounce=(ro_b, rd_b, maxT_b)).items():
        ro_s, rd_s, mx_s = sorted_rays(ro, rd, mx)
        stats = prod.trace_stats(ro_s, rd_s, minT, mx_s)
        RESULTS[f"stats_{name}"] = dict(
            nv_total=float(stats[:, 0].sum()),
            nl_total=float(stats[:, 1].sum()),
            nv_mean=float(stats[:, 0].mean()),
            nl_mean=float(stats[:, 1].mean()),
            nv_max=float(stats[:, 0].max()))
        print(name, RESULTS[f"stats_{name}"], flush=True)
        save()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
