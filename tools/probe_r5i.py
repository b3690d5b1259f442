"""Round-5 probe I: wide (8-ary) stack walk vs binary skip walk on-chip.

Probe F: closest cost ~ 1.7 us x serial rounds; bounce tiles walk 2367
binary nodes. The wide walk pops ~3x fewer nodes per tile with the same
total box-test work (8 sibling boxes per round, overlapped reductions).
Measures cam/bounce standalone + terrain e2e, plus parity.

Usage: python tools/probe_r5i.py
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
OUT = "/root/repo/bench_records/r5_probe_i.json"
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
                         compile_s=round(compile_s, 1))
    print(f"{name:24s} {best*1e3:8.2f} ms (compile {compile_s:.0f}s)",
          flush=True)
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
    from vimg_tpu.render.wavefront import morton_pixel_order, \
        render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    print("backend:", jax.default_backend(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=64, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = 512 * 256 * 64
    mpix = jnp.asarray(morton_pixel_order(512, 256))

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

    skip = ClusterTracer(scene)
    wide = ClusterTracer(scene, walk="wide")
    RESULTS["n_wide"] = wide.n_wide
    RESULTS["max_stack"] = wide.max_stack

    hr = bench("cam_skip", jax.jit(
        lambda ro, rd: skip.closest(scene, ro, rd, minT, infT)),
        ro_c, rd_c)
    hw = bench("cam_wide", jax.jit(
        lambda ro, rd: wide.closest(scene, ro, rd, minT, infT)),
        ro_c, rd_c)
    same = bool(jnp.all(jnp.where(jnp.isinf(hr.t), jnp.isinf(hw.t),
                                  hr.t == hw.t))
                & jnp.all(hr.prim_id == hw.prim_id))
    RESULTS["cam_exact"] = same
    print("cam exact:", same, flush=True)
    save()

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
    bench("bounce_skip", jax.jit(
        lambda ro, rd, mx: skip.closest(scene, ro, rd, minT, mx)),
        ro_b, rd_b, maxT_b)
    bench("bounce_wide", jax.jit(
        lambda ro, rd, mx: wide.closest(scene, ro, rd, minT, mx)),
        ro_b, rd_b, maxT_b)
    bench("occl_skip", jax.jit(
        lambda ro, rd, mx: skip.occluded(scene, ro, rd, minT, mx)),
        ro_b, rd_b, maxT_b)
    bench("occl_wide", jax.jit(
        lambda ro, rd, mx: wide.occluded(scene, ro, rd, minT, mx)),
        ro_b, rd_b, maxT_b)

    # e2e A/B
    imgs = {}
    for label, tr in (("skip", skip), ("wide", wide)):
        render_wavefront(scene, st, tracer=tr)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            img, _ = render_wavefront(scene, st, tracer=tr,
                                      return_stats=True)
            best = min(best, time.time() - t0)
        imgs[label] = img
        RESULTS[f"e2e_{label}"] = dict(
            secs=round(best, 3), mpaths=round(total / best / 1e6, 3))
        print(f"e2e {label}: {RESULTS[f'e2e_{label}']}", flush=True)
        save()
    RESULTS["e2e_dmean"] = float(
        np.abs(imgs["wide"] - imgs["skip"]).mean())
    save()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
