"""Round-5 probe B: standalone stage timings on the envtex scene.

The textured superstep costs ~10 min to compile, so instead of ablating
the whole superstep per stage (probe-hours), time each stage as its own
small jit on a 131k batch: trace (closest/occluded), hit_info (UV +
normal map), eval_pdf (textured principled), sample_mat, env_emit,
env_pdf, env_sample/sample_lights, and the atlas fetch in isolation.
Together with the e2e secs/superstep from probe A this locates the
envtex class's 2.7x cost multiplier (0.29 vs 0.78 Mpaths/s terrain).

Usage: python tools/probe_r5b.py
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
OUT = "/root/repo/bench_records/r5_probe_b.json"
B = 1 << 17


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def timeit(name, fn, *args, repeats=3):
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
                         us_per_lane=round(best / B * 1e6, 4),
                         compile_s=round(compile_s, 1))
    print(f"{name:18s} {best*1e3:8.2f} ms  ({best/B*1e9:6.1f} ns/lane, "
          f"compile {compile_s:.0f}s)", flush=True)
    save()
    return out


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.geometry import intersect
    from vimg_tpu.lights import emitters, envmap
    from vimg_tpu.materials import bsdf
    from vimg_tpu.core import rng as vrng
    from vimg_tpu.core.rng import Draw
    from vimg_tpu.render.integrators import _primary_rays, MIN_T
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import textured_terrain_scene

    print("backend:", jax.default_backend(), flush=True)
    scene = textured_terrain_scene(100_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=16, max_depth=64,
                           integrator="mis")
    tracer = ClusterTracer(scene)

    # a realistic mixed batch: camera rays for random work ids
    ks = jnp.asarray((np.random.RandomState(0)
                      .permutation(512 * 256 * 16)[:B]).astype(np.int32))
    pix = ks // 16
    samp = ks % 16

    @jax.jit
    def gen(pix, samp):
        return _primary_rays(scene, st, pix, samp)

    ro, rd, cw, cs = timeit("primary_rays", gen, pix, samp)
    z = ro[:, 0] * 0.0
    minT = MIN_T + z
    infT = jnp.inf + z

    hr = timeit("closest_mixed", jax.jit(
        lambda ro, rd: tracer.closest(scene, ro, rd, minT, infT)), ro, rd)
    timeit("occluded_mixed", jax.jit(
        lambda ro, rd: tracer.occluded(scene, ro, rd, minT, infT)), ro, rd)

    hi = timeit("hit_info", jax.jit(
        lambda ro, rd, hr: intersect.hit_info(scene, ro, rd, hr)),
        ro, rd, hr)

    ns = jnp.zeros((B,), bool)
    timeit("eval_pdf", jax.jit(
        lambda rd, hi: bsdf.eval_pdf(scene, hi.mat_id, rd, -rd, hi, ns,
                                     cone_width=cw)), rd, hi)
    r1, r2, r3, r4 = vrng.uniform4(pix, samp, pix * 0, Draw.BSDF_SAMPLE)
    timeit("sample_mat", jax.jit(
        lambda rd, hi: bsdf.sample_mat(
            scene, hi.mat_id, rd, hi,
            {"lobe": r1, "u": r2, "v": r3, "fresnel": r4}, ns)), rd, hi)

    timeit("env_emit", jax.jit(
        lambda rd: emitters.background_emit(scene, rd, cs)), rd)
    timeit("env_pdf", jax.jit(
        lambda rd: emitters.background_pdf(scene, rd)), rd)
    timeit("sample_lights", jax.jit(
        lambda p: emitters.sample_lights(scene, p, r1, r2, r3)),
        ro + rd * 2.0)

    from vimg_tpu.textures.texture import base_color_at_hit
    timeit("base_color_tex", jax.jit(
        lambda rd, hi: base_color_at_hit(scene, hi.mat_id, hi, cw, rd)),
        rd, hi)

    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
