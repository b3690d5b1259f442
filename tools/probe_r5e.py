"""Round-5 probe E: walk visit statistics on the r5d populations.

trace_stats (nv = node visits, nl = live leaf visits, per tile) for the
Morton camera and one-bounce populations — sizes the headroom of a wide
(8-ary) walk: inner-node visits (nv - nl) collapse ~4x under an 8-ary
tree, leaf visits and their tri tests stay.

Usage: python tools/probe_r5e.py
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from vimg_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 1 << 17
OUT = "/root/repo/bench_records/r5_probe_e.json"


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
    tracer = ClusterTracer(scene)

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

    res = dict(n_nodes=tracer.data.n_nodes,
               n_clusters=tracer.data.n_clusters)

    # sorted stats need the rays pre-sorted (trace_stats runs _run
    # directly); apply the production sort key here
    from vimg_tpu.geometry.cluster_trace import ray_sort_key
    def sorted_rays(ro, rd, maxT):
        key = ray_sort_key(ro, rd, *tracer.bounds)
        key = jnp.where(maxT == -jnp.inf, jnp.int32(2 ** 31 - 1), key)
        p = jnp.argsort(key)
        return jnp.take(ro, p, 0), jnp.take(rd, p, 0), jnp.take(maxT, p)

    hr = tracer.closest(scene, ro_c, rd_c, minT, infT)

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

    for name, (ro, rd, mx) in dict(
            cam=(ro_c, rd_c, infT), bounce=(ro_b, rd_b, maxT_b)).items():
        ro_s, rd_s, mx_s = sorted_rays(ro, rd, mx)
        stats = tracer.trace_stats(ro_s, rd_s, minT, mx_s)
        nv = stats[:, 0]
        nl = stats[:, 1]
        res[name] = dict(
            tiles=int(stats.shape[0]),
            nv_total=float(nv.sum()), nl_total=float(nl.sum()),
            nv_mean=float(nv.mean()), nl_mean=float(nl.mean()),
            nv_max=float(nv.max()), nl_max=float(nl.max()))
        print(name, res[name], flush=True)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
