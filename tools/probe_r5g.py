"""Round-5 probe G: cluster size (max_k) sweep with sub-box gating.

Probe F: closest cost ~ 1.75 us x node visits; bounce tiles visit 53%
of the 4493-node tree. Doubling the cluster size halves the tree (and
the serial visit chain); the 8/16-tri sub-box gating that did not exist
at the round-3 K sweep should absorb the wider leaves. Sweep
max_k x sub_width on the probe-F populations + e2e.

Usage: python tools/probe_r5g.py
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
OUT = "/root/repo/bench_records/r5_probe_g.json"
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
    print(f"{name:26s} {best*1e3:8.2f} ms (compile {compile_s:.0f}s)",
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

    base = ClusterTracer(scene)
    hr = base.closest(scene, ro_c, rd_c, minT, infT)

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
    h_ref = None

    for K in (64, 128, 256):
        for sw in (8, 16):
            label = f"k{K}_s{sw}"
            tr = ClusterTracer(scene, max_k=K, sub_width=sw)
            RESULTS[f"{label}_nodes"] = tr.data.n_nodes
            ha = bench(f"cam_{label}", jax.jit(
                lambda ro, rd, tr=tr: tr.closest(scene, ro, rd, minT,
                                                 infT)), ro_c, rd_c)
            bench(f"bounce_{label}", jax.jit(
                lambda ro, rd, mx, tr=tr: tr.closest(scene, ro, rd, minT,
                                                     mx)),
                ro_b, rd_b, maxT_b)
            if h_ref is None:
                h_ref = ha
            else:
                same = bool(jnp.all(jnp.where(
                    jnp.isinf(h_ref.t), jnp.isinf(ha.t),
                    h_ref.t == ha.t)))
                RESULTS[f"{label}_exact_t"] = same
                print(f"{label} exact t: {same}", flush=True)
            save()

    # e2e with the best-looking config vs current default
    for K, sw in ((64, 8), (128, 8), (128, 16), (256, 16)):
        tr = ClusterTracer(scene, max_k=K, sub_width=sw)
        render_wavefront(scene, st, tracer=tr)
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            render_wavefront(scene, st, tracer=tr)
            best = min(best, time.time() - t0)
        RESULTS[f"e2e_k{K}_s{sw}"] = dict(
            secs=round(best, 3), mpaths=round(total / best / 1e6, 3))
        print(f"e2e k{K}_s{sw}: {RESULTS[f'e2e_k{K}_s{sw}']}", flush=True)
        save()

    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
