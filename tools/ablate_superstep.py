"""On-chip superstep ablation: time the wavefront superstep with individual
stages stubbed out (see make_superstep's ``ablate`` hook) to locate where the
per-segment milliseconds go on the real TPU.

Usage:  python tools/ablate_superstep.py [--lanes 131072] [--steps 100]
        [--scene /root/reference/scenes/disney_spheres.json]
        [--variants full,film,...]

Single process only — the axon TPU tunnel is single-client.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from vimg_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from vimg_tpu.geometry.trace import make_tracer
from vimg_tpu.render import wavefront
from vimg_tpu.scene.json_loader import load_json_scene

VARIANTS = [
    ("full", frozenset()),
    ("-film", frozenset({"film"})),
    ("-cumsum", frozenset({"cumsum"})),
    ("-film-cumsum", frozenset({"film", "cumsum"})),
    ("-nee", frozenset({"nee"})),
    ("-shadow", frozenset({"shadow"})),
    ("-beval", frozenset({"beval"})),
    ("-bsample", frozenset({"bsample"})),
    ("-trace", frozenset({"trace", "shadow"})),
    ("-hitinfo", frozenset({"hitinfo"})),
    ("-bg", frozenset({"bg"})),
    ("skeleton", frozenset({"film", "cumsum", "nee", "beval", "bsample",
                            "trace", "hitinfo", "bg"})),
]


def make_fixed_run(scene, settings, tracer, total_paths, n_steps, ablate):
    step = wavefront.make_superstep(scene, settings, tracer, total_paths,
                                    ablate=ablate)

    @jax.jit
    def run(state, accum):
        def body(_, c):
            s, a = c
            return step(s, a)
        return jax.lax.fori_loop(0, n_steps, body, (state, accum))

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=wavefront.MAX_LANES)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--scene",
                    default="/root/reference/scenes/disney_spheres.json")
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of variant names")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mesh", type=int, default=0,
                    help="use the synthetic N-tri mesh scene + ClusterTracer"
                         " instead of --scene")
    ap.add_argument("--envtex", type=int, default=0,
                    help="use the textured+env terrain scene (N tris) + "
                         "ClusterTracer instead of --scene")
    ap.add_argument("--terrain", type=int, default=0,
                    help="use the open-terrain scene (N tris, the bench "
                         "anchor) + ClusterTracer instead of --scene")
    args = ap.parse_args()

    if args.terrain:
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene import ir
        from vimg_tpu.scene.synthetic import terrain_scene
        scene = terrain_scene(args.terrain, width=512, height=256)
        settings = ir.RenderSettings(width=512, height=256, spp=64,
                                     max_depth=64, integrator="mis")
        tracer = ClusterTracer(scene)
    elif args.envtex:
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene import ir
        from vimg_tpu.scene.synthetic import textured_terrain_scene
        scene = textured_terrain_scene(args.envtex, width=512, height=256)
        settings = ir.RenderSettings(width=512, height=256, spp=16,
                                     max_depth=64, integrator="mis")
        tracer = ClusterTracer(scene)
    elif args.mesh:
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene import ir
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene
        scene = bumpy_sphere_scene(args.mesh, width=512, height=256)
        settings = ir.RenderSettings(width=512, height=256, spp=64,
                                     max_depth=16, integrator="mis")
        tracer = ClusterTracer(scene, tile_rows=16)
    else:
        scene, settings = load_json_scene(args.scene)
        tracer = make_tracer(scene)
    B = args.lanes
    total = 2 ** 31 - 1  # never exhaust work (int32 max): lanes stay busy

    names = None if args.variants is None else set(args.variants.split(","))
    print(f"backend={jax.default_backend()} lanes={B} steps={args.steps}")
    results = {}
    for name, ablate in VARIANTS:
        if names is not None and name not in names:
            continue
        run = make_fixed_run(scene, settings, tracer, total, args.steps,
                             ablate)
        state = wavefront.init_state(B)
        accum = jnp.zeros((3, settings.width * settings.height), jnp.float32)
        t0 = time.time()
        state, accum = run(state, accum)   # compile + warm run
        jax.block_until_ready(accum)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            state, accum = run(state, accum)
            jax.block_until_ready(accum)
            best = min(best, time.time() - t0)
        ms = best / args.steps * 1e3
        results[name] = ms
        base = results.get("full")
        delta = f"  delta={base - ms:+.2f} ms" if base and name != "full" else ""
        rate = B / (ms * 1e-3) / 1e6
        print(f"{name:14s} {ms:7.3f} ms/superstep  {rate:8.1f} Mseg/s"
              f"  (compile+warm {compile_s:.0f}s){delta}", flush=True)


if __name__ == "__main__":
    main()
