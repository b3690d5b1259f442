"""Command-line renderer, mirroring the reference's CLI (src/main.cpp:59-77).

Flags:
  -f / --file      scene file (.json / .gltf / .glb / .xml)
  -j / --json      companion json for gltf scenes
  -m / --heatmap   render BVH-cost heatmap scaled by FACTOR
  -t / --threads   ignored (TPU; kept for CLI parity)
  -c / --tonemap   0=clamp 1=agx 2=reinhard 3=aces (default agx like -c 1)
  -d / --debug-pixel "x y"  trace one pixel, print linear + sRGB values
  -b / --bvh       0=binned (default); 1=sweep (native builder)
  -o / --output    output path (default v_img_<UTC>.png)
  --spp/--depth/--res  overrides
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from datetime import datetime, timezone


def build_argparser():
    p = argparse.ArgumentParser("vimg_tpu", description=__doc__)
    p.add_argument("-f", "--file", required=True, help="scene file")
    p.add_argument("-j", "--json", default=None, help="gltf companion json")
    p.add_argument("-m", "--heatmap", type=float, default=None,
                   help="BVH heatmap factor")
    p.add_argument("-t", "--threads", type=int, default=0, help="(ignored)")
    p.add_argument("-c", "--tonemap", type=int, default=None,
                   help="0=clamp 1=agx 2=reinhard 3=aces")
    p.add_argument("-d", "--debug-pixel", default=None, metavar='"x y"')
    p.add_argument("-b", "--bvh", type=int, default=0,
                   help="0=binned 1=sweep")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    p.add_argument("--integrator", default=None,
                   choices=["s_normal", "g_normal", "material", "mis"])
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--trace", default=None, metavar="LOGDIR",
                   help="capture a jax.profiler device trace of the "
                        "render into LOGDIR (view with xprof/TensorBoard)")
    return p


TONEMAP_BY_ID = {0: "clamp", 1: "agx", 2: "reinhard", 3: "aces"}


def load_scene_any(path, companion_json=None):
    from vimg_tpu.scene.json_loader import load_json_scene
    path = str(path)
    if path.endswith(".json"):
        return load_json_scene(path)
    if path.endswith((".gltf", ".glb")):
        from vimg_tpu.scene.gltf_loader import load_gltf_scene
        return load_gltf_scene(path, companion_json)
    if path.endswith(".xml"):
        from vimg_tpu.scene.mitsuba_loader import load_mitsuba_scene
        return load_mitsuba_scene(path)
    raise ValueError(f"unknown scene format: {path}")


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from vimg_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    from vimg_tpu.geometry.trace import make_tracer
    from vimg_tpu.render import film
    from vimg_tpu.render.render import render_frame
    from vimg_tpu.scene import ir

    t0 = time.time()
    scene, settings = load_scene_any(args.file, args.json)
    print(f"Scene loaded in {time.time() - t0:.2f}s: "
          f"{scene.n_tris()} tris, {scene.n_spheres()} spheres, "
          f"{scene.n_mats()} materials, {scene.n_lights()} lights")

    over = {}
    if args.spp is not None:
        over["spp"] = args.spp
    if args.depth is not None:
        over["max_depth"] = args.depth if args.depth >= 0 else 2 ** 31 - 1
    if args.integrator is not None:
        over["integrator"] = args.integrator
    if args.tonemap is not None:
        over["tonemap"] = TONEMAP_BY_ID[args.tonemap]
    elif settings.integrator in ("s_normal", "g_normal"):
        # reference forces clamp + 4 spp for normal integrators
        # (main.cpp:220-236)
        over.setdefault("tonemap", "clamp")
        over.setdefault("spp", 4)
    else:
        over["tonemap"] = "agx"
    settings = dataclasses.replace(settings, **over)

    force = "sweep" if args.bvh == 1 else None

    if args.heatmap is not None:
        from vimg_tpu.render.heatmap import render_heatmap
        # heatmaps visualize BVH traversal cost: force the BVH tracer
        # (the auto-picked ClusterTracer has no per-ray cost counters and
        # would fall to the constant-cost brute branch)
        tracer = make_tracer(scene, force=force or "bvh")
        img = render_heatmap(scene, settings, tracer, args.heatmap)
        out = args.output or _default_name("heatmap")
        film.write_png(out, img)
        print(f"Heatmap written to {out}")
        return 0

    if args.debug_pixel is not None:
        import jax.numpy as jnp
        import numpy as np
        from vimg_tpu.render.integrators import trace_radiance
        x, y = (int(v) for v in args.debug_pixel.split())
        tracer = make_tracer(scene, force=force)
        W, H = settings.width, settings.height
        pix = jnp.full((settings.spp,), x + (H - 1 - y) * W, jnp.int32)
        samp = jnp.arange(settings.spp, dtype=jnp.int32)
        col = np.asarray(trace_radiance(scene, settings, tracer, pix,
                                        samp)).mean(axis=0)
        srgb = np.asarray(film.srgb_encode(jnp.asarray(col)))
        print(f"pixel ({x} {y}) linear: {col.tolist()}")
        print(f"pixel ({x} {y}) sRGB:   {srgb.tolist()}")
        return 0

    # the tracer is built lazily by the dispatch: when the megakernel
    # path engages it packs its own cluster tables, so an eager
    # make_tracer here would do the host SAH/cluster build twice
    if force == "sweep":
        import jax
        from vimg_tpu.render.mega import supports_megakernel
        if (jax.default_backend() != "cpu"
                and settings.integrator in ("mis", "material")
                and supports_megakernel(scene, settings)):
            print("note: -b 1 (sweep SAH) only affects the wavefront/BVH "
                  "paths; this render takes the megakernel (binned-SAH "
                  "cluster tables)")
    if args.trace:
        # warm once outside the trace so the capture shows steady-state
        # kernels, not compiles (SURVEY §5 tracing/profiling)
        import contextlib

        from vimg_tpu.utils.profiling import device_trace
        render_frame(scene, settings, tracer_force=force)
        trace_cm = device_trace(args.trace)
    else:
        import contextlib
        trace_cm = contextlib.nullcontext()
    t0 = time.time()
    with trace_cm:
        img = render_frame(scene, settings, tracer_force=force,
                           progress=True)
    dt = time.time() - t0
    n_paths = settings.width * settings.height * settings.spp
    print(f"Render took {dt:.2f}s ({n_paths / dt / 1e6:.2f} Mpaths/s)")
    if args.trace:
        print(f"Device trace captured to {args.trace}")

    import jax.numpy as jnp
    out_img = film.finalize(jnp.asarray(img), tonemap=settings.tonemap)
    out = args.output or _default_name("v_img")
    film.write_png(out, out_img)
    print(f"Image written to {out}")
    return 0


def _default_name(prefix):
    ts = datetime.now(timezone.utc).strftime("%Y-%m-%d_%H-%M-%S")
    return f"{prefix}_{ts}.png"


if __name__ == "__main__":
    sys.exit(main())
