"""Benchmark: MIS path tracing throughput on the reference's headline scene.

Baseline: atom501/v-img renders disney_spheres (1800x800, 512 spp, MIS,
Russian-roulette depth) in 57 s on a Ryzen 7 7700 => ~12.9 M camera paths/s
(README.md:81, BASELINE.md). We render the SAME full frame (identical
estimator) on one TPU chip with the Pallas persistent-path megakernel
(vimg_tpu/render/mega) and report camera paths/s vs that baseline.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PATHS_PER_S = 12.9e6
SCENE = "/root/reference/scenes/disney_spheres.json"
SPP = 512              # the reference's exact headline config
ROWS = 32


def main():
    import jax  # noqa: F401  (backend init)

    from vimg_tpu.utils.compcache import enable_compilation_cache
    enable_compilation_cache()

    if os.path.exists(SCENE):
        from vimg_tpu.scene.json_loader import load_json_scene
        scene, settings = load_json_scene(SCENE)
    else:
        from __graft_entry__ import _flagship_scene
        scene, settings = _flagship_scene()
    settings = dataclasses.replace(settings, spp=SPP)
    total = settings.width * settings.height * settings.spp

    from vimg_tpu.render.mega import render_megakernel, supports_megakernel

    if supports_megakernel(scene, settings):
        # warm (compile) run, then best-of-2 timed runs (the TPU tunnel
        # shows run-to-run variance)
        _, stats = render_megakernel(scene, settings, rows=ROWS,
                                     return_stats=True)
        dt = stats["seconds"]
        for _ in range(2):
            _, s2 = render_megakernel(scene, settings, rows=ROWS,
                                      return_stats=True)
            if s2["seconds"] < dt:
                dt, stats = s2["seconds"], s2
        label = "megakernel mis"
    else:  # pragma: no cover - fallback for exotic scenes
        from vimg_tpu.geometry.trace import make_tracer
        from vimg_tpu.render.wavefront import render_wavefront
        tracer = make_tracer(scene)
        render_wavefront(scene, settings, tracer=tracer)
        t0 = time.time()
        _, stats = render_wavefront(scene, settings, tracer=tracer,
                                    return_stats=True)
        dt = time.time() - t0
        label = "wavefront mis"

    paths_per_s = total / dt
    rays_per_s = (stats["segments"] + stats["shadow_rays"]) / dt
    result = {
        "metric": (f"camera paths/s, {label}, disney_spheres "
                   f"{settings.width}x{settings.height}@{SPP}spp "
                   f"(1 chip, full frame)"),
        "value": round(paths_per_s, 1),
        "unit": "paths/s",
        "vs_baseline": round(paths_per_s / BASELINE_PATHS_PER_S, 3),
    }
    # mesh stage: 100k-tri open-terrain MIS render — the matpreview-class
    # workload proxy (the reference's mesh showcases ship without assets;
    # BASELINE.md: matpreview = 2.7 M paths/s on the Ryzen 7 7700). Rides
    # as extra keys on the same single JSON line.
    try:
        mesh = bench_mesh()
        result.update(mesh)
    except Exception as e:  # pragma: no cover - keep the headline alive
        result["mesh_error"] = f"{type(e).__name__}: {e}"[:200]
    # full-res parity gate (VERDICT r4 #8): every bench line carries an
    # asserted image-parity record vs the reference's shipped PNG
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from ci_artifact import run_check
        rec = run_check()
        result.update(parity_corr=rec["corr"], parity_psnr=rec["psnr"],
                      parity_pass=rec["pass"])
    except Exception as e:  # pragma: no cover
        result["parity_error"] = f"{type(e).__name__}: {e}"[:160]
    print(json.dumps(result))
    print(f"# rays/s/chip: {rays_per_s / 1e6:.2f}M "
          f"({stats['segments'] / 1e6:.1f}M segments + "
          f"{stats['shadow_rays'] / 1e6:.1f}M shadow); "
          f"full 512spp frame: {dt:.2f}s "
          f"(reference: 57s on Ryzen 7 7700)", file=sys.stderr)


MESH_BASELINE_PATHS_PER_S = 2.7e6   # matpreview class (BASELINE.md)


def bench_mesh(n_tris=100_000, spp=64):
    """Mesh throughput on the synthetic 100k-tri terrain scene via the
    production dispatch (round 3: refill wavefront + Pallas ClusterTracer
    beats the mesh megakernel at production spp). Extra JSON fields."""
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    scene = terrain_scene(n_tris, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=spp, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp
    tracer = ClusterTracer(scene)
    render_wavefront(scene, st, tracer=tracer)         # compile
    dt = np.inf
    stats = None
    # best-of-3: the tunnel shows occasional ~10% run-to-run swings
    # (observed 0.787 vs 0.888 Mpaths/s back-to-back in round 5)
    for _ in range(3):
        t0 = time.time()
        _, s2 = render_wavefront(scene, st, tracer=tracer,
                                 return_stats=True)
        d2 = time.time() - t0
        if d2 < dt:
            dt, stats = d2, s2
    mpaths = total / dt
    mrays = (stats["segments"] + stats["shadow_rays"]) / dt
    out = {
        "mesh_metric": (f"camera paths/s, mesh wavefront+cluster mis, "
                        f"terrain {n_tris // 1000}k tris 512x256@{spp}spp"),
        "mesh_paths_per_s": round(mpaths, 1),
        "mesh_rays_per_s": round(mrays, 1),
        "mesh_vs_matpreview_baseline": round(
            mpaths / MESH_BASELINE_PATHS_PER_S, 3),
    }
    # the 500k/env-tex stages were opt-in through round 4 because their
    # wavefront graphs compile for multiple minutes cold (the textured
    # superstep alone took >10 min on 2026-08-20). Round 5 enables the
    # persistent compilation cache (vimg_tpu/utils/compcache.py), which
    # makes those compiles once-per-machine — the two worst numbers in
    # the project are now always driver-visible. VIMG_BENCH_SKIP_EXTRA
    # opts OUT (e.g. a cold cache under a hard wall-clock budget).
    if not os.environ.get("VIMG_BENCH_SKIP_EXTRA"):
        try:
            out.update(bench_mesh_500k())
        except Exception as e:  # pragma: no cover
            out["mesh500k_error"] = f"{type(e).__name__}: {e}"[:160]
        try:
            out.update(bench_envtex())
        except Exception as e:  # pragma: no cover
            out["envtex_error"] = f"{type(e).__name__}: {e}"[:160]
    return out


def bench_mesh_500k(spp=64):
    """HBM-streamed mesh scale point: 500k tris exceeds the resident
    cluster-table budget, exercising the per-leaf DMA walk. spp matches
    the terrain stage (the reference's mesh showcases run 512 spp;
    low-spp frames underrate steady-state throughput — less refill
    occupancy and pixel coherence)."""
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    scene = terrain_scene(500_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=spp, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp
    tracer = ClusterTracer(scene)
    render_wavefront(scene, st, tracer=tracer)
    t0 = time.time()
    render_wavefront(scene, st, tracer=tracer)
    dt = time.time() - t0
    return {"mesh500k_paths_per_s": round(total / dt, 1)}


def bench_envtex(spp=64):
    """Env-lit textured mesh (the lego/statues workload class,
    reference README.md:87-90): wavefront + ClusterTracer with image
    textures, mip/ray-cone LOD and env-map NEE."""
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import textured_terrain_scene

    scene = textured_terrain_scene(100_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=spp, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    total = st.width * st.height * st.spp
    tracer = ClusterTracer(scene)
    render_wavefront(scene, st, tracer=tracer)
    t0 = time.time()
    render_wavefront(scene, st, tracer=tracer)
    dt = time.time() - t0
    # statues class baseline: 6.5 Mpaths/s (README.md:90, BASELINE.md)
    return {"envtex_paths_per_s": round(total / dt, 1),
            "envtex_vs_statues_baseline": round(total / dt / 6.5e6, 4)}


if __name__ == "__main__":
    main()
