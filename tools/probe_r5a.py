"""Round-5 probe A: primary pre-pass + Morton work order A/B on-chip.

Measures, on the terrain-100k anchor (and optionally envtex / 500k):
  base            VIMG_NO_MORTON=1 VIMG_NO_PREPASS=1  (round-4 config)
  morton          Morton work order only
  morton_prepass  Morton + primary pre-pass          (round-5 config)

Each stage records compile time separately from best-of-2 warm runs so a
second invocation of this script doubles as the persistent-compilation-
cache check (compile times should collapse to seconds).

Usage: python tools/probe_r5a.py [--out FILE] [--stages terrain,envtex,m500k]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from vimg_tpu.utils.compcache import enable_compilation_cache

CACHE_DIR = enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

RESULTS = {}
OUT = "/root/repo/bench_records/r5_probe_a.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def log(msg):
    print(msg, flush=True)


CONFIGS = [
    ("base", {"VIMG_NO_MORTON": "1", "VIMG_NO_PREPASS": "1"}),
    ("morton", {"VIMG_NO_PREPASS": "1"}),
    ("morton_prepass", {}),
]
ONLY = None   # --configs subset


def _set_env(env):
    for k in ("VIMG_NO_MORTON", "VIMG_NO_PREPASS"):
        os.environ.pop(k, None)
    os.environ.update(env)


def ab_stage(name, scene, st, total):
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront

    tracer = ClusterTracer(scene)
    stage = {}
    imgs = {}
    for label, env in CONFIGS:
        if ONLY is not None and label not in ONLY:
            continue
        _set_env(env)
        t0 = time.time()
        render_wavefront(scene, st, tracer=tracer)
        compile_s = time.time() - t0
        best, stats = np.inf, None
        for _ in range(2):
            t0 = time.time()
            img, s2 = render_wavefront(scene, st, tracer=tracer,
                                       return_stats=True)
            d2 = time.time() - t0
            if d2 < best:
                best, stats = d2, s2
        imgs[label] = img
        stage[label] = dict(
            compile_s=round(compile_s, 1), secs=round(best, 3),
            mpaths=round(total / best / 1e6, 3),
            supersteps=stats["supersteps"],
            segments=stats["segments"], shadow=stats["shadow_rays"],
            prepass_s=round(stats["prepass_seconds"], 3))
        log(f"{name}/{label}: {stage[label]}")
        RESULTS[name] = stage
        save()
    # estimator parity across configs (statistical, ulp ray-gen diffs)
    ref_label = "base" if "base" in imgs else sorted(imgs)[0]
    b = imgs[ref_label]
    for label in imgs:
        if label != ref_label:
            d = np.abs(imgs[label] - b)
            stage[f"dmean_{label}"] = float(d.mean())
    RESULTS[name] = stage
    save()
    _set_env({})


def main():
    global OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=OUT)
    ap.add_argument("--stages", default="terrain")
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config labels")
    args = ap.parse_args()
    OUT = args.out
    stages = args.stages.split(",")
    global ONLY
    ONLY = None if args.configs is None else set(args.configs.split(","))

    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    log(f"backend={jax.default_backend()} cache={CACHE_DIR}")
    RESULTS["backend"] = jax.default_backend()

    if "terrain" in stages:
        scene = terrain_scene(100_000, width=512, height=256)
        st = ir.RenderSettings(width=512, height=256, spp=64, max_depth=64,
                               integrator="mis", batch_size=1 << 17)
        ab_stage("terrain100k_64spp", scene, st, 512 * 256 * 64)

    if "m500k" in stages:
        scene = terrain_scene(500_000, width=512, height=256)
        st = ir.RenderSettings(width=512, height=256, spp=16, max_depth=64,
                               integrator="mis", batch_size=1 << 17)
        ab_stage("m500k_16spp", scene, st, 512 * 256 * 16)

    if "envtex" in stages:
        from vimg_tpu.scene.synthetic import textured_terrain_scene
        scene = textured_terrain_scene(100_000, width=512, height=256)
        st = ir.RenderSettings(width=512, height=256, spp=16, max_depth=64,
                               integrator="mis", batch_size=1 << 17)
        ab_stage("envtex_16spp", scene, st, 512 * 256 * 16)

    log(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
