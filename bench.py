"""Benchmark: MIS path tracing throughput on the reference's headline scene.

Baseline: atom501/v-img renders disney_spheres (1800x800, 512 spp, MIS,
Russian-roulette depth) in 57 s on a Ryzen 7 7700 => ~12.9 M camera paths/s
(README.md:81, BASELINE.md). We measure camera paths/s of the same scene/
settings on one TPU chip and report vs that baseline.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PATHS_PER_S = 12.9e6
SCENE = "/root/reference/scenes/disney_spheres.json"


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import dataclasses

    from vimg_tpu.geometry.trace import make_tracer
    from vimg_tpu.render.integrators import trace_radiance
    from vimg_tpu.scene import ir

    if os.path.exists(SCENE):
        from vimg_tpu.scene.json_loader import load_json_scene
        scene, settings = load_json_scene(SCENE)
    else:
        from __graft_entry__ import _flagship_scene
        scene, settings = _flagship_scene()

    settings = dataclasses.replace(settings, batch_size=1 << 20)
    tracer = make_tracer(scene)

    W, H, spp = settings.width, settings.height, settings.spp
    total = W * H * spp
    B = settings.batch_size

    @jax.jit
    def chunk(scene, k0):
        k = k0 + jnp.arange(B, dtype=jnp.int32)
        pix = (k // spp) % (W * H)
        samp = k % spp
        col = trace_radiance(scene, settings, tracer, pix, samp,
                             integrator="mis")
        # reduce to tiny output so timing measures trace, not transfer
        return jnp.sum(col)

    # warmup / compile
    chunk(scene, jnp.int32(0)).block_until_ready()

    # time a representative slice of the full 512-spp frame, then scale
    bench_chunks = max(4, min(32, total // B // 8 or 4))
    t0 = time.time()
    acc = 0.0
    for c in range(bench_chunks):
        acc += float(chunk(scene, jnp.int32((c * B) % total)))
    dt = time.time() - t0
    paths_per_s = bench_chunks * B / dt

    full_frame_s = total / paths_per_s
    result = {
        "metric": "camera paths/s, mis integrator, disney_spheres 1800x800@512spp (1 chip)",
        "value": round(paths_per_s, 1),
        "unit": "paths/s",
        "vs_baseline": round(paths_per_s / BASELINE_PATHS_PER_S, 3),
    }
    print(json.dumps(result))
    print(f"# est. full-frame time: {full_frame_s:.1f}s "
          f"(reference: 57s on Ryzen 7 7700)", file=sys.stderr)


if __name__ == "__main__":
    main()
