"""Round-5 probe H: megakernel NEE light-chain slope (VERDICT r4 #7).

The megakernel fetches the NEE-picked light's parameters through a
per-lane select chain that scales O(n_lights) (render/mega/kernel.py
sample_lights), and caps lights at 48 (+ spheres at 64). Real glTF
scenes register every emissive primitive as a light. This probe sweeps
n_lights on the many-lights sphere scene with the caps lifted to
measure the actual chain slope; a mild slope justifies raising the cap,
a steep one documents why it stays.

Usage: python tools/probe_r5h.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from vimg_tpu.utils.compcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

RESULTS = {}
OUT = "/root/repo/bench_records/r5_probe_h.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    from vimg_tpu.render import mega
    from vimg_tpu.render.mega import kernel as mk
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import many_lights_scene

    print("backend:", jax.default_backend(), flush=True)
    mk.MEGA_MAX_LIGHTS = 4096      # lifted for the sweep
    mk.MEGA_MAX_SPHERES = 4096
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=8,
                           integrator="mis")
    total = 512 * 256 * 32
    for nl in (16, 48, 128, 256):
        scene = many_lights_scene(nl, width=512, height=256)
        ok = mega.supports_megakernel(scene, st)
        if not ok:
            RESULTS[f"nl{nl}"] = "unsupported"
            print(f"nl={nl}: unsupported", flush=True)
            save()
            continue
        t0 = time.time()
        img, stats = mega.render_megakernel(scene, st, rows=32,
                                            return_stats=True)
        compile_s = time.time() - t0
        best = stats["seconds"]
        for _ in range(2):
            _, s2 = mega.render_megakernel(scene, st, rows=32,
                                           return_stats=True)
            best = min(best, s2["seconds"])
        RESULTS[f"nl{nl}"] = dict(
            secs=round(best, 3), mpaths=round(total / best / 1e6, 2),
            compile_s=round(compile_s, 1),
            img_mean=float(np.asarray(img).mean()))
        print(f"nl={nl}: {RESULTS[f'nl{nl}']}", flush=True)
        save()
    print(json.dumps(RESULTS, indent=1), flush=True)


if __name__ == "__main__":
    main()
