"""TPU A/B: megakernel disney_spheres f32 vs bf16 shading.

Run: python tools/probe_bf16.py  (single process owns the TPU grant)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from vimg_tpu.scene.json_loader import load_json_scene  # noqa: E402
from vimg_tpu.render.mega import render_megakernel  # noqa: E402

SCENE = "/root/reference/scenes/disney_spheres.json"


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene, st = load_json_scene(SCENE)
    st = dataclasses.replace(st, spp=512)
    total = st.width * st.height * st.spp
    imgs = {}
    for dtype in ("f32", "bf16"):
        sd = dataclasses.replace(st, shading_dtype=dtype)
        img, stats = render_megakernel(scene, sd, rows=32,
                                       return_stats=True)  # warm/compile
        best = stats["seconds"]
        for _ in range(3):
            img, s2 = render_megakernel(scene, sd, rows=32,
                                        return_stats=True)
            best = min(best, s2["seconds"])
        imgs[dtype] = np.asarray(img)
        print(f"{dtype}: best {best:.3f}s {total / best / 1e6:.1f} Mpaths/s",
              flush=True)
    d = np.abs(imgs["f32"] - imgs["bf16"])
    print(f"mean|d| {d.mean():.2e} max|d| {d.max():.2e} "
          f"nan f32={np.isnan(imgs['f32']).sum()} "
          f"bf16={np.isnan(imgs['bf16']).sum()}", flush=True)


if __name__ == "__main__":
    main()
