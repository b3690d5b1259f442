"""Render the reference's headline image at full resolution on TPU and
compare against the shipped golden.

Produces renders/disney_spheres_agx.png (1800x800, 512 spp, MIS, AgX) with
the megakernel, then prints diff stats vs the reference's
renders/disney_spheres_agx_512.png (downsampled to its 512-px width).
Run ALONE (single TPU client).
"""
import dataclasses
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

SCENE = "/root/reference/scenes/disney_spheres.json"
GOLDEN = "/root/reference/renders/disney_spheres_agx_512.png"
OUT = "/root/repo/renders/disney_spheres_agx.png"


def main():
    import jax.numpy as jnp
    from PIL import Image

    from vimg_tpu.render import film
    from vimg_tpu.render.mega import render_megakernel
    from vimg_tpu.scene.json_loader import load_json_scene

    print("backend:", jax.default_backend(), flush=True)
    scene, st = load_json_scene(SCENE)
    st = dataclasses.replace(st, spp=512)
    img, stats = render_megakernel(scene, st, rows=32, return_stats=True)
    print(f"render: {st.width}x{st.height}@{st.spp}spp in "
          f"{stats['seconds']:.2f}s "
          f"({st.width * st.height * st.spp / stats['seconds'] / 1e6:.1f} "
          f"Mpaths/s)", flush=True)

    tone = np.asarray(film.finalize(jnp.asarray(img), tonemap="agx"))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    Image.fromarray((np.clip(tone, 0, 1) * 255).astype(np.uint8)).save(OUT)
    print("wrote", OUT, flush=True)

    if os.path.exists(GOLDEN):
        g = Image.open(GOLDEN).convert("RGB")
        gw, gh = g.size
        ours = Image.fromarray(
            (np.clip(tone, 0, 1) * 255).astype(np.uint8)).resize(
            (gw, gh), Image.BILINEAR)
        a = np.asarray(ours, np.float32) / 255.0
        b = np.asarray(g, np.float32) / 255.0
        d = np.abs(a - b)
        corr = np.corrcoef(a.mean(-1).ravel(), b.mean(-1).ravel())[0, 1]
        print(f"vs golden {os.path.basename(GOLDEN)} ({gw}x{gh}): "
              f"mean|d|={d.mean():.4f} p99|d|={np.percentile(d, 99):.4f} "
              f"corr={corr:.4f}", flush=True)


if __name__ == "__main__":
    main()
