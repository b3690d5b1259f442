"""BVH-cost heatmap (reference src/integrators/heatmap.cpp).

``spp`` jittered primary rays per pixel (the reference forces spp=4,
main.cpp:249-256, with R2 pixel offsets indexed x+y+s and thin-lens rands,
heatmap.cpp:101-115); the per-pixel traversal cost (0.5/node, 1.0/prim
test) is averaged, truncated to an integer (heatmap.cpp:118-119), divided
by the user factor (default 20 when <= 0, heatmap.cpp:137-139) and mapped
through the Turbo colormap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.core import rng
from vimg_tpu.render.camera import generate_rays
from vimg_tpu.scene import ir

# Polynomial approximation of Google's Turbo colormap
# (Mikhailov 2019, public polynomial fit).
_R = jnp.asarray([0.13572138, 4.61539260, -42.66032258, 132.13108234,
                  -152.94239396, 59.28637943])
_G = jnp.asarray([0.09140261, 2.19418839, 4.84296658, -14.18503333,
                  4.27729857, 2.82956604])
_B = jnp.asarray([0.10667330, 12.64194608, -60.58204836, 110.36276771,
                  -89.90310912, 27.34824973])


def turbo(x):
    x = jnp.clip(x, 0.0, 1.0)
    v = jnp.stack([jnp.ones_like(x), x, x ** 2, x ** 3, x ** 4, x ** 5],
                  axis=-1)
    return jnp.stack([v @ _R, v @ _G, v @ _B], axis=-1)


def render_heatmap(scene: ir.Scene, settings: ir.RenderSettings, tracer,
                   factor=1.0, spp=4):
    """Returns an sRGB-ready (H, W, 3) image of traversal cost.

    ``spp`` jittered samples per pixel, averaged then floored, matching the
    reference's forced spp=4 heatmap runs (main.cpp:249-256)."""
    W, H = settings.width, settings.height
    if factor <= 0:
        factor = 20.0          # reference heatmap.cpp:137-139
    pixels = jnp.arange(W * H, dtype=jnp.int32)
    xi = pixels % W
    yi = pixels // W           # yi counts from the TOP row (film order);
    yr = (H - 1) - yi          # reference-convention bottom-up y

    @jax.jit
    def run(scene):
        cost = jnp.zeros((W * H,), jnp.float32)
        for s in range(spp):
            # reference jitter: R2 offsets at index x + y + s
            # (heatmap.cpp:104-106) + thin-lens rands per sample
            ox, oy = rng.r2_sequence(xi + yr + s)
            l1, l2 = rng.uniform2(pixels, s, 0, rng.Draw.CAMERA_LENS)
            ro, rd, _, _ = generate_rays(scene.camera,
                                         xi.astype(jnp.float32) + ox,
                                         yr.astype(jnp.float32) + oy,
                                         l1, l2)
            minT = 1e-4 + rd[..., 0] * 0.0
            maxT = jnp.inf + rd[..., 0] * 0.0
            from vimg_tpu.geometry.bvh import bvh_traverse
            if hasattr(tracer, "bvh"):
                _, c = bvh_traverse(scene, tracer.bvh, ro, rd, minT, maxT,
                                    count_cost=True)
            else:
                # brute force: every ray tests every primitive
                n = scene.n_tris() + scene.n_spheres()
                tracer.closest(scene, ro, rd, minT, maxT)
                c = jnp.full((W * H,), float(n))
            cost = cost + c
        # average, then truncate like the reference's uint32 cast
        # (heatmap.cpp:118-119)
        avg = jnp.floor(cost / spp)
        return turbo(avg / factor)

    img = np.asarray(run(scene)).reshape(H, W, 3)
    return np.clip(img, 0.0, 1.0)
