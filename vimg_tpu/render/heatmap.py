"""BVH-cost heatmap (reference src/integrators/heatmap.cpp).

One primary ray per pixel center; the traversal cost (0.5/node, 1.0/prim
test) times a user factor is mapped through the Turbo colormap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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
                   factor=1.0):
    """Returns an sRGB-ready (H, W, 3) image of traversal cost."""
    W, H = settings.width, settings.height
    pixels = jnp.arange(W * H, dtype=jnp.int32)
    x = (pixels % W).astype(jnp.float32) + 0.5
    y = (H - 1 - pixels // W).astype(jnp.float32) + 0.5

    @jax.jit
    def run(scene):
        ro, rd, _, _ = generate_rays(scene.camera, x, y,
                                     jnp.zeros_like(x), jnp.zeros_like(x))
        minT = 1e-4 + rd[..., 0] * 0.0
        maxT = jnp.inf + rd[..., 0] * 0.0
        from vimg_tpu.geometry.bvh import BVHTracer, bvh_traverse
        if hasattr(tracer, "bvh"):
            _, cost = bvh_traverse(scene, tracer.bvh, ro, rd, minT, maxT,
                                   count_cost=True)
        else:
            # brute force: every ray tests every primitive
            n = scene.n_tris() + scene.n_spheres()
            tracer.closest(scene, ro, rd, minT, maxT)
            cost = jnp.full((W * H,), float(n))
        return turbo(cost * factor / 255.0)

    img = np.asarray(run(scene)).reshape(H, W, 3)
    return np.clip(img, 0.0, 1.0)
