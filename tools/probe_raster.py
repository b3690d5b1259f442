"""Cluster tracer under REAL raster-order camera rays (tile-coherent, the
wavefront's actual layout) on a 100k-tri mesh, plus tile-size / K sweeps.
Run ALONE (single TPU client)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder
from vimg_tpu.render.camera import Camera, generate_rays
from vimg_tpu.core.math import look_at


def bumpy_sphere(T=100_000, seed=0):
    rs = np.random.RandomState(seed)
    n = int(np.sqrt(T / 2)) + 1
    th = np.linspace(1e-3, np.pi - 1e-3, n)
    ph = np.linspace(0, 2 * np.pi, n)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    r = 1.0 + 0.05 * rs.randn(n, n)
    verts = np.stack([(r * np.sin(tt) * np.cos(pp)).ravel(),
                      (r * np.cos(tt)).ravel(),
                      (r * np.sin(tt) * np.sin(pp)).ravel()],
                     -1).astype(np.float32)
    quads = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            quads += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    tris = np.asarray(quads[:T] if len(quads) > T else quads)
    b = SceneBuilder()
    m = b.add_material(ir.MAT_LAMBERTIAN, base=(0.5, 0.5, 0.5))
    b.add_mesh(verts, tris, m)
    W, H = 512, 256
    cam = Camera.make(look_at([0, 0, 3.2], [0, 0, 0], [0, 1, 0]), W, H, 40.0)
    return b.build(camera=cam), W, H


def main():
    print("backend:", jax.default_backend(), flush=True)
    jax.block_until_ready(jax.jit(lambda a: a * 2)(jnp.arange(8.0)))

    scene, W, H = bumpy_sphere()
    B = W * H
    pix = np.arange(B, dtype=np.int32)
    x = (pix % W).astype(np.float32) + 0.5
    y = (H - 1 - pix // W).astype(np.float32) + 0.5
    ro, rd, _, _ = generate_rays(scene.camera, jnp.asarray(x), jnp.asarray(y),
                                 jnp.zeros(B), jnp.zeros(B))
    ro = jax.block_until_ready(ro)
    minT = jnp.full((B,), 1e-4)
    maxT = jnp.full((B,), jnp.inf)

    rs = np.random.RandomState(1)
    for tile_rows, max_k in [(16, 64), (8, 64), (4, 64), (16, 32), (8, 32)]:
        t0 = time.time()
        ct = ClusterTracer(scene, max_k=max_k, tile_rows=tile_rows)
        tb = time.time() - t0
        t0 = time.time()
        hr = ct.closest(scene, ro, rd, minT, maxT)
        jax.block_until_ready(hr.t)
        first = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(ct.closest(scene, ro, rd, minT, maxT).t)
            best = min(best, time.time() - t0)
        hitrate = float(np.asarray(hr.hit).mean())
        # bounce-style rays: origins at hit points, cosine-ish dirs (still
        # raster-ordered lanes -> origins tile-coherent, dirs diffuse)
        p = np.asarray(ro + rd * np.asarray(hr.t)[:, None].clip(0, 10))
        d2 = rs.randn(B, 3).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        ro2 = jnp.asarray(np.where(np.asarray(hr.hit)[:, None], p, 0.0))
        rd2 = jnp.asarray(d2)
        best2 = np.inf
        jax.block_until_ready(ct.closest(scene, ro2, rd2, minT, maxT).t)
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(ct.closest(scene, ro2, rd2, minT, maxT).t)
            best2 = min(best2, time.time() - t0)
        print(f"rows={tile_rows} K={max_k}: clusters={ct.data.n_clusters} "
              f"nodes={ct.data.n_nodes} build={tb:.1f}s first={first:.1f}s "
              f"primary={best*1e3:.1f}ms ({B/best/1e6:.2f} Mrays/s, "
              f"hit {hitrate:.2f}) bounce={best2*1e3:.1f}ms "
              f"({B/best2/1e6:.2f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
