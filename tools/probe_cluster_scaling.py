"""Find out whether the cluster kernel's pathology is compile or execute:
time tiny -> larger cluster kernels incrementally. Run ALONE (background,
generous timeout)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder
from vimg_tpu.render.camera import Camera
from vimg_tpu.core.math import look_at


def soup_scene(T, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.rand(T, 3).astype(np.float32)
    verts = (c[:, None, :]
             + 0.05 * rs.randn(T, 3, 3).astype(np.float32)).reshape(-1, 3)
    idx = np.arange(T * 3).reshape(T, 3)
    b = SceneBuilder()
    m = b.add_material(ir.MAT_LAMBERTIAN, base=(0.5, 0.5, 0.5))
    b.add_mesh(verts, idx, m)
    cam = Camera.make(look_at([0.5, 0.5, 3], [0.5, 0.5, 0.5], [0, 1, 0]),
                      8, 8, 45.0)
    return b.build(camera=cam)


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    jax.block_until_ready(jax.jit(lambda a: a * 2)(jnp.arange(8.0)))
    print(f"tunnel alive ({time.time()-t0:.1f}s)", flush=True)

    rs = np.random.RandomState(1)
    for T, B in [(300, 2048), (3000, 2048), (3000, 1 << 15),
                 (30000, 1 << 15), (100000, 1 << 15), (100000, 1 << 17)]:
        scene = soup_scene(T)
        t0 = time.time()
        ct = ClusterTracer(scene)
        tb = time.time() - t0
        ro = jnp.asarray(rs.rand(B, 3).astype(np.float32) * 2 - 0.5)
        rd = rs.randn(B, 3).astype(np.float32)
        rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
        minT = jnp.full((B,), 1e-4)
        maxT = jnp.full((B,), jnp.inf)
        t0 = time.time()
        hr = ct.closest(scene, ro, rd, minT, maxT)
        jax.block_until_ready(hr.t)
        first = time.time() - t0
        best = np.inf
        for _ in range(2):
            t0 = time.time()
            jax.block_until_ready(ct.closest(scene, ro, rd, minT, maxT).t)
            best = min(best, time.time() - t0)
        tiles = -(-B // (ct.tile_rows * 128))
        print(f"T={T} B={B}: clusters={ct.data.n_clusters} tiles={tiles} "
              f"build={tb:.1f}s first={first:.1f}s best={best:.4f}s "
              f"-> {B/best/1e6:.2f} Mrays/s "
              f"({tiles*ct.data.n_clusters} grid steps, "
              f"{best/max(tiles*ct.data.n_clusters,1)*1e6:.1f} us/step)",
              flush=True)


if __name__ == "__main__":
    main()
