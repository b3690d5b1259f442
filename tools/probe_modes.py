"""Measure cluster-kernel memory modes (stream / resident_dma /
resident_direct) x tile_rows on the synthetic 100k-tri scene.
Run ALONE (single TPU client)."""
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.render.camera import generate_rays
from vimg_tpu.scene.synthetic import bumpy_sphere_scene


def bench(fn):
    r = fn()
    jax.block_until_ready(r.t if hasattr(r, "t") else r)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r.t if hasattr(r, "t") else r)
        best = min(best, time.time() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    jax.block_until_ready(jax.jit(lambda a: a * 2)(jnp.arange(8.0)))

    W, H = 512, 256
    scene = bumpy_sphere_scene(100_000, width=W, height=H)
    B = W * H
    pix = np.arange(B, dtype=np.int32)
    x = (pix % W).astype(np.float32) + 0.5
    y = (H - 1 - pix // W).astype(np.float32) + 0.5
    ro, rd, _, _ = generate_rays(scene.camera, jnp.asarray(x),
                                 jnp.asarray(y), jnp.zeros(B), jnp.zeros(B))
    ro = jax.block_until_ready(ro)
    minT = jnp.full((B,), 1e-4)
    maxT = jnp.full((B,), jnp.inf)

    # incoherent bounce-like rays: origins on the surface, random dirs
    rs = np.random.RandomState(1)
    ro_i = jnp.asarray(rs.rand(B, 3).astype(np.float32) * 2.4 - 1.2)
    rd_i = rs.randn(B, 3).astype(np.float32)
    rd_i = jnp.asarray(rd_i / np.linalg.norm(rd_i, axis=-1, keepdims=True))

    for mode, rows in itertools.product(
            ("resident_direct", "resident_dma", "stream"), (8, 16)):
        try:
            ct = ClusterTracer(scene, tile_rows=rows, mode=mode)
            t_c = bench(lambda: ct.closest(scene, ro, rd, minT, maxT))
            t_i = bench(lambda: ct.closest(scene, ro_i, rd_i, minT, maxT))
            t_s = bench(lambda: ct.occluded(scene, ro_i, rd_i, minT,
                                            jnp.full((B,), 2.0)))
            print(f"{mode:16s} rows={rows:2d}: "
                  f"coh {B/t_c/1e6:6.2f} | incoh {B/t_i/1e6:6.2f} | "
                  f"shadow {B/t_s/1e6:6.2f} Mrays/s "
                  f"({t_c*1e3:.1f}/{t_i*1e3:.1f}/{t_s*1e3:.1f} ms)",
                  flush=True)
        except Exception as e:
            print(f"{mode} rows={rows}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
