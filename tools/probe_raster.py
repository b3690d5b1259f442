"""Cluster-tracer coherence probe: REAL camera/bounce/shadow ray
distributions on a 100k-tri mesh, sweeping tile size, cluster K, and the
ray-sort key. Prints Mrays/s plus per-tile node/leaf visit counts (the
quantity that decides everything — cost ~= leaf_visits * K * lanes).
Run ALONE (single TPU client)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.render.camera import generate_rays
from vimg_tpu.scene.synthetic import bumpy_sphere_scene


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

    rs = np.random.RandomState(1)

    def bench(ct, name, o, d):
        jax.block_until_ready(ct.closest(scene, o, d, minT, maxT).t)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(ct.closest(scene, o, d, minT, maxT).t)
            best = min(best, time.time() - t0)
        st = ct.trace_stats(o, d, minT, maxT)
        print(f"    {name}: {best*1e3:7.1f}ms {B/best/1e6:6.2f} Mrays/s "
              f"visits/tile mean={st[:,0].mean():6.0f} "
              f"leaves mean={st[:,1].mean():6.0f} max={st[:,1].max():.0f}",
              flush=True)
        return best

    # reference-style bounce rays: origins at primary hit points (raster
    # lane order preserved), cosine-weighted directions about the normal
    ct0 = ClusterTracer(scene, sort_rays=False)
    hr = ct0.closest(scene, ro, rd, minT, maxT)
    t = np.asarray(hr.t)
    hit = np.isfinite(t)
    p = np.asarray(ro) + np.asarray(rd) * np.clip(t, 0, 10)[:, None]
    n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
    u = rs.randn(B, 3).astype(np.float32)
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    d_bounce = n + u  # ~cosine lobe about outward normal
    d_bounce /= np.maximum(np.linalg.norm(d_bounce, axis=-1, keepdims=True),
                           1e-9)
    ro_b = jnp.asarray(np.where(hit[:, None], p, np.asarray(ro)))
    rd_b = jnp.asarray(np.where(hit[:, None], d_bounce, np.asarray(rd))
                       .astype(np.float32))
    # shadow-style rays: surface points toward one light position
    lp = np.array([2.0, 3.0, 1.5], np.float32)
    d_sh = lp - p
    d_sh /= np.maximum(np.linalg.norm(d_sh, axis=-1, keepdims=True), 1e-9)
    rd_s = jnp.asarray(np.where(hit[:, None], d_sh, np.asarray(rd))
                       .astype(np.float32))

    for max_k in (64, 32, 16):
        for rows in (8, 16, 32):
            for mode in ("off", "origin", "dir"):
                t0 = time.time()
                ct = ClusterTracer(scene, max_k=max_k, tile_rows=rows,
                                   sort_rays=mode != "off",
                                   sort_mode=mode if mode != "off"
                                   else "origin")
                tb = time.time() - t0
                print(f"K={max_k} rows={rows} sort={mode} "
                      f"(clusters={ct.data.n_clusters} build={tb:.1f}s)",
                      flush=True)
                bench(ct, "primary", ro, rd)
                bench(ct, "bounce ", ro_b, rd_b)
                bench(ct, "shadow ", ro_b, rd_s)


if __name__ == "__main__":
    main()
