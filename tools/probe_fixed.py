"""Isolate the ~40ms fixed cost per cluster-tracer call: tunnel RTT vs
XLA glue vs pallas dispatch vs tree size. Run ALONE (single TPU client)."""
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
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(f(x))
    best = np.inf
    for _ in range(10):
        t0 = time.time()
        jax.block_until_ready(f(x))
        best = min(best, time.time() - t0)
    print(f"RTT floor (trivial jitted op, blocked): {best*1e3:.2f} ms",
          flush=True)

    W, H = 512, 256
    B = W * H
    pix = np.arange(B, dtype=np.int32)
    x_ = (pix % W).astype(np.float32) + 0.5
    y_ = (H - 1 - pix // W).astype(np.float32) + 0.5

    for T in (100_000, 1_000):
        scene = bumpy_sphere_scene(T, width=W, height=H)
        ro, rd, _, _ = generate_rays(scene.camera, jnp.asarray(x_),
                                     jnp.asarray(y_), jnp.zeros(B),
                                     jnp.zeros(B))
        ro = jax.block_until_ready(ro)
        minT = jnp.full((B,), 1e-4)
        maxT = jnp.full((B,), jnp.inf)
        for sort in (True, False):
            ct = ClusterTracer(scene, tile_rows=16, sort_rays=sort)
            jax.block_until_ready(ct.closest(scene, ro, rd, minT, maxT).t)
            # blocked per call
            blocked = np.inf
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(
                    ct.closest(scene, ro, rd, minT, maxT).t)
                blocked = min(blocked, time.time() - t0)
            # pipelined: N calls, one sync
            N = 8
            t0 = time.time()
            outs = [ct.closest(scene, ro, rd, minT, maxT).t
                    for _ in range(N)]
            jax.block_until_ready(outs)
            piped = (time.time() - t0) / N
            print(f"T={T:6d} sort={int(sort)}: blocked {blocked*1e3:6.1f}ms "
                  f"({B/blocked/1e6:5.2f} Mrays/s) | pipelined "
                  f"{piped*1e3:6.1f}ms ({B/piped/1e6:5.2f} Mrays/s)",
                  flush=True)


if __name__ == "__main__":
    main()
