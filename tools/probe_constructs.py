"""Bisect which Pallas construct wedges the remote Mosaic compiler.
Each step compiles a toy kernel (tiny shapes) and prints timing; run ALONE."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8, 128
C = 8          # clusters
K = 8          # tris per cluster


def run(name, fn, *args):
    t0 = time.time()
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        print(f"ok   {name} ({time.time()-t0:.1f}s) sum={float(np.asarray(out).sum()):.3f}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)


print("backend:", jax.default_backend(), flush=True)
t0 = time.time()
jax.block_until_ready(jax.jit(lambda a: a * 2)(jnp.arange(8.0)))
print(f"tunnel alive ({time.time()-t0:.1f}s)", flush=True)

aabbs = jnp.arange(C * 8, dtype=jnp.float32).reshape(C, 8)
tris = jnp.arange(C * K * 16, dtype=jnp.float32).reshape(C * K, 16) * 1e-3
rays = jnp.ones((R, L), jnp.float32)

# 1. fori + DYNAMIC SMEM scalar reads
def k1(aabb_ref, ray_ref, out_ref):
    x = ray_ref[:]
    def body(c, acc):
        return acc + aabb_ref[c, 0] * x
    out_ref[:] = jax.lax.fori_loop(0, C, body, jnp.zeros((R, L), jnp.float32))

run("1 fori+dyn-smem-read", lambda a, r: pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, r), aabbs, rays)

# 2. + DMA from ANY ref in the loop
def k2(aabb_ref, tri_ref, ray_ref, out_ref, buf, sem):
    x = ray_ref[:]
    def body(c, acc):
        dma = pltpu.make_async_copy(tri_ref.at[pl.ds(c * K, K), :], buf, sem)
        dma.start()
        dma.wait()
        return acc + aabb_ref[c, 0] * x + buf[0, 0]
    out_ref[:] = jax.lax.fori_loop(0, C, body, jnp.zeros((R, L), jnp.float32))

run("2 +dma-any", lambda a, t, r: pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.ANY),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((K, 16), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(a, t, r), aabbs, tris, rays)

# 3. + lax.cond with vector carry
def k3(aabb_ref, tri_ref, ray_ref, out_ref, buf, sem):
    x = ray_ref[:]
    def body(c, acc):
        dma = pltpu.make_async_copy(tri_ref.at[pl.ds(c * K, K), :], buf, sem)
        dma.start()
        live = (aabb_ref[c, 0] * x) < 5.0
        dma.wait()
        def yes(a):
            for k in range(K):
                a = a + buf[k, 0] * jnp.where(live, x, 0.0)
            return a
        return jax.lax.cond(jnp.any(live), yes, lambda a: a, acc)
    out_ref[:] = jax.lax.fori_loop(0, C, body, jnp.zeros((R, L), jnp.float32))

run("3 +cond-unroll", lambda a, t, r: pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.ANY),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((K, 16), jnp.float32),
                    pltpu.SemaphoreType.DMA(())])(a, t, r), aabbs, tris, rays)

# 4. the real thing, tiny: actual ClusterTracer on a 100-tri scene
from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder
from vimg_tpu.render.camera import Camera
from vimg_tpu.core.math import look_at
rs = np.random.RandomState(0)
T = 100
c = rs.rand(T, 3).astype(np.float32)
verts = (c[:, None, :] + 0.05 * rs.randn(T, 3, 3).astype(np.float32)).reshape(-1, 3)
b = SceneBuilder()
m = b.add_material(ir.MAT_LAMBERTIAN, base=(0.5, 0.5, 0.5))
b.add_mesh(verts, np.arange(T * 3).reshape(T, 3), m)
cam = Camera.make(look_at([0.5, 0.5, 3], [0.5, 0.5, 0.5], [0, 1, 0]), 8, 8, 45.0)
scene = b.build(camera=cam)
ct = ClusterTracer(scene)
B = 2048
ro = jnp.asarray(rs.rand(B, 3).astype(np.float32) * 2 - 0.5)
rd = rs.randn(B, 3).astype(np.float32)
rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
t0 = time.time()
hr = ct.closest(scene, ro, rd, jnp.full((B,), 1e-4), jnp.full((B,), jnp.inf))
jax.block_until_ready(hr.t)
print(f"ok   4 real tiny tracer ({time.time()-t0:.1f}s) hits={int(np.asarray(hr.hit).sum())}", flush=True)
print("done", flush=True)
