"""VPU throughput probe: f32 vs bf16 with INDEPENDENT FMA chains (the
probe_r2c vpu test was latency-bound — one serial chain measures op
latency x trip count, not throughput). 8 parallel accumulators per
iteration expose the real issue rate; if bf16 is ~2x f32 here, the
megakernel's shading math is worth casting (geometry stays f32).

Also times one mesh-walk-shaped mix (fma + compare + select) per dtype,
and a no-loop straight-line unroll to bound loop overhead.

Usage: python tools/probe_vpu2.py   (owns the TPU tunnel)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32
SHAPE = (ROWS, 128)


def _time(fn, *args, reps=30):
    r = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.time() - t0) / reps)
    return best, r


def fma_throughput(dtype, chains=8, iters=300):
    x0 = np.random.RandomState(3).rand(*SHAPE).astype(np.float32)

    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(dtype)
        c1 = jnp.asarray(1.000001, dtype)
        accs = tuple(x + jnp.asarray(0.001 * i, dtype)
                     for i in range(chains))

        def body(k, accs):
            return tuple(a * c1 + jnp.asarray(1e-7 * (i + 1), dtype)
                         for i, a in enumerate(accs))
        accs = jax.lax.fori_loop(0, iters, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:] = acc.astype(jnp.float32)

    fn = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
    dt, _ = _time(fn, x0)
    flops = 2 * chains * iters * ROWS * 128
    return f"{flops / dt / 1e9:.0f} Gflop/s ({dt*1e6:.0f}us)"


def mix_throughput(dtype, iters=200):
    """fma + compare + select mix, ~ the tri-test op blend."""
    x0 = np.random.RandomState(4).rand(*SHAPE).astype(np.float32)

    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(dtype)
        c1 = jnp.asarray(1.0000013, dtype)
        a = x
        b = x + jnp.asarray(0.5, dtype)
        c = x + jnp.asarray(0.25, dtype)
        d = x + jnp.asarray(0.75, dtype)

        def body(k, v):
            a, b, c, d = v
            a = a * c1 + jnp.asarray(1e-7, dtype)
            b = b * c1 + jnp.asarray(2e-7, dtype)
            hit = (a > b) & (c < d)
            c = jnp.where(hit, a, c) * c1
            d = jnp.where(hit, b, d) + jnp.asarray(1e-7, dtype)
            return a, b, c, d
        a, b, c, d = jax.lax.fori_loop(0, iters, body, (a, b, c, d))
        o_ref[:] = (a + b + c + d).astype(jnp.float32)

    fn = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
    dt, _ = _time(fn, x0)
    ops = 10 * iters * ROWS * 128   # ~10 vector ops per iter
    return f"{ops / dt / 1e9:.0f} Gop/s ({dt*1e6:.0f}us)"


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        try:
            print(f"fma {dt_name}: {fma_throughput(dt)}", flush=True)
        except Exception as e:
            print(f"fma {dt_name}: FAIL {str(e).splitlines()[0][:200]}",
                  flush=True)
        try:
            print(f"mix {dt_name}: {mix_throughput(dt)}", flush=True)
        except Exception as e:
            print(f"mix {dt_name}: FAIL {str(e).splitlines()[0][:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
