"""Probe: validate the Pallas TPU pieces the megakernel needs, on-chip.

Checks (each prints ok/fail):
  1. grid + blocked output write (film-window pattern)
  2. lax.while_loop inside a kernel with a reduction-based cond
  3. uint32 PCG4D arithmetic in-kernel == host rng.uniform4
  4. scene scalars as kernel operands read via static indices
  5. transcendentals (sin/cos/sqrt/log/exp) lower
  6. timing: a synthetic "path-segment-shaped" loop to bound throughput

Run alone (single-client TPU tunnel): python tools/probe_pallas.py [--cpu]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimg_tpu.core import rng

INTERPRET = jax.default_backend() == "cpu"
LS, LANES = 8, 128


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"ok   {name}  ({time.time()-t0:.1f}s)")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {e}")


# --- 1. grid + blocked output ---------------------------------------------
def t_grid():
    P = 256

    def kernel(o_ref):
        g = pl.program_id(0)
        col = jax.lax.broadcasted_iota(jnp.float32, (8, P), 1)
        o_ref[:] = col + g * 1000.0

    out = pl.pallas_call(
        kernel,
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((4 * 8, P), jnp.float32),
        out_specs=pl.BlockSpec((8, P), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )()
    out = np.asarray(jax.block_until_ready(out))
    assert out[9, 5] == 1005.0 and out[25, 7] == 3007.0, out[[9, 25]][:, :8]


# --- 2. while_loop with reduction cond ------------------------------------
def t_while():
    def kernel(x_ref, o_ref):
        def cond(c):
            v, it = c
            return (jnp.max(v) < 100.0) & (it < 1000)

        def body(c):
            v, it = c
            return v * 1.1 + 0.01, it + 1

        v, it = jax.lax.while_loop(cond, body, (x_ref[:], jnp.int32(0)))
        o_ref[:] = v + it.astype(jnp.float32) * 0.0

    x = jnp.full((LS, LANES), 0.5, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((LS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x)
    out = np.asarray(jax.block_until_ready(out))
    assert out.max() >= 100.0, out.max()


# --- 3. PCG4D in-kernel ----------------------------------------------------
def t_pcg():
    def kernel(o_ref):
        pix = jax.lax.broadcasted_iota(jnp.int32, (LS, LANES), 1)
        samp = jax.lax.broadcasted_iota(jnp.int32, (LS, LANES), 0)
        r1, r2, r3, r4 = rng.uniform4(pix, samp, 3, 7)
        o_ref[:] = r1 + r2 * 2.0 + r3 * 4.0 + r4 * 8.0

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((LS, LANES), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )()
    pix = jnp.broadcast_to(jnp.arange(LANES, dtype=jnp.int32), (LS, LANES))
    samp = jnp.broadcast_to(jnp.arange(LS, dtype=jnp.int32)[:, None],
                            (LS, LANES))
    e1, e2, e3, e4 = rng.uniform4(pix, samp, 3, 7)
    exp = np.asarray(e1 + e2 * 2 + e3 * 4 + e4 * 8)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-6)


# --- 4. scalar operand reads ----------------------------------------------
def t_scalars():
    tbl = jnp.arange(24, dtype=jnp.float32).reshape(2, 12) + 0.5

    def kernel(tbl_ref, o_ref):
        acc = jnp.zeros((LS, LANES), jnp.float32)
        for i in range(2):
            for k in range(3):
                acc = acc + tbl_ref[i, k]
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((LS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(tbl)
    exp = float(sum(tbl[i, k] for i in range(2) for k in range(3)))
    assert abs(float(np.asarray(out)[0, 0]) - exp) < 1e-4


# --- 5. transcendentals ----------------------------------------------------
def t_transcendental():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = (jnp.sin(x) + jnp.cos(x) + jnp.sqrt(x + 1.0)
                    + jnp.log(x + 2.0) + jnp.exp(-x) + jnp.arctan2(x, x + 1)
                    + jnp.power(x + 1.0, 1.7))

    x = jnp.linspace(0, 1, LS * LANES, dtype=jnp.float32).reshape(LS, LANES)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((LS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x)
    xs = np.asarray(x, np.float64)
    exp = (np.sin(xs) + np.cos(xs) + np.sqrt(xs + 1) + np.log(xs + 2)
           + np.exp(-xs) + np.arctan2(xs, xs + 1) + np.power(xs + 1, 1.7))
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4)


# --- 6. synthetic throughput ----------------------------------------------
def t_throughput():
    """~200-flop loop body over (LS2,128) lanes, N iters, G grid steps:
    prints effective Gflop/s as the megakernel's compute ceiling probe."""
    LS2 = 64          # 8192 lanes
    ITERS = 2000
    G = 16
    FLOPS_PER_ITER = 60  # rough count of the body below

    def kernel(o_ref):
        g = pl.program_id(0)

        def body(i, c):
            a, b = c
            t = a * 1.000001 + b * 0.5
            u = b * a + 0.25
            v = jax.lax.rsqrt(t * t + u * u + 1.0)
            w = t * v + u * 0.1
            a2 = jnp.where(w > 0.5, w * 0.99, w + 0.01)
            b2 = u * v - t * 0.001
            x = a2 * b2 + v
            y = x * x + a2
            z = y * 0.5 + x * b2
            return z, y + g * 0.0

        a0 = jnp.full((LS2, LANES), 0.3, jnp.float32)
        b0 = jnp.full((LS2, LANES), 0.7, jnp.float32)
        a, b = jax.lax.fori_loop(0, ITERS, body, (a0, b0))
        o_ref[:] = a + b

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((G * LS2, LANES), jnp.float32),
        out_specs=pl.BlockSpec((LS2, LANES), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )
    jf = jax.jit(f)
    jax.block_until_ready(jf())
    t0 = time.time()
    jax.block_until_ready(jf())
    dt = time.time() - t0
    total = G * LS2 * LANES * ITERS * FLOPS_PER_ITER
    print(f"     synthetic loop: {dt*1e3:.1f} ms, "
          f"~{total/dt/1e9:.0f} Gflop-eq/s "
          f"({G*LS2*LANES*ITERS/dt/1e6:.0f} M lane-iters/s)")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), "interpret:", INTERPRET)
    check("grid+blocked-output", t_grid)
    check("while_loop", t_while)
    check("pcg4d", t_pcg)
    check("smem-scalars", t_scalars)
    check("transcendentals", t_transcendental)
    check("throughput", t_throughput)
