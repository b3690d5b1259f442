"""Follow-up VPU probe: which mixed-precision select forms lower?

The shading-in-bf16 plan needs: compares in f32 (bf16 compares hit the
Mosaic i1-relayout gap), mul/add chains in bf16. Question: can an
f32-compare mask select bf16 values, or must selects be arithmetic
(mask cast to bf16, m*a + (1-m)*b)?

Usage: python tools/probe_vpu3.py   (owns the TPU tunnel)
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


def run(name, body_fn, iters=200):
    x0 = np.random.RandomState(4).rand(*SHAPE).astype(np.float32)

    def kernel(x_ref, o_ref):
        xf = x_ref[:]
        st = body_fn(xf, None, init=True)

        def body(k, st):
            return body_fn(xf, st)
        st = jax.lax.fori_loop(0, iters, body, st)
        acc = st[0].astype(jnp.float32)
        for a in st[1:]:
            acc = acc + a.astype(jnp.float32)
        o_ref[:] = acc

    try:
        fn = jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
        dt, r = _time(fn, x0)
        ops = 10 * iters * ROWS * 128
        print(f"{name}: {ops / dt / 1e9:.0f} Gop/s ({dt*1e6:.0f}us) "
              f"finite={bool(np.isfinite(np.asarray(r)).all())}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:200]}", flush=True)


def mix_f32cmp_bf16sel(xf, st, init=False):
    bf = jnp.bfloat16
    c1 = jnp.asarray(1.0000013, bf)
    if init:
        x = xf.astype(bf)
        return (x, x + jnp.asarray(0.5, bf), x + jnp.asarray(0.25, bf),
                x + jnp.asarray(0.75, bf))
    a, b, c, d = st
    a = a * c1 + jnp.asarray(1e-7, bf)
    b = b * c1 + jnp.asarray(2e-7, bf)
    hit = (a.astype(jnp.float32) > b.astype(jnp.float32)) \
        & (c.astype(jnp.float32) < d.astype(jnp.float32))
    c = jnp.where(hit, a, c) * c1
    d = jnp.where(hit, b, d) + jnp.asarray(1e-7, bf)
    return a, b, c, d


def mix_f32cmp_arith_sel(xf, st, init=False):
    bf = jnp.bfloat16
    c1 = jnp.asarray(1.0000013, bf)
    if init:
        x = xf.astype(bf)
        return (x, x + jnp.asarray(0.5, bf), x + jnp.asarray(0.25, bf),
                x + jnp.asarray(0.75, bf))
    a, b, c, d = st
    a = a * c1 + jnp.asarray(1e-7, bf)
    b = b * c1 + jnp.asarray(2e-7, bf)
    hit = (a.astype(jnp.float32) > b.astype(jnp.float32)) \
        & (c.astype(jnp.float32) < d.astype(jnp.float32))
    m = hit.astype(jnp.float32).astype(bf)
    im = jnp.asarray(1.0, bf) - m
    c = (m * a + im * c) * c1
    d = m * b + im * d + jnp.asarray(1e-7, bf)
    return a, b, c, d


def mix_f32sel_bf16math(xf, st, init=False):
    """math bf16, but state + selects f32 (cast at the boundary)."""
    bf = jnp.bfloat16
    c1 = jnp.asarray(1.0000013, bf)
    if init:
        return (xf, xf + 0.5, xf + 0.25, xf + 0.75)
    a, b, c, d = st
    a = (a.astype(bf) * c1).astype(jnp.float32) + 1e-7
    b = (b.astype(bf) * c1).astype(jnp.float32) + 2e-7
    hit = (a > b) & (c < d)
    c = jnp.where(hit, a, c)
    d = jnp.where(hit, b, d) + 1e-7
    return a, b, c, d


def bf16_transcendentals(xf, st, init=False):
    bf = jnp.bfloat16
    if init:
        x = xf.astype(bf) + jnp.asarray(0.5, bf)
        return (x, x)
    a, b = st
    a = jnp.sqrt(a * a + jnp.asarray(0.1, bf))
    b = jnp.exp(-b * jnp.asarray(0.01, bf))
    return a, b


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    run("f32cmp+bf16where", mix_f32cmp_bf16sel)
    run("f32cmp+arith-sel", mix_f32cmp_arith_sel)
    run("bf16math+f32state", mix_f32sel_bf16math)
    run("bf16 sqrt/exp", bf16_transcendentals)


if __name__ == "__main__":
    main()
