"""TPU probes, round-2 batch C (run as ONE process on the tunnel):

1. per-lane dynamic gather inside a Pallas kernel — which forms lower
   (take_along_axis / x[idx] / one-hot matmul / select chain) and what
   they cost. Decides the in-kernel env-map + texture design.
2. in-kernel MXU precision: dot_general f32 (default/HIGHEST) + bf16.
3. VPU rate: f32 vs bf16 FMA chains (is bf16 shading 2x or 1x?).

Usage: python tools/probe_r2c.py
"""
from __future__ import annotations

import functools
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32
SHAPE = (ROWS, 128)


def check(name, fn):
    try:
        t0 = time.time()
        out = fn()
        print(f"[ok] {name}: {out}  ({time.time() - t0:.1f}s)", flush=True)
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)
        if "--trace" in sys.argv:
            traceback.print_exc()
        return None


def _time_kernel(fn, *args, iters=3, reps=50):
    """Best-of timing of a jitted fn; reps handled inside via fori where
    possible, else outer loop."""
    r = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(iters):
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.time() - t0) / reps)
    return best, r


# ---------------------------------------------------------------------------
# 1. gather forms
# ---------------------------------------------------------------------------

def gather_take(n_tab):
    """x = table[idx, lane] via jnp.take_along_axis on the sublane axis."""
    tab = np.arange(n_tab * 128, dtype=np.float32).reshape(n_tab, 128)
    idx = np.random.RandomState(0).randint(0, n_tab, SHAPE).astype(np.int32)

    def kernel(tab_ref, idx_ref, o_ref):
        t = tab_ref[:]
        i = idx_ref[:]
        # REP inner loop to amortize launch: vary idx each rep so nothing
        # hoists
        def body(k, acc):
            ii = (i + k) % n_tab
            g = jnp.take_along_axis(t, ii, axis=0)
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, 100, body, jnp.zeros(SHAPE,
                                                             jnp.float32))

    fn = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
    dt, r = _time_kernel(fn, tab, idx)
    # correctness on one rep pattern
    exp = sum(tab[(idx + k) % n_tab, np.arange(128)[None, :]]
              for k in range(100))
    ok = np.allclose(np.asarray(r), exp)
    return f"{dt * 1e6 / 100:.2f}us/gather(table={n_tab}) correct={ok}"


def gather_onehot(n_tab, dtype=jnp.bfloat16):
    """one-hot @ table on the MXU; exactness of 0/1 weights."""
    tab = (np.random.RandomState(1).rand(n_tab, 4).astype(np.float32))
    idx = np.random.RandomState(0).randint(0, n_tab, SHAPE).astype(np.int32)

    def kernel(tab_ref, idx_ref, o_ref):
        t = tab_ref[:].astype(dtype)
        i = idx_ref[:]

        def body(k, acc):
            ii = ((i + k) % n_tab).reshape(ROWS * 128 // 128, 128)
            # build one-hot (lanes, n_tab) in blocks? lanes=ROWS*128 rows
            # is too big; do it per 128-lane row chunk instead:
            # simpler: one-hot as (ROWS*128, n_tab) f32 — memory ROWS*128*n
            oh = (jax.lax.broadcasted_iota(
                jnp.int32, (ROWS * 128, n_tab), 1)
                == i.reshape(ROWS * 128, 1)).astype(dtype)
            g = jax.lax.dot_general(
                oh, t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + g.reshape(ROWS, 128, 4)[:, :, 0]
        o_ref[:] = jax.lax.fori_loop(
            0, 10, body, jnp.zeros(SHAPE, jnp.float32))

    fn = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
    dt, r = _time_kernel(fn, tab, idx, reps=20)
    exp = sum(tab[(idx + k) % n_tab, 0] for k in range(10))
    err = float(np.abs(np.asarray(r) - exp).max())
    return f"{dt * 1e6 / 10:.2f}us/gather(onehot n={n_tab}) max_err={err:.2e}"


def gather_selchain(n_tab):
    """select-chain gather from an SMEM table (the known-safe fallback)."""
    tab = np.arange(n_tab * 4, dtype=np.float32).reshape(n_tab, 4)
    idx = np.random.RandomState(0).randint(0, n_tab, SHAPE).astype(np.int32)

    def kernel(tab_ref, idx_ref, o_ref):
        i = idx_ref[:]

        def body(k, acc):
            ii = (i + k) % n_tab
            g = jnp.zeros(SHAPE, jnp.float32)
            for row in range(n_tab):
                g = jnp.where(ii == row, tab_ref[row, 0], g)
            return acc + g
        o_ref[:] = jax.lax.fori_loop(0, 10, body,
                                     jnp.zeros(SHAPE, jnp.float32))

    fn = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
    dt, r = _time_kernel(fn, tab, idx, reps=20)
    exp = sum(tab[(idx + k) % n_tab, 0] for k in range(10))
    ok = np.allclose(np.asarray(r), exp)
    return f"{dt * 1e6 / 10:.2f}us/gather(selchain n={n_tab}) correct={ok}"


# ---------------------------------------------------------------------------
# 2. in-kernel MXU precision + rate
# ---------------------------------------------------------------------------

def mxu_precision():
    rs = np.random.RandomState(2)
    a = rs.randn(256, 256).astype(np.float32)
    b = rs.randn(256, 256).astype(np.float32)
    exp = (a.astype(np.float64) @ b.astype(np.float64))
    outs = {}
    for name, prec in (("default", None),
                       ("highest", jax.lax.Precision.HIGHEST)):
        def kernel(a_ref, b_ref, o_ref, _prec=prec):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                precision=_prec, preferred_element_type=jnp.float32)
        try:
            fn = jax.jit(pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32)))
            r = np.asarray(jax.block_until_ready(fn(a, b)))
            rel = np.abs(r - exp) / np.maximum(np.abs(exp), 1e-3)
            outs[name] = f"{rel.max():.2e}"
        except Exception as e:
            outs[name] = f"FAIL {str(e).splitlines()[0][:120]}"
    return outs


# ---------------------------------------------------------------------------
# 3. VPU f32 vs bf16 FMA rate
# ---------------------------------------------------------------------------

def vpu_rate(dtype):
    x0 = np.random.RandomState(3).rand(*SHAPE).astype(np.float32)
    N = 2000

    def kernel(x_ref, o_ref):
        x = x_ref[:].astype(dtype)
        c1 = jnp.asarray(1.000001, dtype)
        c2 = jnp.asarray(1e-6, dtype)

        def body(k, v):
            a, b = v
            a = a * c1 + c2
            b = b * c1 + a * c2
            return a, b
        a, b = jax.lax.fori_loop(0, N, body, (x, x + jnp.asarray(1, dtype)))
        o_ref[:] = (a + b).astype(jnp.float32)

    fn = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32)))
    dt, _ = _time_kernel(fn, x0, reps=20)
    # 2 FMA-ish ops x 3 flops-ish per iter; report ops/s relative measure
    n_ops = N * 4 * ROWS * 128
    return f"{n_ops / dt / 1e9:.1f} Gop/s ({dt * 1e6:.1f}us/call)"


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    check("gather take n=8", lambda: gather_take(8))
    check("gather take n=32", lambda: gather_take(32))
    check("gather take n=256", lambda: gather_take(256))
    check("gather take n=2048", lambda: gather_take(2048))
    check("gather onehot n=256", lambda: gather_onehot(256))
    check("gather onehot n=2048", lambda: gather_onehot(2048))
    check("gather selchain n=64", lambda: gather_selchain(64))
    check("gather selchain n=256", lambda: gather_selchain(256))
    check("mxu precision", mxu_precision)
    check("vpu f32", lambda: vpu_rate(jnp.float32))
    check("vpu bf16", lambda: vpu_rate(jnp.bfloat16))


if __name__ == "__main__":
    main()
