"""Round-4 TPU probe A: lowering + cost of the packet-tracer primitives.

The round-4 structural idea is a FUSED PACKET TRACER: 8 sorted rays per
packet live in SUBLANES, clusters/triangles live in LANES, so one vreg op
tests 8 rays x 128 tris/boxes and the tri-test gating granularity drops
from 8192 lanes (tile walk) to 8 rays.  Primitives it needs that no
existing kernel uses:

  1. static lane-column extract + lane-broadcast:  x[:, c] -> (8,1) -> (8,128)
  2. dynamic lane-column extract (packet id from grid/fori)
     via masked reduction: sum(where(lane==p, x, 0), axis=1)
  3. dynamic (1,128) row loads from a VMEM table: ref[pl.ds(i*12+j,1), :]
  4. sublane-broadcast of a (1,128) row -> (8,128)
  5. scalar extraction of argmin lane from a (1,128)/(8,128) mask
     (find-first-set loop) feeding a dynamic slice index
  6. lane-masked output write: out[:, :] = where(lane==p, v, out)
  7. per-ray (axis=1) min/argmin epilogue

Each probe is a tiny pallas kernel timed over many iterations; failures
are caught and logged so one bad lowering doesn't kill the batch.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = []
OUT = "/root/repo/bench_records/r4_probe_a.json"


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


# --------------------------------------------------------------------------
# probe 1/2/6: packet setup + output write patterns, REPS packets per step
# --------------------------------------------------------------------------

def probe_setup(static_packet, reps=512):
    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        x = x_ref[:]
        acc = jnp.zeros((8, 128), jnp.float32)

        def one(p, acc):
            if static_packet:
                cols = [jnp.broadcast_to(x[:, c * 16 + p][:, None],
                                         (8, 128)) for c in range(6)]
            else:
                cols = [jnp.sum(jnp.where(lane == c * 16 + p, x, 0.0),
                                axis=1, keepdims=True) + jnp.zeros((8, 128))
                        for c in range(6)]
            v = functools.reduce(lambda a, b: a * 1.000001 + b, cols)
            return acc + jnp.where(lane == p, v, 0.0)

        if static_packet:
            for r in range(reps):
                acc = one(r % 16, acc)
        else:
            acc = jax.lax.fori_loop(
                0, reps, lambda r, a: one(r % 16, a), acc)
        o_ref[:] = acc

    x = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, _ = timeit(jax.jit(fn), x)
    log(probe="setup", static=static_packet, reps=reps,
        us=round(dt * 1e6, 2), ns_per_packet=round(dt / reps * 1e9, 2))


# --------------------------------------------------------------------------
# probe 3/4: dynamic (1,128) row loads + sublane broadcast (tri-const read)
# --------------------------------------------------------------------------

def probe_dynrow(reps=512, nrows=12):
    def kernel(t_ref, idx_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)

        def one(i, acc):
            base = idx_ref[i % 64] * nrows
            rows = [jnp.broadcast_to(t_ref[pl.ds(base + j, 1), :], (8, 128))
                    for j in range(nrows)]
            return acc + functools.reduce(
                lambda a, b: a * 1.000001 + b, rows)

        acc = jax.lax.fori_loop(0, reps, one, acc)
        o_ref[:] = acc

    tbl = jnp.asarray(np.random.rand(1024 * nrows, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 1024, 64), jnp.int32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, _ = timeit(jax.jit(fn), tbl, idx)
    log(probe="dynrow", reps=reps, nrows=nrows, us=round(dt * 1e6, 2),
        ns_per_cluster=round(dt / reps * 1e9, 2),
        ns_per_row=round(dt / (reps * nrows) * 1e9, 2))


# --------------------------------------------------------------------------
# probe 5: find-first-set-lane loop (mask -> scalar idx -> dynamic read)
# --------------------------------------------------------------------------

def probe_ffs(n_live=16, reps=64):
    def kernel(m_ref, t_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc = jnp.zeros((8, 128), jnp.float32)

        def outer(r, acc):
            m = m_ref[:] > 0.5

            def cond(c):
                return jnp.any(c[0])

            def body(c):
                m, acc = c
                idx = jnp.min(jnp.where(m, lane, 10 ** 6))
                row = jnp.broadcast_to(t_ref[pl.ds(idx, 1), :], (8, 128))
                return m & (lane != idx), acc + row

            _, acc = jax.lax.while_loop(cond, body, (m, acc))
            return acc

        acc = jax.lax.fori_loop(0, reps, outer, acc)
        o_ref[:] = acc

    m = np.zeros((1, 128), np.float32)
    m[0, np.random.choice(128, n_live, replace=False)] = 1.0
    tbl = jnp.asarray(np.random.rand(128, 128), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, _ = timeit(jax.jit(fn), jnp.asarray(m), tbl)
    log(probe="ffs", n_live=n_live, reps=reps, us=round(dt * 1e6, 2),
        ns_per_extract=round(dt / (reps * n_live) * 1e9, 2))


# --------------------------------------------------------------------------
# probe 7: per-ray (axis=1) min + winner-lane epilogue
# --------------------------------------------------------------------------

def probe_epilogue(reps=512):
    def kernel(x_ref, o_ref):
        lanef = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(
            jnp.float32)
        x = x_ref[:]
        bt = jnp.full((8, 1), jnp.inf)
        code = jnp.zeros((8, 1), jnp.float32)

        def one(i, c):
            bt, code = c
            t = x * (1.0 + 1e-6 * jnp.float32(i))
            tmin = jnp.min(t, axis=1, keepdims=True)
            kwin = jnp.min(jnp.where(t == tmin, lanef, 1e9), axis=1,
                           keepdims=True)
            upd = tmin < bt
            return (jnp.where(upd, tmin, bt),
                    jnp.where(upd, kwin + jnp.float32(i), code))

        bt, code = jax.lax.fori_loop(0, reps, one, (bt, code))
        o_ref[:] = bt + code

    x = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, _ = timeit(jax.jit(fn), x)
    log(probe="epilogue", reps=reps, us=round(dt * 1e6, 2),
        ns_per_block=round(dt / reps * 1e9, 2))


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for name, fn in [
        ("setup_static", lambda: probe_setup(True)),
        ("setup_dynamic", lambda: probe_setup(False)),
        ("dynrow", probe_dynrow),
        ("ffs16", lambda: probe_ffs(16)),
        ("ffs4", lambda: probe_ffs(4)),
        ("epilogue", probe_epilogue),
        ("dynblock_par", lambda: probe_dynblock(parallel=True)),
        ("dynblock_chain", lambda: probe_dynblock(parallel=False)),
        ("dynrow_par", probe_dynrow_par),
    ]:
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            log(probe=name, err=type(e).__name__ + ": " + str(e)[:300])




# --------------------------------------------------------------------------
# probe 3b: one (12,128) dynamic block load, rows extracted from the value;
# parallel (non-chained) accumulation to measure throughput not latency
# --------------------------------------------------------------------------

def probe_dynblock(reps=512, nrows=12, parallel=True):
    def kernel(t_ref, idx_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)

        def one(i, acc):
            base = idx_ref[i % 64] * nrows
            blk = t_ref[pl.ds(base, nrows), :]
            rows = [jnp.broadcast_to(blk[j:j + 1, :], (8, 128))
                    for j in range(nrows)]
            if parallel:
                a = rows[0] * rows[1] + rows[2] * rows[3]
                b = rows[4] * rows[5] + rows[6] * rows[7]
                c = rows[8] * rows[9] + rows[10] * rows[11]
                return acc + (a + b) + c
            return acc + functools.reduce(
                lambda a, b: a * 1.000001 + b, rows)

        acc = jax.lax.fori_loop(0, reps, one, acc)
        o_ref[:] = acc

    tbl = jnp.asarray(np.random.rand(1024 * nrows, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 1024, 64), jnp.int32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, _ = timeit(jax.jit(fn), tbl, idx)
    log(probe="dynblock", parallel=parallel, reps=reps, nrows=nrows,
        us=round(dt * 1e6, 2), ns_per_cluster=round(dt / reps * 1e9, 2))


def probe_dynrow_par(reps=512, nrows=12):
    def kernel(t_ref, idx_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)

        def one(i, acc):
            base = idx_ref[i % 64] * nrows
            rows = [jnp.broadcast_to(t_ref[pl.ds(base + j, 1), :], (8, 128))
                    for j in range(nrows)]
            a = rows[0] * rows[1] + rows[2] * rows[3]
            b = rows[4] * rows[5] + rows[6] * rows[7]
            c = rows[8] * rows[9] + rows[10] * rows[11]
            return acc + (a + b) + c

        acc = jax.lax.fori_loop(0, reps, one, acc)
        o_ref[:] = acc

    tbl = jnp.asarray(np.random.rand(1024 * nrows, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 1024, 64), jnp.int32)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    dt, _ = timeit(jax.jit(fn), tbl, idx)
    log(probe="dynrow_par", reps=reps, nrows=nrows,
        us=round(dt * 1e6, 2), ns_per_cluster=round(dt / reps * 1e9, 2))

if __name__ == "__main__":
    main()
