"""Round-4 probe J: exact per-lane table lookup via one-hot MXU matmul.

The megakernel resolves per-lane material params with O(n_mats) select
chains. Alternative: out[p, lane] = table[p, :] @ onehot[:, lane] where
onehot rows are (id_row == k) — built by comparing a sublane iota against
the lane's mat_id, no transposes. With the f32 table split into three
bf16 terms (8-bit mantissas x 3 = f32's 24), each matmul output is a
SINGLE product of exact bf16 values accumulated in f32 => bit-exact
reconstruction, O(1) in n_mats.

Probes: correctness of the bf16x3 split reconstruction, cost per
gather vs an equivalent select chain, scaling in n_mats.
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
OUT = "/root/repo/bench_records/r4_probe_j.json"


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


def split3(table):
    """f32 -> three bf16 terms summing exactly back (one per matmul)."""
    t = table.astype(np.float32)
    hi = t.astype(jnp.bfloat16)
    r1 = t - np.asarray(hi, np.float32)
    mid = r1.astype(jnp.bfloat16)
    r2 = r1 - np.asarray(mid, np.float32)
    lo = r2.astype(jnp.bfloat16)
    return hi, mid, lo


def make_fn(n_mats, n_params, rows, method, reps):
    npad = -(-n_mats // 8) * 8

    def kernel(id_ref, t_hi, t_mid, t_lo, o_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (npad, 128), 0)
        acc = jnp.zeros((rows, 128), jnp.float32)
        for rep in range(reps):
            vals = []
            if method == "mxu":
                for r in range(rows):
                    ids = id_ref[pl.ds(r, 1), :]
                    oh = (sub == ids).astype(jnp.bfloat16)   # (npad,128)
                    out = (jnp.dot(t_hi[:], oh,
                                   preferred_element_type=jnp.float32)
                           + jnp.dot(t_mid[:], oh,
                                     preferred_element_type=jnp.float32)
                           + jnp.dot(t_lo[:], oh,
                                     preferred_element_type=jnp.float32))
                    vals.append(out)              # (n_params, 128)
                s = functools.reduce(
                    lambda a, b: a + jnp.sum(b, axis=0, keepdims=True),
                    vals, jnp.zeros((1, 128), jnp.float32))
                acc = acc + s
            else:                                  # select chain
                idsf = id_ref[:]                   # (rows, 128)
                tot = jnp.zeros((rows, 128), jnp.float32)
                for k in range(n_mats):
                    m = idsf == k
                    for p in range(n_params):
                        tot = tot + jnp.where(
                            m, t_hi[p, k].astype(jnp.float32), 0.0)
                acc = acc + tot
        o_ref[:] = acc

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def make_check_fn(n_mats, n_params):
    npad = -(-n_mats // 8) * 8
    ppad = -(-n_params // 8) * 8

    def kernel(id_ref, t_hi, t_mid, t_lo, o_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (npad, 128), 0)
        ids = id_ref[pl.ds(0, 1), :]
        oh = (sub == ids).astype(jnp.bfloat16)
        out = (jnp.dot(t_hi[:], oh, preferred_element_type=jnp.float32)
               + jnp.dot(t_mid[:], oh, preferred_element_type=jnp.float32)
               + jnp.dot(t_lo[:], oh, preferred_element_type=jnp.float32))
        o_ref[:] = out

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ppad, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def run(n_mats, n_params=32, rows=8, reps=8):
    npad = -(-n_mats // 8) * 8
    ppad = -(-n_params // 8) * 8
    rs = np.random.RandomState(0)
    table = rs.randn(ppad, npad).astype(np.float32)
    table[:, n_mats:] = 0.0
    hi, mid, lo = split3(table)
    ids = jnp.asarray(rs.randint(0, n_mats, (rows, 128)), jnp.int32)

    # exactness: per-param gathered values vs numpy fancy-index, bitwise
    fn = jax.jit(make_check_fn(n_mats, n_params))
    out = np.asarray(fn(ids, jnp.asarray(hi), jnp.asarray(mid),
                        jnp.asarray(lo)))
    want = table[:, np.asarray(ids[0])]           # (ppad, 128)
    log(method="mxu_exact", n_mats=n_mats,
        bit_exact=bool(np.all(out == want)),
        max_abs_err=float(np.abs(out - want).max()))

    dt, _ = timeit(jax.jit(make_fn(n_mats, n_params, rows, "mxu", reps)),
                   ids, jnp.asarray(hi), jnp.asarray(mid), jnp.asarray(lo))
    per = dt / (reps * rows)
    log(method="mxu", n_mats=n_mats, n_params=n_params, rows=rows,
        us=round(dt * 1e6, 2), ns_per_row_gather=round(per * 1e9, 1))

    if n_mats <= 64:
        dt, _ = timeit(jax.jit(make_fn(n_mats, n_params, rows, "chain",
                                       reps)),
                       ids, jnp.asarray(hi), jnp.asarray(mid),
                       jnp.asarray(lo))
        log(method="chain", n_mats=n_mats, n_params=n_params, rows=rows,
            us=round(dt * 1e6, 2),
            ns_per_row_gather=round(dt / (reps * rows) * 1e9, 1))


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for n in (48, 128, 256, 512):
        try:
            run(n)
        except Exception as e:  # noqa: BLE001
            log(n_mats=n, err=type(e).__name__ + ": " + str(e)[:300])


if __name__ == "__main__":
    main()
