"""Micro-cost of traversal primitives on the TPU (Mosaic).

Each kernel runs a 200k-iteration while_loop whose body is N copies of one
primitive; per-iteration cost = slope between N=1 and N=4 runs. Primitives:
  vec22   - 22 elementwise f32 ops on a (16,128) tile (slab-test worth)
  anyred  - jnp.any(v > c) -> scalar (vector->scalar sync), result feeds
            the carry so it can't be hoisted
  cond    - lax.cond on a data-dependent scalar, trivial branches
  vload   - 6 dynamic-offset scalar loads from a VMEM f32 table
  sload   - 6 dynamic-offset scalar loads from an SMEM f32 table
Run ALONE.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 200_000
ROWS = 16


def make_kernel(prim, n_rep):
    def kernel(tab_ref, out_ref):
        v0 = out_ref[:] + 1.0e-6

        def body(carry):
            i, v, acc = carry
            for r in range(n_rep):
                if prim == "vec22":
                    for _ in range(11):
                        v = v * 1.000001 + 1e-7
                elif prim == "anyred":
                    s = jnp.any(v > 100.0)
                    acc = acc + jnp.where(s, 1, 0)
                    v = v * 1.000001
                elif prim == "cond":
                    s = jnp.any(v > 100.0)
                    v = jax.lax.cond(s, lambda x: x * 0.5,
                                     lambda x: x * 1.000001, v)
                elif prim == "vload":
                    off = (i * 7 + r * 13) % 900
                    t = sum(tab_ref[off // 128, (off + k) % 128]
                            for k in range(6))
                    v = v + t * 1e-12
                elif prim == "sload":
                    off = (i * 7 + r * 13) % 900
                    t = sum(tab_ref[0, 0] * 0.0 + tab_ref[off // 128,
                                                          (off + k) % 128]
                            for k in range(6))
                    v = v + t * 1e-12
            return i + 1, v, acc

        def cond_fn(carry):
            return carry[0] < ITERS

        _, v, acc = jax.lax.while_loop(
            cond_fn, body, (jnp.int32(0), v0, jnp.int32(0)))
        out_ref[:] = v + acc.astype(jnp.float32) * 1e-20

    return kernel


def run(prim, n_rep, smem):
    tab = np.random.default_rng(0).random((8, 128)).astype(np.float32)
    mem = pltpu.SMEM if smem else pltpu.VMEM
    fn = pl.pallas_call(
        make_kernel(prim, n_rep),
        in_specs=[pl.BlockSpec(memory_space=mem)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
    )
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(tab))   # compile
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(jfn(tab))
        best = min(best, time.time() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    for prim in ("vec22", "anyred", "cond", "vload", "sload"):
        smem = prim == "sload"
        try:
            t1 = run(prim, 1, smem)
            t4 = run(prim, 4, smem)
        except Exception as e:  # noqa: BLE001
            print(f"{prim}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        per = (t4 - t1) / (3 * ITERS)
        print(f"{prim}: t1={t1*1e3:.1f}ms t4={t4*1e3:.1f}ms "
              f"-> {per*1e9:.0f} ns/prim (loop floor {t1/ITERS*1e9:.0f} ns)",
              flush=True)


if __name__ == "__main__":
    main()
