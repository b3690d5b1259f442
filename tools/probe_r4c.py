"""Round-4 probe C: bisect which packet-kernel construct kills Mosaic.

Variants build up the kernel piecewise; each is compiled + run on tiny
synthetic inputs. First failing variant names the culprit.
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
OUT = "/root/repo/bench_records/r4_probe_c.json"


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


W, CP, NTRI_ROWS = 8, 128, 64 * 12


def make_kernel(stage, n_packets=16):
    def kernel(xt_ref, meta_ref, tri_ref, out_ref, rays_scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lanef = lane.astype(jnp.float32)
        xt = xt_ref[:]

        maxTs = []
        for p in range(n_packets):
            for c in range(7):
                col = jnp.sum(jnp.where(lane == c * 16 + p, xt, 0.0),
                              axis=1, keepdims=True)
                rays_scr[pl.ds((p * 7 + c) * 8, 8), :] = (
                    col + jnp.zeros((8, 128), jnp.float32))
            maxTs.append(jnp.sum(jnp.where(lane == 7 * 16 + p, xt, 0.0),
                                 axis=1, keepdims=True)
                         + jnp.zeros((8, 128), jnp.float32))

        if stage == 0:                       # setup + scratch readback only
            acc = jnp.zeros((8, 128), jnp.float32)
            for p in range(n_packets):
                acc = acc + rays_scr[pl.ds((p * 7) * 8, 8), :] + maxTs[p]
            out_ref[:] = acc
            return

        count = meta_ref[2, 0]

        def tri_consts(c):
            base = c * 12
            return [jnp.broadcast_to(tri_ref[pl.ds(base + j, 1), :],
                                     (8, 128)) for j in range(12)]

        def test(cr, cbase, p, bt, code):
            (nx, ny, nz, d0, m1x, m1y, m1z, c1, m2x, m2y, m2z, c2) = cr
            ox = rays_scr[pl.ds((p * 7 + 0) * 8, 8), :]
            oy = rays_scr[pl.ds((p * 7 + 1) * 8, 8), :]
            oz = rays_scr[pl.ds((p * 7 + 2) * 8, 8), :]
            dx = rays_scr[pl.ds((p * 7 + 3) * 8, 8), :]
            dy = rays_scr[pl.ds((p * 7 + 4) * 8, 8), :]
            dz = rays_scr[pl.ds((p * 7 + 5) * 8, 8), :]
            mnt = rays_scr[pl.ds((p * 7 + 6) * 8, 8), :]
            ro_n = ox * nx + oy * ny + oz * nz
            rd_n = dx * nx + dy * ny + dz * nz
            par = jnp.abs(rd_n) < 1e-22
            t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
            u = (ox * m1x + oy * m1y + oz * m1z - c1
                 + t * (dx * m1x + dy * m1y + dz * m1z))
            v = (ox * m2x + oy * m2y + oz * m2z - c2
                 + t * (dx * m2x + dy * m2y + dz * m2z))
            hit = (~par & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                   & (t >= mnt) & (t < bt))
            return jnp.where(hit, t, bt), jnp.where(hit, cbase + lanef,
                                                    code)

        if stage == 1:                       # loop + scalar reads + consts
            def body(i, acc):
                c = meta_ref[0, i]
                pm = meta_ref[1, i]
                cr = tri_consts(c)
                s = functools.reduce(lambda a, b: a + b, cr)
                return acc + s * jnp.float32(1.0) + pm.astype(jnp.float32)
            out_ref[:] = jax.lax.fori_loop(0, count, body,
                                           jnp.zeros((8, 128), jnp.float32))
            return

        if stage == 2:                       # + one unconditional test
            def body(i, carry):
                bt, code = carry
                c = meta_ref[0, i]
                cr = tri_consts(c)
                cbase = (c * 128).astype(jnp.float32)
                return test(cr, cbase, 0, bt, code)
            bt, code = jax.lax.fori_loop(
                0, count, body, (maxTs[0], jnp.full((8, 128), -1.0)))
            out_ref[:] = bt + code
            return

        if stage == 3:                       # + lax.cond on mask bit
            def body(i, carry):
                c = meta_ref[0, i]
                pm = meta_ref[1, i]
                cr = tri_consts(c)
                cbase = (c * 128).astype(jnp.float32)
                live = (jax.lax.shift_right_logical(pm, 0) & 1) > 0
                return jax.lax.cond(
                    live, lambda s: test(cr, cbase, 0, *s), lambda s: s,
                    carry)
            bt, code = jax.lax.fori_loop(
                0, count, body, (maxTs[0], jnp.full((8, 128), -1.0)))
            out_ref[:] = bt + code
            return

        # stage 4: full n_packets with conds + epilogue
        def body(i, carry):
            c = meta_ref[0, i]
            pm = meta_ref[1, i]
            cr = tri_consts(c)
            cbase = (c * 128).astype(jnp.float32)
            new = []
            for p in range(n_packets):
                live = (jax.lax.shift_right_logical(pm, p) & 1) > 0
                new.append(jax.lax.cond(
                    live, lambda s, p=p: test(cr, cbase, p, *s),
                    lambda s: s, carry[p]))
            return tuple(new)

        init = tuple((maxTs[p], jnp.full((8, 128), -1.0))
                     for p in range(n_packets))
        final = jax.lax.fori_loop(0, count, body, init)
        out = jnp.zeros((8, 128), jnp.float32)
        for p in range(n_packets):
            bt, code = final[p]
            btmin = jnp.min(bt, axis=1, keepdims=True)
            kcode = jnp.min(jnp.where(bt == btmin, code, jnp.inf),
                            axis=1, keepdims=True)
            out = out + jnp.where(lane == p,
                                  jnp.broadcast_to(btmin, (8, 128)), 0.0)
            out = out + jnp.where(lane == 16 + p,
                                  jnp.broadcast_to(kcode, (8, 128)), 0.0)
        out_ref[:] = out

    return kernel


def run_stage(stage, n_packets=16):
    kernel = make_kernel(stage, n_packets)
    fn = pl.pallas_call(
        kernel,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CP), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((W * 8, 128), jnp.float32),
        out_specs=pl.BlockSpec((8, 128), lambda w: (w, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16 * 7 * 8, 128), jnp.float32)],
    )
    rs = np.random.RandomState(0)
    xt = jnp.asarray(rs.rand(W * 8, 128), jnp.float32)
    meta = np.zeros((W, 8, CP), np.int32)
    meta[:, 0, :] = rs.randint(0, 60, (W, CP))
    meta[:, 1, :] = rs.randint(0, 1 << 16, (W, CP))
    meta[:, 2, 0] = 40
    tri = jnp.asarray(rs.rand(NTRI_ROWS, 128), jnp.float32)
    t0 = time.time()
    out = jax.jit(fn)(xt, jnp.asarray(meta.reshape(W * 8, CP)), tri)
    jax.block_until_ready(out)
    log(stage=stage, n_packets=n_packets, ok=True,
        compile_s=round(time.time() - t0, 1),
        mean=float(jnp.mean(out)))


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    for stage in (0, 1, 2, 3):
        try:
            run_stage(stage)
        except Exception as e:  # noqa: BLE001
            log(stage=stage, err=type(e).__name__ + ": " + str(e)[:200])
    for np_ in (1, 4, 16):
        try:
            run_stage(4, np_)
        except Exception as e:  # noqa: BLE001
            log(stage=4, n_packets=np_,
                err=type(e).__name__ + ": " + str(e)[:200])


if __name__ == "__main__":
    main()
