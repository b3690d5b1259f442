"""TPU mesh traversal, packet form: 8 rays x 128 triangles per VPU op.

The cluster tracer (geometry/cluster_trace.py) walks the treelet tree once
per (tile_rows x 128)-lane tile: every live leaf costs dense triangle tests
for the UNION of the tile's rays' working sets (~23-35% of the scene on
100k-tri terrain, r3_probe_h). This backend drops the gating granularity
from 8192 lanes to 8 rays:

- rays are Morton-sorted (same key as the cluster tracer) and grouped into
  PACKETS of 8 (sublanes); 16 packets form a WORKGROUP of 128 rays,
- triangle constants are packed TRANSPOSED: each treelet cluster of up to
  128 tris is 12 rows x 128 lanes (lane k = tri k, row j = const j of the
  shared soa_intersect plane/dual-basis formulation), so one (8,128) vreg
  op tests 8 rays against 128 triangles,
- an XLA cull pass computes, per workgroup, the chain of candidate
  clusters (next-pointer table built with a reverse cumulative min — no
  per-row sort) and per-(cluster, packet) liveness bits from exact
  per-ray slab tests,
- the Pallas kernel runs one grid step per workgroup: stage the meta rows
  VMEM->SMEM (dynamic-LANE reads from VMEM do not lower on Mosaic;
  SMEM scalar reads and VMEM->SMEM DMA do — bench_records/r4_probe_a),
  extract the 16 packets' ray components with masked lane reductions
  (52 ns/packet measured vs 1.2 us for static lane slices), then chase
  the candidate chain: 12 dynamic (1,128) row loads per cluster
  (8 ns/row measured) + per-live-packet dense tri tests under lax.cond.

Reference semantics matched: include/bvh.h:87-226 traversal contract
(closest hit with [minT, maxT) interval, any-hit early semantics),
include/simd_hit.h:121-156 packet philosophy (their 1 ray x 2 boxes per
AVX op becomes 8 rays x 128 tris per VPU op).

Measured round-4 groundwork (bench_records/r4_probe_b.json, terrain 100k,
B=131072): closest 724 ns/ray primary / 622 bounce vs the cluster walk's
813/810; parity 1.0 on all populations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimg_tpu.geometry import intersect
from vimg_tpu.geometry.cluster_trace import ClusterData, ray_sort_key
from vimg_tpu.scene import ir

WG = 128                 # rays per workgroup (16 packets x 8 rays)
N_PACKETS = WG // 8
PACK_K = 128             # tris per cluster in the transposed layout: the
                         # 128 lanes ARE the cluster, so partially-filled
                         # clusters waste lanes — max_k=128 measured best
                         # (r4_probe_b: max_k=64 was 1.34x slower)
N_CONST = 12             # soa_intersect consts per tri


class PacketData:
    """Transposed cluster tables for the packet kernel.

    Reuses ClusterData's SAH build + treelet cut (same tree, same
    permutation — a hit code c*128+k maps through the same ``perm``),
    re-packing the triangle constants cluster-major x lane-minor.
    """

    def __init__(self, scene: ir.Scene, max_k=PACK_K, builder="auto"):
        base = ClusterData(scene, max_k=max_k, builder=builder)
        C = base.n_clusters
        self.n_clusters = C
        self.max_k = max_k
        self.n_tris = base.n_tris
        self.perm = base.perm                   # (C*max_k,) tri ids
        self.scene_lo = base.scene_lo
        self.scene_hi = base.scene_hi

        # un-transpose ClusterData's (C * max_k*16/128, 128) row layout
        # back to (C, max_k, 16) and emit (C, 12, max_k): row j of cluster
        # c holds const j of its max_k triangles. Invalid lanes are zero
        # (plane normal 0 => rd_n 0 => parallel => no hit).
        rows = base.tri_rows.reshape(C, max_k, 16)
        tri_t = np.ascontiguousarray(
            rows[:, :, :N_CONST].transpose(0, 2, 1)).astype(np.float32)
        if max_k != 128:
            pad = np.zeros((C, N_CONST, 128 - max_k), np.float32)
            tri_t = np.concatenate([tri_t, pad], axis=2)
        self.tri_rows_t = tri_t.reshape(C * N_CONST, 128)

        # per-cluster AABBs for the XLA cull: tight union of member tris
        # (recomputed from the packed constants' source verts via the sub
        # boxes ClusterData already stashed would be loose at 16-tri
        # granularity; use exact per-cluster reduction instead)
        verts = np.asarray(scene.verts)
        tvidx = np.asarray(scene.tri_vidx)
        p = verts[tvidx]                         # (T, 3, 3)
        bmin = p.min(axis=1)
        bmax = p.max(axis=1)
        ids = base.perm.reshape(C, max_k)
        # padding lanes hold tri id 0 (ClusterData zeroes invalid slots) —
        # mask them out of the union or every partially-filled cluster's
        # AABB absorbs triangle 0's box (conservative but it inflates the
        # XLA cull's candidate chains and weakens f2b entry distances;
        # ADVICE round 4)
        valid = np.arange(max_k)[None, :] < base.cl_len[:, None]
        self.cl_lo = np.where(valid[..., None], bmin[ids],
                              np.inf).min(axis=1).astype(np.float32)
        self.cl_hi = np.where(valid[..., None], bmax[ids],
                              -np.inf).max(axis=1).astype(np.float32)
        # cluster-tree tables for the near-first orderings
        M = base.n_nodes
        self._t_cid = np.asarray(base.node_cid).reshape(-1)[:M]
        self._t_right = np.asarray(base.node_right).reshape(-1)[:M]
        self._t_order = np.asarray(base.node_order).reshape(-1)[:M]

    def octant_orders(self):
        """Per-direction-octant near-first cluster orderings: the leaf
        visit order of a DFS that descends each inner node's children in
        the octant's near-first order (the precomputed per-node order
        bits — the same rule as the megakernel's ordered stack walk and
        the reference's far-then-near push, bvh.h:200-213)."""
        C = self.n_clusters
        pi = np.empty((8, C), np.int32)
        for o in range(8):
            out = []
            stack = [0]
            while stack:
                n = stack.pop()
                c = int(self._t_cid[n])
                if c >= 0:                        # cut leaf = a cluster
                    out.append(c)
                    continue
                left, r = n + 1, int(self._t_right[n])
                right_first = (int(self._t_order[n]) >> o) & 1
                first, second = (r, left) if right_first else (left, r)
                stack.append(second)              # LIFO: first pops first
                stack.append(first)
            pi[o] = np.asarray(out, np.int32)
        return pi


# ---------------------------------------------------------------------------
# XLA cull: per-packet liveness bits + per-workgroup candidate chains
# ---------------------------------------------------------------------------

def _cull_meta(ro, rd, mn, mx, cl_lo, cl_hi, cp, pi=None,
               entry_scale=None):
    """Exact per-ray slab tests vs every cluster AABB, reduced to
    per-packet bits and a per-workgroup next-pointer chain.

    Returns meta (W*8, cp) int32; per workgroup w the (8, cp) block is:
      row 0: nxt[j] = smallest candidate index >= j (cp-1 sentinel)
      row 1: pmask[j] = 16 liveness bits (bit p = packet p touches it)
      row 2, col 0: candidate count (chain length)
    Rows are indexed by CLUSTER ID (no sort, no gather): the kernel
    chases row 0 and tests bits from row 1 at the chased id.

    With ``pi`` (the (8, C) per-direction-octant front-to-back cluster
    orderings) the chain lives in PERMUTED index space — candidates come
    out front-to-back for each workgroup's majority ray octant — and two
    more rows ride along for the kernel's early exit:
      row 3: per-WG conservative entry distance of candidate j, quantized
             to int32 as round(entry * entry_scale) (monotonic)
      row 4: the real cluster id of candidate j (pi[oct_w][j])
    """
    B = ro.shape[0]
    C = cl_lo.shape[0]
    W = B // WG
    P = B // 8
    inv = 1.0 / jnp.where(rd == 0.0, 1e-30, rd)

    o = ro.reshape(P, 8, 3, 1)
    iv = inv.reshape(P, 8, 3, 1)
    mnp = mn.reshape(P, 8, 1)
    mxp = mx.reshape(P, 8, 1)

    n_rows = 8
    extra = {}
    if pi is not None:
        # majority direction octant per WG -> its front-to-back ordering.
        # Everything below runs natively in PERMUTED cluster-index space:
        # the permuted AABB tables are selected with an 8-way where-chain
        # (exact, elementwise) instead of per-row gathers — two (W, C)
        # take_along_axis calls measured ~300 ns/ray, 8 selects ~nothing.
        sgn = jnp.sum(rd.reshape(W, WG, 3), axis=1) < 0.0
        octs = (sgn[:, 0].astype(jnp.int32)
                + 2 * sgn[:, 1].astype(jnp.int32)
                + 4 * sgn[:, 2].astype(jnp.int32))
        octs_p = jnp.repeat(octs, N_PACKETS)             # (P,)
        lo_oct = jnp.stack([cl_lo[pi[o]] for o in range(8)])  # (8, C, 3)
        hi_oct = jnp.stack([cl_hi[pi[o]] for o in range(8)])
        op = octs_p[:, None, None, None]

        def sel(tab, c0, w):
            t = tab[:, c0:c0 + w].transpose(0, 2, 1)[:, None, None]
            out = jnp.zeros(t.shape[1:], t.dtype)        # (1, 1, 3, w)
            acc = jnp.where(op == 0, t[0], out)
            for oo in range(1, 8):
                acc = jnp.where(op == oo, t[oo], acc)
            return acc                                    # (P|1, 1, 3, w)

        idx = jnp.zeros((W, C), jnp.int32)
        pio = pi.astype(jnp.int32)
        ow = octs[:, None]
        for oo in range(8):
            idx = jnp.where(ow == oo, pio[oo][None, :], idx)

    bits = []
    entries = []
    for c0 in range(0, C, 128):
        w = min(128, C - c0)
        if pi is not None:
            lo = sel(lo_oct, c0, w)
            hi = sel(hi_oct, c0, w)
        else:
            lo = cl_lo[c0:c0 + w].T[None, None]      # (1, 1, 3, w)
            hi = cl_hi[c0:c0 + w].T[None, None]
        t0 = (lo - o) * iv                       # (P, 8, 3, w)
        t1 = (hi - o) * iv
        tin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=2), mnp)
        tout = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=2), mxp)
        hit = tin <= tout
        bits.append(jnp.any(hit, axis=1))        # (P, w)
        if pi is not None:
            e = jnp.min(jnp.where(hit, tin, jnp.inf), axis=1)   # (P, w)
            entries.append(e.reshape(W, N_PACKETS, w).min(axis=1))
    pmask_p = jnp.concatenate(bits, axis=1)          # (P, C) bool
    pbits = pmask_p.reshape(W, N_PACKETS, C).astype(jnp.int32)
    shift = (1 << jnp.arange(N_PACKETS, dtype=jnp.int32))[None, :, None]
    pmask = jnp.sum(pbits * shift, axis=1)           # (W, C)

    wmask = pmask > 0
    if pi is not None:
        # entry distances must be SUFFIX MINIMA over the remaining chain:
        # the ordered DFS is only locally near-first (a deep near-subtree
        # leaf can sit beyond a shallow far-subtree one), so the sound
        # early-exit bound is min over every candidate still ahead
        entry = jnp.concatenate(entries, axis=1)     # (W, C)
        eq = jnp.clip(entry * entry_scale, 0.0, 2.0 ** 30).astype(jnp.int32)
        eq = jnp.where(wmask, eq, 1 << 30)
        eq = jax.lax.cummin(eq, axis=1, reverse=True)
        extra[3] = jnp.pad(eq, ((0, 0), (0, cp - C)),
                           constant_values=(1 << 30))
        extra[4] = jnp.pad(idx, ((0, 0), (0, cp - C)))

    cidx = jnp.arange(C, dtype=jnp.int32)[None, :]
    sentinel = jnp.int32(cp - 1)
    firsts = jnp.where(wmask, cidx, sentinel)
    nxt = jax.lax.cummin(firsts, axis=1, reverse=True)   # (W, C)
    count = jnp.sum(wmask, axis=1, dtype=jnp.int32)      # (W,)

    pad = cp - C
    nxt = jnp.pad(nxt, ((0, 0), (0, pad)), constant_values=cp - 1)
    pmask = jnp.pad(pmask, ((0, 0), (0, pad)))
    meta = jnp.zeros((W, n_rows, cp), jnp.int32)
    meta = meta.at[:, 0, :].set(nxt)
    meta = meta.at[:, 1, :].set(pmask)
    meta = meta.at[:, 2, 0].set(count)
    for r, v in extra.items():
        meta = meta.at[:, r, :].set(v)
    return meta.reshape(W * n_rows, cp)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_packet_kernel(cp, n_clusters, any_hit, variant="slist",
                        unroll=1, entry_scale=1.0, scene_bounds=None):
    """``variant`` picks how the candidate chain is consumed:
      - "chase":    carry the next-pointer through the fori (each
                    iteration's SMEM address depends on the previous —
                    a serial latency chain)
      - "prefetch": carry (current, next) so the chase is one iteration
                    ahead of the work that hides it
      - "slist":    chase the whole chain into an SMEM list scratch up
                    front (cheap scalar loop), then the main loop reads
                    list[i] — independent addresses the compiler can
                    pipeline
      - "f2b":      slist + the chain is in front-to-back (per-octant)
                    order with quantized entry distances (meta rows 3/4):
                    after each chunk of ``unroll`` candidates the kernel
                    compares the worst per-ray best-t against the next
                    candidate's conservative entry distance and stops —
                    the packet analogue of the reference's far-then-near
                    stack push (bvh.h:200-213). For any-hit the same test
                    stops the walk once every lane is occluded
                    (worst == -inf).
    """
    def kernel(xt_ref, meta_ref, tri_ref, out_ref, smeta, slist, sentry,
               scr, dma_sem):
        # stage this workgroup's meta rows into SMEM (scalar-readable)
        dma = pltpu.make_async_copy(meta_ref, smeta, dma_sem)
        dma.start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lanef = lane.astype(jnp.float32)
        xt = xt_ref[:]

        # packet setup: masked-reduction lane extraction (8.7 ns/column
        # measured) of the 7 ray comps + maxT, staged as (8,128)
        # broadcasts in VMEM scratch for cheap static re-reads
        maxTs = []
        exits = []
        for p in range(N_PACKETS):
            cols = []
            for c in range(7):
                col = jnp.sum(jnp.where(lane == c * N_PACKETS + p, xt, 0.0),
                              axis=1, keepdims=True)
                cols.append(col)
                scr[pl.ds((p * 7 + c) * 8, 8), :] = (
                    col + jnp.zeros((8, 128), jnp.float32))
            maxTs.append(jnp.sum(
                jnp.where(lane == 7 * N_PACKETS + p, xt, 0.0),
                axis=1, keepdims=True) + jnp.zeros((8, 128), jnp.float32))
            if variant == "f2b":
                # per-ray scene-box exit t: a ray that has found nothing
                # by the time the front-to-back chain passes its exit can
                # never hit anything — it must not pin the early-exit
                # bound at +inf (sky rays otherwise disable it)
                ox, oy, oz, dx, dy, dz, _ = cols
                lo3 = scene_bounds[:3]
                hi3 = scene_bounds[3:]
                ex = None
                for o3, d3, l3, h3 in ((ox, dx, lo3[0], hi3[0]),
                                       (oy, dy, lo3[1], hi3[1]),
                                       (oz, dz, lo3[2], hi3[2])):
                    ivd = 1.0 / jnp.where(d3 == 0.0, 1e-30, d3)
                    a = (l3 - o3) * ivd
                    b = (h3 - o3) * ivd
                    m = jnp.maximum(a, b)
                    ex = m if ex is None else jnp.minimum(ex, m)
                exits.append(ex * 1.0001 + 1e-5)
        dma.wait()
        count = smeta[2, 0]
        start = smeta[0, 0]

        def test_packet(rows, cbase, p, carry):
            ox = scr[pl.ds((p * 7 + 0) * 8, 8), :]
            oy = scr[pl.ds((p * 7 + 1) * 8, 8), :]
            oz = scr[pl.ds((p * 7 + 2) * 8, 8), :]
            dx = scr[pl.ds((p * 7 + 3) * 8, 8), :]
            dy = scr[pl.ds((p * 7 + 4) * 8, 8), :]
            dz = scr[pl.ds((p * 7 + 5) * 8, 8), :]
            mnt = scr[pl.ds((p * 7 + 6) * 8, 8), :]
            (nx, ny, nz, d0, m1x, m1y, m1z, c1, m2x, m2y, m2z, c2) = rows
            bt, code = carry
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
            if any_hit:
                return jnp.where(hit, -jnp.inf, bt), code
            return jnp.where(hit, t, bt), jnp.where(hit, cbase + lanef, code)

        def step(cs, state):
            # chain value -> real cluster id (identity unless f2b, whose
            # chain lives in per-octant permuted index space)
            rid = smeta[4, cs] if variant == "f2b" else cs
            # sentinel slots (unroll overrun) must not read past the tri
            # table; their pmask is 0 so every test cond skips
            base = jnp.minimum(rid, n_clusters - 1) * N_CONST
            rows = tuple(
                jnp.broadcast_to(tri_ref[pl.ds(base + j, 1), :], (8, 128))
                for j in range(N_CONST))
            pm = smeta[1, cs]
            cbase = (rid * 128).astype(jnp.float32)
            new = []
            for p in range(N_PACKETS):
                live = (jax.lax.shift_right_logical(pm, p) & 1) > 0
                new.append(jax.lax.cond(
                    live,
                    lambda s, p=p: test_packet(rows, cbase, p, s),
                    lambda s: s, state[p]))
            return tuple(new)

        init = tuple((maxTs[p], jnp.full((8, 128), -1.0))
                     for p in range(N_PACKETS))

        if variant == "chase":
            def body(i, carry):
                c, state = carry
                cs = jnp.minimum(c, cp - 1)
                state = step(cs, state)
                c_next = smeta[0, jnp.minimum(cs + 1, cp - 1)]
                return c_next, state

            _, final = jax.lax.fori_loop(0, count, body, (start, init))
        elif variant == "prefetch":
            nxt0 = smeta[0, jnp.minimum(start + 1, cp - 1)]

            def body(i, carry):
                c, cn, state = carry
                cs = jnp.minimum(c, cp - 1)
                cn2 = smeta[0, jnp.minimum(cn + 1, cp - 1)]
                state = step(cs, state)
                return cn, cn2, state

            _, _, final = jax.lax.fori_loop(0, count, body,
                                            (start, nxt0, init))
        elif variant == "f2b":
            def chase(i, c):
                slist[i] = c
                sentry[i] = smeta[3, c]
                return smeta[0, jnp.minimum(c + 1, cp - 1)]

            jax.lax.fori_loop(0, count, chase, start)
            slist[count] = cp - 1          # pmask 0: overrun slots no-op
            sentry[count] = 1 << 30

            ch = max(unroll, 1)
            n_chunks = (count + ch - 1) // ch

            def cond(carry):
                k, stop, _ = carry
                return (k < n_chunks) & (stop == 0)

            def body(carry):
                k, _, state = carry
                for u in range(ch):
                    state = step(slist[jnp.minimum(k * ch + u, count)],
                                 state)
                # worst best-t across every ray vs the next candidate's
                # conservative entry distance (quantized; -1 margin keeps
                # truncation error on the safe side). Rays still at
                # maxT=inf (no hit yet) pin worst at inf — no early stop
                # until every ray is resolved or the chain runs dry.
                worst = -jnp.inf
                for p in range(N_PACKETS):
                    bt = state[p][0]
                    bound = jnp.minimum(jnp.min(bt, axis=1, keepdims=True),
                                        exits[p])
                    worst = jnp.maximum(worst, jnp.max(bound))
                nxt_e = sentry[jnp.minimum((k + 1) * ch, count)]
                stop = (worst * entry_scale
                        < (nxt_e - 1).astype(jnp.float32))
                return k + 1, stop.astype(jnp.int32), state

            _, _, final = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), init))
        else:                                   # "slist"
            def chase(i, c):
                slist[i] = c
                return smeta[0, jnp.minimum(c + 1, cp - 1)]

            jax.lax.fori_loop(0, count, chase, start)

            if unroll == 1:
                def body(i, state):
                    return step(slist[i], state)

                final = jax.lax.fori_loop(0, count, body, init)
            else:
                # overrun slots (at most unroll-1) read the sentinel
                # written at slist[count]: pmask 0 => every cond skips
                slist[count] = cp - 1

                def body(i, state):
                    for u in range(unroll):
                        state = step(
                            slist[jnp.minimum(i * unroll + u, count)],
                            state)
                    return state

                final = jax.lax.fori_loop(0, (count + unroll - 1) // unroll,
                                          body, init)

        out = jnp.zeros((8, 128), jnp.float32)
        for p in range(N_PACKETS):
            bt, code = final[p]
            btmin = jnp.min(bt, axis=1, keepdims=True)
            win = jnp.min(jnp.where(bt == btmin, code, jnp.inf), axis=1,
                          keepdims=True)
            out = out + jnp.where(lane == p,
                                  jnp.broadcast_to(btmin, (8, 128)), 0.0)
            out = out + jnp.where(lane == N_PACKETS + p,
                                  jnp.broadcast_to(win, (8, 128)), 0.0)
        out_ref[:] = out

    return kernel


@functools.lru_cache(maxsize=16)
def _build_packet_fn(n_wg, cp, n_clusters, any_hit, interpret,
                     variant="slist", unroll=1, entry_scale=1.0,
                     scene_bounds=None):
    kernel = _make_packet_kernel(cp, n_clusters, any_hit, variant, unroll,
                                 entry_scale, scene_bounds)
    fn = pl.pallas_call(
        kernel,
        grid=(n_wg,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),      # ray comps
            pl.BlockSpec((8, cp), lambda w: (w, 0),
                         memory_space=pltpu.VMEM),      # meta rows
            pl.BlockSpec(memory_space=pltpu.VMEM),      # tri consts (C*12)
        ],
        out_shape=jax.ShapeDtypeStruct((n_wg * 8, 128), jnp.float32),
        out_specs=pl.BlockSpec((8, 128), lambda w: (w, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((8, cp), jnp.int32),
                        pltpu.SMEM((cp,), jnp.int32),       # chain list
                        pltpu.SMEM((cp,), jnp.int32),       # entry dists
                        pltpu.VMEM((N_PACKETS * 7 * 8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# tracer facade
# ---------------------------------------------------------------------------

class PacketTracer:
    """Mesh tracer: Pallas ray-packet streaming + dense XLA spheres.

    Same contract as ClusterTracer (closest / occluded with detached
    traversal); drop-in for the wavefront renderer.
    """

    VMEM_BUDGET_BYTES = 10 * 2 ** 20

    def __init__(self, scene: ir.Scene, max_k=PACK_K, sort_rays=True,
                 sort_mode="origin", builder="auto", variant="slist",
                 unroll=4):
        self.data = PacketData(scene, max_k=max_k, builder=builder)
        if self.data.tri_rows_t.nbytes > self.VMEM_BUDGET_BYTES:
            raise ValueError(
                f"packed tri table {self.data.tri_rows_t.nbytes >> 20} MB "
                f"exceeds the packet kernel's VMEM budget — use "
                f"ClusterTracer (streaming) for this scene")
        self.sort_rays = sort_rays
        self.sort_mode = sort_mode
        self.variant = variant
        self.unroll = unroll
        C = self.data.n_clusters
        # next-pointer rows need a C < cp sentinel slot
        self.cp = -(-(C + 1) // 128) * 128
        # front-to-back machinery: per-direction-octant cluster orderings
        # (by center projection on the octant diagonal) + the quantization
        # scale for entry distances (2^21 quanta across the scene diag)
        self.pi = jnp.asarray(self.data.octant_orders())
        diag = float(np.linalg.norm(self.data.scene_hi
                                    - self.data.scene_lo)) or 1.0
        self.entry_scale = float(2.0 ** 21) / (4.0 * diag)
        self._bounds_static = tuple(
            float(v) for v in np.concatenate(
                [self.data.scene_lo, self.data.scene_hi]))
        self.bounds = (jnp.asarray(self.data.scene_lo),
                       jnp.asarray(self.data.scene_hi))
        self.tri_t = jnp.asarray(self.data.tri_rows_t)
        self.cl_lo = jnp.asarray(self.data.cl_lo)
        self.cl_hi = jnp.asarray(self.data.cl_hi)
        self.perm = jnp.asarray(self.data.perm)
        from vimg_tpu.geometry.soa_intersect import build_constants
        _, self.sph_c = build_constants(scene)
        if self.sph_c is not None:
            self.sph_c = np.asarray(self.sph_c)
        # vert tables for the XLA barycentric reconstruction (the kernel
        # returns only (t, code); u/v are recomputed at the winning tri —
        # the same verts hit_info gathers anyway)
        self.verts = jnp.asarray(scene.verts)
        self.tri_vidx = jnp.asarray(scene.tri_vidx)
        self._closest_jit = jax.jit(self._closest_impl)
        self._occluded_jit = jax.jit(self._occluded_impl)

    def _run(self, ro, rd, minT, maxT, any_hit):
        B = ro.shape[0]
        n_pad = -(-B // WG) * WG
        minT = jnp.broadcast_to(minT, (B,))
        maxT = jnp.broadcast_to(maxT, (B,))

        do_sort = self.sort_rays and B > WG
        if do_sort:
            key = ray_sort_key(ro, rd, *self.bounds, mode=self.sort_mode)
            perm = jnp.argsort(key)
            ro = jnp.take(ro, perm, axis=0)
            rd = jnp.take(rd, perm, axis=0)
            minT = jnp.take(minT, perm)
            maxT = jnp.take(maxT, perm)

        def padto(x, fill=0.0):
            if x.ndim == 2:
                return jnp.pad(x, ((0, n_pad - B), (0, 0)),
                               constant_values=fill)
            return jnp.pad(x, (0, n_pad - B), constant_values=fill)

        # padding lanes: maxT=-inf never passes t < bt and never keeps a
        # cluster live in the cull (tin >= mn=0 > tout)
        rop = padto(ro)
        rdp = padto(rd, fill=1.0)
        mnp = padto(minT)
        mxp = padto(maxT, fill=-jnp.inf)

        f2b = self.variant == "f2b"
        meta = _cull_meta(rop, rdp, mnp, mxp, self.cl_lo, self.cl_hi,
                          self.cp, pi=self.pi if f2b else None,
                          entry_scale=self.entry_scale)
        comps = jnp.concatenate(
            [rop, rdp, mnp[:, None], mxp[:, None]], axis=1)   # (n_pad, 8)
        n_wg = n_pad // WG
        xt = comps.reshape(n_wg, N_PACKETS, 8, 8).transpose(
            0, 2, 3, 1).reshape(n_wg * 8, 128)

        interpret = jax.default_backend() == "cpu"
        fn = _build_packet_fn(n_wg, self.cp, self.data.n_clusters, any_hit,
                              interpret, self.variant, self.unroll,
                              self.entry_scale, self._bounds_static)
        out = fn(xt, meta, self.tri_t)

        o = out.reshape(n_wg, 8, 128)
        # ray (w, p, r) lives at out[w, r, lane p] (bt) / lane 16+p (code)
        bt = o[:, :, :N_PACKETS].transpose(0, 2, 1).reshape(n_pad)[:B]
        code = o[:, :, N_PACKETS:2 * N_PACKETS].transpose(
            0, 2, 1).reshape(n_pad)[:B]
        if do_sort:
            def unperm(x):
                return jnp.zeros_like(x).at[perm].set(x)
            bt, code = unperm(bt), unperm(code)
        return bt, code

    def _closest_impl(self, ro, rd, minT, maxT):
        bt, code = self._run(ro, rd, minT, maxT, any_hit=False)
        found = code >= 0.0
        slot = jnp.clip(code.astype(jnp.int32), 0, self.perm.shape[0] - 1)
        tri_id = self.perm[slot]
        best_t = jnp.where(found, bt, jnp.inf)

        # barycentrics of the winning tri (exact solve in the tri plane;
        # convention matches soa_intersect: HitResult.u weights p0)
        tid = jnp.clip(tri_id, 0, self.tri_vidx.shape[0] - 1)
        vidx = self.tri_vidx[tid]
        p0 = self.verts[vidx[:, 0]]
        p1 = self.verts[vidx[:, 1]]
        p2 = self.verts[vidx[:, 2]]
        hp = ro + rd * jnp.where(found, bt, 0.0)[:, None]
        e1 = p1 - p0
        e2 = p2 - p0
        q = hp - p0
        d11 = jnp.sum(e1 * e1, axis=1)
        d12 = jnp.sum(e1 * e2, axis=1)
        d22 = jnp.sum(e2 * e2, axis=1)
        q1 = jnp.sum(q * e1, axis=1)
        q2 = jnp.sum(q * e2, axis=1)
        det = jnp.maximum(d11 * d22 - d12 * d12, 1e-30)
        lam1 = (d22 * q1 - d12 * q2) / det       # weight of p1
        lam2 = (d11 * q2 - d12 * q1) / det       # weight of p2
        u = 1.0 - lam1 - lam2                    # weight of p0
        v = lam1

        hr = intersect.HitResult(
            t=best_t,
            prim_type=jnp.full(ro.shape[:1], ir.PRIM_TRI, jnp.int32),
            prim_id=jnp.where(found, tri_id, 0).astype(jnp.int32),
            u=jnp.where(found, u, 0.0), v=jnp.where(found, v, 0.0))
        if self.sph_c is not None:
            hr = self._merge_spheres(hr, ro, rd, minT, maxT)
        return hr

    def _occluded_impl(self, ro, rd, minT, maxT):
        bt, _ = self._run(ro, rd, minT, maxT, any_hit=True)
        occ = bt == -jnp.inf
        if self.sph_c is not None:
            from vimg_tpu.geometry.soa_intersect import _trace_impl
            occ = occ | _trace_impl(None, self.sph_c, ro, rd, minT,
                                    jnp.broadcast_to(maxT, occ.shape), True)
        return occ

    # same zero-tangent traversal semantics as ClusterTracer
    differentiable = True

    def closest(self, scene, ro, rd, minT, maxT):
        dt = jax.lax.stop_gradient
        return self._closest_jit(dt(ro), dt(rd), dt(minT), dt(maxT))

    def occluded(self, scene, ro, rd, minT, maxT):
        dt = jax.lax.stop_gradient
        return self._occluded_jit(dt(ro), dt(rd), dt(minT), dt(maxT))

    def _merge_spheres(self, hr, ro, rd, minT, maxT):
        from vimg_tpu.geometry.soa_intersect import _trace_impl
        sh = _trace_impl(None, self.sph_c, ro, rd, minT,
                         jnp.broadcast_to(maxT, hr.t.shape), False)
        better = sh.t < hr.t
        return intersect.HitResult(
            t=jnp.where(better, sh.t, hr.t),
            prim_type=jnp.where(better, ir.PRIM_SPHERE, hr.prim_type)
            .astype(jnp.int32),
            prim_id=jnp.where(better, sh.prim_id, hr.prim_id),
            u=jnp.where(better, sh.u, hr.u),
            v=jnp.where(better, sh.v, hr.v))
