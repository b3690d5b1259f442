"""TPU-native mesh traversal: SAH-treelet cluster streaming in Pallas.

The classic per-ray BVH walk (geometry/bvh.py, reference include/bvh.h:
87-226) is gather-bound on TPU: per-lane random reads from the node table
have no VPU datapath (~0.01 Mrays/s measured on v5e). This backend
restructures traversal so EVERY memory access is dense:

- the SAH tree (same builders as bvh.py) is cut into treelet clusters of
  <= K triangles; each cluster is one contiguous (K, 16) block of
  plane/dual-basis triangle constants (soa_intersect formulation) plus a
  precomputed AABB,
- the cut nodes plus their ancestors form the SAH tree's restriction to
  clusters (leaves = clusters, in preorder); that small tree (~2C nodes)
  is threaded with skip links and its AABBs/metadata live in SMEM,
- a Pallas kernel runs one grid step per RAY TILE; inside, a scalar
  while_loop walks the cluster tree: dense slab test of the whole tile
  vs the node AABB (current best_t as tmax, so closer hits shrink the
  interval), advance ``hit ? n+1 : skip[n]``; at a live leaf, DMA the
  cluster's (8, 128) tri block HBM->VMEM scratch and run the K dense
  triangle tests (lax.cond),
- best-hit state lives in while carries (VMEM/vregs); no scatter, no
  gather, no per-ray divergence.

Cluster skipping is tile-coherent rather than ray-coherent: a tile
visits a node iff ANY of its rays touches the box. Primary/shadow tiles
skip nearly everything; incoherent bounce tiles degrade toward streaming
the whole cluster list — the trade that keeps the inner loop dense VPU
work (the measured 560 M prim-tests/s regime) instead of pointer
chasing (~0.01 Mrays/s measured for the per-lane gather walk).

Spheres are not clustered (mesh scenes carry at most a handful); the
tracer tests them densely on the XLA side and merges by min-t.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimg_tpu.geometry import intersect
from vimg_tpu.geometry.bvh import build_bvh_numpy
from vimg_tpu.scene import ir

CLUSTER_K = 64          # triangles per cluster (pad with inert zero rows)
TILE_ROWS = 64          # ray tile = TILE_ROWS * 128 lanes (min 8: Pallas
                        # requires block rows divisible by 8). With
                        # per-row-group gated tri tests, bigger tiles
                        # amortize the per-node walk overhead while tri
                        # tests stay (8,128)-granular: 64 beat 32 by
                        # +11-16% e2e on terrain/bumpy 100k and was the
                        # round-3 sweep peak (bench_records/r3_probe_g.json)
ROW16 = 16              # floats per packed triangle row (12 used)


# ---------------------------------------------------------------------------
# host-side build: SAH tree -> treelet clusters
# ---------------------------------------------------------------------------

def cut_clusters(built: dict, node_start, max_k=CLUSTER_K):
    """Greedy treelet cut: maximal subtrees with <= max_k prims become
    clusters (contiguous ranges of the build permutation). Also emits the
    SAH tree's *restriction* to the cut — internal nodes are the cut
    nodes' ancestors, leaves are the clusters in preorder — threaded with
    skip links for the kernel's tile-coherent walk.

    Returns (ranges, tree) where tree = dict(lo (M,3), hi (M,3),
    cid (M,) int32 cluster id or -1, skip (M,) int32)."""
    node_count = built["node_count"]
    node_min = built["node_min"]
    node_max = built["node_max"]
    node_skip = built["node_skip"]
    N = node_count.shape[0]
    node_right = built.get("node_right")
    if node_right is None:
        # preorder invariant: left child = i+1, skip(left) = right sibling
        node_right = np.full(N, -1, np.int32)
        inner_n = np.nonzero(node_count == 0)[0]
        node_right[inner_n] = node_skip[np.minimum(inner_n + 1, N - 1)]
    # subtree prim ranges, vectorized: in the preorder layout node n's
    # subtree is the contiguous block [n, skip[n]), and SAH splits keep
    # prim ranges contiguous — so lo[n] is the start of the first leaf at
    # index >= n and hi[n] the end of the last leaf before skip[n]. (The
    # python postorder this replaces walked all N nodes: ~10 s at 2M tris.)
    leaf_pos = np.nonzero(node_count > 0)[0]
    leaf_start = node_start[leaf_pos].astype(np.int64)
    leaf_end = leaf_start + node_count[leaf_pos]
    first_leaf = np.searchsorted(leaf_pos, np.arange(N))
    last_leaf = np.searchsorted(leaf_pos, node_skip) - 1
    lo = leaf_start[np.minimum(first_leaf, len(leaf_pos) - 1)]
    hi = leaf_end[np.clip(last_leaf, 0, len(leaf_pos) - 1)]

    ranges = []
    t_min, t_max, t_cid, t_right = [], [], [], []
    stack = [(0, -1, False)]           # (orig node, parent new idx, is_right)
    while stack:
        n, parent, is_right = stack.pop()
        idx = len(t_min)
        if parent >= 0 and is_right:
            t_right[parent] = idx
        t_min.append(node_min[n])
        t_max.append(node_max[n])
        t_right.append(-1)
        if hi[n] - lo[n] <= max_k or node_count[n] > 0:
            t_cid.append(len(ranges))
            ranges.append((int(lo[n]), int(hi[n])))
        else:
            t_cid.append(-1)
            stack.append((int(node_right[n]), idx, True))
            stack.append((n + 1, idx, False))

    M = len(t_min)
    # preorder skip links: skip(root)=M, skip(left)=right sibling,
    # skip(right)=skip(parent); for a leaf skip == idx+1
    t_skip = np.full(M, M, np.int32)
    st2 = [(0, M)]
    while st2:
        i, s = st2.pop()
        t_skip[i] = s
        if t_cid[i] < 0:
            r = t_right[i]
            st2.append((i + 1, r))
            st2.append((r, s))
    lo_a = np.stack(t_min).astype(np.float32)
    hi_a = np.stack(t_max).astype(np.float32)
    right = np.asarray(t_right, np.int32)
    # per-node, per-direction-octant child order for near-first stack
    # walks (the reference pushes far-then-near, bvh.h:200-213): on the
    # axis of largest child-center separation, a ray moving toward
    # +axis should descend the lower-center child first. order bit o
    # (octant = sign bits of the ray direction, 1 = negative) set =>
    # visit the RIGHT child first for that octant.
    order = np.zeros(M, np.int32)
    inner = right >= 0
    if inner.any():
        li = np.minimum(np.arange(M) + 1, M - 1)   # left child = n+1
        ri = np.maximum(right, 0)
        cl = (lo_a[li] + hi_a[li]) * 0.5
        cr = (lo_a[ri] + hi_a[ri]) * 0.5
        sep = np.abs(cr - cl)
        axis = np.argmax(sep, axis=1)
        r_lower = np.take_along_axis(cr, axis[:, None], 1)[:, 0] < \
            np.take_along_axis(cl, axis[:, None], 1)[:, 0]
        for o in range(8):
            neg = (o >> axis) & 1            # octant sign on split axis
            right_first = np.where(neg.astype(bool), ~r_lower, r_lower)
            order |= np.where(inner, right_first.astype(np.int32) << o, 0)
    tree = dict(lo=lo_a, hi=hi_a, cid=np.asarray(t_cid, np.int32),
                skip=t_skip, right=right, order=order)
    return ranges, tree


def build_wide_tree(tree, fan=8):
    """Collapse the binary cluster tree into a ``fan``-ary one for the
    wide stack walk: each wide node's children are the frontier obtained
    by repeatedly expanding binary inner nodes (BFS) until every entry is
    a cluster leaf or the frontier reaches ``fan``.

    The wide walk pops ONE wide node per serial round and slab-tests its
    up-to-``fan`` child boxes together — the reductions overlap, so the
    per-round latency stays near the binary walk's while covering ~3
    binary levels (the binary walk's serial chain is one node per round;
    probe r5_probe_f measured cost ~ 1.7 us x rounds).

    Returns dict(boxes (W, fan, 6) f32, refs (W, fan) i32, depth int).
    refs: >= 0 -> wide node id; < 0 -> cluster id encoded as -(cid+1);
    empty slots hold ref 0x3FFFFFFF with an inverted (never-hit) box.
    """
    cid = tree["cid"]
    right = tree["right"]
    lo, hi = tree["lo"], tree["hi"]

    id_of = {}
    roots = []              # binary node backing each wide node

    def make(b):
        if b not in id_of:
            id_of[b] = len(roots)
            roots.append(b)
        return id_of[b]

    make(0)
    boxes, refs = [], []
    w = 0
    while w < len(roots):
        b = roots[w]
        frontier = [b]
        # expand the LARGEST-subtree inner entry first (subtree size =
        # preorder span) so the wide children stay balanced — leftmost
        # expansion would unroll one spine deep and leave huge siblings
        skip = tree["skip"]
        while len(frontier) < fan:
            inner = [(int(skip[n]) - n, i) for i, n in enumerate(frontier)
                     if cid[n] < 0]
            if not inner:
                break
            _, i = max(inner)
            n = frontier[i]
            frontier[i: i + 1] = [n + 1, int(right[n])]
        nb = np.zeros((fan, 6), np.float32)
        nb[:, 0:3] = np.inf          # empty slots: inverted box, never hit
        nb[:, 3:6] = -np.inf
        nr = np.full((fan,), 0x3FFFFFFF, np.int32)
        for i, n in enumerate(frontier):
            nb[i, 0:3] = lo[n]
            nb[i, 3:6] = hi[n]
            nr[i] = -(int(cid[n]) + 1) if cid[n] >= 0 else make(n)
        boxes.append(nb)
        refs.append(nr)
        w += 1

    boxes = np.stack(boxes)
    refs = np.stack(refs)
    # max stack depth of the wide DFS: along any root->leaf path each
    # pushed level adds at most fan-1 siblings plus the descent
    W = len(roots)
    depth = np.ones(W, np.int32)
    for w in range(W - 1, -1, -1):
        kids = refs[w]
        d = 1
        for r in kids:
            if 0 <= r < 0x3FFFFFFF:
                d = max(d, 1 + depth[r])
        depth[w] = d
    max_stack = int(depth[0]) * fan + fan
    return dict(boxes=boxes, refs=refs, depth=int(depth[0]),
                max_stack=max_stack)


def _tri_constants_f32(verts, tri_vidx):
    """Plane + dual-basis constants — the shared soa_intersect
    formulation (one implementation, so the cluster path can never drift
    from the dense tracer it must match exactly)."""
    from vimg_tpu.geometry.soa_intersect import tri_constants
    return tri_constants(verts, tri_vidx)


class ClusterData:
    """Packed cluster tables (host numpy; device arrays built lazily).

    ``with_attrs`` additionally packs a parallel per-tri shading-attribute
    table ``attr_rows`` (same (C * max_k * 16/128, 128) shape as
    ``tri_rows``) for kernels that shade in-kernel (render/mega): slots
    0..8 hold the three vertex normals n0/n1/n2 (falling back to the
    normalized geometric normal when a tri has no vertex normals, exactly
    like geometry/intersect.py:253-255)."""

    def __init__(self, scene: ir.Scene, max_k=CLUSTER_K, with_attrs=False,
                 builder="auto"):
        verts = np.asarray(scene.verts)
        tvidx = np.asarray(scene.tri_vidx)
        T = tvidx.shape[0]
        p = verts[tvidx]
        bmin = p.min(axis=1)
        bmax = p.max(axis=1)
        centers = p.mean(axis=1)
        # builder: "auto" = native C++ binned-SAH (threaded) with a numpy
        # fallback; "device" = the on-device level-synchronous sweep
        # (geometry/device_build.py) — dynamic-scene rebuild pipelines can
        # produce the cluster cut without the host SAH recursion; "numpy"
        # = the oracle. All emit the same preorder/skip layout.
        if builder == "device":
            from vimg_tpu.geometry.device_build import build_sweep_sah_device
            built = build_sweep_sah_device(bmin, bmax, centers)
        elif builder == "numpy":
            built = build_bvh_numpy(bmin, bmax, centers)
        else:
            try:
                from vimg_tpu.runtime.native import build_bvh_native
                built = build_bvh_native(bmin, bmax, centers, mode=0)
            except Exception:
                built = build_bvh_numpy(bmin, bmax, centers)
        if "node_right" not in built:
            # preorder invariant: left child = i+1, skip(left) = right
            count = built["node_count"]
            skip = built["node_skip"]
            N = count.shape[0]
            node_right = np.full(N, -1, np.int32)
            inner = np.nonzero(count == 0)[0]
            node_right[inner] = skip[np.minimum(inner + 1, N - 1)]
            built["node_right"] = node_right
        order = built["order"]
        ranges, tree = cut_clusters(built, built["node_start"], max_k)

        C = len(ranges)
        # each cluster's (max_k, 16) consts pack into (max_k*16/128, 128)
        # rows: DMA slice shapes must be 128-aligned in the minor dim.
        # Spare float slots (12..15 of each 16-wide tri row) carry:
        #   slot 12        = material id (as f32) of tri k
        #   tris 2s, 2s+1, slots 13..15 = sub-block s AABB lo / hi — each
        #   run of 16 consecutive tris (BVH order, so spatially tight) gets
        #   its own box; the kernel gates each 16-tri test group on it.
        n_sub = max(max_k // 16, 1)
        # hit codes ride the kernels as f32 (c*max_k + k); above 2^24 they
        # stop being exactly representable and hits would silently map to
        # the WRONG triangle — refuse rather than corrupt
        if C * max_k > (1 << 24):
            raise ValueError(
                f"mesh too large for the f32 hit-code space: "
                f"{C} clusters x {max_k} slots > 2^24 "
                f"({T} tris — shard the mesh or use BVHTracer)")
        consts = _tri_constants_f32(verts, tvidx)
        tri_mat = np.asarray(scene.tri_mat, np.float32) \
            if scene.tri_mat is not None else np.zeros(T, np.float32)
        # fully vectorized packing (the per-cluster python loop cost 2.6 s
        # at 500k tris — the dominant host build cost)
        starts = np.asarray([s for s, _ in ranges], np.int64)
        ends = np.asarray([e for _, e in ranges], np.int64)
        lens = ends - starts
        kk = np.arange(max_k)
        valid = kk[None, :] < lens[:, None]                       # (C, K)
        ids = order[np.minimum(starts[:, None] + kk[None, :],
                               ends[:, None] - 1)]                # (C, K)
        tri_rows = np.zeros((C, max_k, ROW16), np.float32)
        tri_rows[:, :, :12] = np.where(valid[..., None], consts[ids], 0.0)
        tri_rows[:, :, 12] = np.where(valid, tri_mat[ids], 0.0)
        perm = np.where(valid, ids, 0).astype(np.int32).reshape(-1)

        def sub_boxes(width):
            g = max_k // width
            idsr = ids[:, :g * width].reshape(C, g, width)
            mr = valid[:, :g * width].reshape(C, g, width)[..., None]
            lo = np.where(mr, bmin[idsr], np.inf).min(axis=2)
            hi = np.where(mr, bmax[idsr], -np.inf).max(axis=2)
            return lo.astype(np.float32), hi.astype(np.float32)

        lo16, hi16 = sub_boxes(16)
        tri_rows[:, 0:2 * n_sub:2, 13:16] = lo16
        tri_rows[:, 1:2 * n_sub:2, 13:16] = hi16
        # finer 8-tri sub boxes in the NEXT free spare slots (tri rows
        # 2*n_sub .. 2*n_sub + 2*n_sub8 - 1); additive so the 16-tri
        # layout above stays valid for the XLA cluster kernel
        n_sub8 = max(max_k // 8, 1)
        if 2 * n_sub + 2 * n_sub8 <= max_k:
            lo8, hi8 = sub_boxes(8)
            tri_rows[:, 2 * n_sub: 2 * n_sub + 2 * n_sub8: 2, 13:16] = lo8
            tri_rows[:, 2 * n_sub + 1: 2 * n_sub + 2 * n_sub8: 2,
                     13:16] = hi8
        self.n_clusters = C
        self.max_k = max_k
        # (C * max_k*16/128, 128) layout, row-major within each cluster
        self.tri_rows = tri_rows.reshape(C * (max_k * ROW16 // 128), 128)
        self.perm = perm
        self.cl_len = lens.astype(np.int32)     # valid tris per cluster
        self.n_tris = T

        self.attr_rows = None
        if with_attrs:
            # face normals in f32 with intersect.py op order (normalize of
            # the f32 cross product)
            p32 = verts.astype(np.float32)[tvidx]
            e1 = p32[:, 1] - p32[:, 0]
            e2 = p32[:, 2] - p32[:, 0]
            fn = np.cross(e1, e2)
            fn = fn / np.maximum(
                np.sqrt((fn * fn).sum(-1, keepdims=True)), 1e-38)
            if scene.vnormals is not None and scene.tri_flags is not None:
                vn = np.asarray(scene.vnormals, np.float32)
                has = (np.asarray(scene.tri_flags)
                       & ir.TRI_HAS_NORMALS).astype(bool)[:, None]
                n0 = np.where(has, vn[tvidx[:, 0]], fn)
                n1 = np.where(has, vn[tvidx[:, 1]], fn)
                n2 = np.where(has, vn[tvidx[:, 2]], fn)
            else:
                n0 = n1 = n2 = fn
            attrs = np.concatenate([n0, n1, n2], axis=1).astype(np.float32)
            attr_rows = np.zeros((C, max_k, ROW16), np.float32)
            attr_rows[:, :, :9] = np.where(valid[..., None], attrs[ids], 0.0)
            self.attr_rows = attr_rows.reshape(C * (max_k * ROW16 // 128),
                                               128)

        # --- cluster-tree tables for SMEM -------------------------------
        # SMEM rows are padded to 128 lanes (512 B) regardless of logical
        # width, so narrow tables are packed: 16 node AABBs (8 f32 each)
        # per f32 row, 128 node metas per i32 row.
        M = tree["cid"].shape[0]
        self.n_nodes = M
        self.scene_lo = tree["lo"][0].copy()
        self.scene_hi = tree["hi"][0].copy()
        M16 = -(-M // 16) * 16
        ab = np.zeros((M16, 8), np.float32)
        ab[:M, 0:3] = tree["lo"]
        ab[:M, 3:6] = tree["hi"]
        self.node_aabbs = ab.reshape(M16 // 16, 128)
        M128 = -(-M // 128) * 128
        cid = np.full((M128,), 0, np.int32)
        cid[:M] = tree["cid"]
        skip = np.full((M128,), M, np.int32)
        skip[:M] = tree["skip"]
        self.node_cid = cid.reshape(-1, 128)
        self.node_skip = skip.reshape(-1, 128)
        # right-child + per-octant order tables for the near-first stack
        # walk (render/mega kernel walk="stack")
        right = np.full((M128,), -1, np.int32)
        right[:M] = tree["right"]
        order = np.zeros((M128,), np.int32)
        order[:M] = tree["order"]
        self.node_right = right.reshape(-1, 128)
        self.node_order = order.reshape(-1, 128)
        # max stack depth a DFS of the cluster tree can need (root->leaf
        # path length), for sizing the kernel's SMEM stack
        st3 = [(0, 1)]
        maxd = 1
        while st3:
            i, d = st3.pop()
            maxd = max(maxd, d)
            if tree["cid"][i] < 0:
                st3.append((i + 1, d + 1))
                st3.append((int(tree["right"][i]), d + 1))
        self.tree_depth = maxd
        self._tree = tree          # retained for lazy wide-walk tables
        self._wide = None

    def wide_tables(self, fan=8):
        """SMEM-packed tables for the wide stack walk (built lazily):
        boxes: child c of wide node w at [w//2, (w%2)*64 + c*8 + j] (6 of
        8 slots used); refs: [w//16, (w%16)*8 + c]; cl_boxes: cluster cid
        box at [cid//16, (cid%16)*8 + j] (node_aabbs packing)."""
        if self._wide is None:
            wt = build_wide_tree(self._tree, fan)
            W = wt["boxes"].shape[0]
            arr = np.zeros((W, fan, 8), np.float32)
            arr[:, :, :6] = wt["boxes"]
            arr = arr.reshape(W, fan * 8)
            W2 = -(-W // 2) * 2
            wb = np.zeros((W2, 64), np.float32)
            wb[:W] = arr
            wb = wb.reshape(W2 // 2, 128)
            W16 = -(-W // 16) * 16
            rr = np.full((W16, fan), 0x3FFFFFFF, np.int32)
            rr[:W] = wt["refs"]
            rr = rr.reshape(W16 // 16, 128)
            # per-cluster AABBs (binary-tree leaf boxes) for leaf-pop
            # per-lane gating
            tree = self._tree
            C = self.n_clusters
            cb = np.zeros((-(-C // 16) * 16, 8), np.float32)
            leaf = tree["cid"] >= 0
            cb[tree["cid"][leaf], 0:3] = tree["lo"][leaf]
            cb[tree["cid"][leaf], 3:6] = tree["hi"][leaf]
            self._wide = dict(boxes=wb, refs=rr,
                              cl_boxes=cb.reshape(-1, 128),
                              n_wide=W, max_stack=wt["max_stack"])
        return self._wide


# ---------------------------------------------------------------------------
# the wide (8-ary) stack-walk kernel
# ---------------------------------------------------------------------------

def _make_wide_kernel(n_wide, max_k, tile_rows, any_hit, count_stats=False,
                      mode="resident_direct", walk_batch=2, sub_width=16,
                      max_stack=96, fan=8):
    """One serial round per WIDE node pop: slab-test its up-to-``fan``
    child boxes together (independent reductions overlap — the binary
    skip walk pays one latency-bound round PER node, r5_probe_f: cost ~
    1.7 us x rounds), push live children on an SMEM stack; cluster
    leaves run the same sub-box-gated dense tri tests as the skip
    kernel, so hits are bit-identical (same candidate sets, same test
    order per lane)."""
    rows_per_cluster = max_k * ROW16 // 128
    EMPTY = 0x3FFFFFFF

    def kernel(wbox_ref, wref_ref, clbox_ref, tri_hbm,
               rox, roy, roz, rdx, rdy, rdz, tmin_ref, tmax_ref,
               bt_ref, code_ref, bu_ref, bv_ref, *rest):
        if count_stats:
            stats_ref = rest[0]
            rest = rest[1:]
        stack_ref = rest[0]
        rest = rest[1:]
        if mode == "resident_direct":
            tri_buf = dma_sem = None
        else:
            tri_buf, dma_sem = rest

        n_groups = tile_rows // 8 if tile_rows > 8 else 1
        R = tile_rows // n_groups
        gsl = [pl.ds(g * R, R) for g in range(n_groups)]
        gset = list(range(n_groups))
        oxs = [rox[s, :] for s in gsl]
        oys = [roy[s, :] for s in gsl]
        ozs = [roz[s, :] for s in gsl]
        dxs = [rdx[s, :] for s in gsl]
        dys = [rdy[s, :] for s in gsl]
        dzs = [rdz[s, :] for s in gsl]
        minTs = [tmin_ref[s, :] for s in gsl]
        idxs = [1.0 / jnp.where(d == 0.0, 1e-30, d) for d in dxs]
        idys = [1.0 / jnp.where(d == 0.0, 1e-30, d) for d in dys]
        idzs = [1.0 / jnp.where(d == 0.0, 1e-30, d) for d in dzs]

        def _or(xs):
            return functools.reduce(jnp.logical_or, xs)

        def _slab_any(bxl, byl, bzl, bxh, byh, bzh, bts):
            """Tile-level liveness of one box (any lane's [minT, bt]
            segment enters it)."""
            g_any = []
            for g in gset:
                t0x = (bxl - oxs[g]) * idxs[g]
                t1x = (bxh - oxs[g]) * idxs[g]
                t0y = (byl - oys[g]) * idys[g]
                t1y = (byh - oys[g]) * idys[g]
                t0z = (bzl - ozs[g]) * idzs[g]
                t1z = (bzh - ozs[g]) * idzs[g]
                tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                              jnp.minimum(t0y, t1y)),
                                  jnp.maximum(jnp.minimum(t0z, t1z),
                                              minTs[g]))
                tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.minimum(jnp.maximum(t0z, t1z),
                                               bts[g]))
                g_any.append(jnp.any(tin <= tout))
            return _or(g_any)

        def round_(carry):
            sp0, bts0, codes0, bus0, bvs0, nv, nl = carry
            valid = sp0 > 0
            spm = jnp.maximum(sp0 - 1, 0)
            ref = stack_ref[spm]
            is_cluster = valid & (ref < 0)
            is_inner = valid & (ref >= 0) & (ref != EMPTY)
            c = jnp.maximum(-ref - 1, 0)
            w = jnp.clip(ref, 0, n_wide - 1)

            # ---- inner round: test the fan child boxes together -------
            wrow = w // 2
            wbase = (w % 2) * 64

            def inner_anys():
                out = []
                for ci in range(fan):
                    a = wbase + ci * 8
                    out.append(jnp.where(
                        _slab_any(wbox_ref[wrow, a + 0],
                                  wbox_ref[wrow, a + 1],
                                  wbox_ref[wrow, a + 2],
                                  wbox_ref[wrow, a + 3],
                                  wbox_ref[wrow, a + 4],
                                  wbox_ref[wrow, a + 5], bts0),
                        jnp.int32(1), jnp.int32(0)))
                return tuple(out)

            anys = jax.lax.cond(
                is_inner, inner_anys,
                lambda: tuple(jnp.int32(0) for _ in range(fan)))

            # ---- leaf round: sub-box-gated dense tri tests ------------
            if mode == "resident_direct":
                def tconst(k, j):
                    flat = k * ROW16 + j
                    return tri_hbm[c * rows_per_cluster + flat // 128,
                                   flat % 128]
            else:
                def tconst(k, j):
                    flat = k * ROW16 + j
                    return tri_buf[flat // 128, flat % 128]

            def _read_tris(sub0):
                return [tuple(tconst(k, j) for j in range(12))
                        for k in range(sub0, min(sub0 + sub_width, max_k))]

            def _test_group(sub0, consts, g, gate, cg):
                btg, codeg, bug, bvg = cg
                oxg, oyg, ozg = oxs[g], oys[g], ozs[g]
                dxg, dyg, dzg = dxs[g], dys[g], dzs[g]
                minTg = minTs[g]
                for k, (nx, ny, nz, d0, m1x, m1y, m1z, c1,
                        m2x, m2y, m2z, c2) in enumerate(consts, sub0):
                    ro_n = oxg * nx + oyg * ny + ozg * nz
                    rd_n = dxg * nx + dyg * ny + dzg * nz
                    par = jnp.abs(rd_n) < 1e-22
                    t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                    u = (oxg * m1x + oyg * m1y + ozg * m1z - c1
                         + t * (dxg * m1x + dyg * m1y + dzg * m1z))
                    v = (oxg * m2x + oyg * m2y + ozg * m2z - c2
                         + t * (dxg * m2x + dyg * m2y + dzg * m2z))
                    hit = (~par & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                           & (t >= minTg) & (t < btg) & gate)
                    if any_hit:
                        btg = jnp.where(hit, -jnp.inf, btg)
                    else:
                        fcode = (c * max_k + k).astype(jnp.float32)
                        codeg = jnp.where(hit, fcode, codeg)
                        bug = jnp.where(hit, u, bug)
                        bvg = jnp.where(hit, v, bvg)
                        btg = jnp.where(hit, t, btg)
                return btg, codeg, bug, bvg

            n_sub = max(max_k // 16, 1)
            n_sub_w = max(max_k // sub_width, 1)
            box_base = 0 if sub_width == 16 else 2 * n_sub

            def leaf_tests(carry4):
                if mode != "resident_direct":
                    dma = pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(c * rows_per_cluster,
                                         rows_per_cluster), :],
                        tri_buf, dma_sem)
                    dma.start()
                    dma.wait()
                bts_e = carry4[0]
                # per-lane leaf liveness from the cluster AABB
                arow = c // 16
                acol = (c % 16) * 8
                bxl = clbox_ref[arow, acol + 0]
                byl = clbox_ref[arow, acol + 1]
                bzl = clbox_ref[arow, acol + 2]
                bxh = clbox_ref[arow, acol + 3]
                byh = clbox_ref[arow, acol + 4]
                bzh = clbox_ref[arow, acol + 5]
                lives = {}
                for g in gset:
                    t0x = (bxl - oxs[g]) * idxs[g]
                    t1x = (bxh - oxs[g]) * idxs[g]
                    t0y = (byl - oys[g]) * idys[g]
                    t1y = (byh - oys[g]) * idys[g]
                    t0z = (bzl - ozs[g]) * idzs[g]
                    t1z = (bzh - ozs[g]) * idzs[g]
                    tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                                  jnp.minimum(t0y, t1y)),
                                      jnp.maximum(jnp.minimum(t0z, t1z),
                                                  minTs[g]))
                    tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                                   jnp.maximum(t0y, t1y)),
                                       jnp.minimum(jnp.maximum(t0z, t1z),
                                                   bts_e[g]))
                    lv = tin <= tout
                    if any_hit:
                        lv = lv & (bts_e[g] > -jnp.inf)
                    lives[g] = lv
                if n_sub_w == 1:
                    masks = [lives]
                else:
                    masks = []
                    for s in range(n_sub_w):
                        slx = tconst(box_base + 2 * s, 13)
                        sly = tconst(box_base + 2 * s, 14)
                        slz = tconst(box_base + 2 * s, 15)
                        shx = tconst(box_base + 2 * s + 1, 13)
                        shy = tconst(box_base + 2 * s + 1, 14)
                        shz = tconst(box_base + 2 * s + 1, 15)
                        row = {}
                        for g in gset:
                            s0x = (slx - oxs[g]) * idxs[g]
                            s1x = (shx - oxs[g]) * idxs[g]
                            s0y = (sly - oys[g]) * idys[g]
                            s1y = (shy - oys[g]) * idys[g]
                            s0z = (slz - ozs[g]) * idzs[g]
                            s1z = (shz - ozs[g]) * idzs[g]
                            stin = jnp.maximum(
                                jnp.maximum(jnp.minimum(s0x, s1x),
                                            jnp.minimum(s0y, s1y)),
                                jnp.maximum(jnp.minimum(s0z, s1z),
                                            minTs[g]))
                            stout = jnp.minimum(
                                jnp.minimum(jnp.maximum(s0x, s1x),
                                            jnp.maximum(s0y, s1y)),
                                jnp.minimum(jnp.maximum(s0z, s1z),
                                            bts_e[g]))
                            row[g] = lives[g] & (stin <= stout)
                        masks.append(row)
                ganys = [{g: jnp.any(row[g]) for g in gset}
                         for row in masks]
                c4 = carry4
                for s in range(len(masks)):
                    def do_sub(c4, s=s):
                        consts = _read_tris(s * sub_width)
                        bts, codes, bus, bvs = map(list, c4)
                        for g in gset:
                            cg = (bts[g], codes[g], bus[g], bvs[g])
                            if len(gset) > 1:
                                cg = jax.lax.cond(
                                    ganys[s][g],
                                    functools.partial(_test_group,
                                                      s * sub_width,
                                                      consts, g,
                                                      masks[s][g]),
                                    lambda c_: c_, cg)
                            else:
                                cg = _test_group(s * sub_width, consts, g,
                                                 masks[s][g], cg)
                            bts[g], codes[g], bus[g], bvs[g] = cg
                        return (tuple(bts), tuple(codes), tuple(bus),
                                tuple(bvs))

                    if len(masks) == 1:
                        c4 = do_sub(c4)
                    else:
                        c4 = jax.lax.cond(
                            _or([ganys[s][g] for g in gset]), do_sub,
                            lambda c_: c_, c4)
                return c4

            bts, codes, bus, bvs = jax.lax.cond(
                is_cluster, leaf_tests, lambda cr: cr,
                (bts0, codes0, bus0, bvs0))

            # ---- push live children (preorder: child 0 ends on top) ---
            sp1 = spm
            for ci in reversed(range(fan)):
                r = wref_ref[w // 16, (w % 16) * 8 + ci]
                do = is_inner & (anys[ci] != 0) & (r != EMPTY)

                @pl.when(do)
                def _(r=r, sp1=sp1):
                    stack_ref[sp1] = r

                sp1 = sp1 + jnp.where(do, 1, 0)

            nv = nv + jnp.where(valid, 1.0, 0.0)
            nl = nl + jnp.where(is_cluster, 1.0, 0.0)
            return sp1, bts, codes, bus, bvs, nv, nl

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            for _ in range(walk_batch):
                carry = round_(carry)
            if any_hit:
                sp, bts = carry[0], carry[1]
                alive = _or([jnp.any(bts[g] > -jnp.inf) for g in gset])
                carry = (jnp.where(alive, sp, 0),) + carry[1:]
            return carry

        stack_ref[0] = jnp.int32(0)
        zg = jnp.zeros((R, 128), jnp.float32)
        init = (jnp.int32(1),
                tuple(tmax_ref[s, :] for s in gsl),
                tuple(zg - 1.0 for _ in range(n_groups)),
                tuple(zg for _ in range(n_groups)),
                tuple(zg for _ in range(n_groups)),
                jnp.float32(0.0), jnp.float32(0.0))
        out = jax.lax.while_loop(cond, body, init)
        _, bts, codes, bus, bvs, nv, nl = out
        for g, s in enumerate(gsl):
            bt_ref[s, :] = bts[g]
            code_ref[s, :] = codes[g]
            bu_ref[s, :] = bus[g]
            bv_ref[s, :] = bvs[g]
        if count_stats:
            col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            stats_ref[:] = (jnp.where(col == 0, nv, 0.0)
                            + jnp.where(col == 1, nl, 0.0))

    return kernel


@functools.lru_cache(maxsize=32)
def _build_wide_fn(n_tiles, n_wide, max_k, tile_rows, any_hit,
                   interpret, count_stats=False, mode="resident_direct",
                   walk_batch=2, sub_width=16, max_stack=96):
    kernel = _make_wide_kernel(n_wide, max_k, tile_rows, any_hit,
                               count_stats, mode, walk_batch, sub_width,
                               max_stack)
    shape = jax.ShapeDtypeStruct((n_tiles * tile_rows, 128), jnp.float32)
    ray_spec = pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [shape, shape, shape, shape]
    out_specs = [out_spec, out_spec, out_spec, out_spec]
    if count_stats:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles * 8, 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    tri_space = pl.ANY if mode == "stream" else pltpu.VMEM
    scratch = [pltpu.SMEM((max_stack,), jnp.int32)]
    if mode != "resident_direct":
        scratch += [pltpu.VMEM((max_k * ROW16 // 128, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())]
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # wide child boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),      # wide child refs
            pl.BlockSpec(memory_space=pltpu.SMEM),      # cluster boxes
            pl.BlockSpec(memory_space=tri_space),       # cluster tri table
        ] + [ray_spec] * 8,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_trace_kernel(n_nodes, max_k, tile_rows, any_hit,
                       count_stats=False, mode="stream", walk_batch=4,
                       group_gate=True, walks=1, sub_width=16,
                       probe_leaf=None):
    """One kernel instance per RAY TILE; the traversal is an in-kernel
    scalar while_loop over the cluster tree (preorder + skip links, all
    metadata in SMEM): dense slab test of the tile vs the node AABB,
    advance ``any(live) ? n+1 : skip[n]``; at a live leaf, run the K
    dense triangle tests under lax.cond.

    ``mode`` picks where the cluster tri blocks live (measured on v5e:
    the per-node HBM DMA latency, not compute, set the ~2.7 us/visit
    floor of the original always-DMA design):
      - "stream":          tris in HBM; every visit DMAs the cluster to a
                           VMEM scratch, overlapping the slab test. For
                           scenes whose packed tri table exceeds VMEM.
      - "resident_dma":    whole tri table VMEM-resident; live leaves
                           copy their block VMEM->VMEM (cheap) inside the
                           leaf branch — internal visits do no copy.
      - "resident_direct": whole table VMEM-resident; tri constants are
                           read directly with a dynamic row offset — no
                           copy at all.

    Mosaic constraints honoured (found by bisection, see the axon
    environment memory): DMA slices 128-aligned in the minor dim, no i1
    while-carries (best-hit state is f32), SMEM tables packed to full
    128-lane rows, scalar dynamic SMEM reads only."""
    shape = (tile_rows, 128)

    rows_per_cluster = max_k * ROW16 // 128

    def kernel(aabb_ref, cid_ref, skip_ref, tri_hbm,
               rox, roy, roz, rdx, rdy, rdz, tmin_ref, tmax_ref,
               bt_ref, code_ref, bu_ref, bv_ref, *rest):
        if count_stats:
            stats_ref = rest[0]
            rest = rest[1:]
        if mode == "resident_direct":
            tri_buf = dma_sem = None
        else:
            tri_buf, dma_sem = rest

        # Per-row-group (8,128) ray/hit state: ONE shared tile walk, but
        # each vreg group only pays dense tri tests for (leaf, sub-box)
        # pairs IT touches (rows=32 vs rows=8 leaf stats: ~2.2x fewer
        # lane-tri tests, without small-tiles' 4x walk overhead). State
        # never crosses groups, so the while carry holds per-group arrays
        # (dynamic_update_slice does not lower in Mosaic).
        n_groups = tile_rows // 8 if (group_gate and tile_rows > 8) else 1
        R = tile_rows // n_groups
        gsl = [pl.ds(g * R, R) for g in range(n_groups)]
        oxs = [rox[s, :] for s in gsl]
        oys = [roy[s, :] for s in gsl]
        ozs = [roz[s, :] for s in gsl]
        dxs = [rdx[s, :] for s in gsl]
        dys = [rdy[s, :] for s in gsl]
        dzs = [rdz[s, :] for s in gsl]
        minTs = [tmin_ref[s, :] for s in gsl]
        idxs = [1.0 / jnp.where(d == 0.0, 1e-30, d) for d in dxs]
        idys = [1.0 / jnp.where(d == 0.0, 1e-30, d) for d in dys]
        idzs = [1.0 / jnp.where(d == 0.0, 1e-30, d) for d in dzs]

        def _or(xs):
            return functools.reduce(jnp.logical_or, xs)

        def cond(carry):
            return _or([nn < n_nodes for nn in carry[0]])

        def step(n0, gset, state):
            """One node visit of the walk owning row groups ``gset``.
            With walks > 1 the block's groups are partitioned into
            independent walks whose serial chains (slab -> reduce ->
            scalar decide -> SMEM read) interleave in the instruction
            stream — each walk's scalar round-trip hides behind the
            others' vector work (the per-visit cost is latency-bound,
            ~3.3 us at rows=32, r3_probe_h)."""
            bts0, codes0, bus0, bvs0, nv, nl = state
            # with walk_batch > 1 a step may run past the walk's end:
            # clamp reads and no-op via ``valid``
            valid = n0 < n_nodes
            n = jnp.minimum(n0, n_nodes - 1)
            cid = cid_ref[n // 128, n % 128]
            c = jnp.maximum(cid, 0)
            if mode == "stream":
                # always-DMA (internal nodes fetch cluster max(cid,0) and
                # drop it): uniform start/wait keeps the semaphore balanced
                # and the copy overlaps the slab test below
                dma = pltpu.make_async_copy(
                    tri_hbm.at[pl.ds(c * rows_per_cluster,
                                     rows_per_cluster), :],
                    tri_buf, dma_sem)
                dma.start()

            if mode == "resident_direct":
                def tconst(k, j):
                    flat = k * ROW16 + j
                    return tri_hbm[c * rows_per_cluster + flat // 128,
                                   flat % 128]
            else:
                def tconst(k, j):
                    flat = k * ROW16 + j
                    return tri_buf[flat // 128, flat % 128]

            # dense slab test vs the node AABB over [minT, best_t]
            # (16 AABBs per 128-wide SMEM row — see ClusterData)
            arow = n // 16
            acol = (n % 16) * 8
            bxl = aabb_ref[arow, acol + 0]
            byl = aabb_ref[arow, acol + 1]
            bzl = aabb_ref[arow, acol + 2]
            bxh = aabb_ref[arow, acol + 3]
            byh = aabb_ref[arow, acol + 4]
            bzh = aabb_ref[arow, acol + 5]
            lives = {}
            for g in gset:
                t0x = (bxl - oxs[g]) * idxs[g]
                t1x = (bxh - oxs[g]) * idxs[g]
                t0y = (byl - oys[g]) * idys[g]
                t1y = (byh - oys[g]) * idys[g]
                t0z = (bzl - ozs[g]) * idzs[g]
                t1z = (bzh - ozs[g]) * idzs[g]
                tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                              jnp.minimum(t0y, t1y)),
                                  jnp.maximum(jnp.minimum(t0z, t1z),
                                              minTs[g]))
                tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.minimum(jnp.maximum(t0z, t1z),
                                               bts0[g]))
                lv = tin <= tout
                if any_hit:
                    lv = lv & (bts0[g] > -jnp.inf)
                lives[g] = lv
            any_live = _or([jnp.any(lives[g]) for g in gset]) & valid
            if mode == "stream":
                dma.wait()

            def _read_tris(sub0):
                """Hoist one sub-block's scalar constants (12 per tri) so
                the per-row-group test loop below doesn't re-read them
                once per group."""
                if probe_leaf == "noreads":
                    # perf probe: replace the 12 scalar reads per tri
                    # with literals (measures the read share of leaf
                    # cost; results are garbage)
                    return [tuple(0.1 + 0.01 * j for j in range(12))
                            for k in range(sub0,
                                           min(sub0 + sub_width, max_k))]
                return [tuple(tconst(k, j) for j in range(12))
                        for k in range(sub0, min(sub0 + sub_width, max_k))]

            def _test_group(sub0, consts, g, gate, cg):
                """Dense tri tests of row group ``g`` vs one sub-block.
                ``gate`` is the per-lane liveness used in the hit mask —
                conservative row-group culling: a triangle is contained
                in its sub-block AABB, so a lane whose [minT, entry-bt]
                ray segment misses the sub-box cannot produce a valid
                hit."""
                btg, codeg, bug, bvg = cg
                if probe_leaf == "notests":
                    # perf probe: consume the reads, skip the vector math
                    acc = 0.0
                    for row in consts:
                        for val in row:
                            acc = acc + val
                    return (btg + acc * 1e-30, codeg, bug, bvg)
                oxg, oyg, ozg = oxs[g], oys[g], ozs[g]
                dxg, dyg, dzg = dxs[g], dys[g], dzs[g]
                minTg = minTs[g]
                for k, (nx, ny, nz, d0, m1x, m1y, m1z, c1,
                        m2x, m2y, m2z, c2) in enumerate(consts, sub0):
                    ro_n = oxg * nx + oyg * ny + ozg * nz
                    rd_n = dxg * nx + dyg * ny + dzg * nz
                    par = jnp.abs(rd_n) < 1e-22
                    t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                    u = (oxg * m1x + oyg * m1y + ozg * m1z - c1
                         + t * (dxg * m1x + dyg * m1y + dzg * m1z))
                    v = (oxg * m2x + oyg * m2y + ozg * m2z - c2
                         + t * (dxg * m2x + dyg * m2y + dzg * m2z))
                    hit = (~par & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                           & (t >= minTg) & (t < btg) & gate)
                    if any_hit:
                        btg = jnp.where(hit, -jnp.inf, btg)
                    else:
                        fcode = (c * max_k + k).astype(jnp.float32)
                        codeg = jnp.where(hit, fcode, codeg)
                        bug = jnp.where(hit, u, bug)
                        bvg = jnp.where(hit, v, bvg)
                        btg = jnp.where(hit, t, btg)
                return btg, codeg, bug, bvg

            n_sub = max(max_k // 16, 1)
            n_sub_w = max(max_k // sub_width, 1)
            # sub-box rows: 16-tri boxes sit at tri rows 2s/2s+1; the
            # finer 8-tri boxes (when packed) at 2*n_sub + 2s / +1
            box_base = 0 if sub_width == 16 else 2 * n_sub
            if sub_width == 8:
                assert 2 * n_sub + 2 * (max_k // 8) <= max_k, \
                    "8-tri sub-boxes not packed for this max_k"

            def tri_tests(carry4):
                # sub_width-tri sub-blocks, each gated on its own AABB
                # (packed in the spare slots of tri rows — ClusterData)
                # PER ROW GROUP: a (leaf, sub-box) pair costs dense tests
                # only in groups whose rays touch the sub-box over their
                # [minT, entry-bt] segment. occluded (-inf) lanes fail
                # tin<=tout. All sub-box chains + reductions are issued
                # before the first cond (the reduces pipeline; entry bt —
                # conservative, the exact t < bt test still clamps).
                if mode == "resident_dma":
                    # copy only at live leaves, VMEM->VMEM (cheap)
                    dma2 = pltpu.make_async_copy(
                        tri_hbm.at[pl.ds(c * rows_per_cluster,
                                         rows_per_cluster), :],
                        tri_buf, dma_sem)
                    dma2.start()
                    dma2.wait()
                if n_sub_w == 1:
                    masks = [lives]
                else:
                    bts_e = carry4[0]
                    masks = []
                    for s in range(n_sub_w):
                        slx, sly, slz = (tconst(box_base + 2 * s, 13),
                                         tconst(box_base + 2 * s, 14),
                                         tconst(box_base + 2 * s, 15))
                        shx, shy, shz = (tconst(box_base + 2 * s + 1, 13),
                                         tconst(box_base + 2 * s + 1, 14),
                                         tconst(box_base + 2 * s + 1, 15))
                        row = {}
                        for g in gset:
                            s0x = (slx - oxs[g]) * idxs[g]
                            s1x = (shx - oxs[g]) * idxs[g]
                            s0y = (sly - oys[g]) * idys[g]
                            s1y = (shy - oys[g]) * idys[g]
                            s0z = (slz - ozs[g]) * idzs[g]
                            s1z = (shz - ozs[g]) * idzs[g]
                            stin = jnp.maximum(
                                jnp.maximum(jnp.minimum(s0x, s1x),
                                            jnp.minimum(s0y, s1y)),
                                jnp.maximum(jnp.minimum(s0z, s1z),
                                            minTs[g]))
                            stout = jnp.minimum(
                                jnp.minimum(jnp.maximum(s0x, s1x),
                                            jnp.maximum(s0y, s1y)),
                                jnp.minimum(jnp.maximum(s0z, s1z),
                                            bts_e[g]))
                            row[g] = lives[g] & (stin <= stout)
                        masks.append(row)
                ganys = [{g: jnp.any(row[g]) for g in gset}
                         for row in masks]

                for s in range(len(masks)):
                    def do_sub(c4, s=s):
                        consts = _read_tris(s * sub_width)
                        bts, codes, bus, bvs = map(list, c4)
                        for g in gset:
                            cg = (bts[g], codes[g], bus[g], bvs[g])
                            if len(gset) > 1:
                                cg = jax.lax.cond(
                                    ganys[s][g],
                                    functools.partial(_test_group,
                                                      s * sub_width,
                                                      consts, g,
                                                      masks[s][g]),
                                    lambda c_: c_, cg)
                            else:
                                cg = _test_group(s * sub_width, consts, g,
                                                 masks[s][g], cg)
                            bts[g], codes[g], bus[g], bvs[g] = cg
                        return (tuple(bts), tuple(codes), tuple(bus),
                                tuple(bvs))

                    if len(masks) == 1:
                        carry4 = do_sub(carry4)
                    else:
                        carry4 = jax.lax.cond(
                            _or([ganys[s][g] for g in gset]), do_sub,
                            lambda c_: c_, carry4)
                return carry4

            is_leaf = cid >= 0
            bts, codes, bus, bvs = jax.lax.cond(
                any_live & is_leaf, tri_tests, lambda cr: cr,
                (bts0, codes0, bus0, bvs0))

            n_next = jnp.where(
                valid, jnp.where(any_live, n + 1,
                                 skip_ref[n // 128, n % 128]), n0)
            nv = nv + jnp.where(valid, 1.0, 0.0)
            nl = nl + jnp.where(any_live & is_leaf, 1.0, 0.0)
            return n_next, (bts, codes, bus, bvs, nv, nl)

        gsets = [list(range(w * n_groups // walks,
                            (w + 1) * n_groups // walks))
                 for w in range(walks)]

        def body(carry):
            # unroll walk_batch node steps per while iteration: the
            # data-dependent while cond costs ~0.4us per ITERATION on v5e
            # (r3_probe_walkablate) regardless of body size. With
            # walks > 1 the walks' steps interleave per batch slot.
            ns = list(carry[0])
            state = carry[1:]
            for _ in range(walk_batch):
                for w in range(walks):
                    ns[w], state = step(ns[w], gsets[w], state)
            if any_hit:
                # early out once every lane of a walk is occluded
                bts = state[0]
                for w in range(walks):
                    alive = _or([jnp.any(bts[g] > -jnp.inf)
                                 for g in gsets[w]])
                    ns[w] = jnp.where(alive, ns[w], n_nodes)
            return (tuple(ns),) + state

        zg = jnp.zeros((R, 128), jnp.float32)
        init = (tuple(jnp.int32(0) for _ in range(walks)),
                tuple(tmax_ref[s, :] for s in gsl),
                tuple(zg - 1.0 for _ in range(n_groups)),
                tuple(zg for _ in range(n_groups)),
                tuple(zg for _ in range(n_groups)),
                jnp.float32(0.0), jnp.float32(0.0))
        _, bts, codes, bus, bvs, nv, nl = jax.lax.while_loop(cond, body,
                                                             init)
        for g, s in enumerate(gsl):
            bt_ref[s, :] = bts[g]
            code_ref[s, :] = codes[g]
            bu_ref[s, :] = bus[g]
            bv_ref[s, :] = bvs[g]
        if count_stats:
            col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            stats_ref[:] = (jnp.where(col == 0, nv, 0.0)
                            + jnp.where(col == 1, nl, 0.0))

    return kernel


@functools.lru_cache(maxsize=32)
def _build_trace_fn(n_tiles, n_nodes, max_k, tile_rows, any_hit,
                    interpret, count_stats=False, mode="stream",
                    walk_batch=4, group_gate=True, walks=1, sub_width=16,
                    probe_leaf=None):
    kernel = _make_trace_kernel(n_nodes, max_k, tile_rows, any_hit,
                                count_stats, mode, walk_batch, group_gate,
                                walks, sub_width, probe_leaf)
    shape = jax.ShapeDtypeStruct((n_tiles * tile_rows, 128), jnp.float32)

    ray_spec = pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [shape, shape, shape, shape]
    out_specs = [out_spec, out_spec, out_spec, out_spec]
    if count_stats:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles * 8, 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    tri_space = pl.ANY if mode == "stream" else pltpu.VMEM
    scratch = []
    if mode != "resident_direct":
        scratch = [pltpu.VMEM((max_k * ROW16 // 128, 128), jnp.float32),
                   pltpu.SemaphoreType.DMA(())]
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # node AABBs 16/row
            pl.BlockSpec(memory_space=pltpu.SMEM),      # node cid 128/row
            pl.BlockSpec(memory_space=pltpu.SMEM),      # node skip 128/row
            pl.BlockSpec(memory_space=tri_space),       # cluster tri table
        ] + [ray_spec] * 8,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=interpret,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# tracer facade
# ---------------------------------------------------------------------------

def _pack_rays(x, n_pad, fill=0.0):
    x = jnp.pad(x, (0, n_pad - x.shape[0]), constant_values=fill)
    return x.reshape(-1, 128)


def _spread3(x):
    """Insert two zero bits between the low 10 bits of x (Morton spread)."""
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton3(qx, qy, qz):
    return (_spread3(qx) << 2) | (_spread3(qy) << 1) | _spread3(qz)


def ray_sort_key(ro, rd, lo, hi, mode="origin"):
    """Coherence key for ray re-binning, interleaved Morton codes.

    mode="origin": origin-major (5 bits/axis fine grid), direction-minor
    (2 bits/axis octant). Tiles share an origin cell — the right key for
    bounce/shadow rays whose origins lie on nearby surface points; camera
    rays (identical origins) give equal origin bits and fall through to
    direction octants + the stable sort's original (raster) order.

    mode="dir": direction-major (6 bits/axis), origin-minor (4 bits/axis).
    Tiles share a direction wedge — useful when origins span the scene
    but directions align (e.g. all rays toward one distant light)."""
    ext = jnp.maximum(hi - lo, 1e-6)
    if mode == "dir":
        qd = jnp.clip(((rd + 1.0) * 32.0), 0.0, 63.0).astype(jnp.int32)
        qo = jnp.clip((ro - lo) / ext * 16.0, 0.0, 15.0).astype(jnp.int32)
        kd = _morton3(qd[:, 0], qd[:, 1], qd[:, 2])      # 18 bits
        ko = _morton3(qo[:, 0], qo[:, 1], qo[:, 2])      # 12 bits
        return (kd << 12) | ko
    qo = jnp.clip((ro - lo) / ext * 32.0, 0.0, 31.0).astype(jnp.int32)
    qd = jnp.clip(((rd + 1.0) * 2.0), 0.0, 3.0).astype(jnp.int32)
    ko = _morton3(qo[:, 0], qo[:, 1], qo[:, 2])          # 15 bits
    kd = _morton3(qd[:, 0], qd[:, 1], qd[:, 2])          # 6 bits
    return (ko << 6) | kd


class ClusterTracer:
    """Mesh tracer: Pallas cluster streaming for tris + dense XLA spheres.

    Replaces the reference's per-ray stack traversal (include/bvh.h:87-226,
    simd_hit.h:121-156) with tile-coherent dense streaming — the TPU
    analogue of its SIMD sibling-AABB packets.
    """

    # VMEM budget for keeping the whole packed tri table on-chip (v5e has
    # ~16 MB/core; leave room for ray blocks, outputs and vreg spills)
    RESIDENT_BUDGET_BYTES = 12 * 2 ** 20

    def __init__(self, scene: ir.Scene, max_k=CLUSTER_K,
                 tile_rows=None, sort_rays=True, sort_mode="origin",
                 mode="auto", builder="auto", group_gate="auto", walks=1,
                 sub_width="auto", probe_leaf=None, walk="auto",
                 wide_batch=2):
        on_cpu = jax.default_backend() == "cpu"
        tile_rows_defaulted = tile_rows is None
        if tile_rows is None:
            # CPU runs the kernel interpreted (Python per grid step):
            # smaller tiles keep tests fast; results are config-exact
            tile_rows = 32 if on_cpu else TILE_ROWS
        if tile_rows % 8 or tile_rows < 8:
            raise ValueError("tile_rows must be a positive multiple of 8")
        if group_gate == "auto":
            # per-group gating multiplies interpret-mode Python work
            # n_groups-fold for zero CPU benefit; parity between gate
            # modes is exact (test_cluster_trace group-gate test)
            group_gate = not on_cpu
        self.group_gate = group_gate
        # walks: partition each block's row groups into this many
        # INDEPENDENT tree walks whose serial chains interleave in the
        # instruction stream (latency hiding). Requires group gating and
        # an even group split.
        n_groups = tile_rows // 8 if (group_gate and tile_rows > 8) else 1
        if walks < 1 or n_groups % walks:
            raise ValueError(f"walks={walks} must evenly divide the "
                             f"{n_groups} row groups")
        self.walks = walks
        # sub_width: leaf gating granularity — 16-tri sub-boxes (default)
        # or the finer 8-tri boxes ClusterData also packs. Probe history:
        # r5_probe_d showed 8 winning, but its population was an all-sky
        # Morton corner (zero hits); the corrected r5_probe_g sweep on a
        # real frame mix has 16 slightly ahead on both populations
        # (cam 44.8 vs 45.7 ms, bounce 94.7 vs 97.6 at 131k lanes), so
        # 16 stays the default everywhere.
        # probe_leaf: perf-probe kernel variants (see _make_trace_kernel),
        # never production.
        if sub_width == "auto":
            sub_width = 16
        if sub_width == 8 and max_k % 8 == 0 and \
                2 * max(max_k // 16, 1) + 2 * (max_k // 8) > max_k:
            sub_width = 16          # 8-tri boxes not packed at this max_k
        self.sub_width = sub_width
        self.probe_leaf = probe_leaf
        self.data = ClusterData(scene, max_k, builder=builder)
        if mode == "auto":
            fits = self.data.tri_rows.nbytes <= self.RESIDENT_BUDGET_BYTES
            mode = "resident_direct" if fits else "stream"
        self.mode = mode
        self.tile_rows = tile_rows
        self.sort_rays = sort_rays
        self.sort_mode = sort_mode
        # walk="wide": pop one 8-ary node per serial round, testing its
        # child boxes together (overlapped reductions) instead of one
        # binary node per round — same hits, fewer latency-bound rounds.
        # Measured +3-4% e2e on terrain/bumpy 100k (r5_probe_l), so
        # "auto" picks wide on accelerators when the wide tables fit the
        # 1 MB SMEM budget (at ~11k clusters/500k tris the padded child-
        # box table alone is 1.09 MB and the compile fails; skip's packed
        # tables still fit there). CPU keeps skip (interpret parity
        # fixtures pin wide explicitly).
        if walk == "auto":
            walk = "wide" if (not on_cpu
                              and self.data.n_clusters <= 4096) else "skip"
        self.walk = walk
        self.wide_batch = wide_batch
        if walk == "wide" and tile_rows_defaulted and not on_cpu:
            # rows sweep for the wide walk (r5_probe_m): 32 -> 0.876,
            # 64 -> 0.932, 128 -> 0.961 Mpaths/s terrain e2e; 192/256
            # collapse (vreg spills). The wider tile amortizes each
            # serial round over 2x the lanes.
            self.tile_rows = 128
        self.bounds = (jnp.asarray(self.data.scene_lo),
                       jnp.asarray(self.data.scene_hi))
        self.tri_rows = jnp.asarray(self.data.tri_rows)
        if walk == "wide":
            wt = self.data.wide_tables()
            self.n_wide = wt["n_wide"]
            self.max_stack = wt["max_stack"]
            self.node_tables = (jnp.asarray(wt["boxes"]),
                                jnp.asarray(wt["refs"]),
                                jnp.asarray(wt["cl_boxes"]))
        else:
            self.node_tables = (jnp.asarray(self.data.node_aabbs),
                                jnp.asarray(self.data.node_cid),
                                jnp.asarray(self.data.node_skip))
        self.perm = jnp.asarray(self.data.perm)
        from vimg_tpu.geometry.soa_intersect import build_constants
        _, self.sph_c = build_constants(scene)
        if self.sph_c is not None:
            self.sph_c = np.asarray(self.sph_c)
        # whole-call jit: a standalone (non-jitted) caller would otherwise
        # pay one tunnel round trip per eager op (~50 ms floor measured)
        self._closest_jit = jax.jit(self._closest_impl,
                                    static_argnames=("sort",))
        self._occluded_jit = jax.jit(self._occluded_impl,
                                     static_argnames=("sort",))

    def _run(self, nodes, tri_rows, ro, rd, minT, maxT, any_hit,
             count_stats=False, sort=None):
        B = ro.shape[0]
        tile = self.tile_rows * 128
        n_pad = -(-B // tile) * tile
        n_tiles = n_pad // self.tile_rows // 128
        minT = jnp.broadcast_to(minT, (B,))
        maxT = jnp.broadcast_to(maxT, (B,))

        # re-bin rays into coherent tiles: the walk visits a node iff ANY
        # tile lane touches it, so tile coherence is the whole ballgame for
        # bounce rays (measured 5x on incoherent batches). perm is applied
        # with takes/scatters; per-ray results are order-independent (each
        # lane's hit state is private, culling is conservative).
        # ``sort`` overrides the instance policy per call (static under
        # jit): the wavefront's primary pre-pass feeds pixel-Morton-
        # ordered camera rays that are already tile-coherent — re-sorting
        # them costs the argsort+takes AND loses sub-pixel sample
        # adjacency (camera rays share an origin, so the Morton key
        # degenerates to direction octants).
        do_sort = (self.sort_rays if sort is None else sort) and B > tile
        if do_sort:
            key = ray_sort_key(ro, rd, *self.bounds, mode=self.sort_mode)
            # inert lanes (maxT=-inf: dead lanes, pre-passed fresh lanes,
            # no-NEE shadow slots) sort to the TAIL: the walk is
            # visit-bound, so a dead lane inside a live tile dilutes the
            # tile's live density and the per-visit cost amortizes over
            # fewer real rays; segregated, they pack into all-dead tail
            # tiles that walk straight out
            key = jnp.where(maxT == -jnp.inf, jnp.int32(2 ** 31 - 1), key)
            perm = jnp.argsort(key)
            ro = jnp.take(ro, perm, axis=0)
            rd = jnp.take(rd, perm, axis=0)
            minT = jnp.take(minT, perm)
            maxT = jnp.take(maxT, perm)

        interpret = jax.default_backend() == "cpu"
        if self.walk == "wide":
            fn = _build_wide_fn(n_tiles, self.n_wide, self.data.max_k,
                                self.tile_rows, any_hit, interpret,
                                count_stats, self.mode,
                                walk_batch=self.wide_batch,
                                sub_width=self.sub_width,
                                max_stack=self.max_stack)
        else:
            fn = _build_trace_fn(n_tiles, self.data.n_nodes,
                                 self.data.max_k,
                                 self.tile_rows, any_hit, interpret,
                                 count_stats,
                                 self.mode, group_gate=self.group_gate,
                                 walks=self.walks,
                                 sub_width=self.sub_width,
                                 probe_leaf=self.probe_leaf)
        # padding lanes get maxT=-inf: tin >= minT=0 > tout, so they never
        # keep a node live (an all-padding tail tile walks straight out)
        args = ([_pack_rays(ro[:, k], n_pad) for k in range(3)]
                + [_pack_rays(rd[:, k], n_pad) for k in range(3)]
                + [_pack_rays(minT, n_pad),
                   _pack_rays(maxT, n_pad, fill=-jnp.inf)])
        out = fn(*nodes, tri_rows, *args)
        bt, code, bu, bv = out[:4]
        flat = lambda a: a.reshape(-1)[:B]
        bt, code, bu, bv = flat(bt), flat(code), flat(bu), flat(bv)
        if do_sort:
            def unperm(x):
                return jnp.zeros_like(x).at[perm].set(x)
            bt, code, bu, bv = (unperm(bt), unperm(code),
                                unperm(bu), unperm(bv))
        if count_stats:
            st = out[4].reshape(n_tiles, 8, 128)
            return (bt, code, bu, bv), st[:, 0, :2]
        return bt, code, bu, bv

    def trace_stats(self, ro, rd, minT, maxT, any_hit=False):
        """Debug: per-tile (node visits, live leaf visits) for a batch —
        the coherence diagnostic behind tile/K/sort-key tuning."""
        _, st = self._run(self.node_tables, self.tri_rows, ro, rd, minT,
                          maxT, any_hit, count_stats=True)
        return np.asarray(st)

    def _closest_impl(self, nodes, tri_rows, perm, ro, rd, minT, maxT,
                      sort=None):
        bt, code, bu, bv = self._run(nodes, tri_rows, ro, rd, minT, maxT,
                                     any_hit=False, sort=sort)
        found = code >= 0.0
        slot = jnp.clip(code.astype(jnp.int32), 0, perm.shape[0] - 1)
        tri_id = perm[slot]               # one dense gather, per-hit only
        best_t = jnp.where(found, bt, jnp.inf)
        best_type = jnp.full(ro.shape[:1], ir.PRIM_TRI, jnp.int32)
        best_id = jnp.where(found, tri_id, 0).astype(jnp.int32)
        u = 1.0 - bu - bv
        v = bu
        hr = intersect.HitResult(t=best_t, prim_type=best_type,
                                 prim_id=best_id, u=jnp.where(found, u, 0.0),
                                 v=jnp.where(found, v, 0.0))
        if self.sph_c is not None:
            hr = self._merge_spheres(hr, ro, rd, minT, maxT)
        return hr

    def _occluded_impl(self, nodes, tri_rows, ro, rd, minT, maxT,
                       sort=None):
        bt, *_ = self._run(nodes, tri_rows, ro, rd, minT, maxT, any_hit=True,
                           sort=sort)
        occ = bt == -jnp.inf
        if self.sph_c is not None:
            from vimg_tpu.geometry.soa_intersect import _trace_impl
            occ = occ | _trace_impl(None, self.sph_c, ro, rd, minT,
                                    jnp.broadcast_to(maxT, occ.shape), True)
        return occ

    # Differentiability: traversal inputs are detached (zero-tangent
    # semantics — the framework's detached-sampling estimator already
    # stops gradients at discrete traversal, diff/grad.py docstring), so
    # reverse-mode AD never has to transpose the Pallas kernel or its
    # while_loop. Material/emission/texture gradients are bit-identical
    # to the XLA tracers' (traversal doesn't depend on those params);
    # camera/geometry gradients lose the (detached-by-design) hit-point
    # motion term that pure-XLA tracers happen to carry.
    differentiable = True
    # closest/occluded accept a static ``sort`` override — the wavefront
    # primary pre-pass feeds already-coherent batches with sort=False
    presortable = True

    def closest(self, scene, ro, rd, minT, maxT, sort=None):
        dt = jax.lax.stop_gradient
        return self._closest_jit(self.node_tables, self.tri_rows, self.perm,
                                 dt(ro), dt(rd), dt(minT), dt(maxT),
                                 sort=sort)

    def occluded(self, scene, ro, rd, minT, maxT, sort=None):
        dt = jax.lax.stop_gradient
        return self._occluded_jit(self.node_tables, self.tri_rows,
                                  dt(ro), dt(rd), dt(minT), dt(maxT),
                                  sort=sort)

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
