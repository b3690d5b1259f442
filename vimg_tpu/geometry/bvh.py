"""BVH build + TPU traversal.

Build (host): binned SAH, 16 bins, max 8 prims/leaf, SAH costs
Ci=1 / Ct=0.5 and median-split fallback — the algorithm of reference
src/bvh/bin_bvh.cpp re-expressed iteratively over numpy slices. A C++
builder (vimg_tpu/runtime) provides the same output format for large scenes;
this numpy version is the always-available fallback and the correctness
oracle.

Traversal (device): the reference walks a stack with AVX2 2-wide sibling
AABB tests (include/bvh.h:87-226, include/simd_hit.h). Per-lane stacks are
hostile to a lockstep vector unit, so we lay the tree out in DFS preorder
and thread it with skip links: every step is

    next = aabb_hit(node) ? node + 1 : skip[node]

which makes traversal a pure gather loop with uniform control flow across
the wavefront — the TPU-native replacement for divergent stacks. Leaves
test up to LEAF_SIZE primitives at once (vectorized over rays x prims).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry import intersect
from vimg_tpu.scene import ir

N_BINS = 16
LEAF_SIZE = 8
COST_INTERSECT = 1.0   # reference BVHConst::intersection_cost
COST_TRAVERSE = 0.5    # reference BVHConst::traversal_cost


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BVHArrays:
    node_min: jax.Array    # (N, 3) f32
    node_max: jax.Array    # (N, 3) f32
    node_start: jax.Array  # (N,) i32: first prim (leaf) / unused (inner)
    node_count: jax.Array  # (N,) i32: prim count; 0 == inner node
    node_skip: jax.Array   # (N,) i32: DFS skip pointer
    node_right: jax.Array  # (N,) i32: right child (inner; undefined leaf)
    prim_type: jax.Array   # (P,) i32 (PRIM_TRI / PRIM_SPHERE), build order
    prim_idx: jax.Array    # (P,) i32 index into tri/sphere tables


def scene_prim_bounds(scene: ir.Scene):
    """Per-primitive AABBs + centers for the unified prim table
    (tris then spheres)."""
    mins, maxs, centers, ptype, pidx = [], [], [], [], []
    if scene.n_tris() > 0:
        v = np.asarray(scene.verts)
        tidx = np.asarray(scene.tri_vidx)
        p = v[tidx]                       # (T, 3, 3)
        mins.append(p.min(axis=1))
        maxs.append(p.max(axis=1))
        centers.append(p.mean(axis=1))
        ptype.append(np.full(p.shape[0], ir.PRIM_TRI, np.int32))
        pidx.append(np.arange(p.shape[0], dtype=np.int32))
    if scene.n_spheres() > 0:
        c = np.asarray(scene.sph_center)
        r = np.asarray(scene.sph_radius)[:, None]
        mins.append(c - r)
        maxs.append(c + r)
        centers.append(c)
        ptype.append(np.full(c.shape[0], ir.PRIM_SPHERE, np.int32))
        pidx.append(np.arange(c.shape[0], dtype=np.int32))
    return (np.concatenate(mins), np.concatenate(maxs),
            np.concatenate(centers), np.concatenate(ptype),
            np.concatenate(pidx))


def _half_sa(bmin, bmax):
    d = np.maximum(bmax - bmin, 0.0)
    return d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2]


def build_bvh_numpy(bmin, bmax, centers):
    """Binned-SAH build. Returns dict of flat arrays in DFS preorder
    (left child = parent + 1) plus the primitive permutation."""
    P = bmin.shape[0]
    order = np.arange(P, dtype=np.int32)

    node_min, node_max = [], []
    node_start, node_count, node_right = [], [], []

    # explicit stack of (start, end, slot-of-parent-to-fix)
    def new_node():
        node_min.append(None)
        node_max.append(None)
        node_start.append(0)
        node_count.append(0)
        node_right.append(-1)
        return len(node_min) - 1

    stack = [(0, P, -1, False)]  # (start, end, parent, is_right_child)
    while stack:
        s, e, parent, is_right = stack.pop()
        idx = new_node()
        if parent >= 0 and is_right:
            node_right[parent] = idx

        sel = order[s:e]
        nb_min = bmin[sel].min(axis=0)
        nb_max = bmax[sel].max(axis=0)
        node_min[idx] = nb_min
        node_max[idx] = nb_max
        n = e - s

        do_leaf = n <= 1
        best = None
        if not do_leaf:
            cen = centers[sel]
            c_min = cen.min(axis=0)
            c_max = cen.max(axis=0)
            ext = c_max - c_min
            best_cost = np.inf
            for axis in range(3):
                if ext[axis] <= 0:
                    continue
                scale = N_BINS * (1.0 - 1e-6) / ext[axis]
                b = np.minimum(((cen[:, axis] - c_min[axis]) * scale)
                               .astype(np.int32), N_BINS - 1)
                counts = np.bincount(b, minlength=N_BINS)
                binmin = np.full((N_BINS, 3), np.inf, np.float32)
                binmax = np.full((N_BINS, 3), -np.inf, np.float32)
                for k in range(3):
                    np.minimum.at(binmin[:, k], b, bmin[sel][:, k])
                    np.maximum.at(binmax[:, k], b, bmax[sel][:, k])
                # prefix (left) sweeps
                lmin = np.minimum.accumulate(binmin, axis=0)
                lmax = np.maximum.accumulate(binmax, axis=0)
                lcount = np.cumsum(counts)
                # suffix (right) sweeps
                rmin = np.minimum.accumulate(binmin[::-1], axis=0)[::-1]
                rmax = np.maximum.accumulate(binmax[::-1], axis=0)[::-1]
                rcount = np.cumsum(counts[::-1])[::-1]
                # split after bin i: left bins [0..i], right [i+1..]
                sa_l = _half_sa(lmin[:-1], lmax[:-1])
                sa_r = _half_sa(rmin[1:], rmax[1:])
                nl = lcount[:-1].astype(np.float64)
                nr = rcount[1:].astype(np.float64)
                with np.errstate(invalid="ignore"):
                    cost = sa_l * nl + sa_r * nr
                cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
                i = int(np.argmin(cost))
                if cost[i] < best_cost:
                    best_cost = cost[i]
                    best = (axis, i, c_min[axis], scale)
            # SAH termination: split cost vs leaf cost
            # (COST_TRAVERSE + split/SA) * Ci vs n * Ci, reference form
            sa_node = max(_half_sa(nb_min, nb_max), 1e-12)
            if best is not None:
                split_cost = COST_TRAVERSE + COST_INTERSECT * best_cost / sa_node
                if split_cost >= COST_INTERSECT * n and n <= LEAF_SIZE:
                    do_leaf = True
            else:
                # degenerate centroid bounds: leaf if small, median otherwise
                if n <= LEAF_SIZE:
                    do_leaf = True
                else:
                    best = ("median", 0, 0.0, 0.0)

        if do_leaf:
            node_start[idx] = s
            node_count[idx] = n
            continue

        if best[0] == "median":
            axis = int(np.argmax(bmax[sel].max(0) - bmin[sel].min(0)))
            key = centers[sel][:, axis]
            part = np.argsort(key, kind="stable")
            mid = n // 2
            order[s:e] = sel[part]
        else:
            axis, i, c0, scale = best
            b = np.minimum(((centers[sel][:, axis] - c0) * scale)
                           .astype(np.int32), N_BINS - 1)
            left_mask = b <= i
            mid = int(left_mask.sum())
            if mid == 0 or mid == n:
                part = np.argsort(centers[sel][:, axis], kind="stable")
                order[s:e] = sel[part]
                mid = n // 2
            else:
                order[s:e] = np.concatenate([sel[left_mask], sel[~left_mask]])

        # push right first so left is processed (appended) immediately after
        node_start[idx] = 0
        node_count[idx] = 0
        stack.append((s + mid, e, idx, True))
        stack.append((s, s + mid, idx, False))

    N = len(node_min)
    node_min = np.stack(node_min).astype(np.float32)
    node_max = np.stack(node_max).astype(np.float32)
    node_start = np.asarray(node_start, np.int32)
    node_count = np.asarray(node_count, np.int32)
    node_right = np.asarray(node_right, np.int32)

    # skip links: preorder DFS; skip(root) = N, skip(left) = right sibling,
    # skip(right) = skip(parent)
    node_skip = np.full(N, N, np.int32)
    stack2 = [(0, N)]
    while stack2:
        i, skip = stack2.pop()
        node_skip[i] = skip
        if node_count[i] == 0:  # inner
            r = node_right[i]
            stack2.append((i + 1, r))
            stack2.append((r, skip))
    return dict(node_min=node_min, node_max=node_max, node_start=node_start,
                node_count=node_count, node_skip=node_skip, order=order,
                node_right=node_right)


def _bvh_levels(node_count, node_right):
    """Depth of every node (preorder walk) -> list of per-level index
    arrays, deepest first — the schedule for the on-device refit."""
    N = node_count.shape[0]
    depth = np.zeros(N, np.int32)
    stack = [(0, 0)]
    while stack:
        i, d = stack.pop()
        depth[i] = d
        if node_count[i] == 0:
            stack.append((i + 1, d + 1))
            stack.append((node_right[i], d + 1))
    levels = []
    for d in range(depth.max(), -1, -1):
        idx = np.nonzero(depth == d)[0].astype(np.int32)
        if idx.size:
            levels.append(idx)
    return levels


def build_scene_bvh(scene: ir.Scene, builder="auto") -> BVHArrays:
    """builder: auto | native | sweep | device | numpy. 'sweep' is the
    reference's -b 1 exact sweep-SAH (native); 'device' runs the same
    sweep-SAH on the accelerator (geometry/device_build.py); others use
    binned SAH."""
    bmin, bmax, centers, ptype, pidx = scene_prim_bounds(scene)
    built = None
    if builder == "device":
        from vimg_tpu.geometry.device_build import build_sweep_sah_device
        built = build_sweep_sah_device(bmin, bmax, centers)
    if built is None and builder in ("auto", "native", "sweep"):
        try:
            from vimg_tpu.runtime.native import build_bvh_native
            built = build_bvh_native(bmin, bmax, centers,
                                     mode=1 if builder == "sweep" else 0)
        except Exception:
            if builder in ("native", "sweep"):
                raise
    if built is None:
        built = build_bvh_numpy(bmin, bmax, centers)
    order = built["order"]
    if "node_right" in built:
        node_right = built["node_right"]
    else:
        # preorder invariant: left child = i+1, and skip(left) = right
        count = built["node_count"]
        skip = built["node_skip"]
        N = count.shape[0]
        node_right = np.full(N, -1, np.int32)
        inner = np.nonzero(count == 0)[0]
        node_right[inner] = skip[np.minimum(inner + 1, N - 1)]
    return BVHArrays(
        node_min=jnp.asarray(built["node_min"]),
        node_max=jnp.asarray(built["node_max"]),
        node_start=jnp.asarray(built["node_start"]),
        node_count=jnp.asarray(built["node_count"]),
        node_skip=jnp.asarray(built["node_skip"]),
        node_right=jnp.asarray(node_right, dtype=jnp.int32),
        prim_type=jnp.asarray(ptype[order]),
        prim_idx=jnp.asarray(pidx[order]))


# ---------------------------------------------------------------------------
# traversal
# ---------------------------------------------------------------------------

def _leaf_test(scene, bvh: BVHArrays, start, count, ro, rd, minT, maxT,
               any_hit=False):
    """Test up to LEAF_SIZE prims of each ray's current leaf.

    Returns (t (B, LEAF_SIZE), ptype, pidx, u, v) with +inf where missed.
    """
    B = ro.shape[0]
    lanes = jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]      # (1, K)
    slot = jnp.clip(start[:, None] + lanes, 0,
                    bvh.prim_type.shape[0] - 1)                  # (B, K)
    valid = lanes < count[:, None]
    ptype = bvh.prim_type[slot]
    pidx = bvh.prim_idx[slot]

    t = jnp.full((B, LEAF_SIZE), jnp.inf)
    u = jnp.zeros((B, LEAF_SIZE))
    v = jnp.zeros((B, LEAF_SIZE))

    if scene.n_tris() > 0:
        tid = jnp.clip(pidx, 0, scene.n_tris() - 1)
        vidx = scene.tri_vidx[tid]                               # (B, K, 3)
        p0 = scene.verts[vidx[..., 0]]
        p1 = scene.verts[vidx[..., 1]]
        p2 = scene.verts[vidx[..., 2]]
        tt, tu, tv, tw, ok = intersect.tri_intersect(
            ro[:, None, :], rd[:, None, :], p0, p1, p2,
            minT[:, None], maxT[:, None])
        m = (ptype == ir.PRIM_TRI) & valid & ok
        t = jnp.where(m, tt, t)
        u = jnp.where(m, tu, u)
        v = jnp.where(m, tv, v)

    if scene.n_spheres() > 0:
        sid = jnp.clip(pidx, 0, scene.n_spheres() - 1)
        st, ok = intersect.sphere_intersect(
            ro[:, None, :], rd[:, None, :], scene.sph_center[sid],
            scene.sph_radius[sid], minT[:, None], maxT[:, None])
        m = (ptype == ir.PRIM_SPHERE) & valid & ok
        t = jnp.where(m, st, t)

    return t, ptype, pidx, u, v


def _aabb_hit(node_min, node_max, ro, inv_rd, minT, maxT):
    t_lo = (node_min - ro) * inv_rd
    t_hi = (node_max - ro) * inv_rd
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)
    t0 = jnp.maximum(jnp.max(t_near, axis=-1), minT)
    t1 = jnp.minimum(jnp.min(t_far, axis=-1), maxT)
    return t0 <= t1


def bvh_traverse(scene, bvh: BVHArrays, ro, rd, minT, maxT, any_hit=False,
                 count_cost=False):
    """Threaded (skip-link) traversal over the whole wavefront.

    Returns HitResult (closest), a bool occlusion mask (any_hit), or
    (HitResult, cost) with the reference's heatmap cost model
    (0.5/node visit, 1.0/prim test — bvh.h:17-20) when count_cost.
    """
    B = ro.shape[0]
    N = bvh.node_min.shape[0]
    inv_rd = 1.0 / jnp.where(rd == 0.0, 1e-20, rd)

    state = dict(
        cur=jnp.zeros((B,), jnp.int32),
        best_t=maxT,
        ptype=jnp.zeros((B,), jnp.int32),
        pidx=jnp.full((B,), -1, jnp.int32),
        u=jnp.zeros((B,)),
        v=jnp.zeros((B,)),
    )
    if any_hit:
        state["occluded"] = jnp.zeros((B,), bool)
    if count_cost:
        state["cost"] = minT * 0.0

    def cond(s):
        return jnp.any(s["cur"] < N)

    def body(s):
        cur = jnp.clip(s["cur"], 0, N - 1)
        active = s["cur"] < N
        nmin = bvh.node_min[cur]
        nmax = bvh.node_max[cur]
        count = bvh.node_count[cur]
        start = bvh.node_start[cur]
        skip = bvh.node_skip[cur]

        hit_box = _aabb_hit(nmin, nmax, ro, inv_rd, minT, s["best_t"]) & active
        is_leaf = count > 0
        do_leaf = hit_box & is_leaf

        t, ptype, pidx, u, v = _leaf_test(
            scene, bvh, start, jnp.where(do_leaf, count, 0), ro, rd, minT,
            s["best_t"])
        tmin = jnp.min(t, axis=1)
        lane = jnp.argmin(t, axis=1).astype(jnp.int32)
        onehot = (jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
                  == lane[:, None])
        better = do_leaf & (tmin < s["best_t"])

        def take_f(a):
            return jnp.sum(jnp.where(onehot, a, 0.0), axis=1)

        def take_i(a):
            return jnp.sum(jnp.where(onehot, a, 0), axis=1).astype(jnp.int32)

        best_t = jnp.where(better, tmin, s["best_t"])
        new = dict(
            best_t=best_t,
            ptype=jnp.where(better, take_i(ptype), s["ptype"]),
            pidx=jnp.where(better, take_i(pidx), s["pidx"]),
            u=jnp.where(better, take_f(u), s["u"]),
            v=jnp.where(better, take_f(v), s["v"]),
        )

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, cur + 1, skip)
        if any_hit:
            occ = s["occluded"] | (better & jnp.isfinite(tmin))
            nxt = jnp.where(occ, N, nxt)   # early exit for shadow rays
            new["occluded"] = occ
        if count_cost:
            new["cost"] = (s["cost"]
                           + jnp.where(active, COST_TRAVERSE, 0.0)
                           + jnp.where(do_leaf,
                                       COST_INTERSECT * count.astype(jnp.float32),
                                       0.0))
        new["cur"] = jnp.where(active, nxt, s["cur"])
        return new

    state = jax.lax.while_loop(cond, body, state)

    if any_hit:
        return state["occluded"]
    found = state["pidx"] >= 0
    hr = intersect.HitResult(
        t=jnp.where(found, state["best_t"], jnp.inf),
        prim_type=state["ptype"],
        prim_id=jnp.where(found, state["pidx"], 0),
        u=state["u"], v=state["v"])
    if count_cost:
        return hr, state["cost"]
    return hr


def refit_bvh(scene: ir.Scene, bvh: BVHArrays, levels) -> BVHArrays:
    """On-device BVH refit: recompute every AABB bottom-up for the current
    vertex/sphere positions, keeping topology (north-star item — enables
    differentiable/animated geometry without host rebuilds).

    ``levels``: per-depth node index arrays, deepest first (host-static,
    from ``_bvh_levels``). Jittable; cost is a few gathers/scatters per
    tree level.
    """
    # per-prim AABBs in build (prim_order) order
    P = bvh.prim_type.shape[0]
    pmin = jnp.full((P, 3), jnp.inf)
    pmax = jnp.full((P, 3), -jnp.inf)
    if scene.n_tris() > 0:
        tid = jnp.clip(bvh.prim_idx, 0, scene.n_tris() - 1)
        tri = scene.verts[scene.tri_vidx[tid]]          # (P, 3, 3)
        is_tri = (bvh.prim_type == ir.PRIM_TRI)[:, None]
        pmin = jnp.where(is_tri, tri.min(axis=1), pmin)
        pmax = jnp.where(is_tri, tri.max(axis=1), pmax)
    if scene.n_spheres() > 0:
        sid = jnp.clip(bvh.prim_idx, 0, scene.n_spheres() - 1)
        c = scene.sph_center[sid]
        r = scene.sph_radius[sid][:, None]
        is_sph = (bvh.prim_type == ir.PRIM_SPHERE)[:, None]
        pmin = jnp.where(is_sph, c - r, pmin)
        pmax = jnp.where(is_sph, c + r, pmax)

    node_min = bvh.node_min
    node_max = bvh.node_max
    lanes = jnp.arange(LEAF_SIZE, dtype=jnp.int32)[None, :]
    for idx in levels:
        idx = jnp.asarray(idx)
        count = bvh.node_count[idx]
        start = bvh.node_start[idx]
        is_leaf = count > 0
        # leaf: masked min/max over its <=LEAF_SIZE prims
        slot = jnp.clip(start[:, None] + lanes, 0, P - 1)
        valid = (lanes < count[:, None])[..., None]
        leaf_min = jnp.where(valid, pmin[slot], jnp.inf).min(axis=1)
        leaf_max = jnp.where(valid, pmax[slot], -jnp.inf).max(axis=1)
        # inner: combine children (deeper levels already updated)
        left = jnp.clip(idx + 1, 0, node_min.shape[0] - 1)
        right = jnp.clip(bvh.node_right[idx], 0, node_min.shape[0] - 1)
        in_min = jnp.minimum(node_min[left], node_min[right])
        in_max = jnp.maximum(node_max[left], node_max[right])
        new_min = jnp.where(is_leaf[:, None], leaf_min, in_min)
        new_max = jnp.where(is_leaf[:, None], leaf_max, in_max)
        node_min = node_min.at[idx].set(new_min)
        node_max = node_max.at[idx].set(new_max)
    return dataclasses.replace(bvh, node_min=node_min, node_max=node_max)


class BVHTracer:
    def __init__(self, scene: ir.Scene, builder="auto"):
        self.bvh = build_scene_bvh(scene, builder=builder)
        nc = np.asarray(self.bvh.node_count)
        nr = np.asarray(self.bvh.node_right)
        self.levels = _bvh_levels(nc, nr)

    def refit(self, scene):
        """Update AABBs for moved geometry (topology preserved)."""
        self.bvh = refit_bvh(scene, self.bvh, self.levels)
        return self

    def closest(self, scene, ro, rd, minT, maxT):
        return bvh_traverse(scene, self.bvh, ro, rd, minT, maxT)

    def occluded(self, scene, ro, rd, minT, maxT):
        return bvh_traverse(scene, self.bvh, ro, rd, minT, maxT, any_hit=True)
