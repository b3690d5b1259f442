"""On-device sweep-SAH BVH build: sorts + segmented scans, no recursion.

The reference's sweep builder (src/bvh/sweep_bvh.cpp:218-292, mirrored by
runtime/bvh_builder.cpp mode=1) recurses node-by-node: sort the node's
prims per axis, prefix/suffix-sweep SAH costs, split at the argmin. That
shape is hostile to XLA; the TPU-native formulation is LEVEL-SYNCHRONOUS:
every tree level processes ALL active segments at once with

  - one 2-key `lax.sort` per axis (segment id, centroid) — prims of a
    segment stay contiguous,
  - segmented prefix/suffix min/max scans (`lax.associative_scan` with
    reset flags) for the left/right bound sweeps,
  - `segment_min` reductions for the per-segment argmin over (axis, pos),
  - one final sort to apply each segment's winning-axis order globally.

The SAH cost model (half-area * count sweeps, cost 1/0.5, leaf size 8,
split-vs-leaf rule) replicates the native sweep exactly, including its
tie-breaking (axis ascending, then position ascending). The device loop
emits per-level segment tables; the O(nodes) pointer-chasing assembly into
the flat preorder/skip-link BVHArrays layout stays on host (numpy), where
it belongs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

COST_INTERSECT = 1.0   # reference BVHConst::intersection_cost
COST_TRAVERSE = 0.5    # reference BVHConst::traversal_cost
LEAF_SIZE = 8


# ---------------------------------------------------------------------------
# segmented scans
# ---------------------------------------------------------------------------

def _seg_combine(a, b):
    """Segmented-scan monoid: (flag, *values); a right element flagged as a
    segment start resets the accumulation."""
    fa, mins_a, maxs_a = a
    fb, mins_b, maxs_b = b
    keep = ~fb
    return (fa | fb,
            jnp.where(keep, jnp.minimum(mins_a, mins_b), mins_b),
            jnp.where(keep, jnp.maximum(maxs_a, maxs_b), maxs_b))


def _seg_scan_bounds(starts, bmin, bmax, reverse=False):
    """Running (min, max) within each segment; ``starts`` marks segment
    starts in scan direction. bmin/bmax: (P, 3)."""
    if reverse:
        starts = starts[::-1]
        bmin = bmin[::-1]
        bmax = bmax[::-1]
    f = jnp.broadcast_to(starts[:, None], bmin.shape)
    _, lo, hi = jax.lax.associative_scan(_seg_combine, (f, bmin, bmax))
    if reverse:
        lo = lo[::-1]
        hi = hi[::-1]
    return lo, hi


def _seg_imax_scan(starts, vals, reverse=False):
    """Segmented running max of an i32 array (for seg_end computation)."""
    if reverse:
        starts = starts[::-1]
        vals = vals[::-1]

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))

    _, out = jax.lax.associative_scan(comb, (starts, vals))
    if reverse:
        out = out[::-1]
    return out


def _half_sa(lo, hi):
    d = jnp.maximum(hi - lo, 0.0)
    return d[:, 0] * d[:, 1] + d[:, 0] * d[:, 2] + d[:, 1] * d[:, 2]


# ---------------------------------------------------------------------------
# one level
# ---------------------------------------------------------------------------

def _level(bmin, bmax, cen, order, seg_start, done):
    """Advance every active segment one split. Returns updated
    (order, seg_start, done)."""
    P = order.shape[0]
    pos = jnp.arange(P, dtype=jnp.int32)

    INF = jnp.float32(jnp.inf)
    best_cost = jnp.full((P,), INF)          # per segment-start slot
    best_axis = jnp.full((P,), -1, jnp.int32)
    best_j = jnp.full((P,), -1, jnp.int32)
    axis_pos = []

    for axis in range(3):
        cent_key = cen[order, axis]
        # 2-key sort: (segment, centroid); done segments sort too (no-op)
        seg_s, _, order_a = jax.lax.sort(
            (seg_start, cent_key, order), num_keys=2, is_stable=True)
        # NB: native uses std::sort (unstable) — stable sort is a valid
        # refinement (deterministic tie order by original index)
        starts = jnp.concatenate([jnp.ones((1,), bool),
                                  seg_s[1:] != seg_s[:-1]])
        lo_l, hi_l = _seg_scan_bounds(starts, bmin[order_a], bmax[order_a])
        ends = jnp.concatenate([starts[1:], jnp.ones((1,), bool)])
        lo_r, hi_r = _seg_scan_bounds(ends, bmin[order_a], bmax[order_a],
                                      reverse=True)
        seg_end = _seg_imax_scan(ends, pos + 1, reverse=True)
        nl = pos - seg_s + 1                 # left count at split-after-pos
        nr = seg_end - pos - 1
        # cost of splitting after this position (left = [seg_s, pos])
        sa_l = _half_sa(lo_l, hi_l)
        # right bounds must start at pos+1: shift the suffix scan by one
        sa_r = _half_sa(jnp.roll(lo_r, -1, axis=0),
                        jnp.roll(hi_r, -1, axis=0))
        cost = sa_l * nl.astype(jnp.float32) + sa_r * nr.astype(jnp.float32)
        cost = jnp.where(nr > 0, cost, INF)

        seg_min = jax.ops.segment_min(cost, seg_s, num_segments=P,
                                      indices_are_sorted=True)
        cmin = seg_min[seg_s]
        # first position achieving the min (native scans i ascending)
        j_here = jnp.where(cost == cmin, nl, P + 1)
        seg_jmin = jax.ops.segment_min(j_here, seg_s, num_segments=P,
                                       indices_are_sorted=True)
        # native scans axes ascending with strict '<': earlier axis wins ties
        improved = seg_min < best_cost
        best_j = jnp.where(improved, seg_jmin, best_j)
        best_axis = jnp.where(improved, axis, best_axis)
        best_cost = jnp.where(improved, seg_min, best_cost)

        # position of each prim in this axis's sorted order
        pa = jnp.zeros((P,), jnp.int32).at[order_a].set(pos)
        axis_pos.append(pa)

    # per-segment leaf rule (indexed by segment start slot)
    seg_s_now = seg_start
    starts_now = jnp.concatenate([jnp.ones((1,), bool),
                                  seg_s_now[1:] != seg_s_now[:-1]])
    ends_now = jnp.concatenate([starts_now[1:], jnp.ones((1,), bool)])
    seg_end_now = _seg_imax_scan(ends_now, pos + 1, reverse=True)
    n_here = seg_end_now - seg_s_now         # per position: segment size
    lo_n, hi_n = _seg_scan_bounds(ends_now, bmin[order], bmax[order],
                                  reverse=True)
    # full-segment bounds live at the START position of each segment
    sa_node = jnp.maximum(_half_sa(lo_n, hi_n), 1e-12)

    cmin_here = best_cost[seg_s_now]
    split_cost = COST_TRAVERSE + COST_INTERSECT * cmin_here / sa_node[seg_s_now]
    leaf_small = n_here <= 1
    no_split = ~jnp.isfinite(cmin_here)
    sah_leaf = (split_cost >= COST_INTERSECT * n_here.astype(jnp.float32)) \
        & (n_here <= LEAF_SIZE)
    new_done = done | leaf_small | (no_split & (n_here <= LEAF_SIZE)) \
        | (~no_split & sah_leaf)
    # segments with no finite split and n > LEAF_SIZE: median fallback on
    # the longest axis — native does the same; use axis 0 order middle
    force_median = ~new_done & no_split
    med_axis = jnp.int32(0)

    axis_sel = jnp.where(force_median, med_axis, best_axis[seg_s_now])
    j_split = jnp.where(force_median, n_here // 2, best_j[seg_s_now])

    # ---- apply: resort split segments on their winning axis ------------
    ap = jnp.stack(axis_pos, axis=0)         # (3, P) prim -> axis position
    axis_of_prim = axis_sel                  # per-position (segment const)
    key = jnp.where(new_done, pos,
                    jnp.where(axis_of_prim == 0, ap[0][order],
                              jnp.where(axis_of_prim == 1, ap[1][order],
                                        ap[2][order])))
    # done segments keep current order (key = current pos; stable)
    _, order_new, segs_new, done_new, j_new = jax.lax.sort(
        (key, order, seg_s_now, new_done, j_split), num_keys=1,
        is_stable=True)

    # new segment assignment: left keeps start, right starts at start + j
    pos_in_seg = pos - segs_new
    go_right = (~done_new) & (pos_in_seg >= j_new)
    seg_start_new = jnp.where(go_right, segs_new + j_new, segs_new)
    return order_new, seg_start_new, done_new


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_levels",))
def _build_levels(bmin, bmax, cen, max_levels):
    P = bmin.shape[0]
    order = jnp.arange(P, dtype=jnp.int32)
    seg_start = jnp.zeros((P,), jnp.int32)
    done = jnp.zeros((P,), bool)

    def step(carry, _):
        order, seg_start, done = carry
        order, seg_start, done = _level(bmin, bmax, cen, order, seg_start,
                                        done)
        return (order, seg_start, done), seg_start

    (order, seg_start, done), seg_hist = jax.lax.scan(
        step, (order, seg_start, done), None, length=max_levels)
    return order, seg_hist, done


def build_sweep_sah_device(bmin, bmax, centers, max_levels=None):
    """Sweep-SAH build with the heavy lifting (sorts/sweeps) on device.
    Returns the same dict as bvh.build_bvh_numpy."""
    P = bmin.shape[0]
    if max_levels is None:
        max_levels = max(2 * int(np.ceil(np.log2(max(P, 2)))) + 8, 12)
    order, seg_hist, done = _build_levels(
        jnp.asarray(bmin, jnp.float32), jnp.asarray(bmax, jnp.float32),
        jnp.asarray(centers, jnp.float32), max_levels)
    order = np.asarray(order)
    seg_hist = np.asarray(seg_hist)          # (L, P) segment starts
    if not bool(np.asarray(done).all()):
        raise RuntimeError("device BVH build did not converge; raise "
                           "max_levels")

    bmin = np.asarray(bmin)
    bmax = np.asarray(bmax)

    # host assembly (O(nodes) pointer chasing): recover the binary tree
    # from the per-level segment tables
    node_min, node_max = [], []
    node_start, node_count, node_right = [], [], []

    def new_node(s, e):
        sel = order[s:e]
        node_min.append(bmin[sel].min(axis=0))
        node_max.append(bmax[sel].max(axis=0))
        node_start.append(0)
        node_count.append(0)
        node_right.append(-1)
        return len(node_min) - 1

    L = seg_hist.shape[0]
    stack = [(0, P, 0, -1, False)]           # (s, e, level, parent, right?)
    while stack:
        s, e, lev, parent, is_right = stack.pop()
        idx = new_node(s, e)
        if parent >= 0 and is_right:
            node_right[parent] = idx
        # find the first level where this range splits
        mid = None
        for l in range(lev, L):
            seg = seg_hist[l, s:e]
            nz = np.nonzero(seg != s)[0]
            if nz.size:
                mid = int(nz[0])
                lev_next = l + 1
                break
        if mid is None or e - s <= 1:
            node_start[idx] = s
            node_count[idx] = e - s
            continue
        stack.append((s + mid, e, lev_next, idx, True))
        stack.append((s, s + mid, lev_next, idx, False))

    N = len(node_min)
    node_count_arr = np.asarray(node_count, np.int32)
    node_right_arr = np.asarray(node_right, np.int32)
    node_skip = np.full(N, N, np.int32)
    st = [(0, N)]
    while st:
        i, skip = st.pop()
        node_skip[i] = skip
        if node_count_arr[i] == 0:
            r = node_right_arr[i]
            st.append((i + 1, r))
            st.append((r, skip))
    return dict(node_min=np.stack(node_min).astype(np.float32),
                node_max=np.stack(node_max).astype(np.float32),
                node_start=np.asarray(node_start, np.int32),
                node_count=node_count_arr,
                node_skip=node_skip, order=order.astype(np.int32),
                node_right=node_right_arr)
