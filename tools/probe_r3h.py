"""Round-3 TPU probe batch 12: WHERE does cluster-trace time go in e2e?

Standalone ClusterTracer.closest/occluded on three realistic ray
populations (camera primaries / cosine bounce rays off real hits /
NEE shadow rays) at wavefront batch size, with count_stats: per-tile
node visits + live-leaf visits => union breadth, per-visit cost, and
whether per-group gating fires. Sweep gate x K {64,128} x tile_rows.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)
    with open("/root/repo/bench_records/r3_probe_h.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_populations(scene, B):
    """Primary, bounce, shadow ray batches representative of wavefront
    supersteps (no RNG parity needed — distribution shape only)."""
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.integrators import _primary_rays
    from vimg_tpu.scene import ir

    st = ir.RenderSettings(width=512, height=256, spp=8, max_depth=8,
                           integrator="mis")
    rs = np.random.RandomState(7)
    pix = jnp.asarray(rs.randint(0, 512 * 256, B), jnp.int32)
    samp = jnp.asarray(rs.randint(0, 8, B), jnp.int32)
    ro, rd, _, _ = _primary_rays(scene, st, pix, samp)
    minT = jnp.full((B,), 1e-3)
    inf = jnp.full((B,), jnp.inf)

    tr = ClusterTracer(scene)
    hr = tr.closest(scene, ro, rd, minT, inf)
    t = jnp.where(jnp.isfinite(hr.t), hr.t, 1.0)
    p = ro + rd * t[:, None]
    # cosine-ish bounce directions about +y-ish surface normal proxy:
    # use random unit dirs flipped to the upper hemisphere of -rd
    d = jnp.asarray(rs.randn(B, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    flip = jnp.sum(d * rd, axis=1) > 0
    d = jnp.where(flip[:, None], -d, d)
    bounce = (p + d * 1e-3, d)
    # shadow rays toward a fixed light point
    lp = jnp.asarray(scene.verts.mean(0) + np.array([0, 6, 0]),
                     jnp.float32)
    wi = lp[None, :] - p
    dist = jnp.linalg.norm(wi, axis=1, keepdims=True)
    shadow = (p + wi / dist * 1e-3, wi / dist, dist[:, 0] - 1e-2)
    return (ro, rd), bounce, shadow, minT, inf


def bench_pop(scene, pop_name, ro, rd, minT, maxT, any_hit, **kw):
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    tr = ClusterTracer(scene, **kw)
    f = tr.occluded if any_hit else tr.closest
    out = f(scene, ro, rd, minT, maxT)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = f(scene, ro, rd, minT, maxT)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    st = tr.trace_stats(ro, rd, minT, maxT, any_hit=any_hit)
    nv, nl = float(st[:, 0].sum()), float(st[:, 1].sum())
    B = ro.shape[0]
    n_nodes = tr.data.n_nodes
    n_tiles = st.shape[0]
    log(pop=pop_name, any_hit=any_hit, secs=round(dt, 4),
        us_per_lane=round(dt / B * 1e6, 4),
        nvisit=nv, nleaf=nl, n_nodes=n_nodes, n_tiles=n_tiles,
        union_frac=round(nv / (n_tiles * n_nodes), 4),
        us_per_visit=round(dt / max(nv, 1) * 1e6, 3), **kw)


def main():
    from vimg_tpu.scene.synthetic import terrain_scene

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    B = 1 << 17
    (pro, prd), (bro, brd), (sro, srd, sdist), minT, inf = \
        make_populations(scene, B)

    for kw in (dict(group_gate=True), dict(group_gate=False),
               dict(group_gate=True, max_k=128),
               dict(group_gate=True, tile_rows=64),
               dict(group_gate=True, max_k=128, tile_rows=64),
               dict(group_gate=True, tile_rows=128),
               dict(group_gate=True, max_k=128, tile_rows=128),
               dict(group_gate=True, tile_rows=256)):
        for name, ro, rd, mx, ah in (
                ("primary", pro, prd, inf, False),
                ("bounce", bro, brd, inf, False),
                ("shadow", sro, srd, sdist, True)):
            try:
                bench_pop(scene, name, ro, rd, minT, mx, ah, **kw)
            except Exception as e:  # noqa: BLE001
                log(pop=name, err=type(e).__name__ + ": " + str(e)[:250],
                    **kw)


if __name__ == "__main__":
    main()
