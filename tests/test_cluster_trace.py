"""ClusterTracer (Pallas treelet streaming) vs brute force — CPU interpret.

The TPU mesh path must agree with the dense reference intersector on
closest-hit (t, prim id, barycentrics) and any-hit; mixed tri+sphere
scenes exercise the sphere merge.
"""
import jax
import numpy as np
import pytest

from vimg_tpu.core.math import look_at
from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.geometry.intersect import (intersect_bruteforce,
                                         occlude_bruteforce)
from vimg_tpu.render.camera import Camera
from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder

import jax.numpy as jnp


def _soup_scene(T=1500, spheres=2, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.rand(T, 3).astype(np.float32)
    verts = (c[:, None, :]
             + 0.05 * rs.randn(T, 3, 3).astype(np.float32)).reshape(-1, 3)
    idx = np.arange(T * 3).reshape(T, 3)
    b = SceneBuilder()
    m = b.add_material(ir.MAT_LAMBERTIAN, base=(0.5, 0.5, 0.5))
    b.add_mesh(verts, idx, m)
    for k in range(spheres):
        b.add_sphere(rs.rand(3) * 1.2, 0.08 + 0.05 * rs.rand(), m)
    cam = Camera.make(look_at([0.5, 0.5, 3], [0.5, 0.5, 0.5], [0, 1, 0]),
                      8, 8, 45.0)
    return b.build(camera=cam)


def _rays(B=2048, seed=3):
    rs = np.random.RandomState(seed)
    ro = jnp.asarray(rs.rand(B, 3).astype(np.float32) * 2.0 - 0.5)
    rd = rs.randn(B, 3).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
    return ro, rd, jnp.full((B,), 1e-4), jnp.full((B,), jnp.inf)


class TestClusterTracer:
    def test_closest_matches_bruteforce(self):
        scene = _soup_scene()
        ct = ClusterTracer(scene)
        assert ct.data.n_clusters > 4
        ro, rd, minT, maxT = _rays()
        hc = ct.closest(scene, ro, rd, minT, maxT)
        hb = intersect_bruteforce(scene, ro, rd, minT, maxT)
        hit_c = np.asarray(hc.hit)
        hit_b = np.asarray(hb.hit)
        assert (hit_c == hit_b).mean() > 0.999
        both = hit_c & hit_b
        dt = np.abs(np.asarray(hc.t) - np.asarray(hb.t))[both]
        assert dt.max() < 1e-4
        same_prim = ((np.asarray(hc.prim_id) == np.asarray(hb.prim_id))
                     & (np.asarray(hc.prim_type) == np.asarray(hb.prim_type)))
        assert same_prim[both].mean() > 0.999
        # barycentrics only matter for tris (sphere hit_info ignores u/v,
        # and the soa/brute conventions differ there)
        tri_hit = both & (np.asarray(hb.prim_type) == ir.PRIM_TRI)
        du = np.abs(np.asarray(hc.u) - np.asarray(hb.u))[tri_hit]
        assert du.max() < 1e-3

    def test_occluded_matches_bruteforce(self):
        scene = _soup_scene()
        ct = ClusterTracer(scene)
        ro, rd, minT, _ = _rays(seed=7)
        maxT = jnp.full((ro.shape[0],), 0.6)
        oc = np.asarray(ct.occluded(scene, ro, rd, minT, maxT))
        ob = np.asarray(occlude_bruteforce(scene, ro, rd, minT, maxT))
        assert (oc == ob).mean() > 0.999

    def test_cluster_cut_covers_all_tris(self):
        """perm must be a permutation of 0..T-1 over the valid slots:
        every tri appears exactly once, and id 0 appears exactly
        (padding_slots + 1) times since padded slots store 0."""
        T = 777
        scene = _soup_scene(T=T, spheres=0)
        ct = ClusterTracer(scene)
        perm = np.asarray(ct.data.perm)
        counts = np.bincount(perm, minlength=T)
        assert counts.shape[0] == T          # no id outside 0..T-1
        assert (counts[1:] == 1).all()       # each tri exactly once
        n_pad = perm.shape[0] - T
        assert counts[0] == n_pad + 1        # tri 0 once + padding zeros

    def test_mesh_render_with_cluster_tracer(self):
        """End-to-end: wavefront MIS render with the cluster tracer equals
        the render with the BVH tracer (same estimator, same RNG)."""
        import dataclasses
        from vimg_tpu.geometry.bvh import BVHTracer
        from vimg_tpu.render.wavefront import render_wavefront

        b = SceneBuilder()
        white = b.add_material(ir.MAT_LAMBERTIAN, base=(0.7, 0.7, 0.7))
        light = b.add_material(ir.MAT_DIFFUSE_LIGHT, base=(6.0, 6.0, 6.0))
        # an icosphere-ish bumpy mesh over a ground plane
        rs = np.random.RandomState(2)
        n = 12
        th = np.linspace(0, np.pi, n)
        ph = np.linspace(0, 2 * np.pi, n)
        tt, pp = np.meshgrid(th, ph, indexing="ij")
        r = 1.0 + 0.08 * rs.randn(n, n)
        vx = (r * np.sin(tt) * np.cos(pp)).ravel()
        vy = (r * np.cos(tt)).ravel()
        vz = (r * np.sin(tt) * np.sin(pp)).ravel()
        verts = np.stack([vx, vy, vz], -1).astype(np.float32)
        quads = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                quads += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
        b.add_mesh(verts, np.asarray(quads), white)
        b.add_sphere((0, 3.0, 0), 0.8, light)
        cam = Camera.make(look_at([0, 0.5, 4], [0, 0, 0], [0, 1, 0]),
                          24, 24, 45.0)
        scene = b.build(camera=cam)
        st = ir.RenderSettings(width=24, height=24, spp=8, max_depth=16,
                               integrator="mis", batch_size=24 * 24 * 8)
        img_c = render_wavefront(scene, st, tracer=ClusterTracer(scene))
        img_b = render_wavefront(scene, st, tracer=BVHTracer(scene))
        # same estimator; tiny fp differences in t can flip rare
        # epsilon races — compare statistically
        assert np.abs(img_c - img_b).mean() < 5e-3

    def test_prepass_render_parity(self, monkeypatch):
        """Primary pre-pass == plain wavefront, same estimator and RNG.
        Not bit-exact: camera-ray generation is only ulp-reproducible
        across jit contexts (the pre-pass chunk vs the refill), so rare
        silhouette samples can flip — parity is statistical with tight
        bounds (the megakernel-parity pattern)."""
        from vimg_tpu.render.wavefront import render_wavefront
        from vimg_tpu.scene.synthetic import terrain_scene

        scene = terrain_scene(600, width=24, height=16)
        st = ir.RenderSettings(width=24, height=16, spp=6, max_depth=6,
                               integrator="mis", batch_size=1 << 10)
        tr = ClusterTracer(scene)
        img_off, stats_off = render_wavefront(scene, st, tracer=tr,
                                              return_stats=True)
        monkeypatch.setenv("VIMG_PREPASS", "1")
        img_on, stats_on = render_wavefront(scene, st, tracer=tr,
                                            return_stats=True)
        assert stats_on["prepass_seconds"] > 0.0
        assert stats_off["prepass_seconds"] == 0.0
        assert stats_on["supersteps"] == stats_off["supersteps"]
        assert abs(stats_on["segments"] - stats_off["segments"]) \
            <= 0.001 * stats_off["segments"]
        assert np.isfinite(img_on).all()
        d = np.abs(img_on - img_off)
        assert d.mean() < 1e-4, d.mean()
        assert (d.max(-1) > 1e-5).mean() < 0.01
        assert np.corrcoef(img_on.ravel(), img_off.ravel())[0, 1] > 0.999

    def test_wide_walk_parity(self):
        """The wide (8-ary) stack walk is bit-equal to the binary skip
        walk: same candidate clusters per lane (conservative box tests
        over the same tree restriction), same tri-test order within a
        cluster."""
        scene = _soup_scene(1100)
        ro, rd, minT, maxT = _rays(B=1536, seed=13)
        base = ClusterTracer(scene, tile_rows=16)
        wide = ClusterTracer(scene, tile_rows=16, walk="wide")
        h0 = base.closest(scene, ro, rd, minT, maxT)
        h1 = wide.closest(scene, ro, rd, minT, maxT)
        for a, b in zip(jax.tree_util.tree_leaves(h0),
                        jax.tree_util.tree_leaves(h1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        o0 = base.occluded(scene, ro, rd, minT, jnp.full((1536,), 4.0))
        o1 = wide.occluded(scene, ro, rd, minT, jnp.full((1536,), 4.0))
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def test_group_gate_parity(self):
        """The TPU production config (per-row-group gated tri tests,
        wide tiles) is bit-equal to the ungated walk: row-group culling
        is conservative (a tri is inside its sub-block AABB, so a lane
        whose [minT, entry-bt] segment misses the box cannot hit), and
        the surviving t/u/v math is identical. CPU defaults resolve to
        the ungated config for interpret speed — this test pins the
        gated one explicitly."""
        scene = _soup_scene(900)
        ro, rd, minT, maxT = _rays(B=1536, seed=11)
        base = ClusterTracer(scene, group_gate=False, tile_rows=32)
        gated = ClusterTracer(scene, group_gate=True, tile_rows=32)
        h0 = base.closest(scene, ro, rd, minT, maxT)
        h1 = gated.closest(scene, ro, rd, minT, maxT)
        for a, b in zip(jax.tree_util.tree_leaves(h0),
                        jax.tree_util.tree_leaves(h1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        o0 = base.occluded(scene, ro, rd, minT, jnp.full((1536,), 4.0))
        o1 = gated.occluded(scene, ro, rd, minT, jnp.full((1536,), 4.0))
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
