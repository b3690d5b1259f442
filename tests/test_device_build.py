"""On-device sweep-SAH build (geometry/device_build.py).

Done-criterion from round-2 planning: the device build equals the native
sweep builder's output on test scenes (same SAH rules, same tie-breaking).
"""
import numpy as np
import pytest


def _soup(T, seed=0):
    rs = np.random.RandomState(seed)
    c = rs.rand(T, 3).astype(np.float32)
    h = 0.03 * rs.rand(T, 3).astype(np.float32)
    return c - h, c + h, c


class TestDeviceBuild:
    def test_valid_tree(self):
        from vimg_tpu.geometry.device_build import build_sweep_sah_device
        bmin, bmax, cen = _soup(700, 1)
        d = build_sweep_sah_device(bmin, bmax, cen)
        assert sorted(d["order"].tolist()) == list(range(700))
        leaf = d["node_count"] > 0
        spans = sorted((int(s), int(s + n)) for s, n in
                       zip(d["node_start"][leaf], d["node_count"][leaf]))
        cover = 0
        for s, e in spans:
            assert s == cover
            cover = e
        assert cover == 700
        assert d["node_count"][leaf].max() <= 8

    def test_equals_native_sweep(self):
        from vimg_tpu.geometry.device_build import build_sweep_sah_device
        try:
            from vimg_tpu.runtime.native import build_bvh_native
        except Exception:
            pytest.skip("native builder unavailable")
        for seed, T in [(0, 257), (3, 1000)]:
            bmin, bmax, cen = _soup(T, seed)
            d = build_sweep_sah_device(bmin, bmax, cen)
            n = build_bvh_native(bmin, bmax, cen, mode=1)
            assert np.array_equal(d["order"], n["order"]), (seed, T)
            assert np.array_equal(d["node_count"], n["node_count"])
            assert np.array_equal(d["node_start"][d["node_count"] > 0],
                                  n["node_start"][n["node_count"] > 0])
            np.testing.assert_allclose(d["node_min"], n["node_min"],
                                       atol=1e-6)

    def test_traversal_with_device_tree(self):
        """BVH traversal over the device-built tree == brute force."""
        import jax.numpy as jnp
        from vimg_tpu.geometry.bvh import BVHTracer
        from vimg_tpu.geometry.intersect import intersect_bruteforce
        from vimg_tpu.scene import ir
        from vimg_tpu.scene.json_loader import SceneBuilder
        from vimg_tpu.render.camera import Camera
        from vimg_tpu.core.math import look_at

        rs = np.random.RandomState(5)
        T = 800
        c = rs.rand(T, 3).astype(np.float32)
        verts = (c[:, None, :]
                 + 0.05 * rs.randn(T, 3, 3).astype(np.float32)).reshape(-1, 3)
        b = SceneBuilder()
        m = b.add_material(ir.MAT_LAMBERTIAN, base=(0.5, 0.5, 0.5))
        b.add_mesh(verts, np.arange(T * 3).reshape(T, 3), m)
        cam = Camera.make(look_at([0.5, 0.5, 3], [0.5, 0.5, 0.5],
                                  [0, 1, 0]), 8, 8, 45.0)
        scene = b.build(camera=cam)

        B = 1024
        ro = jnp.asarray(rs.rand(B, 3).astype(np.float32) * 2 - 0.5)
        rd = rs.randn(B, 3).astype(np.float32)
        rd = jnp.asarray(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
        minT = jnp.full((B,), 1e-4)
        maxT = jnp.full((B,), jnp.inf)
        tr = BVHTracer(scene, builder="device")
        hb = intersect_bruteforce(scene, ro, rd, minT, maxT)
        hc = tr.closest(scene, ro, rd, minT, maxT)
        assert (np.asarray(hc.hit) == np.asarray(hb.hit)).mean() > 0.999
        both = np.asarray(hc.hit) & np.asarray(hb.hit)
        assert np.abs(np.asarray(hc.t) - np.asarray(hb.t))[both].max() < 1e-4


class TestClusterRouting:
    def test_cluster_cut_device_equals_native_sweep(self):
        """builder="device" routes the on-device sweep into the cluster
        pipeline: the resulting cluster tables must be bit-equal to those
        cut from the native sweep builder (mode=1) — same tree, same
        preorder, same packing (round-3: dynamic-scene rebuilds can skip
        the host SAH recursion)."""
        import numpy as np
        from vimg_tpu.geometry.cluster_trace import ClusterData
        from vimg_tpu.runtime.native import build_bvh_native
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        scene = bumpy_sphere_scene(5000, width=32, height=16)
        dev = ClusterData(scene, max_k=64, builder="device")

        # native sweep oracle -> same cut by monkeypatching the builder
        verts = np.asarray(scene.verts)
        tv = np.asarray(scene.tri_vidx)
        p = verts[tv]
        built = build_bvh_native(p.min(1), p.max(1), p.mean(1), mode=1)

        from vimg_tpu.geometry import cluster_trace as ct
        ranges, tree = ct.cut_clusters(built, built["node_start"], 64)
        # compare the tree restriction: same cluster ranges and skip links
        order = built["order"]
        dev_ranges_ids = dev.perm.reshape(dev.n_clusters, dev.max_k)
        assert len(ranges) == dev.n_clusters
        for c, (s, e) in enumerate(ranges):
            ids = order[s:e]
            got = dev_ranges_ids[c, :e - s]
            assert np.array_equal(np.sort(ids), np.sort(got))
        M = tree["cid"].shape[0]
        assert dev.n_nodes == M
        assert np.array_equal(dev.node_skip.reshape(-1)[:M], tree["skip"])
