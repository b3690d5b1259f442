"""Pallas megakernel correctness (CPU interpret mode; see conftest.py).

The megakernel implements the SAME estimator as the wavefront/loop MIS
integrators (identical counter-RNG streams per (pixel, sample, bounce,
draw)). On scenes without epsilon races the outputs agree per-sample to
float rounding; on large-scale scenes (cornell: 555-unit box vs MIN_T 1e-4)
self-intersection/shadow epsilon races resolve per fp-rounding of the
specific compiled graph, so renderers are compared statistically there and
against the reference goldens (the races are unbiased — each flip swaps one
valid sample for another; tested by spp-decay in round-2 notes).
"""
import dataclasses
import os

import numpy as np
import pytest

from vimg_tpu.core.math import look_at
from vimg_tpu.geometry.trace import make_tracer
from vimg_tpu.render.camera import Camera
from vimg_tpu.render.mega import render_megakernel, supports_megakernel
from vimg_tpu.render.wavefront import render_wavefront
from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder, load_json_scene

SCENES = "/root/reference/scenes"


def _simple_scene(spp=8):
    b = SceneBuilder()
    red = b.add_material(ir.MAT_LAMBERTIAN, base=(0.8, 0.2, 0.2))
    glass = b.add_material(ir.MAT_DIELECTRIC, base=(1, 1, 1),
                           scalars={ir.MS_IOR: 1.5})
    light = b.add_material(ir.MAT_DIFFUSE_LIGHT, base=(5.0, 5.0, 5.0))
    b.add_sphere((0, 0, 0), 1.0, red)
    b.add_sphere((2.2, 0, 0), 1.0, glass)
    b.add_sphere((0, 3.0, 0), 1.0, light)
    cam = Camera.make(look_at([0, 0, 6], [0.7, 0, 0], [0, 1, 0]), 32, 24,
                      45.0)
    scene = b.build(camera=cam)
    settings = ir.RenderSettings(width=32, height=24, spp=spp, max_depth=64,
                                 integrator="mis", batch_size=32 * 24 * spp)
    return scene, settings


class TestSupports:
    def test_simple_supported(self):
        scene, st = _simple_scene()
        assert supports_megakernel(scene, st)

    def test_reference_scenes_supported(self):
        for name in ("disney_spheres", "cornell_box_spheres"):
            p = os.path.join(SCENES, f"{name}.json")
            if not os.path.exists(p):
                pytest.skip("reference scenes unavailable")
            scene, st = load_json_scene(p)
            assert supports_megakernel(scene, st), name

    def test_material_supported_normal_rejected(self):
        scene, st = _simple_scene()
        st = dataclasses.replace(st, integrator="material")
        assert supports_megakernel(scene, st)
        st = dataclasses.replace(st, integrator="s_normal")
        assert not supports_megakernel(scene, st)

    def test_many_spheres_rejected(self):
        scene, st = _simple_scene()
        # cap raised to 256 in round 5 (measured chain slope,
        # bench_records/r5_probe_h.json); beyond it the unrolled select
        # chains still fall back to the XLA path
        n = 257
        scene = scene.replace(sph_center=np.zeros((n, 3), np.float32),
                              sph_radius=np.ones((n,), np.float32),
                              sph_mat=np.zeros((n,), np.int32))
        assert not supports_megakernel(scene, st)
        n = 72          # inside the new cap
        scene = scene.replace(sph_center=np.zeros((n, 3), np.float32),
                              sph_radius=np.ones((n,), np.float32),
                              sph_mat=np.zeros((n,), np.int32))
        assert supports_megakernel(scene, st)

    def test_mesh_scene_supported(self):
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene
        scene = bumpy_sphere_scene(2000, width=64, height=32)
        st = ir.RenderSettings(width=64, height=32, spp=4, max_depth=8,
                               integrator="mis")
        assert supports_megakernel(scene, st)
        smooth = bumpy_sphere_scene(2000, width=64, height=32,
                                    smooth_normals=True)
        assert supports_megakernel(smooth, st)  # attr-table mesh mode


class TestParity:
    def test_exact_parity_small_scene(self):
        """No epsilon races at unit scene scale: per-sample identical paths,
        image equal to float rounding."""
        scene, st = _simple_scene(spp=8)
        ref = render_wavefront(scene, st, tracer=make_tracer(scene))
        img = render_megakernel(scene, st)
        assert np.abs(ref - img).max() < 1e-5

    def test_material_mode_parity(self):
        """Material (no-NEE) megakernel vs the XLA chunked loop integrator:
        same counter-RNG streams, no epsilon races at unit scale."""
        from vimg_tpu.render.render import render as render_loop
        scene, st = _simple_scene(spp=16)
        st = dataclasses.replace(st, integrator="material")
        ref = render_loop(scene, st)
        img = render_megakernel(scene, st)
        assert np.abs(ref - img).mean() < 2e-3
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.999

    def test_material_mode_glass_box(self):
        """glass_in_box.json forced to integrator=material (the reference's
        no-NEE path); the megakernel must agree with the loop integrator."""
        from vimg_tpu.render.render import render as render_loop
        p = os.path.join(SCENES, "glass_in_box.json")
        if not os.path.exists(p):
            pytest.skip("reference scenes unavailable")
        scene, st = load_json_scene(p)
        w = h = 40
        scene = scene.replace(camera=dataclasses.replace(
            scene.camera, width=w, height=h))
        st = dataclasses.replace(st, width=w, height=h, spp=32,
                                 batch_size=w * h * 32,
                                 integrator="material")
        assert supports_megakernel(scene, st)
        ref = render_loop(scene, st)
        img = render_megakernel(scene, st)
        assert np.abs(ref - img).mean() < 8e-3
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.99

    def test_statistical_parity_cornell(self):
        """Large-scale scene: epsilon races flip individual samples between
        compiled graphs; means must still agree."""
        p = os.path.join(SCENES, "cornell_box_spheres.json")
        if not os.path.exists(p):
            pytest.skip("reference scenes unavailable")
        scene, st = load_json_scene(p)
        w = h = 48
        scene = scene.replace(camera=dataclasses.replace(
            scene.camera, width=w, height=h))
        st = dataclasses.replace(st, width=w, height=h, spp=48,
                                 batch_size=w * h * 48)
        ref = render_wavefront(scene, st, tracer=make_tracer(scene))
        img = render_megakernel(scene, st)
        assert np.abs(ref - img).mean() < 6e-3
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.99

    def test_sample_offset_slabs_compose(self):
        """Two half-spp slabs at sample offsets 0 and spp/2 must average
        to the full render (checkpoint/resume on the megakernel path).
        Only the f32 accumulation grouping differs."""
        p = os.path.join(SCENES, "cornell_box_spheres.json")
        if not os.path.exists(p):
            pytest.skip("reference scenes unavailable")
        scene, st = load_json_scene(p)
        st = dataclasses.replace(st, width=64, height=32, spp=8, max_depth=6)
        full = render_megakernel(scene, st, rows=8)
        half = dataclasses.replace(st, spp=4)
        a = render_megakernel(scene, half, rows=8, sample_offset=0)
        b = render_megakernel(scene, half, rows=8, sample_offset=4)
        comp = (np.asarray(a) + np.asarray(b)) / 2.0
        assert np.abs(comp - np.asarray(full)).max() < 1e-5
        # the offset must actually change the streams
        assert np.abs(np.asarray(a) - np.asarray(b)).mean() > 1e-4

    def test_bf16_shading(self):
        """RenderSettings.shading_dtype="bf16" (Disney eval/pdf in bf16,
        geometry + sampling stay f32): no NaNs, small linear error vs f32.
        CPU-interpret only (Mosaic cannot lower bf16 compare masks)."""
        p = os.path.join(SCENES, "disney_spheres.json")
        if not os.path.exists(p):
            pytest.skip("reference scenes unavailable")
        scene, st = load_json_scene(p)
        st = dataclasses.replace(st, width=64, height=32, spp=8, max_depth=8)
        ref = render_megakernel(scene, st, rows=8)
        img = render_megakernel(
            scene, dataclasses.replace(st, shading_dtype="bf16"), rows=8)
        assert np.isfinite(img).all()
        assert np.abs(ref - img).mean() < 2e-3


class TestMesh:
    def test_mesh_megakernel_parity(self):
        """Mesh-mode megakernel (in-kernel cluster-tree walk) vs the XLA
        wavefront with the cluster tracer: same estimator, same RNG
        streams. The kernel's hit point is ro + t*rd while the XLA path
        reconstructs barycentrically (documented divergence) — the ~1e-7
        position difference flips rare epsilon races (~1 sample per few
        thousand), so parity is statistical with a tight mean bound."""
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        scene = bumpy_sphere_scene(800, width=64, height=32)
        st = ir.RenderSettings(width=64, height=32, spp=4, max_depth=8,
                               integrator="mis", batch_size=1 << 14)
        assert supports_megakernel(scene, st)
        img = render_megakernel(scene, st, rows=16)
        ref = render_wavefront(scene, st, tracer=ClusterTracer(scene))
        assert np.isfinite(img).all()
        d = np.abs(ref - img)
        assert d.mean() < 1e-4
        assert (d.max(-1) > 1e-5).mean() < 0.01  # <1% of pixels race
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.999

    def test_mesh_megakernel_smooth_normals(self):
        """Vertex-normal (smooth shading) mesh megakernel vs the XLA
        wavefront+ClusterTracer: interpolated n_s drives shading, emission
        sidedness and NEE; same estimator, statistical parity (the hit
        point + interp-weight op orders differ by ulps)."""
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        scene = bumpy_sphere_scene(800, width=64, height=32,
                                   smooth_normals=True)
        st = ir.RenderSettings(width=64, height=32, spp=4, max_depth=8,
                               integrator="mis", batch_size=1 << 14)
        assert supports_megakernel(scene, st)
        img = render_megakernel(scene, st, rows=16)
        ref = render_wavefront(scene, st, tracer=ClusterTracer(scene))
        assert np.isfinite(img).all()
        d = np.abs(ref - img)
        assert d.mean() < 1e-4
        assert (d.max(-1) > 1e-5).mean() < 0.01
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.999
        # smooth shading must actually differ from flat shading
        flat = bumpy_sphere_scene(800, width=64, height=32)
        flat_img = render_megakernel(flat, st, rows=16)
        assert np.abs(flat_img - img).mean() > 1e-3

    def test_mesh_megakernel_sphere_light(self):
        """Mesh mode with a SPHERE light: exercises surf_pdf_mesh's
        sphere branch + sphere NEE in the in-kernel walk (previously
        untested — the standard mesh scenes use a quad light)."""
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        scene = bumpy_sphere_scene(800, width=64, height=32,
                                   light_shape="sphere")
        st = ir.RenderSettings(width=64, height=32, spp=4, max_depth=8,
                               integrator="mis", batch_size=1 << 14)
        assert supports_megakernel(scene, st)
        img = render_megakernel(scene, st, rows=16)
        ref = render_wavefront(scene, st, tracer=ClusterTracer(scene))
        assert np.isfinite(img).all()
        d = np.abs(ref - img)
        assert d.mean() < 1e-4
        assert (d.max(-1) > 1e-5).mean() < 0.01
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.999

    def test_mesh_megakernel_terrain(self):
        """Second mesh topology (open heightfield): megakernel vs the XLA
        wavefront+ClusterTracer, statistical parity as above."""
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene.synthetic import terrain_scene

        scene = terrain_scene(900, width=64, height=32)
        st = ir.RenderSettings(width=64, height=32, spp=4, max_depth=8,
                               integrator="mis", batch_size=1 << 14)
        assert supports_megakernel(scene, st)
        img = render_megakernel(scene, st, rows=16)
        ref = render_wavefront(scene, st, tracer=ClusterTracer(scene))
        assert np.isfinite(img).all()
        d = np.abs(ref - img)
        assert d.mean() < 1e-4
        assert (d.max(-1) > 1e-5).mean() < 0.01
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.999

    def test_mesh_megakernel_streamed(self):
        """HBM-streamed mesh mode (cluster table above the VMEM budget:
        live leaves DMA their block into scratch) must be bit-identical to
        the VMEM-resident walk — same tests, same order, different memory
        space."""
        from vimg_tpu.render.mega import kernel as K
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        st = ir.RenderSettings(width=64, height=32, spp=2, max_depth=6,
                               integrator="mis", batch_size=1 << 14)
        scene = bumpy_sphere_scene(800, width=64, height=32)
        ref = render_megakernel(scene, st, rows=8)
        scene2 = bumpy_sphere_scene(800, width=64, height=32)
        K._FORCE_STREAM = True
        try:
            img = render_megakernel(scene2, st, rows=8)
        finally:
            K._FORCE_STREAM = False
        assert np.array_equal(np.asarray(ref), np.asarray(img))

    def test_mesh_megakernel_material_mode(self):
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        scene = bumpy_sphere_scene(500, width=48, height=24)
        st = ir.RenderSettings(width=48, height=24, spp=4, max_depth=6,
                               integrator="material", batch_size=1 << 14)
        assert supports_megakernel(scene, st)
        img = render_megakernel(scene, st, rows=16)
        from vimg_tpu.render.render import render as render_loop
        ref = render_loop(scene, st, tracer=ClusterTracer(scene))
        assert np.isfinite(img).all()
        assert np.abs(ref - img).mean() < 4e-3
        assert np.corrcoef(ref.ravel(), img.ravel())[0, 1] > 0.99


class TestGolden:
    @pytest.mark.parametrize("scene_name,ref_name", [
        ("sphere_light_small_mis.json", "sphere_light_small-ref.png"),
    ])
    def test_mis_golden_megakernel(self, scene_name, ref_name):
        golden_dir = os.path.join(SCENES, "MIS_light_tests")
        if not os.path.isdir(golden_dir):
            pytest.skip("reference goldens unavailable")
        import jax.numpy as jnp
        from PIL import Image
        from vimg_tpu.render import film

        scene, settings = load_json_scene(os.path.join(golden_dir,
                                                       scene_name))
        w, h = 96, 96
        scene = scene.replace(camera=dataclasses.replace(
            scene.camera, width=w, height=h))
        settings = dataclasses.replace(settings, width=w, height=h, spp=96,
                                       batch_size=w * h * 96)
        assert supports_megakernel(scene, settings)
        img = render_megakernel(scene, settings)
        ours = np.asarray(film.srgb_encode(jnp.asarray(img)))
        gp = os.path.join(golden_dir, ref_name)
        golden = np.asarray(Image.open(gp).convert("RGB").resize(
            (w, h), Image.BILINEAR), np.float32) / 255.0
        assert np.abs(ours - golden).mean() < 0.06
        corr = np.corrcoef(ours.mean(-1).ravel(),
                           golden.mean(-1).ravel())[0, 1]
        assert corr > 0.97


class TestSharded:
    def test_sharded_equals_single(self):
        """Pixel-block sharding over the 8-device virtual mesh must equal
        the single-device megakernel render exactly (disjoint film blocks,
        identical per-block computation)."""
        from vimg_tpu.render.mega.kernel import render_megakernel_sharded

        scene, st = _simple_scene(spp=4)
        single = render_megakernel(scene, st, rows=1)
        multi = render_megakernel_sharded(scene, st, rows=1)
        assert np.abs(single - multi).max() < 1e-6

    def test_sharded_mesh_equals_single(self):
        """Mesh-mode megakernel sharded over the 8-device virtual mesh:
        image tiles are disjoint film windows, so the sharded render must
        equal single-device exactly (incl. the cluster-walk path)."""
        from vimg_tpu.render.mega.kernel import render_megakernel_sharded
        from vimg_tpu.scene.synthetic import bumpy_sphere_scene

        scene = bumpy_sphere_scene(600, width=64, height=16)
        st = ir.RenderSettings(width=64, height=16, spp=2, max_depth=5,
                               integrator="mis")
        single = render_megakernel(scene, st, rows=8)
        multi = render_megakernel_sharded(scene, st, rows=8)
        assert np.abs(np.asarray(single) - np.asarray(multi)).max() < 1e-6


class TestManyMaterials:
    def test_many_material_scene_routes_to_wavefront(self):
        """Scenes past MEGA_MAX_MATERIALS (256 since round 4 — the
        measured select-chain slope stays minor vs the mesh walk,
        bench_records/r4_many_mats.json) route off the megakernel to the
        wavefront, whose per-lane fetch is one jnp.take (flat in n_mats —
        r3_probe_c: 0.1-1.3 ns/row). A 300-material mesh scene must (a)
        be rejected by supports_megakernel and (b) render correctly
        through the wavefront (reference gltf_loading.cpp:547-690
        converts real scenes to hundreds of Principled materials)."""
        import numpy as np

        from vimg_tpu.core.math import look_at
        from vimg_tpu.render.camera import Camera
        from vimg_tpu.render.mega import supports_megakernel
        from vimg_tpu.render.wavefront import render_wavefront
        from vimg_tpu.scene.json_loader import SceneBuilder
        from vimg_tpu.scene.synthetic import bumpy_sphere_mesh

        rs = np.random.RandomState(3)
        verts, tris = bumpy_sphere_mesh(2000)
        b = SceneBuilder()
        mats = [b.add_material(ir.MAT_PRINCIPLED,
                               base=tuple(rs.rand(3) * 0.8 + 0.1),
                               scalars={ir.MS_IOR: 1.5,
                                        ir.MS_ROUGHNESS: 0.3 + 0.5 * rs.rand(),
                                        ir.MS_METALLIC: rs.rand(),
                                        ir.MS_SPECULAR: 0.5,
                                        ir.MS_SUBSURFACE: 0.2,
                                        ir.MS_SHEEN_TINT: 0.5,
                                        ir.MS_CLEARCOAT_GLOSS: 0.5})
                for _ in range(299)]
        light = b.add_material(ir.MAT_DIFFUSE_LIGHT, base=(12.0, 12.0, 12.0))
        # split the mesh across the 299 materials
        n = len(tris)
        nm = len(mats)
        step = max(n // nm, 1)
        for i in range(nm):
            sl = (tris[i * step:(i + 1) * step] if i < nm - 1
                  else tris[(nm - 1) * step:])
            if len(sl):
                b.add_mesh(verts, sl, mats[i])
        lv = np.array([[-0.6, 2.4, -0.6], [0.6, 2.4, -0.6],
                       [0.6, 2.4, 0.6], [-0.6, 2.4, 0.6]], np.float32)
        b.add_mesh(lv, np.array([[0, 1, 2], [0, 2, 3]]), light)
        cam = Camera.make(look_at([0, 0.6, 3.2], [0, 0, 0], [0, 1, 0]),
                          48, 24, 40.0)
        scene = b.build(camera=cam, bg_color=(0.05, 0.06, 0.08))
        st = ir.RenderSettings(width=48, height=24, spp=2, max_depth=4,
                               integrator="mis", batch_size=1 << 12)
        assert scene.mat_type.shape[0] == 300
        assert not supports_megakernel(scene, st)
        img = render_wavefront(scene, st)
        assert np.isfinite(img).all() and float(np.asarray(img).mean()) > 0


def test_many_materials_mesh_parity():
    """glTF-scale material counts (> the old 48 cap) stay estimator-
    identical between the mesh megakernel and the wavefront: the
    per-lane select chain must resolve all 129 materials correctly."""
    from vimg_tpu.scene.synthetic import multi_material_terrain_scene

    scene = multi_material_terrain_scene(1500, 96, width=64, height=32)
    assert scene.n_mats() > 48
    st = ir.RenderSettings(width=64, height=32, spp=4, max_depth=6,
                           integrator="mis", batch_size=1 << 12)
    assert supports_megakernel(scene, st)
    ref = render_wavefront(scene, st, tracer=make_tracer(scene))
    img = render_megakernel(scene, st, rows=8)
    assert np.isfinite(img).all()
    # statistical parity, bounds as test_mesh_megakernel_parity (the
    # kernel/XLA hit-point construction differs by ~1e-7, flipping rare
    # epsilon races; 96 material stripes = more boundaries than the
    # single-material scenes, hence the slightly wider mean bound)
    d = np.abs(ref - img)
    assert d.mean() < 3e-4
    assert (d.max(-1) > 1e-5).mean() < 0.02
    assert np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(img).ravel())[0, 1] > 0.999
