"""End-to-end: load reference json scenes, render small images, sanity-check
against physically expected values."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import load_json_scene
from vimg_tpu.render.render import render


def _small(settings, w=64, h=64, spp=4, **kw):
    import dataclasses
    return dataclasses.replace(settings, width=w, height=h, spp=spp,
                               batch_size=w * h * spp, **kw)


def _scaled_scene(path, w, h):
    scene, settings = load_json_scene(path)
    import dataclasses
    cam = dataclasses.replace(scene.camera, width=w, height=h)
    return scene.replace(camera=cam), settings


class TestLoader:
    def test_cornell_counts(self, ref_scenes):
        scene, settings = load_json_scene(
            os.path.join(ref_scenes, "cornell_box_spheres.json"))
        # 6 quads -> 12 tris, 3 spheres, 4 materials
        assert scene.n_tris() == 12
        assert scene.n_spheres() == 3
        assert scene.n_mats() == 4
        # light quad -> 2 emissive triangles in the light list
        assert scene.n_lights() == 2
        assert settings.integrator == "mis"
        assert settings.spp == 100
        assert settings.width == 800

    def test_disney_counts(self, ref_scenes):
        scene, settings = load_json_scene(
            os.path.join(ref_scenes, "disney_spheres.json"))
        assert scene.n_spheres() == 6
        assert scene.has_principled
        assert settings.max_depth == 2 ** 31 - 1


class TestNormalIntegrator:
    def test_cornell_normals(self, ref_scenes):
        scene, settings = _scaled_scene(
            os.path.join(ref_scenes, "cornell_box_spheres.json"), 32, 32)
        img = render(scene, _small(settings, 32, 32, spp=1,
                                   integrator="s_normal"),
                     integrator="s_normal")
        assert img.shape == (32, 32, 3)
        assert not np.any(np.isnan(img))
        # center ray hits the white sphere facing the camera: normal ~ -z
        center = img[16, 16]
        assert center[2] < 0.2, center
        # side walls have +-x normals -> ch0 ~ 1 on one side, ~0 on the other
        left, right = img[16, 1], img[16, 30]
        assert {round(float(left[0])), round(float(right[0]))} == {0, 1}, \
            (left, right)
        # floor/ceiling rows have +-y normals
        top, bottom = img[1, 16], img[30, 16]
        assert {round(float(top[1])), round(float(bottom[1]))} == {0, 1}, \
            (top, bottom)


class TestMaterialIntegrator:
    def test_furnace_white(self):
        """Lambertian albedo-1 sphere inside a uniform white env: radiance
        must equal the env radiance (white furnace test)."""
        from vimg_tpu.scene.json_loader import SceneBuilder
        from vimg_tpu.render.camera import Camera
        from vimg_tpu.core.math import look_at

        b = SceneBuilder()
        m = b.add_material(ir.MAT_LAMBERTIAN, base=(1.0, 1.0, 1.0))
        b.add_sphere((0, 0, 0), 1.0, m)
        cam = Camera.make(look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                          16, 16, 40.0)
        scene = b.build(camera=cam, bg_color=(0.7, 0.7, 0.7))
        # build() honors bg_color only through build_scene; furnace needs it
        assert scene.bg_is_emissive

        settings = ir.RenderSettings(width=16, height=16, spp=256,
                                     max_depth=64, integrator="material",
                                     batch_size=16 * 16 * 256)
        img = render(scene, settings)
        center = img[8, 8]
        assert np.allclose(center, 0.7, atol=0.02), center

    def test_cornell_light_visible(self, ref_scenes):
        scene, settings = _scaled_scene(
            os.path.join(ref_scenes, "cornell_box_spheres.json"), 24, 24)
        img = render(scene, _small(settings, 24, 24, spp=32,
                                   integrator="material", max_depth=8),
                     integrator="material")
        assert not np.any(np.isnan(img))
        assert img.mean() > 0.01   # light reaches the camera
        assert img.max() < 20.0


class TestMISIntegrator:
    def test_cornell_mis_close_to_material(self, ref_scenes):
        """MIS and material integrators estimate the same integral -> means
        must agree within Monte-Carlo noise."""
        scene, settings = _scaled_scene(
            os.path.join(ref_scenes, "cornell_box_spheres.json"), 16, 16)
        s_mat = _small(settings, 16, 16, spp=196, max_depth=6)
        img_mat = render(scene, s_mat, integrator="material")
        img_mis = render(scene, s_mat, integrator="mis")
        assert not np.any(np.isnan(img_mis))
        m1, m2 = img_mat.mean(), img_mis.mean()
        assert abs(m1 - m2) / max(m1, m2) < 0.2, (m1, m2)
        # MIS should be far lower variance on this scene; just check sane range
        assert img_mis.mean() > 0.005
