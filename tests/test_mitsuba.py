"""Mitsuba XML loader + .serialized round-trip tests."""
import textwrap

import numpy as np
import pytest

from vimg_tpu.scene import ir
from vimg_tpu.scene.serialized import read_serialized, write_serialized


class TestSerialized:
    def test_roundtrip(self, tmp_path):
        r = np.random.default_rng(0)
        v = r.random((30, 3)).astype(np.float32)
        n = r.normal(size=(30, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        uv = r.random((30, 2)).astype(np.float32)
        idx = r.integers(0, 30, (17, 3)).astype(np.int64)
        p = tmp_path / "m.serialized"
        write_serialized(p, v, idx, normals=n, uvs=uv)
        v2, idx2, n2, uv2 = read_serialized(p)
        assert np.allclose(v, v2)
        assert (idx == idx2).all()
        assert np.allclose(n, n2)
        assert np.allclose(uv, uv2)

    def test_transform_applied(self, tmp_path):
        v = np.eye(3, dtype=np.float32)
        idx = np.array([[0, 1, 2]])
        p = tmp_path / "m.serialized"
        write_serialized(p, v, idx)
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [1, 2, 3]
        v2, *_ = read_serialized(p, to_world=m)
        assert np.allclose(v2, v + [1, 2, 3])


MITSUBA_XML = """<?xml version="1.0"?>
<scene version="0.6.0">
    <integrator type="path"><integer name="max_depth" value="8"/></integrator>
    <sensor type="perspective">
        <float name="fov" value="45"/>
        <string name="fov_axis" value="y"/>
        <transform name="to_world">
            <lookat origin="0, 2, 6" target="0, 0.5, 0" up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="64"/>
            <integer name="height" value="48"/>
        </film>
        <sampler type="independent">
            <integer name="sample_count" value="9"/>
        </sampler>
    </sensor>
    <shape type="rectangle">
        <transform name="to_world">
            <scale value="4"/>
            <rotate x="1" angle="-90"/>
        </transform>
        <bsdf type="diffuse" id="floor">
            <rgb name="reflectance" value="0.7 0.7 0.7"/>
        </bsdf>
    </shape>
    <shape type="cube">
        <transform name="to_world">
            <scale value="0.5"/>
            <translate x="0" y="0.5" z="0"/>
        </transform>
        <bsdf type="principled">
            <rgb name="base_color" value="0.2 0.4 0.8"/>
            <float name="roughness" value="0.3"/>
            <float name="metallic" value="0.8"/>
        </bsdf>
    </shape>
    <shape type="sphere">
        <point name="center" x="0" y="4" z="0"/>
        <float name="radius" value="0.5"/>
        <emitter type="area">
            <rgb name="radiance" value="10 10 10"/>
        </emitter>
    </shape>
</scene>
"""


class TestMitsubaLoader:
    def test_load(self, tmp_path):
        from vimg_tpu.scene.mitsuba_loader import load_mitsuba_scene
        p = tmp_path / "scene.xml"
        p.write_text(MITSUBA_XML)
        scene, settings = load_mitsuba_scene(p)
        assert settings.width == 64 and settings.height == 48
        assert settings.spp == 9
        assert settings.max_depth == 8
        assert settings.integrator == "mis"
        # rectangle (2 tris) + cube (12 tris) + 1 sphere light
        assert scene.n_tris() == 14
        assert scene.n_spheres() == 1
        assert scene.n_lights() == 1
        assert scene.lights_have_sphere

    def test_render(self, tmp_path):
        import dataclasses
        from vimg_tpu.scene.mitsuba_loader import load_mitsuba_scene
        from vimg_tpu.render.render import render
        p = tmp_path / "scene.xml"
        p.write_text(MITSUBA_XML)
        scene, settings = load_mitsuba_scene(p)
        scene = scene.replace(camera=dataclasses.replace(
            scene.camera, width=32, height=24))
        settings = dataclasses.replace(settings, width=32, height=24, spp=8,
                                       max_depth=4, batch_size=32 * 24 * 8)
        img = render(scene, settings)
        assert not np.isnan(img).any()
        assert img.mean() > 1e-4   # light illuminates the scene
