"""Coverage for auxiliary surfaces with no dedicated tests: the BVH-cost
heatmap, the OBJ loader, checker textures, and the profiling utils."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder, load_json_scene
from vimg_tpu.render.camera import Camera
from vimg_tpu.core.math import look_at

SCENES = "/root/reference/scenes"


def test_heatmap_renders():
    """Heatmap on a mesh scene via the BVH tracer: finite turbo-mapped
    image whose cost is higher where geometry is (center) than the
    corners (reference -m mode, main.cpp:249-256)."""
    from vimg_tpu.geometry.trace import BVHTracer_lazy
    from vimg_tpu.render.heatmap import render_heatmap
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene

    scene = bumpy_sphere_scene(600, width=48, height=32, with_light=False)
    st = ir.RenderSettings(width=48, height=32, spp=4, max_depth=4,
                           integrator="mis")
    tracer = BVHTracer_lazy(scene, None)
    img = render_heatmap(scene, st, tracer, factor=4.0)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    center = img[12:20, 18:30].mean()
    corner = img[:4, :4].mean()
    assert center != corner  # cost structure visible


def test_obj_loader_roundtrip(tmp_path):
    """v/f records incl. quads (fan triangulation) and negative indices."""
    from vimg_tpu.scene.obj_loader import load_obj

    p = tmp_path / "m.obj"
    p.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"          # quad -> 2 tris
        "f -4 -3 -2\n")        # negative indices -> (0, 1, 2)
    v, f = load_obj(str(p))
    assert v.shape == (4, 3)
    assert f.shape == (3, 3)
    assert f.tolist() == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]


def test_checker_texture_pattern():
    """A checker-textured floor quad must alternate the two colors in the
    render (reference checkered texture, texture.h)."""
    from vimg_tpu.render.wavefront import render_wavefront

    b = SceneBuilder()
    tex = b.add_texture(ir.TEX_CHECKER, col_a=(0.9, 0.1, 0.1),
                        col_b=(0.1, 0.1, 0.9), wh=(4.0, 4.0))
    m = b.add_material(ir.MAT_LAMBERTIAN, tex=(tex, -1, -1))
    light = b.add_material(ir.MAT_DIFFUSE_LIGHT, base=(30.0, 30.0, 30.0))
    # floor quad at y=0 with UVs spanning [0,1]^2
    lv = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                  np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(lv, np.array([[0, 2, 1], [0, 3, 2]]), m, uvs=uv)
    le = np.array([[-0.4, 2.0, -0.4], [0.4, 2.0, -0.4],
                   [0.4, 2.0, 0.4], [-0.4, 2.0, 0.4]], np.float32)
    b.add_mesh(le, np.array([[0, 1, 2], [0, 2, 3]]), light)
    cam = Camera.make(look_at([0.0, 2.2, 2.2], [0.0, 0.0, 0.0],
                              [0.0, 1.0, 0.0]), 64, 48, 45.0)
    scene = b.build(camera=cam, bg_color=(0.0, 0.0, 0.0))
    st = ir.RenderSettings(width=64, height=48, spp=8, max_depth=3,
                           integrator="mis", batch_size=1 << 14)
    img = np.asarray(render_wavefront(scene, st))
    assert np.isfinite(img).all()
    # lower half of the frame shows the floor: both checker colors appear
    floor = img[28:, :, :]
    lit = floor[floor.sum(-1) > 0.02]
    assert lit.size > 100
    reddish = (lit[:, 0] > lit[:, 2]).mean()
    assert 0.15 < reddish < 0.85  # both cell colors visible


def test_profiling_utils(capsys):
    from vimg_tpu.utils.profiling import PhaseTimer, block_and_time

    ph = PhaseTimer()
    with ph.phase("build"):
        pass
    with ph.phase("render"):
        pass
    out = capsys.readouterr().out
    assert "build" in out and "render" in out
    assert [n for n, _ in ph.records] == ["build", "render"]

    r, dt = block_and_time(lambda x: jnp.sum(x * 2.0),
                           jnp.ones((8, 8)), warmup=1, iters=2)
    assert dt >= 0.0 and float(r) == 128.0
