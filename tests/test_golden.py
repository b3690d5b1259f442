"""Golden-image parity vs the reference's MIS light-test renders.

The reference ships `scenes/MIS_light_tests/*-ref.png` (SURVEY §4): Veach
MIS scenes at depth 1 where direct lighting dominates, so converged output
is nearly noise-free and comparable across different RNGs. We render at
reduced resolution, downsample the golden to match, and require close
per-pixel agreement after identical tonemapping.
"""
import dataclasses
import os

import numpy as np
import pytest

GOLDEN_DIR = "/root/reference/scenes/MIS_light_tests"


def _load_golden(name, w, h):
    from PIL import Image
    p = os.path.join(GOLDEN_DIR, name)
    img = Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


@pytest.mark.parametrize("scene_name,ref_name", [
    ("sphere_light_small_mis.json", "sphere_light_small-ref.png"),
    ("sphere_light_medium_mis.json", "sphere_light_medium-ref.png"),
    # cube.obj is absent from the scene mount; the loader substitutes the
    # synthesized unit cube (json_loader._synth_mesh_asset)
    ("odyssey_mis.json", "odyssey_mis-ref.png"),
])
def test_mis_golden(scene_name, ref_name):
    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip("reference goldens unavailable")
    import jax.numpy as jnp
    from vimg_tpu.render import film
    from vimg_tpu.render.render import render
    from vimg_tpu.scene.json_loader import load_json_scene

    scene, settings = load_json_scene(os.path.join(GOLDEN_DIR, scene_name))
    # keep the scene's aspect ratio: horizontal fov follows W/H, so a
    # square crop of a 16:9 scene (odyssey) would reframe the image
    ar = settings.width / settings.height
    h = 72 if ar > 1.2 else 96
    w = int(round(h * ar))
    scene = scene.replace(camera=dataclasses.replace(
        scene.camera, width=w, height=h))
    settings = dataclasses.replace(settings, width=w, height=h, spp=96,
                                   batch_size=w * h * 96)
    img = render(scene, settings, integrator="mis")
    # goldens look gamma-encoded with clamping (no AgX shoulder visible)
    ours = np.asarray(film.srgb_encode(jnp.asarray(img)))
    golden = _load_golden(ref_name, w, h)

    # downsampled golden vs our render: direct-light scene, tight stats.
    # Bounds set at ~1.5x the round-5 measured values (mean_abs max
    # 0.0082, corr min 0.9918 across the three scenes) per VERDICT r4 #8
    diff = np.abs(ours - golden)
    assert diff.mean() < 0.013, diff.mean()
    # structural agreement (the lit sphere/plane pattern)
    corr = np.corrcoef(ours.mean(-1).ravel(), golden.mean(-1).ravel())[0, 1]
    assert corr > 0.985, corr


def test_disney_spheres_agx_golden():
    """The reference's headline AgX render (renders/disney_spheres_agx_512
    .png): reduced-res MIS render, AgX-tonemapped, vs the downsampled
    golden. Looser stats than the MIS tests — indirect noise at 96 spp.
    Full-res TPU artifact: tools/make_artifact.py."""
    ref_png = "/root/reference/renders/disney_spheres_agx_512.png"
    scene_p = "/root/reference/scenes/disney_spheres.json"
    if not (os.path.exists(ref_png) and os.path.exists(scene_p)):
        pytest.skip("reference renders unavailable")
    import jax.numpy as jnp
    from PIL import Image

    from vimg_tpu.render import film
    from vimg_tpu.render.render import render
    from vimg_tpu.scene.json_loader import load_json_scene

    scene, settings = load_json_scene(scene_p)
    w, h = 99, 44                     # 1800x800 aspect
    scene = scene.replace(camera=dataclasses.replace(
        scene.camera, width=w, height=h))
    settings = dataclasses.replace(settings, width=w, height=h, spp=96,
                                   batch_size=w * h * 96)
    img = render(scene, settings, integrator="mis")
    ours = np.asarray(film.finalize(jnp.asarray(img), tonemap="agx"))
    golden = np.asarray(
        Image.open(ref_png).convert("RGB").resize((w, h), Image.BILINEAR),
        np.float32) / 255.0
    # bounds ~1.5x the round-5 measured values (mean_abs 0.0296,
    # corr 0.9771 at this spp/resolution)
    diff = np.abs(ours - golden)
    assert diff.mean() < 0.045, diff.mean()
    corr = np.corrcoef(ours.mean(-1).ravel(), golden.mean(-1).ravel())[0, 1]
    assert corr > 0.965, corr
