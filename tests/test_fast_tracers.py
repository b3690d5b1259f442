"""Fast tracer backends (Pallas interpret mode, MXU matmul formulation)
must agree with the reference jnp brute force."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_bvh import _random_tri_scene
from vimg_tpu.geometry.intersect import intersect_bruteforce, occlude_bruteforce
from vimg_tpu.geometry.mxu_intersect import MXUBruteForceTracer


def _rays(n, seed=1):
    r = np.random.default_rng(seed)
    ro = jnp.asarray(r.uniform(-15, 15, (n, 3)).astype(np.float32))
    rd = r.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, jnp.asarray(rd)


@pytest.mark.parametrize("make", [
    lambda s: MXUBruteForceTracer(s),
], ids=["mxu"])
def test_matches_reference(make):
    scene = _random_tri_scene(25, 6)
    tracer = make(scene)
    B = 2048
    ro, rd = _rays(B)
    minT = jnp.full((B,), 1e-4)
    maxT = jnp.full((B,), jnp.inf)
    ref = intersect_bruteforce(scene, ro, rd, minT, maxT)
    got = tracer.closest(scene, ro, rd, minT, maxT)
    t1, t2 = np.asarray(ref.t), np.asarray(got.t)
    assert (np.isfinite(t1) == np.isfinite(t2)).mean() > 0.999
    both = np.isfinite(t1) & np.isfinite(t2)
    assert np.allclose(t1[both], t2[both], rtol=1e-3, atol=1e-3)
    assert (np.asarray(ref.prim_id)[both]
            == np.asarray(got.prim_id)[both]).mean() > 0.999
    tri = both & (np.asarray(ref.prim_type) == 0)
    assert np.allclose(np.asarray(ref.u)[tri], np.asarray(got.u)[tri],
                       atol=2e-3)
    occ_ref = np.asarray(occlude_bruteforce(scene, ro, rd, minT,
                                            jnp.full((B,), 10.0)))
    occ_got = np.asarray(tracer.occluded(scene, ro, rd, minT,
                                         jnp.full((B,), 10.0)))
    assert (occ_ref == occ_got).mean() > 0.999


def test_wavefront_matches_loop():
    """Refill wavefront == masked-loop integrator within MC tolerance."""
    import dataclasses
    import os
    if not os.path.isdir("/root/reference/scenes"):
        pytest.skip("reference scenes unavailable")
    from vimg_tpu.scene.json_loader import load_json_scene
    from vimg_tpu.render.render import render
    from vimg_tpu.render.wavefront import render_wavefront
    scene, st = load_json_scene(
        "/root/reference/scenes/cornell_box_spheres.json")
    scene = scene.replace(camera=dataclasses.replace(
        scene.camera, width=16, height=16))
    st = dataclasses.replace(st, width=16, height=16, spp=32, max_depth=12,
                             batch_size=1 << 13)
    img_loop = render(scene, st, integrator="mis")
    img_wf = render_wavefront(scene, st)
    assert not np.isnan(img_wf).any()
    d = np.abs(img_loop - img_wf).mean() / max(img_loop.mean(), 1e-9)
    assert d < 0.05, d
