"""Gradient and multi-device sharding tests (8-device virtual CPU mesh)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vimg_tpu.diff.grad import apply_params, get_params, radiance_loss_fn
from vimg_tpu.geometry.trace import make_tracer
from vimg_tpu.scene import ir
from vimg_tpu.scene.json_loader import SceneBuilder
from vimg_tpu.render.camera import Camera
from vimg_tpu.core.math import look_at


def _simple_scene(spp=16, integrator="mis"):
    b = SceneBuilder()
    red = b.add_material(ir.MAT_LAMBERTIAN, base=(0.8, 0.2, 0.2))
    light = b.add_material(ir.MAT_DIFFUSE_LIGHT, base=(5.0, 5.0, 5.0))
    b.add_sphere((0, 0, 0), 1.0, red)
    b.add_sphere((0, 3.0, 0), 1.0, light)
    cam = Camera.make(look_at([0, 0, 5], [0, 0, 0], [0, 1, 0]), 16, 16, 45.0)
    scene = b.build(camera=cam)
    settings = ir.RenderSettings(width=16, height=16, spp=spp, max_depth=6,
                                 integrator=integrator, batch_size=16 * 16 * spp)
    return scene, settings


class TestGradients:
    def test_albedo_gradient_matches_fd(self):
        """Gradient of mean radiance w.r.t. albedo vs finite differences."""
        scene, settings = _simple_scene()
        tracer = make_tracer(scene)
        B = 16 * 16 * 4
        pix = jnp.arange(B, dtype=jnp.int32) % (16 * 16)
        samp = jnp.arange(B, dtype=jnp.int32) // (16 * 16)
        target = jnp.zeros((B, 3))

        def loss(params):
            s = apply_params(scene, params)
            return radiance_loss_fn(s, settings, tracer, pix, samp, target,
                                    bounded_depth=3, integrator="mis")

        params = get_params(scene)
        g = jax.grad(loss)(params)
        g_albedo = np.asarray(g["mat_base"])[0]
        assert np.all(np.isfinite(g_albedo))
        # finite difference on the red channel of material 0
        eps = 1e-2
        p_plus = dict(params)
        mb = np.asarray(params["mat_base"]).copy()
        mb[0, 0] += eps
        p_plus["mat_base"] = jnp.asarray(mb)
        mb2 = np.asarray(params["mat_base"]).copy()
        mb2[0, 0] -= eps
        p_minus = dict(params)
        p_minus["mat_base"] = jnp.asarray(mb2)
        fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
        ad = float(g_albedo[0])
        # same RNG keys on all evals -> estimator is deterministic in params,
        # so FD and AD must agree tightly
        assert abs(fd - ad) < 0.05 * max(abs(fd), abs(ad), 1e-3), (fd, ad)

    def test_emission_gradient_nonzero(self):
        scene, settings = _simple_scene()
        tracer = make_tracer(scene)
        B = 256
        pix = jnp.arange(B, dtype=jnp.int32)
        samp = jnp.zeros((B,), jnp.int32)
        target = jnp.zeros((B, 3))

        def loss(params):
            s = apply_params(scene, params)
            return radiance_loss_fn(s, settings, tracer, pix, samp, target,
                                    bounded_depth=3, integrator="mis")

        g = jax.grad(loss)(get_params(scene))
        g_emit = np.asarray(g["mat_base"])[1]
        assert np.any(g_emit != 0.0)
        assert np.all(np.isfinite(g_emit))


class TestSharding:
    def test_sharded_matches_single(self):
        from jax.sharding import Mesh
        from vimg_tpu.parallel.sharding import sharded_trace_fn
        from vimg_tpu.render.integrators import trace_radiance

        scene, settings = _simple_scene(spp=4)
        tracer = make_tracer(scene)
        n = min(8, len(jax.devices()))
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("rays",))
        B = 64 * n
        pix = jnp.arange(B, dtype=jnp.int32) % 256
        samp = jnp.zeros((B,), jnp.int32)

        f = sharded_trace_fn(scene, settings, tracer, mesh, integrator="mis")
        col_sharded = np.asarray(f(scene, pix, samp))
        col_single = np.asarray(trace_radiance(
            scene, settings, tracer, pix, samp, integrator="mis"))
        assert np.allclose(col_sharded, col_single, atol=1e-5)

    def test_train_step_sharded(self):
        from jax.sharding import Mesh
        from vimg_tpu.diff.grad import make_train_step

        scene, settings = _simple_scene(spp=1)
        tracer = make_tracer(scene)
        n = min(8, len(jax.devices()))
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("rays",))
        step, opt_state, params = make_train_step(
            scene, settings, tracer, bounded_depth=2, mesh=mesh)
        B = 32 * n
        pix = jnp.arange(B, dtype=jnp.int32) % 256
        samp = jnp.zeros((B,), jnp.int32)
        target = jnp.full((B, 3), 0.1)
        params2, opt_state, loss = step(params, opt_state, pix, samp, target)
        assert np.isfinite(float(loss))
        # params actually moved
        assert not np.allclose(np.asarray(params2["mat_base"]),
                               np.asarray(params["mat_base"]))


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (4096, 3)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dryrun_multichip(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(4)


def _closeup_scene():
    """Sphere filling the whole frame: no silhouette edges, so the
    interior-derivative (detached-sampling) camera gradient matches FD.
    (With silhouettes in frame, FD additionally sees the boundary term that
    detached AD by construction omits.)"""
    b = SceneBuilder()
    red = b.add_material(ir.MAT_LAMBERTIAN, base=(0.8, 0.2, 0.2))
    light = b.add_material(ir.MAT_DIFFUSE_LIGHT, base=(5.0, 5.0, 5.0))
    b.add_sphere((0, 0, 0), 1.0, red)
    b.add_sphere((0, 3.0, 0), 1.0, light)
    cam = Camera.make(look_at([0, 0, 1.6], [0, 0, 0], [0, 1, 0]), 16, 16, 40.0)
    scene = b.build(camera=cam)
    settings = ir.RenderSettings(width=16, height=16, spp=16, max_depth=6,
                                 integrator="mis", batch_size=16 * 16 * 16)
    return scene, settings


class TestCameraGradients:
    def test_vfov_gradient_matches_fd(self):
        """North star: pixel gradients flow to the camera. FD check on vfov
        (reference camera being differentiated: src/tl_camera.cpp:25-53)."""
        scene, settings = _closeup_scene()
        tracer = make_tracer(scene)
        B = 16 * 16
        pix = jnp.arange(B, dtype=jnp.int32)
        samp = jnp.zeros((B,), jnp.int32)
        target = jnp.zeros((B, 3))

        def loss(params):
            s = apply_params(scene, params)
            return radiance_loss_fn(s, settings, tracer, pix, samp, target,
                                    bounded_depth=3, integrator="mis")

        params = get_params(scene)
        assert "cam_vfov" in params and "cam2world" in params
        g = jax.grad(loss)(params)
        ad = float(g["cam_vfov"])
        assert np.isfinite(ad) and ad != 0.0
        eps = 1e-2
        p_plus = dict(params, cam_vfov=params["cam_vfov"] + eps)
        p_minus = dict(params, cam_vfov=params["cam_vfov"] - eps)
        fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
        assert abs(fd - ad) < 0.12 * max(abs(fd), abs(ad), 1e-4), (fd, ad)

    def test_pose_gradient_finite_nonzero(self):
        scene, settings = _simple_scene()
        tracer = make_tracer(scene)
        B = 256
        pix = jnp.arange(B, dtype=jnp.int32)
        samp = jnp.zeros((B,), jnp.int32)
        target = jnp.zeros((B, 3))

        def loss(params):
            s = apply_params(scene, params)
            return radiance_loss_fn(s, settings, tracer, pix, samp, target,
                                    bounded_depth=2, integrator="mis")

        g = jax.grad(loss)(get_params(scene))
        gc = np.asarray(g["cam2world"])
        assert np.all(np.isfinite(gc)) and np.any(gc != 0.0)


class TestDistributedSampling:
    def test_split_spp_disjoint_cover(self):
        from vimg_tpu.parallel.distributed import split_spp
        for spp, nproc in [(512, 4), (7, 3), (5, 8), (1, 1), (16, 16)]:
            slabs = split_spp(spp, nproc)
            ids = []
            for count, off in slabs:
                ids.extend(range(off, off + count))
            assert sorted(ids) == list(range(spp)), (spp, nproc, slabs)

    def test_sharded_sample_offset_combines(self):
        """Two disjoint sample slabs must equal one render at the full spp
        (this is the multi-host partitioning contract, distributed.py)."""
        import dataclasses
        from vimg_tpu.parallel.sharding import make_mesh, render_sharded

        scene, settings = _simple_scene(spp=4)
        tracer = make_tracer(scene)
        mesh = make_mesh()
        full = render_sharded(scene, settings, tracer, mesh=mesh)
        half = dataclasses.replace(settings, spp=2)
        a = render_sharded(scene, half, tracer, mesh=mesh, sample_offset=0)
        b = render_sharded(scene, half, tracer, mesh=mesh, sample_offset=2)
        combined = (a * 2 + b * 2) / 4
        assert np.allclose(combined, full, atol=1e-5)

    def test_sharded_offset_streams_differ(self):
        import dataclasses
        from vimg_tpu.parallel.sharding import make_mesh, render_sharded

        scene, settings = _simple_scene(spp=2)
        tracer = make_tracer(scene)
        mesh = make_mesh()
        one = dataclasses.replace(settings, spp=1)
        a = render_sharded(scene, one, tracer, mesh=mesh, sample_offset=0)
        b = render_sharded(scene, one, tracer, mesh=mesh, sample_offset=1)
        assert not np.allclose(a, b)
