"""Unit tests for core math, RNG, warps, camera."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vimg_tpu.core import rng, warps
from vimg_tpu.core.math import (dot, look_at, normalize, onb_from_normal,
                                onb_to_world, world_to_onb)
from vimg_tpu.render.camera import Camera, generate_rays


def _rand_dirs(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestONB:
    def test_orthonormal(self):
        n = jnp.asarray(_rand_dirs(1000))
        u, v = onb_from_normal(n)
        # f32 precision degrades near the -z pole (a = 1/(1+nz) blows up)
        assert np.allclose(dot(u, v), 0, atol=3e-4)
        assert np.allclose(dot(u, n), 0, atol=3e-4)
        assert np.allclose(dot(v, n), 0, atol=3e-4)
        assert np.allclose(np.sum(np.asarray(u) ** 2, -1), 1, atol=1e-3)

    def test_singular_pole(self):
        n = jnp.asarray([[0.0, 0.0, -1.0]])
        u, v = onb_from_normal(n)
        assert np.allclose(u, [[0, -1, 0]])
        assert np.allclose(v, [[-1, 0, 0]])

    def test_roundtrip(self):
        n = jnp.asarray(_rand_dirs(100))
        u, v = onb_from_normal(n)
        d = jnp.asarray(_rand_dirs(100, seed=1))
        local = world_to_onb(u, v, n, d)
        back = onb_to_world(u, v, n, local)
        assert np.allclose(back, d, atol=1e-3)


class TestRNG:
    def test_uniform_range_and_mean(self):
        i = jnp.arange(100000)
        r1, r2, r3, r4 = rng.uniform4(i, 0, 0, 0)
        for r in (r1, r2, r3, r4):
            r = np.asarray(r)
            assert r.min() >= 0.0 and r.max() < 1.0
            assert abs(r.mean() - 0.5) < 0.01

    def test_streams_decorrelated(self):
        i = jnp.arange(10000)
        a = np.asarray(rng.uniform1(i, 0, 0, 0))
        b = np.asarray(rng.uniform1(i, 0, 0, 1))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.05

    def test_r2_matches_reference_formula(self):
        x, y = rng.r2_sequence(jnp.asarray([0, 1, 2, 100]))
        g = 1.32471795724474602596
        a1, a2 = 1 - 1 / g, 1 - 1 / (g * g)
        for i, n in enumerate([0, 1, 2, 100]):
            assert abs(float(x[i]) - (np.float32(a1) * np.float32(n)) % 1.0) < 2e-5
            assert abs(float(y[i]) - (np.float32(a2) * np.float32(n)) % 1.0) < 2e-5


class TestWarps:
    def _u(self, n, seed=0):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.random(n, dtype=np.float32)), \
            jnp.asarray(r.random(n, dtype=np.float32))

    def test_sphere_uniform(self):
        r1, r2 = self._u(200000)
        d = np.asarray(warps.sample_sphere(r1, r2))
        assert np.allclose(np.linalg.norm(d, axis=1), 1, atol=1e-4)
        assert np.abs(d.mean(0)).max() < 0.01

    def test_cosine_hemisphere_pdf(self):
        # E[cos theta] under cos-weighted pdf = 2/3
        r1, r2 = self._u(200000)
        d = np.asarray(warps.sample_hemisphere_cosine(r1, r2))
        assert (d[:, 2] >= 0).all()
        assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.005

    def test_sphere_cap(self):
        r1, r2 = self._u(100000)
        cap = np.asarray(warps.sample_sphere_cap(r1, r2, 0.8))
        assert cap[:, 2].min() >= 0.8 - 1e-4

    def test_triangle_uv(self):
        r1, r2 = self._u(100000)
        u, v = warps.sample_triangle_uv(r1, r2)
        u, v = np.asarray(u), np.asarray(v)
        w = 1 - u - v
        assert (u >= 0).all() and (v >= 0).all() and (w >= -1e-6).all()
        # uniform over the triangle: mean barycentric = 1/3 each
        assert abs(u.mean() - 1 / 3) < 0.01
        assert abs(v.mean() - 1 / 3) < 0.01


class TestCamera:
    def test_center_ray_points_at_target(self):
        c2w = look_at([278, 278, -800], [278, 278, 0], [0, 1, 0])
        cam = Camera.make(c2w, 800, 800, 40.0)
        o, d, cw, cs = generate_rays(
            cam, jnp.asarray([400.0]), jnp.asarray([400.0]),
            jnp.zeros(1), jnp.zeros(1))
        assert np.allclose(o, [[278, 278, -800]], atol=1e-3)
        assert np.allclose(d, [[0, 0, 1]], atol=1e-3)

    def test_fov_edge(self):
        # top edge of image should be vfov/2 above the axis
        c2w = look_at([0, 0, 0], [0, 0, -1], [0, 1, 0])
        cam = Camera.make(c2w, 100, 100, 90.0)
        o, d, _, _ = generate_rays(
            cam, jnp.asarray([50.0]), jnp.asarray([100.0]),
            jnp.zeros(1), jnp.zeros(1))
        # tan(45 deg) = 1 -> direction (0, 1, -1)/sqrt(2)
        assert np.allclose(d, [[0, 1, -1] / np.sqrt(2)], atol=1e-4)

    def test_cone_spread(self):
        c2w = np.eye(4, dtype=np.float32)
        cam = Camera.make(c2w, 800, 800, 40.0)
        _, _, cw, cs = generate_rays(cam, jnp.asarray([1.0]),
                                     jnp.asarray([1.0]), jnp.zeros(1),
                                     jnp.zeros(1))
        expect = np.arctan(2 * np.tan(np.radians(40) / 2) / 800)
        assert np.allclose(cs, expect, atol=1e-6)
        assert np.allclose(cw, 0.0)
