"""Intersection kernel tests vs closed-form expectations."""
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.intersect import sphere_intersect, tri_intersect


def _b(x):
    return jnp.asarray(np.asarray(x, np.float32))


class TestTriangle:
    def test_direct_hit(self):
        ro = _b([[0, 0, -1]])
        rd = _b([[0, 0, 1]])
        p0, p1, p2 = _b([[-1, -1, 0]]), _b([[1, -1, 0]]), _b([[0, 1, 0]])
        t, u, v, w, ok = tri_intersect(ro, rd, p0, p1, p2, _b([1e-4]), _b([1e9]))
        assert bool(ok[0])
        assert abs(float(t[0]) - 1.0) < 1e-6
        assert abs(float(u[0] + v[0] + w[0]) - 1.0) < 1e-5

    def test_miss_outside(self):
        ro = _b([[5, 5, -1]])
        rd = _b([[0, 0, 1]])
        p0, p1, p2 = _b([[-1, -1, 0]]), _b([[1, -1, 0]]), _b([[0, 1, 0]])
        t, *_, ok = tri_intersect(ro, rd, p0, p1, p2, _b([1e-4]), _b([1e9]))
        assert not bool(ok[0])
        assert np.isinf(float(t[0]))

    def test_respects_maxT(self):
        ro = _b([[0, 0, -1]])
        rd = _b([[0, 0, 1]])
        p0, p1, p2 = _b([[-1, -1, 0]]), _b([[1, -1, 0]]), _b([[0, 1, 0]])
        t, *_, ok = tri_intersect(ro, rd, p0, p1, p2, _b([1e-4]), _b([0.5]))
        assert not bool(ok[0])

    def test_barycentric_interp(self):
        # ray hits exactly at p1 -> v ~ 1
        ro = _b([[1, -1, -1]])
        rd = _b([[0, 0, 1]])
        p0, p1, p2 = _b([[-1, -1, 0]]), _b([[1, -1, 0]]), _b([[0, 1, 0]])
        t, u, v, w, ok = tri_intersect(ro, rd, p0, p1, p2, _b([1e-4]), _b([1e9]))
        assert bool(ok[0])
        assert abs(float(v[0]) - 1.0) < 1e-4

    def test_batch_many_rays(self):
        n = 1000
        r = np.random.default_rng(0)
        # rays from z=-2 aimed at the triangle's plane
        xy = r.uniform(-2, 2, size=(n, 2)).astype(np.float32)
        ro = np.concatenate([xy, np.full((n, 1), -2, np.float32)], 1)
        rd = np.tile(np.asarray([[0, 0, 1]], np.float32), (n, 1))
        p0, p1, p2 = [-1, -1, 0], [1, -1, 0], [0, 1, 0]
        t, u, v, w, ok = tri_intersect(
            _b(ro), _b(rd), _b([p0]), _b([p1]), _b([p2]),
            _b(np.full(n, 1e-4)), _b(np.full(n, 1e9)))
        # check against half-plane tests for the triangle
        x, y = xy[:, 0], xy[:, 1]
        inside = (y >= -1) & (y <= 1 - 2 * np.abs(x) + (1 + y) * 0)
        # edges: from (-1,-1) to (0,1): y <= 2x+1 mirrored; use sign tests
        def edge(ax, ay, bx, by):
            return (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        e0 = edge(-1, -1, 1, -1)
        e1 = edge(1, -1, 0, 1)
        e2 = edge(0, 1, -1, -1)
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                 ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        assert (np.asarray(ok) == inside).mean() > 0.995  # boundary fuzz


class TestSphere:
    def test_direct_hit(self):
        t, ok = sphere_intersect(_b([[0, 0, -5]]), _b([[0, 0, 1]]),
                                 _b([[0, 0, 0]]), _b([1.0]),
                                 _b([1e-4]), _b([1e9]))
        assert bool(ok[0]) and abs(float(t[0]) - 4.0) < 1e-5

    def test_from_inside(self):
        t, ok = sphere_intersect(_b([[0, 0, 0]]), _b([[0, 0, 1]]),
                                 _b([[0, 0, 0]]), _b([1.0]),
                                 _b([1e-4]), _b([1e9]))
        assert bool(ok[0]) and abs(float(t[0]) - 1.0) < 1e-5

    def test_miss(self):
        t, ok = sphere_intersect(_b([[0, 5, -5]]), _b([[0, 0, 1]]),
                                 _b([[0, 0, 0]]), _b([1.0]),
                                 _b([1e-4]), _b([1e9]))
        assert not bool(ok[0])

    def test_grazing_precision(self):
        # large sphere far away — robust quadratic should not lose the hit
        t, ok = sphere_intersect(_b([[0, 0, 0]]), _b([[0, 0, 1]]),
                                 _b([[0, 0, 1000.0]]), _b([10.0]),
                                 _b([1e-4]), _b([1e9]))
        assert bool(ok[0]) and abs(float(t[0]) - 990.0) < 1e-2
