"""PacketTracer parity vs ClusterTracer (CPU interpret mode).

The packet kernel is an alternative TPU mesh backend (8 sorted rays per
packet x 128 cluster tris per VPU op; see geometry/packet_trace.py). It
must produce the SAME hits as the cluster walk: same SAH tree, same
treelet cut, same watertight-constants formulation.

The bake-off is decided (the cluster walk won, ROADMAP round-4 notes),
so only the slist closest/occluded pair runs as a default smoke test;
the f2b variant and the interleaved-walks partition check are nightly
(VIMG_SLOW_TESTS=1) — interpret-mode packet fixtures cost minutes each
and the backends they pin are non-production.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

nightly = pytest.mark.skipif(
    not os.environ.get("VIMG_SLOW_TESTS"),
    reason="nightly parity fixture for a non-production backend "
           "(set VIMG_SLOW_TESTS=1)")

from vimg_tpu.geometry.cluster_trace import ClusterTracer
from vimg_tpu.geometry.packet_trace import PacketTracer
from vimg_tpu.scene.synthetic import terrain_scene


@pytest.fixture(scope="module")
def small_mesh():
    # interpret-mode kernel cost scales with B x clusters x variants —
    # keep this tight so the suite stays within its CI budget
    scene = terrain_scene(450, width=32, height=16)
    rs = np.random.RandomState(3)
    B = 128
    lo = np.asarray(scene.verts).min(0)
    hi = np.asarray(scene.verts).max(0)
    ro = jnp.asarray(lo + rs.rand(B, 3) * (hi - lo)
                     + np.array([0, 1.5, 0]), jnp.float32)
    rd = rs.randn(B, 3)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return scene, ro, jnp.asarray(rd, jnp.float32)


@pytest.mark.parametrize("variant", ["slist", pytest.param("f2b", marks=nightly)])
def test_closest_parity(small_mesh, variant):
    scene, ro, rd = small_mesh
    B = ro.shape[0]
    minT = jnp.full((B,), 1e-3)
    maxT = jnp.full((B,), jnp.inf)
    hc = ClusterTracer(scene).closest(scene, ro, rd, minT, maxT)
    hp = PacketTracer(scene, variant=variant).closest(
        scene, ro, rd, minT, maxT)
    assert bool(jnp.all(jnp.isfinite(hp.t) == jnp.isfinite(hc.t)))
    assert bool(jnp.all(hp.prim_id == hc.prim_id))
    hit = jnp.isfinite(hc.t)
    assert float(jnp.max(jnp.where(hit, jnp.abs(hp.t - hc.t), 0.0))) < 1e-4
    # barycentrics reconstructed in XLA from the winning tri
    assert float(jnp.max(jnp.where(hit, jnp.abs(hp.u - hc.u), 0.0))) < 1e-4
    assert float(jnp.max(jnp.where(hit, jnp.abs(hp.v - hc.v), 0.0))) < 1e-4


@pytest.mark.parametrize("variant", ["slist", pytest.param("f2b", marks=nightly)])
def test_occluded_parity(small_mesh, variant):
    scene, ro, rd = small_mesh
    B = ro.shape[0]
    minT = jnp.full((B,), 1e-3)
    maxT = jnp.full((B,), 4.0)
    oc = ClusterTracer(scene).occluded(scene, ro, rd, minT, maxT)
    op = PacketTracer(scene, variant=variant).occluded(
        scene, ro, rd, minT, maxT)
    assert bool(jnp.all(oc == op))


@nightly
def test_cluster_walks_partition_exact(small_mesh):
    """walks=2 (interleaved independent tile walks) is bit-exact vs the
    single-walk kernel."""
    scene, ro, rd = small_mesh
    B = ro.shape[0]
    minT = jnp.full((B,), 1e-3)
    maxT = jnp.full((B,), jnp.inf)
    # group_gate defaults off on CPU (interpret speed); walks needs the
    # per-group partition, so force it on for both sides of the compare
    # (tile_rows=16 keeps the interpreted per-group python cost small)
    c1 = ClusterTracer(scene, group_gate=True, tile_rows=16)
    c2 = ClusterTracer(scene, group_gate=True, tile_rows=16, walks=2)
    h1 = c1.closest(scene, ro, rd, minT, maxT)
    h2 = c2.closest(scene, ro, rd, minT, maxT)
    assert bool(jnp.all(h1.t == h2.t))
    assert bool(jnp.all(h1.prim_id == h2.prim_id))
    o1 = c1.occluded(scene, ro, rd, minT, jnp.full((B,), 4.0))
    o2 = c2.occluded(scene, ro, rd, minT, jnp.full((B,), 4.0))
    assert bool(jnp.all(o1 == o2))
