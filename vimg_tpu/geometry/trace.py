"""Tracer facade: picks the intersection backend for a scene.

Small analytic scenes (the reference's json scenes are < 32 primitives) use
dense brute-force tests — on TPU a (rays x prims) vectorized test beats any
divergent traversal. Mesh scenes use the BVH backend (vimg_tpu.geometry.bvh)
with threaded (skip-link) traversal.
"""
from __future__ import annotations

from vimg_tpu.geometry import intersect
from vimg_tpu.scene import ir

BRUTE_FORCE_MAX_PRIMS = 64


class BruteForceTracer:
    """Dense all-primitives intersection."""

    def __init__(self, scene: ir.Scene):
        self.scene = scene

    def closest(self, scene, ro, rd, minT, maxT) -> intersect.HitResult:
        return intersect.intersect_bruteforce(scene, ro, rd, minT, maxT)

    def occluded(self, scene, ro, rd, minT, maxT):
        return intersect.occlude_bruteforce(scene, ro, rd, minT, maxT)


def make_tracer(scene: ir.Scene, force=None, differentiable=False):
    """Pick the intersection backend.

    ``differentiable=True`` is satisfied by every backend since round 3:
    the Pallas ClusterTracer detaches its traversal inputs (zero-tangent
    semantics — exactly the detached-sampling estimator's treatment of
    discrete traversal), so mesh gradient renders run at full tracer
    speed instead of falling back to the gather-bound skip-link walk.
    """
    import jax
    n_prims = scene.n_tris() + scene.n_spheres()
    if force == "brute":
        return BruteForceTracer(scene)
    if force == "mxu":
        # parked formulation note: this platform's matmul paths cap at
        # ~2e-3 rel error — NOT a production backend (see mxu_intersect)
        import warnings
        warnings.warn("force='mxu' is an experimental formulation with "
                      "~2e-3 intersection error on this platform; use "
                      "'soa'/'cluster' for production renders")
        from vimg_tpu.geometry.mxu_intersect import MXUBruteForceTracer
        return MXUBruteForceTracer(scene)
    if force == "soa" or (force is None and n_prims <= BRUTE_FORCE_MAX_PRIMS):
        # flop-lean fused formulation; exact f32
        from vimg_tpu.geometry.soa_intersect import SoATracer
        return SoATracer(scene)
    if force == "bvh":
        return BVHTracer_lazy(scene, None)
    if force == "packet":
        # ray-packet mesh backend (8 sorted rays x 128 cluster tris per
        # VPU op): exact-parity alternative to the cluster walk, measured
        # slower e2e on the round-4 workloads (ROADMAP round-4 findings)
        # — opt-in for workloads/toolchains where the trade flips
        from vimg_tpu.geometry.packet_trace import PacketTracer
        return PacketTracer(scene)
    if force == "cluster" or (force is None
                              and scene.n_tris() > 0
                              # unrolled per-sphere merge: gate like the
                              # megakernel does (kernel.py n_spheres<=64)
                              and scene.n_spheres() <= 64
                              and jax.default_backend() != "cpu"):
        # TPU mesh path: Pallas treelet-cluster streaming — dense VPU
        # work only, no per-lane gathers (geometry/cluster_trace.py)
        from vimg_tpu.geometry.cluster_trace import ClusterTracer
        return ClusterTracer(scene)
    return BVHTracer_lazy(scene, force)


def BVHTracer_lazy(scene, force):
    from vimg_tpu.geometry.bvh import BVHTracer
    return BVHTracer(scene, builder="sweep" if force == "sweep" else "auto")
