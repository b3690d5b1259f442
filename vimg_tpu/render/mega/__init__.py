"""Persistent Pallas megakernel renderer.

The round-1 wavefront keeps path state in HBM and pays XLA fusion-boundary
spills, per-channel film scatter-adds and refill cumsums every superstep
(measured floor ~7 ms / 128k lanes on v5e). This package removes the
skeleton entirely: one Pallas kernel runs the whole MIS path integrator for
a block of pixels, with

- one lane per pixel: each lane traces all spp paths of its pixel back to
  back (in-kernel regeneration == the wavefront's refill, minus the cumsum),
- all lane state resident in VMEM/vregs across the entire while_loop — zero
  HBM traffic per segment,
- the film "deposit" reduced to writing the lane accumulator to an aligned
  (rows, 128) output block — the scatter-adds vanish by construction,
- scene constants (<=64 prims, materials, lights, camera) in SMEM, read
  once before the loop and closure-captured into registers.

Public API: render_megakernel / supports_megakernel (see kernel.py).
"""
from vimg_tpu.render.mega.kernel import (render_megakernel,
                                         supports_megakernel)

__all__ = ["render_megakernel", "supports_megakernel"]
