"""vimg_tpu — a TPU-native differentiable path tracer (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of the CPU ray tracer
``atom501/v-img`` (reference mounted at /root/reference) for TPU hardware:

- SoA everywhere: rays, hits, materials, lights and BVH nodes are flat
  device arrays, not object graphs.
- Wavefront-with-masks integration: ``lax.while_loop`` over bounces with
  per-ray active masks replaces divergent recursion.
- Stateless counter-based RNG (PCG4D hash keyed by pixel/sample/bounce/draw)
  replaces threaded PCG32 state (reference: include/rng/pcg_rand.h).
- Compiler-friendly control flow: everything under ``jit`` has static shapes.
- Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` over rays.
"""

__version__ = "0.1.0"

from vimg_tpu.core import math as vmath  # noqa: F401
from vimg_tpu.core import rng  # noqa: F401
