"""Multi-chip scaling: shard the ray wavefront over a device mesh.

The reference's parallel runtime is an 8x8-tile thread pool over shared
memory (include/integrators.h:36-153). The TPU-native equivalent: rays are
data-parallel, the scene is replicated, and the only cross-chip
communication is the image-accumulation reduction (psum over ICI) — plus a
gradient psum for the differentiable path. Expressed with ``shard_map`` over
a 1-D ("rays",) mesh; multi-host meshes reuse the same code with
jax.distributed initialization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vimg_tpu.render.integrators import trace_radiance
from vimg_tpu.scene import ir


def make_mesh(devices=None, axis="rays"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_trace_fn(scene_template: ir.Scene, settings: ir.RenderSettings,
                     tracer, mesh: Mesh, integrator=None, bounded_depth=None):
    """Build a jitted function (scene, pix, samp) -> (B, 3) radiance with
    rays sharded over the mesh and the scene replicated."""
    axis = mesh.axis_names[0]

    def per_shard(scene, pix, samp):
        return trace_radiance(scene, settings, tracer, pix, samp,
                              integrator=integrator,
                              bounded_depth=bounded_depth)

    shard = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis))
    return jax.jit(shard)


def render_sharded(scene: ir.Scene, settings: ir.RenderSettings, tracer,
                   mesh=None, integrator=None, sample_offset=0):
    """Full-frame render with rays sharded across all devices.

    ``sample_offset`` shifts the per-pixel sample indices so disjoint slabs
    of a larger render (checkpoint slabs, per-process shards) draw disjoint
    RNG streams — radiance of (pixel, sample) depends only on that pair.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.size
    W, H, spp = settings.width, settings.height, settings.spp
    total = W * H * spp
    B = min(settings.batch_size or (1 << 20), total)
    B = ((B + n_dev - 1) // n_dev) * n_dev
    trace = sharded_trace_fn(scene, settings, tracer, mesh,
                             integrator=integrator)

    @jax.jit
    def accumulate(accum, pix, col, valid):
        return accum.at[pix].add(jnp.where(valid[:, None], col, 0.0))

    accum = jnp.zeros((W * H, 3), jnp.float32)
    n_chunks = (total + B - 1) // B
    for c in range(n_chunks):
        k = c * B + jnp.arange(B, dtype=jnp.int32)
        valid = k < total
        ks = jnp.where(valid, k, 0)
        pix = ks // spp
        samp = ks % spp + jnp.int32(sample_offset)
        col = trace(scene, pix, samp)
        accum = accumulate(accum, pix, col, valid)
    return np.asarray(accum).reshape(H, W, 3) / spp
