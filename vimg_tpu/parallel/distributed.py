"""Multi-host launch helpers.

The reference is single-process (SURVEY §2.3: "no distributed layer
whatsoever"); for TPU pods this module wires `jax.distributed` so every host
joins one global mesh. Rays stay data-parallel across all chips of all
hosts (ICI within a slice, DCN across hosts is only touched by the final
film reduction and — for training — the gradient psum in diff/grad.py).

Typical pod launch (same command on every host):

    python -m vimg_tpu.cli -f scene.json --distributed
or
    from vimg_tpu.parallel.distributed import initialize, global_mesh
    initialize()                     # env-driven (TPU pod metadata)
    mesh = global_mesh()             # 1-D ("rays",) mesh over ALL devices
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Join the jax.distributed cluster. On Cloud TPU pods the arguments
    are discovered from the environment; pass them explicitly elsewhere."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
        kwargs["num_processes"] = int(
            num_processes or os.environ.get("JAX_NUM_PROCESSES", 1))
        kwargs["process_id"] = int(
            process_id or os.environ.get("JAX_PROCESS_ID", 0))
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        if kwargs:
            raise  # explicit config must work; env-less single host is fine


def global_mesh(axis="rays"):
    """1-D mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def split_spp(spp, nproc):
    """Partition ``spp`` samples into ``nproc`` disjoint (count, offset)
    slabs. Counts differ by at most 1 and cover spp exactly; each process's
    sample indices are [offset, offset+count) so RNG streams are disjoint
    (same scheme as render/checkpoint.py slabs)."""
    base, rem = divmod(spp, nproc)
    counts = [base + (1 if p < rem else 0) for p in range(nproc)]
    offsets = [p * base + min(p, rem) for p in range(nproc)]
    return list(zip(counts, offsets))


def render_distributed(scene, settings, tracer=None, integrator=None):
    """Full-frame render across all hosts: each process traces a DISJOINT
    slab of the per-pixel sample range (distinct RNG streams via
    sample_offset), then the sample-weighted films are summed across hosts.
    Every host returns the full image."""
    import dataclasses

    import jax.numpy as jnp

    from vimg_tpu.geometry.trace import make_tracer
    from vimg_tpu.parallel.sharding import render_sharded

    tracer = tracer or make_tracer(scene)
    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc == 1:
        return render_sharded(scene, settings, tracer, mesh=global_mesh(),
                              integrator=integrator)

    # disjoint sample slab per process; per-process local-mesh render, then
    # a cross-host sum of the sample-weighted partial films
    spp_local, sample_offset = split_spp(settings.spp, nproc)[pid]
    local_mesh = Mesh(np.asarray(jax.local_devices()), ("rays",))
    if spp_local > 0:
        local = dataclasses.replace(settings, spp=spp_local)
        img = render_sharded(scene, local, tracer, mesh=local_mesh,
                             integrator=integrator,
                             sample_offset=sample_offset)
        weighted = np.asarray(img) * spp_local
    else:  # more processes than samples: this host contributes nothing
        weighted = np.zeros((settings.height, settings.width, 3), np.float32)

    return reduce_films(weighted, settings.spp)


def reduce_films(weighted, total_spp):
    """Cross-host film reduction as an IN-NETWORK all-reduce.

    The round-2 combine was a `process_allgather` + host-side sum:
    O(hosts x WxHx3) DCN traffic to every host, then serial numpy adds —
    fine at 2 hosts, the wrong shape for a pod. Here each host's weighted
    partial film becomes one shard of a ("host",)-sharded global array and
    XLA reduces the sharded axis — a psum the runtime routes over ICI
    within a slice and DCN across, O(film) per link with in-network
    combining. Every host gets the replicated full frame back."""
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    nproc = jax.process_count()
    if nproc == 1:
        return np.asarray(weighted) / max(total_spp, 1)
    mesh = Mesh(np.asarray(jax.devices()).reshape(nproc, -1),
                ("host", "chip"))
    glob = multihost_utils.host_local_array_to_global_array(
        np.asarray(weighted)[None], mesh, P("host"))

    @jax.jit
    def reduce(x):
        # sum over the sharded host axis => XLA emits an all-reduce
        return jnp.sum(x, axis=0) / max(total_spp, 1)

    out = reduce(glob)
    local = multihost_utils.global_array_to_host_local_array(out, mesh, P())
    return np.asarray(local)
