"""Frame renderer: chunks (pixel, sample) work over jitted wavefront
launches and accumulates into the film.

This replaces the reference's 8x8-tile thread pool (include/integrators.h:
36-153): on TPU the "tiles" are flat wavefronts of rays sized to fill the
chip; the progress thread becomes an optional per-chunk callback.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.geometry.trace import make_tracer
from vimg_tpu.render import film
from vimg_tpu.render.integrators import trace_radiance
from vimg_tpu.scene import ir


_CHUNK_CACHE = {}


def _cached_chunk_step(settings, tracer, integrator, B, total):
    """The jitted chunk step is cached per static configuration — a fresh
    closure per render() call would retrace AND recompile every frame
    (the scene rides as a traced argument, so scene-parameter changes do
    NOT invalidate the cache)."""
    spp = settings.spp
    key = (id(tracer), settings, integrator, B, total)
    hit = _CHUNK_CACHE.get(key)
    if hit is not None and hit[0] is tracer:
        return hit[1]

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk_step(scene, accum, k0, samp_off):
        k = k0 + jnp.arange(B, dtype=jnp.int32)
        valid = k < total
        ks = jnp.where(valid, k, 0)
        pix = ks // spp
        samp = ks % spp + samp_off
        col = trace_radiance(scene, settings, tracer, pix, samp,
                             integrator=integrator)
        col = jnp.where(valid[:, None], col, 0.0)
        return accum.at[pix].add(col)

    if len(_CHUNK_CACHE) > 16:
        _CHUNK_CACHE.clear()
    _CHUNK_CACHE[key] = (tracer, chunk_step)
    return chunk_step


def render(scene: ir.Scene, settings: ir.RenderSettings, tracer=None,
           progress=False, integrator=None, sample_offset=0):
    """Render a full frame. Returns linear (H, W, 3) float32 numpy array.

    ``sample_offset`` shifts the per-pixel sample indices (and therefore
    every RNG stream) — used by checkpoint slabs to continue a render.
    """
    W, H = settings.width, settings.height
    spp = settings.spp
    tracer = tracer or make_tracer(scene)

    total = W * H * spp
    B = min(settings.batch_size or (1 << 20), total)
    n_chunks = (total + B - 1) // B
    chunk_step = _cached_chunk_step(settings, tracer, integrator, B, total)

    accum = jnp.zeros((W * H, 3), jnp.float32)
    t0 = time.time()
    for c in range(n_chunks):
        accum = chunk_step(scene, accum, jnp.int32(c * B),
                           jnp.int32(sample_offset))
        if progress:
            accum.block_until_ready()
            done = min((c + 1) * B, total)
            rate = done / max(time.time() - t0, 1e-9)
            print(f"\r{100.0 * done / total:.2f} % done "
                  f"({rate / 1e6:.2f} Mpaths/s)", end="", flush=True)
    if progress:
        print("\nRender Completed")

    img = np.asarray(accum).reshape(H, W, 3) / spp
    return img


MESH_WAVEFRONT_MIN_SPP = 8


def prefer_wavefront_for_mesh(scene, settings):
    """Round-3 dispatch fact (bench_records/r3_probe_f.json + session
    logs): at production sample counts the refill wavefront +
    ClusterTracer beats the mesh megakernel on mesh scenes (terrain 100k
    0.62 vs 0.45, bumpy 0.54 vs 0.34, streamed terrain 500k 0.20 vs 0.13
    Mpaths/s) — global Morton-sorted batches at full occupancy amortize
    better than pixel-tile lanes once spp covers the refill ramp. At very
    low spp the megakernel's zero-skeleton superstep still wins."""
    return (scene.n_tris() > 64
            and settings.spp >= MESH_WAVEFRONT_MIN_SPP
            and settings.integrator == "mis")


def render_frame(scene, settings, tracer=None, progress=False,
                 integrator=None, use_wavefront=True, tracer_force=None):
    """Render dispatch: the Pallas megakernel for supported analytic MIS
    scenes on accelerators, the persistent wavefront (with the Pallas
    ClusterTracer) for mesh/env/texture MIS frames, the chunked loop
    renderer otherwise.

    ``tracer`` is only consumed by the non-megakernel paths — build it
    lazily (or pass ``tracer_force`` and let the dispatch build it) so the
    megakernel path doesn't pay a wasted host acceleration-structure
    build."""
    name = integrator or settings.integrator
    if use_wavefront and name in ("mis", "material"):
        import dataclasses
        from vimg_tpu.render.mega import (render_megakernel,
                                          supports_megakernel)
        st = settings if integrator is None else dataclasses.replace(
            settings, integrator=name)
        # on CPU the megakernel only runs interpreted (slow) — keep it for
        # tests; production CPU renders use the XLA wavefront
        if (jax.default_backend() != "cpu"
                and supports_megakernel(scene, st)
                and not prefer_wavefront_for_mesh(scene, st)):
            return render_megakernel(scene, st, progress=progress)
        if name == "mis":
            from vimg_tpu.render.wavefront import render_wavefront
            tracer = tracer or make_tracer(scene, force=tracer_force)
            return render_wavefront(scene, settings, tracer=tracer,
                                    progress=progress)
    tracer = tracer or make_tracer(scene, force=tracer_force)
    return render(scene, settings, tracer=tracer, progress=progress,
                  integrator=integrator)


def render_to_png(scene, settings, path, **kw):
    img = render_frame(scene, settings, **kw)
    out = film.finalize(jnp.asarray(img), tonemap=settings.tonemap)
    film.write_png(path, out)
    return img
