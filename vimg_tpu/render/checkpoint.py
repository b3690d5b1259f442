"""Accumulation-buffer checkpointing for long renders.

The reference renders one-shot with no recovery (SURVEY §5: "no retries, no
checkpoint of partial renders"). Here the counter-based RNG makes resume
trivial: radiance of sample s for pixel p depends only on (p, s), so a
checkpoint is just (accumulated film, samples_done). Renders proceed in
sample slabs; each completed slab atomically replaces the checkpoint file.
"""
from __future__ import annotations

import dataclasses
import os
import tempfile

import numpy as np


def save_checkpoint(path, accum, spp_done, meta=None):
    """Atomic write of the accumulation state."""
    d = os.path.dirname(os.path.abspath(path)) or "."
    # suffix ends in .npz so np.savez writes INTO tmp (no second file to leak)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp.npz")
    os.close(fd)
    np.savez(tmp, accum=np.asarray(accum), spp_done=np.int64(spp_done),
             **(meta or {}))
    os.replace(tmp, path)


def load_checkpoint(path):
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return dict(accum=z["accum"], spp_done=int(z["spp_done"]))


def render_with_checkpoints(scene, settings, path, slab_spp=16, tracer=None,
                            progress=False, use_wavefront=True):
    """Render in sample slabs, checkpointing after each. Resumes from an
    existing checkpoint at ``path``. Returns the linear image."""
    # build the tracer ONCE, and only when a non-megakernel path will
    # actually serve the slabs (the megakernel packs its own tables; an
    # eager build would be wasted — and a per-slab build would repeat the
    # host acceleration-structure build slab_count times)
    import jax
    from vimg_tpu.render.mega import supports_megakernel
    if tracer is None and not (
            use_wavefront and settings.integrator in ("mis", "material")
            and jax.default_backend() != "cpu"
            and supports_megakernel(scene, settings)):
        from vimg_tpu.geometry.trace import make_tracer
        tracer = make_tracer(scene)
    W, H = settings.width, settings.height
    total_spp = settings.spp

    accum = np.zeros((H, W, 3), np.float32)
    done = 0
    ck = load_checkpoint(path)
    if ck is not None and ck["accum"].shape == accum.shape:
        accum = ck["accum"].astype(np.float32)
        done = min(ck["spp_done"], total_spp)
        if progress:
            print(f"resumed at {done}/{total_spp} spp")

    while done < total_spp:
        n = min(slab_spp, total_spp - done)
        slab = dataclasses.replace(settings, spp=n)
        # shift sample indices so slab k continues the global RNG streams
        img = _render_slab(scene, slab, tracer, sample_offset=done,
                           use_wavefront=use_wavefront)
        accum += img * n
        done += n
        save_checkpoint(path, accum, done)
        if progress:
            print(f"checkpoint: {done}/{total_spp} spp")
    return accum / max(total_spp, 1)


def _render_slab(scene, settings, tracer, sample_offset=0,
                 use_wavefront=True):
    """One sample slab; sample ids are offset so RNG streams continue."""
    import jax
    from vimg_tpu.render.render import render
    from vimg_tpu.render.wavefront import render_wavefront

    if use_wavefront and settings.integrator in ("mis", "material"):
        from vimg_tpu.render.mega import (render_megakernel,
                                          supports_megakernel)
        if (jax.default_backend() != "cpu"
                and supports_megakernel(scene, settings)):
            return render_megakernel(scene, settings,
                                     sample_offset=sample_offset)
        if settings.integrator == "mis":
            from vimg_tpu.geometry.trace import make_tracer
            tracer = tracer or make_tracer(scene)
            return render_wavefront(scene, settings, tracer=tracer,
                                    sample_offset=sample_offset)
    from vimg_tpu.geometry.trace import make_tracer
    tracer = tracer or make_tracer(scene)
    return render(scene, settings, tracer=tracer,
                  sample_offset=sample_offset)
