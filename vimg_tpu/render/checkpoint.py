"""Accumulation-buffer checkpointing for long renders.

The reference renders one-shot with no recovery (SURVEY §5: "no retries, no
checkpoint of partial renders"). Here the counter-based RNG makes resume
trivial: radiance of sample s for pixel p depends only on (p, s), so a
checkpoint is just (accumulated film, samples_done). Renders proceed in
sample slabs; each completed slab atomically replaces the checkpoint file.
"""
from __future__ import annotations

import dataclasses
import hashlib
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
        out = dict(accum=z["accum"], spp_done=int(z["spp_done"]))
        if "digest" in z.files:
            out["digest"] = str(z["digest"])
        return out


def _takes_megakernel(scene, settings, use_wavefront):
    """Single source of truth for 'this render dispatches to the
    megakernel' — render_with_checkpoints (tracer prebuild decision) and
    _render_slab (dispatch) must agree or the eager tracer build is either
    repeated per slab or wasted."""
    import jax
    from vimg_tpu.render.mega import supports_megakernel
    from vimg_tpu.render.render import prefer_wavefront_for_mesh
    return (use_wavefront and settings.integrator in ("mis", "material")
            and jax.default_backend() != "cpu"
            and supports_megakernel(scene, settings)
            and not prefer_wavefront_for_mesh(scene, settings))


def _render_digest(scene, settings, use_wavefront, slab_spp):
    """Fingerprint of (scene, settings, renderer path): mixing slabs from
    a different scene/config — or from a different estimator path after a
    renderer upgrade — is near-parity but not bit-identical; refuse."""
    h = hashlib.sha256()
    # spp excluded: extending the sample target of an existing render is a
    # legitimate resume (slab streams depend on sample_offset, not total).
    # The renderer-path tag is computed at SLAB spp — that's what
    # _render_slab dispatches on.
    h.update(repr(dataclasses.astuple(
        dataclasses.replace(settings, spp=0))).encode())
    slab = dataclasses.replace(settings, spp=slab_spp)
    h.update(b"mega" if _takes_megakernel(scene, slab, use_wavefront)
             else b"wavefront")
    for name in ("verts", "tri_vidx", "sph_center", "sph_radius",
                 "mat_base", "mat_scalars", "light_type", "light_idx"):
        arr = getattr(scene, name, None)
        if arr is not None:
            h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
    return h.hexdigest()[:32]


def render_with_checkpoints(scene, settings, path, slab_spp=16, tracer=None,
                            progress=False, use_wavefront=True):
    """Render in sample slabs, checkpointing after each. Resumes from an
    existing checkpoint at ``path``. Returns the linear image."""
    # build the tracer ONCE, and only when a non-megakernel path will
    # actually serve the slabs (the megakernel packs its own tables; an
    # eager build would be wasted — and a per-slab build would repeat the
    # host acceleration-structure build slab_count times)
    if tracer is None and not _takes_megakernel(
            scene, dataclasses.replace(settings, spp=slab_spp),
            use_wavefront):
        from vimg_tpu.geometry.trace import make_tracer
        tracer = make_tracer(scene)
    W, H = settings.width, settings.height
    total_spp = settings.spp
    digest = _render_digest(scene, settings, use_wavefront, slab_spp)

    accum = np.zeros((H, W, 3), np.float32)
    done = 0
    ck = load_checkpoint(path)
    if ck is not None and ck["accum"].shape == accum.shape:
        if ck.get("digest") not in (None, digest):
            raise ValueError(
                f"checkpoint {path} was written by a different "
                f"scene/settings/renderer (digest {ck['digest']} != "
                f"{digest}); delete it or change the path")
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
        save_checkpoint(path, accum, done, meta=dict(digest=digest))
        if progress:
            print(f"checkpoint: {done}/{total_spp} spp")
    return accum / max(total_spp, 1)


def _render_slab(scene, settings, tracer, sample_offset=0,
                 use_wavefront=True):
    """One sample slab; sample ids are offset so RNG streams continue."""
    from vimg_tpu.render.render import render
    from vimg_tpu.render.wavefront import render_wavefront

    if _takes_megakernel(scene, settings, use_wavefront):
        from vimg_tpu.render.mega import render_megakernel
        return render_megakernel(scene, settings,
                                 sample_offset=sample_offset)
    if use_wavefront and settings.integrator == "mis":
        from vimg_tpu.geometry.trace import make_tracer
        tracer = tracer or make_tracer(scene)
        return render_wavefront(scene, settings, tracer=tracer,
                                sample_offset=sample_offset)
    from vimg_tpu.geometry.trace import make_tracer
    tracer = tracer or make_tracer(scene)
    return render(scene, settings, tracer=tracer,
                  sample_offset=sample_offset)
