"""One-process TPU session: full-res parity artifact + mesh wavefront diag.

1. disney_spheres 1800x800 @ 512 spp (the reference's exact headline
   config) on the megakernel, AgX-tonemapped, written to
   artifacts/disney_spheres_agx_512_tpu.png with pixel metrics vs the
   reference's shipped render (VERDICT round-1 weak #5: no full-res
   parity artifact existed).
2. mesh wavefront e2e diagnostic: superstep count + per-phase cost on the
   100k-tri synthetic scene, to explain the 25 us/ray e2e number
   (standalone cluster tracer: ~1.5 us/lane-slot).

Usage: python tools/tpu_artifact.py [--skip artifact,meshdiag]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

RESULTS = {}
OUT = "/tmp/tpu_artifact.json"


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def log(msg):
    print(msg, flush=True)


def artifact():
    from PIL import Image
    from vimg_tpu.render.film import finalize
    from vimg_tpu.render.mega import render_megakernel
    from vimg_tpu.scene.json_loader import load_json_scene

    scene, st = load_json_scene("/root/reference/scenes/disney_spheres.json")
    st = dataclasses.replace(st, spp=512)
    t0 = time.time()
    img, stats = render_megakernel(scene, st, rows=32, return_stats=True)
    wall = time.time() - t0
    srgb = np.asarray(finalize(np.asarray(img), "agx"))
    out_p = "/root/repo/artifacts/disney_spheres_agx_512_tpu.png"
    os.makedirs(os.path.dirname(out_p), exist_ok=True)
    Image.fromarray((np.clip(srgb, 0, 1) * 255 + 0.5).astype(np.uint8)
                    ).save(out_p)

    ref_p = "/root/reference/renders/disney_spheres_agx_512.png"
    ref = np.asarray(Image.open(ref_p).convert("RGB"), np.float32) / 255.0
    if ref.shape[:2] != srgb.shape[:2]:
        im = Image.fromarray((np.clip(srgb, 0, 1) * 255 + 0.5)
                             .astype(np.uint8))
        im = im.resize((ref.shape[1], ref.shape[0]), Image.BILINEAR)
        srgb_c = np.asarray(im, np.float32) / 255.0
    else:
        srgb_c = srgb
    d = np.abs(srgb_c - ref)
    mse = float((d ** 2).mean())
    RESULTS["artifact"] = dict(
        seconds=round(stats["seconds"], 3), wall=round(wall, 1),
        mpaths=round(1800 * 800 * 512 / stats["seconds"] / 1e6, 2),
        ref_shape=list(ref.shape), out_shape=list(srgb.shape),
        mean_abs=round(float(d.mean()), 5),
        p99_abs=round(float(np.quantile(d, 0.99)), 5),
        psnr=round(10 * np.log10(1.0 / max(mse, 1e-12)), 2),
        corr=round(float(np.corrcoef(srgb_c.ravel(), ref.ravel())[0, 1]), 5))
    log(f"artifact: {RESULTS['artifact']}")
    save()


def meshdiag(T=100_000, spp=4, W=512, H=256):
    import jax.numpy as jnp
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render.wavefront import render_wavefront
    from vimg_tpu.scene import ir as _ir
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene

    scene = bumpy_sphere_scene(T, width=W, height=H)
    st = _ir.RenderSettings(width=W, height=H, spp=spp, max_depth=16,
                            integrator="mis")
    tracer = ClusterTracer(scene)

    # single-call costs on a realistic mixed batch: camera rays from the
    # real camera + their bounce directions (random hemisphere)
    B = 1 << 17
    rs = np.random.RandomState(0)
    from vimg_tpu.render.integrators import _primary_rays
    pix = jnp.arange(B, dtype=jnp.int32) % (W * H)
    samp = jnp.zeros((B,), jnp.int32)
    ro, rd, _, _ = _primary_rays(scene, st, pix, samp)
    t0 = time.time()
    hr = jax.block_until_ready(tracer.closest(scene, ro, rd, 1e-4, jnp.inf))
    cold = time.time() - t0
    t0 = time.time()
    hr = jax.block_until_ready(tracer.closest(scene, ro, rd, 1e-4, jnp.inf))
    closest_cam = time.time() - t0
    # bounce-ish: origins at hit points, random dirs
    p = np.asarray(ro + rd * np.asarray(hr.t)[:, None].clip(0, 10))
    rnd = rs.randn(B, 3).astype(np.float32)
    rnd /= np.linalg.norm(rnd, axis=1, keepdims=True)
    t0 = time.time()
    jax.block_until_ready(tracer.closest(scene, jnp.asarray(p),
                                         jnp.asarray(rnd), 1e-4, jnp.inf))
    t0b = time.time()
    jax.block_until_ready(tracer.closest(scene, jnp.asarray(p),
                                         jnp.asarray(rnd), 1e-4, jnp.inf))
    closest_bounce = time.time() - t0b
    t0 = time.time()
    jax.block_until_ready(tracer.occluded(scene, jnp.asarray(p),
                                          jnp.asarray(rnd), 1e-4, 100.0))
    t0b = time.time()
    jax.block_until_ready(tracer.occluded(scene, jnp.asarray(p),
                                          jnp.asarray(rnd), 1e-4, 100.0))
    occluded_bounce = time.time() - t0b

    # e2e with superstep count
    t0 = time.time()
    img, stats = render_wavefront(scene, st, tracer=tracer,
                                  return_stats=True)
    wall = time.time() - t0
    total = W * H * spp
    RESULTS["meshdiag"] = dict(
        tris=T, spp=spp, B_used=min(st.batch_size or (1 << 20), 1 << 17),
        closest_cold_s=round(cold, 1),
        closest_cam_s=round(closest_cam, 3),
        closest_bounce_s=round(closest_bounce, 3),
        occluded_bounce_s=round(occluded_bounce, 3),
        e2e_wall=round(wall, 1), supersteps=stats["supersteps"],
        segments=stats["segments"], shadow=stats["shadow_rays"],
        mpaths=round(total / wall / 1e6, 4),
        mrays=round((stats["segments"] + stats["shadow_rays"]) / wall / 1e6,
                    3))
    log(f"meshdiag: {RESULTS['meshdiag']}")
    save()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--out", default=OUT)
    a = ap.parse_args()
    OUT = a.out
    skip = set(a.skip.split(","))
    log(f"backend={jax.default_backend()}")
    if "artifact" not in skip:
        artifact()
    if "meshdiag" not in skip:
        meshdiag()
    log("session done")
