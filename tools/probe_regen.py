"""Round-3 TPU probe batch 1: mesh-walk regeneration coherence.

1. regen_frac sweep on terrain + bumpy-sphere 100k-tri scenes: does
   keeping each block's walk within one path generation shrink the
   cluster union (nleaf) and the wall time?
2. Mosaic probe: dynamic scalar SMEM *writes* (needed for an in-kernel
   per-block traversal stack -> exact near-first ordering).
3. Depth decomposition at the best frac: where do the leaf visits go?

Run standalone on the axon TPU (single-client tunnel: nothing else may
touch the backend while this runs).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


def log(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def probe_smem_dynamic_write():
    """Tiny kernel: scalar while-loop pushes/pops a dynamic-index SMEM
    stack. If this lowers + runs, the megakernel can hold a per-block
    traversal stack in SMEM scratch."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref, stack_ref):
        def body(i, sp):
            # push two values, pop one — dynamic scalar store + load
            stack_ref[sp] = i * 3 + 1
            stack_ref[sp + 1] = i * 3 + 2
            v = stack_ref[sp]
            return sp + 1 + (v % 1)

        sp = jax.lax.fori_loop(0, 16, body, jnp.int32(0))
        acc = jnp.float32(0.0)

        def rd(i, acc):
            return acc + stack_ref[i].astype(jnp.float32)

        acc = jax.lax.fori_loop(0, sp + 1, rd, acc)
        o_ref[:] = x_ref[:] + acc

    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
        )
        out = jax.block_until_ready(fn(jnp.zeros((8, 128), jnp.float32)))
        # expected: pushes at sp=0..15 leave stack[i]=3i+1 except the +1
        # overwrites; just check it ran and is finite + deterministic
        ok = bool(np.isfinite(np.asarray(out)).all())
        log(probe="smem_dynamic_write", ok=ok, v=float(out[0, 0]))
    except Exception as e:  # noqa: BLE001
        log(probe="smem_dynamic_write", ok=False,
            err=type(e).__name__ + ": " + str(e)[:300])


def sweep_regen():
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import bumpy_sphere_scene, terrain_scene

    scenes = {
        "terrain100k": terrain_scene(100_000, width=512, height=256),
        "bumpy100k": bumpy_sphere_scene(100_000, width=512, height=256),
    }
    st = ir.RenderSettings(width=512, height=256, spp=32, max_depth=64,
                           integrator="mis", batch_size=1 << 18)
    total = st.width * st.height * st.spp
    for name, scene in scenes.items():
        for rows in (16, 32):
            for frac in (1.0, 0.5, 0.25, 0.0):
                try:
                    img, s = render_megakernel(scene, st, rows=rows,
                                               return_stats=True,
                                               regen_frac=frac)
                    # warm second run for timing (first includes compile)
                    img, s = render_megakernel(scene, st, rows=rows,
                                               return_stats=True,
                                               regen_frac=frac)
                    log(probe="regen", scene=name, rows=rows, frac=frac,
                        mpaths=round(total / s["seconds"] / 1e6, 3),
                        mrays=round((s["segments"] + s["shadow_rays"])
                                    / s["seconds"] / 1e6, 3),
                        secs=round(s["seconds"], 3),
                        nvisit=s["node_visits"], nleaf=s["leaf_visits"],
                        mean=float(np.asarray(img).mean()))
                except Exception as e:  # noqa: BLE001
                    log(probe="regen", scene=name, rows=rows, frac=frac,
                        err=type(e).__name__ + ": " + str(e)[:200])


def depth_decomposition(frac):
    from vimg_tpu.render.mega.kernel import render_megakernel
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    scene = terrain_scene(100_000, width=512, height=256)
    for depth in (1, 2, 3, 6, 64):
        st = ir.RenderSettings(width=512, height=256, spp=32,
                               max_depth=depth, integrator="mis",
                               batch_size=1 << 18)
        total = st.width * st.height * st.spp
        img, s = render_megakernel(scene, st, rows=32, return_stats=True,
                                   regen_frac=frac)
        img, s = render_megakernel(scene, st, rows=32, return_stats=True,
                                   regen_frac=frac)
        log(probe="depth", depth=depth, frac=frac,
            mpaths=round(total / s["seconds"] / 1e6, 3),
            secs=round(s["seconds"], 3),
            segs=s["segments"], shadow=s["shadow_rays"],
            nvisit=s["node_visits"], nleaf=s["leaf_visits"])


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    probe_smem_dynamic_write()
    sweep_regen()
    best = min((r for r in RESULTS if r.get("probe") == "regen"
                and "secs" in r and r["scene"] == "terrain100k"),
               key=lambda r: r["secs"], default=None)
    depth_decomposition(best["frac"] if best else 1.0)
    with open("/root/repo/bench_records/r3_probe_regen.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
