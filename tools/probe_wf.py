"""Round-3 TPU probe batch 7: where do the wavefront's seconds go on a
MESH scene? (probe r3c killed the gather folklore: jnp.take is ~0.1-1.3
ns/row and hit_info is 0.1 us/lane, yet wavefront e2e on terrain runs
~1.8 s/superstep at 131k lanes.)

Runs the terrain scene end-to-end with individual stages ablated.
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


VARIANTS = [
    ("full", frozenset()),
    ("-film", frozenset({"film"})),
    ("-cumsum", frozenset({"cumsum"})),
    ("-nee", frozenset({"nee"})),
    ("-shadow", frozenset({"shadow"})),
    ("-beval", frozenset({"beval"})),
    ("-bsample", frozenset({"bsample"})),
    ("-trace", frozenset({"trace", "shadow"})),
    ("-hitinfo", frozenset({"hitinfo"})),
    ("skeleton", frozenset({"film", "cumsum", "nee", "beval", "bsample",
                            "trace", "hitinfo"})),
]


def main():
    from vimg_tpu.geometry.cluster_trace import ClusterTracer
    from vimg_tpu.render import wavefront
    from vimg_tpu.scene import ir
    from vimg_tpu.scene.synthetic import terrain_scene

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    scene = terrain_scene(100_000, width=512, height=256)
    st = ir.RenderSettings(width=512, height=256, spp=4, max_depth=64,
                           integrator="mis", batch_size=1 << 17)
    tracer = ClusterTracer(scene)
    W, H, spp = st.width, st.height, st.spp
    total = W * H * spp
    B = min(st.batch_size, wavefront.MAX_LANES, max(total // 2, 1024))

    for name, ab in VARIANTS:
        try:
            superstep = wavefront.make_superstep(scene, st, tracer, total,
                                                 ablate=ab)
            run = None
            state = wavefront.init_state(B)
            state["samp_off"] = jnp.int32(0)
            accum = jnp.zeros((3, W * H), jnp.float32)

            import functools

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def run(state, accum, superstep=superstep):
                def cond(c):
                    s, _, it = c
                    return (s["n_done"] < total) & (it < 4096)

                def body(c):
                    s, a, it = c
                    s, a = superstep(s, a)
                    return s, a, it + 1

                return jax.lax.while_loop(cond, body,
                                          (state, accum, jnp.int32(0)))

            s, a, it = run(state, accum)
            jax.block_until_ready(a)
            # warm timing
            state = wavefront.init_state(B)
            state["samp_off"] = jnp.int32(0)
            accum = jnp.zeros((3, W * H), jnp.float32)
            t0 = time.time()
            s, a, it = run(state, accum)
            jax.block_until_ready(a)
            dt = time.time() - t0
            log(variant=name, secs=round(dt, 3), supersteps=int(it),
                ms_per_step=round(dt / max(int(it), 1) * 1e3, 1),
                mpaths=round(total / dt / 1e6, 4))
        except Exception as e:  # noqa: BLE001
            log(variant=name, err=type(e).__name__ + ": " + str(e)[:200])

    with open("/root/repo/bench_records/r3_probe_wf.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
