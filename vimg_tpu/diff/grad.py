"""Differentiable rendering: pixel gradients w.r.t. scene parameters.

The reference has no gradients at all; this is the framework's inverse-
rendering layer. Estimator: detached sampling — autodiff flows through BSDF
eval, emission, textures and background radiance, while sampled directions,
pdf divisors, MIS weights and RR decisions are stop_gradient'ed inside the
integrators (see vimg_tpu/render/integrators.py). The bounce loop is a
bounded ``lax.scan``, which reverse-mode AD traverses.

Trainable parameter pytree: material base colors + scalar tables,
background color, env radiance scale, env map texels, and the camera
(vfov, cam2world pose, aperture radius, focal distance).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vimg_tpu.render.integrators import trace_radiance
from vimg_tpu.scene import ir


def get_params(scene: ir.Scene) -> Dict[str, Any]:
    p = dict(mat_base=scene.mat_base, mat_scalars=scene.mat_scalars,
             bg_color=scene.bg_color, tex_cols=scene.tex_cols,
             env_scale=scene.env_scale,
             # camera parameters (north star: pixel gradients flow to the
             # camera; reference camera being differentiated:
             # /root/reference/src/tl_camera.cpp:25-53)
             cam_vfov=scene.camera.vfov_deg,
             cam2world=scene.camera.cam2world,
             cam_aperture=scene.camera.aperture_radius,
             cam_focal=scene.camera.focal_dist)
    if scene.has_envmap:
        p["env_mips"] = scene.env_mips
    return p


_CAMERA_KEYS = dict(cam_vfov="vfov_deg", cam2world="cam2world",
                    cam_aperture="aperture_radius", cam_focal="focal_dist")


def apply_params(scene: ir.Scene, params) -> ir.Scene:
    import dataclasses
    params = dict(params)
    cam_fields = {_CAMERA_KEYS[k]: params.pop(k)
                  for k in list(params) if k in _CAMERA_KEYS}
    if cam_fields:
        scene = scene.replace(
            camera=dataclasses.replace(scene.camera, **cam_fields))
    return scene.replace(**params)


def radiance_loss_fn(scene, settings, tracer, pix, samp, target,
                     bounded_depth=6, integrator=None):
    """MSE between traced radiance and per-ray target colors."""
    col = trace_radiance(scene, settings, tracer, pix, samp,
                         integrator=integrator or settings.integrator,
                         bounded_depth=bounded_depth)
    return jnp.mean((col - target) ** 2)


def make_train_step(scene: ir.Scene, settings: ir.RenderSettings, tracer,
                    bounded_depth=6, integrator="mis", optimizer=None,
                    mesh=None):
    """Returns (step_fn, opt_state_init). step_fn(params, opt_state, pix,
    samp, target) -> (params, opt_state, loss).

    With a mesh, rays are sharded and gradients psum'd across devices —
    the gradient all-reduce rides ICI while each chip walks its own rays.

    ``tracer`` must be a pure-XLA backend: build it with
    ``make_tracer(scene, differentiable=True)`` — the Pallas
    ClusterTracer has no reverse-mode AD rule and jax.grad through it
    raises.
    """
    import optax
    optimizer = optimizer or optax.adam(1e-2)

    def loss_fn(params, pix, samp, target):
        s = apply_params(scene, params)
        return radiance_loss_fn(s, settings, tracer, pix, samp, target,
                                bounded_depth=bounded_depth,
                                integrator=integrator)

    if mesh is None:
        grad_fn = jax.value_and_grad(loss_fn)
    else:
        axis = mesh.axis_names[0]

        def shard_grad(params, pix, samp, target):
            loss, g = jax.value_and_grad(loss_fn)(params, pix, samp, target)
            loss = jax.lax.pmean(loss, axis)
            g = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axis), g)
            return loss, g

        grad_fn = jax.shard_map(
            shard_grad, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()))

    @jax.jit
    def step(params, opt_state, pix, samp, target):
        loss, g = grad_fn(params, pix, samp, target)
        updates, opt_state = optimizer.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params0 = get_params(scene)
    return step, optimizer.init(params0), params0
