"""HDR environment map: lat-long radiance map with luminance·sin(θ)
importance sampling (reference include/background.h:70-179 and the CDF
tables of include/rng/sampling.h:107-223).

TPU-first design: the reference's row-marginal x per-row-conditional CDF
binary search becomes an ALIAS TABLE over the flat (H*W,) texel
distribution — the identical probability mass p_texel = w / sum(w), but
one (prob, alias) gather per sample instead of log2(W) gather rounds
(measured round 5: the CDF search machinery cost ~28 ms per 131k-lane
superstep; alias sampling is 2 gathers + arithmetic). The solid-angle
pdf rides a precomputed per-texel table shared by the sampler and the
MIS pdf query, so the two can never disagree. Tables are built
host-side (numpy, Vose's method) at load time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.core.math import normalize

PI = np.pi


def build_env_tables(image: np.ndarray, env_to_world=None, radiance_scale=1.0,
                     n_mips=None):
    """Host-side construction of the env pytree fields for ir.build_scene.

    image: (H, W, 3) float32 linear radiance.
    """
    image = np.asarray(image, np.float32)
    H, W, _ = image.shape
    lum = image @ np.array([0.212671, 0.715160, 0.072169], np.float32)
    v = (np.arange(H, dtype=np.float32) + 0.5) / H
    sin_el = np.sin(PI * v)
    weighted = lum * sin_el[:, None]

    # flat texel distribution -> alias tables (Vose) + per-texel pdf
    flat_w = weighted.reshape(-1).astype(np.float64)
    total = flat_w.sum()
    N = flat_w.size
    if total > 0:
        p = flat_w / total
    else:
        p = np.full(N, 1.0 / N)
    prob, alias = _build_alias(p)
    # solid-angle pdf = p_texel * W*H / (2 pi^2 sin(theta)); the sin
    # factor is continuous in the sampled point, so it divides at use
    pdf_w = (p * (W * H) / (2.0 * PI * PI)).astype(np.float32)

    # mip chain (simple 2x2 box; env lookups only need coarse LOD)
    mips = [jnp.asarray(image)]
    m = image
    if n_mips is None:
        n_mips = max(1, int(np.floor(np.log2(max(H, W)))) + 1)
    while len(mips) < n_mips and min(m.shape[0], m.shape[1]) >= 2:
        h2, w2 = m.shape[0] // 2, m.shape[1] // 2
        m = m[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3))
        mips.append(jnp.asarray(m))

    if env_to_world is None:
        env_to_world = np.eye(4, dtype=np.float32)
    env_to_world = np.asarray(env_to_world, np.float32)
    world_to_env = np.linalg.inv(env_to_world)

    return dict(
        env_mips=tuple(mips),
        env_alias=jnp.asarray(alias),
        env_prob=jnp.asarray(prob),
        env_pdf_w=jnp.asarray(pdf_w),
        env_to_world=jnp.asarray(env_to_world),
        world_to_env=jnp.asarray(world_to_env),
        env_scale=jnp.float32(radiance_scale))


def _build_alias(p):
    """Vose's alias method: O(N) build of (prob, alias) such that
    sampling j0 ~ U{0..N-1}, accepting j0 with probability prob[j0] and
    falling back to alias[j0] draws texel j with probability p[j]."""
    N = p.size
    scaled = p * N
    alias = np.zeros(N, np.int32)
    prob = np.ones(N, np.float32)
    small = [i for i in range(N) if scaled[i] < 1.0]
    large = [i for i in range(N) if scaled[i] >= 1.0]
    scaled = scaled.copy()
    while small and large:
        s_i = small.pop()
        l_i = large.pop()
        prob[s_i] = np.float32(scaled[s_i])
        alias[s_i] = l_i
        scaled[l_i] = (scaled[l_i] + scaled[s_i]) - 1.0
        (small if scaled[l_i] < 1.0 else large).append(l_i)
    for i in large + small:
        prob[i] = 1.0
        alias[i] = i
    return prob, alias


def env_sample(scene, r1, r2):
    """Importance-sample the env map. Returns (radiance, wi, pdf_solid_angle).

    Same texel distribution as reference EnvMap::sample
    (background.h:110-139), drawn through the alias table: r1 picks the
    alias slot (its fractional residual is the accept draw, rescaled
    after the accept/reject into the sub-texel dv — exactly uniform
    either way); r2 is the sub-texel du."""
    H = scene.env_mips[0].shape[0]
    W = scene.env_mips[0].shape[1]
    N = H * W
    x = r1 * N
    j0 = jnp.clip(x.astype(jnp.int32), 0, N - 1)
    a = x - j0.astype(jnp.float32)            # accept draw in [0, 1)
    pr = scene.env_prob[j0]
    accept = a < pr
    j = jnp.where(accept, j0, scene.env_alias[j0])
    # rescale the accept residual into a fresh uniform (alias-method
    # standard trick): a/pr on accept, (a-pr)/(1-pr) on reject
    dv = jnp.where(accept, a / jnp.maximum(pr, 1e-12),
                   (a - pr) / jnp.maximum(1.0 - pr, 1e-12))
    dv = jnp.clip(dv, 0.0, 1.0 - 1e-7)
    du = r2

    row = j // W
    col = j % W
    u = (col.astype(jnp.float32) + du) / W
    v = (row.astype(jnp.float32) + dv) / H

    elevation = v * jnp.pi
    y = jnp.cos(elevation)
    azimuth = u * 2.0 * jnp.pi
    sin_el = jnp.sin(elevation)
    x3 = jnp.sin(azimuth) * sin_el
    z3 = -jnp.cos(azimuth) * sin_el
    wi = jnp.stack([x3, y, z3], axis=-1)
    wi = normalize(wi @ scene.env_to_world[:3, :3].T)

    pdf = scene.env_pdf_w[j] / jnp.maximum(sin_el, 1e-8)
    rad = _bilinear_level(scene.env_mips[0], u, v) * scene.env_scale
    return rad, wi, pdf


def env_pdf(scene, world_dir):
    """Solid-angle pdf for direction (reference background.h:141-169) —
    ONE gather from the same per-texel table the sampler uses."""
    H = scene.env_mips[0].shape[0]
    W = scene.env_mips[0].shape[1]
    d = normalize(world_dir @ scene.world_to_env[:3, :3].T)
    u = (1.0 + jnp.arctan2(-d[..., 0], d[..., 2]) / jnp.pi) * 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    col = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    row = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    sin_el = jnp.sin(jnp.pi * v)
    return scene.env_pdf_w[row * W + col] / jnp.maximum(sin_el, 1e-8)


def _bilinear_level(img, u, v):
    """Bilinear fetch from one mip level with repeat wrapping in u and
    clamped v (lat-long)."""
    Hh, Ww = img.shape[0], img.shape[1]
    x = u * Ww - 0.5
    y = v * Hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.mod(x0.astype(jnp.int32), Ww)
    x1i = jnp.mod(x0i + 1, Ww)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hh - 1)
    y1i = jnp.clip(y0i + 1, 0, Hh - 1)
    c00 = img[y0i, x0i]
    c10 = img[y0i, x1i]
    c01 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    a = c00 * (1 - fx)[..., None] + c10 * fx[..., None]
    b = c01 * (1 - fx)[..., None] + c11 * fx[..., None]
    return a * (1 - fy)[..., None] + b * fy[..., None]


def _bilinear_flat(flat, off, h, w, u, v):
    """Bilinear fetch from a flattened mip pyramid with PER-LANE level
    geometry (off/h/w are (B,) int32): repeat wrap in u, clamped v —
    value-identical to _bilinear_level at the lane's level."""
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = flat[off + y0i * w + x0i]
    c10 = flat[off + y0i * w + x1i]
    c01 = flat[off + y1i * w + x0i]
    c11 = flat[off + y1i * w + x1i]
    a = c00 * (1 - fx) + c10 * fx
    b = c01 * (1 - fx) + c11 * fx
    return a * (1 - fy) + b * fy


def env_emit(scene, world_dir, cone_spread):
    """Radiance for a direction that escaped the scene (reference
    background.h:91-108): lat-long lookup with mip level from the ray-cone
    spread angle.

    The mip pyramid is read as ONE flat array (the concat folds to a
    loop-invariant constant under jit; env-texel gradients still flow
    through it) so each lane pays 8 gathers for its two levels instead of
    4 x n_levels — the per-level masked-sum loop cost 44+ gathers per
    call on real HDRI pyramids."""
    d = normalize(world_dir @ scene.world_to_env[:3, :3].T)
    u = (1.0 + jnp.arctan2(-d[..., 0], d[..., 2]) / jnp.pi) * 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi

    H = scene.env_mips[0].shape[0]
    lam = jnp.log2(jnp.maximum(jnp.abs(cone_spread), 1e-20) * (H / jnp.pi))
    lam = jnp.where(jnp.isnan(lam), 0.0, lam) - 2.0
    n_levels = len(scene.env_mips)
    lam = jnp.clip(lam, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lam)
    frac = (lam - l0)[..., None]

    flat = jnp.concatenate([m.reshape(-1, 3) for m in scene.env_mips])
    hs = np.array([m.shape[0] for m in scene.env_mips], np.int32)
    ws = np.array([m.shape[1] for m in scene.env_mips], np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws)[:-1]])
    hs_t, ws_t = jnp.asarray(hs), jnp.asarray(ws)
    offs_t = jnp.asarray(offs.astype(np.int32))

    l0i = jnp.clip(l0.astype(jnp.int32), 0, n_levels - 1)
    l1i = jnp.minimum(l0i + 1, n_levels - 1)
    c0 = _bilinear_flat(flat, offs_t[l0i], hs_t[l0i], ws_t[l0i], u, v)
    c1 = _bilinear_flat(flat, offs_t[l1i], hs_t[l1i], ws_t[l1i], u, v)
    return (c0 * (1.0 - frac) + c1 * frac) * scene.env_scale
