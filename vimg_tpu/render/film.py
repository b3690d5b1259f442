"""Tonemapping and sRGB encoding (reference src/tonemap/*, color_utils.h).

All operators take/return linear (H, W, 3) or (N, 3) float arrays, jittable.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vimg_tpu.core.math import luminance

# AgX (reference src/tonemap/agx.cpp, after iolite-engine's minimal AgX).
# glm::mat3 column-major constructor -> rows here are transposed accordingly.
_AGX_MAT = jnp.asarray([
    [0.842479062253094, 0.0784335999999992, 0.0792237451477643],
    [0.0423282422610123, 0.878468636469772, 0.0791661274605434],
    [0.0423756549057051, 0.0784336, 0.879142973793104],
], jnp.float32)
_AGX_MAT_INV = jnp.asarray([
    [1.19687900512017, -0.0980208811401368, -0.0990297440797205],
    [-0.0528968517574562, 1.15190312990417, -0.0989611768448433],
    [-0.0529716355144438, -0.0980434501171241, 1.15107367264116],
], jnp.float32)


def _agx_contrast(x):
    x2 = x * x
    x4 = x2 * x2
    return (15.5 * x4 * x2 - 40.14 * x4 * x + 31.96 * x4 - 6.868 * x2 * x
            + 0.4298 * x2 + 0.1191 * x - 0.00232)


def agx(col):
    val = col @ _AGX_MAT.T
    min_ev = -12.47393
    max_ev = 4.026069
    val = jnp.clip(jnp.log2(jnp.maximum(val, 1e-10)), min_ev, max_ev)
    val = (val - min_ev) / (max_ev - min_ev)
    val = _agx_contrast(val)
    # default AgX look is identity (agx.cpp:66-78)
    val = val @ _AGX_MAT_INV.T
    val = jnp.maximum(val, 0.0)
    return jnp.power(val, 2.2)


_ACES_IN = jnp.asarray([
    [0.59719, 0.35458, 0.04823],
    [0.07600, 0.90834, 0.01566],
    [0.02840, 0.13383, 0.83777],
], jnp.float32)
_ACES_OUT = jnp.asarray([
    [1.60475, -0.53108, -0.07367],
    [-0.10208, 1.10813, -0.00605],
    [-0.00327, -0.07276, 1.07602],
], jnp.float32)


def aces(col):
    v = col @ _ACES_IN.T
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return (a / b) @ _ACES_OUT.T


def reinhard(col):
    lum = luminance(col)
    largest = jnp.max(lum)
    new_l = lum * (1.0 + lum / jnp.maximum(largest * largest, 1e-20)) / (1.0 + lum)
    scale = jnp.where(lum > 0.0, new_l / jnp.maximum(lum, 1e-20), 0.0)
    return col * scale[..., None]


def clamp01(col):
    return jnp.clip(col, 0.0, 1.0)


TONEMAPPERS = {"clamp": clamp01, "agx": agx, "reinhard": reinhard, "aces": aces}


def srgb_encode(col):
    col = jnp.clip(col, 0.0, 1.0)
    return jnp.where(col < 0.0031308, col * 12.92,
                     1.055 * jnp.power(jnp.maximum(col, 1e-10), 1.0 / 2.4) - 0.055)


def srgb_decode(col):
    return jnp.where(col <= 0.04045, col / 12.92,
                     jnp.power((col + 0.055) / 1.055, 2.4))


def finalize(image_linear, tonemap="clamp", mark_nan_magenta=True):
    """linear HDR -> display sRGB in [0,1]; NaN pixels forced magenta like
    the reference (main.cpp:346-349)."""
    col = TONEMAPPERS[tonemap](image_linear)
    out = srgb_encode(col)
    if mark_nan_magenta:
        nan = jnp.any(jnp.isnan(image_linear), axis=-1, keepdims=True)
        out = jnp.where(nan, jnp.asarray([1.0, 0.0, 1.0]), out)
    return out


def write_png(path, srgb01):
    from PIL import Image
    arr = np.asarray(srgb01)
    img = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(path)
