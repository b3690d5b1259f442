"""Texture evaluation: const colors, checkerboard, and mip-mapped image
atlas lookups with ray-cone LOD.

Reference: include/texture/texture_RGB.h (ConstColor, Checkerboard,
ImageTexture trilinear + ray-cone LOD), include/texture/texture_RG.h,
src/image_texture.cpp. All image textures (every mip level) live in ONE
flat (N, 3) atlas with an (NT, L, 3) offset/size table, so a wavefront's
fetches are plain 1-D row gathers.

Bilinear filtering matches the reference's convention (col_at_uv_mipmap:
pixel = wrap(uv) * size, floor + clamp, fractional lerp — no half-texel
offset).
"""
from __future__ import annotations

import jax.numpy as jnp

from vimg_tpu.core.math import tgather
from vimg_tpu.scene import ir


def _checker_color(scene: ir.Scene, tex_id, uv):
    wh = tgather(scene.tex_wh, tex_id)
    u_board = jnp.floor(uv[..., 0] * wh[..., 0]).astype(jnp.int32)
    v_board = jnp.floor(uv[..., 1] * wh[..., 1]).astype(jnp.int32)
    even = ((u_board + v_board) % 2) == 0
    cols = tgather(scene.tex_cols, tex_id)   # (B, 2, 3)
    return jnp.where(even[..., None], cols[..., 0, :], cols[..., 1, :])


def base_color_at_hit(scene: ir.Scene, mat_id, hit, cone_width=None,
                      ray_dir=None):
    """Base color/albedo for each ray's material at its hit point."""
    col = tgather(scene.mat_base, mat_id)
    tex_id = tgather(scene.mat_tex, mat_id)[..., 0]
    has_tex = tex_id >= 0
    safe_tex = jnp.maximum(tex_id, 0)
    ttype = tgather(scene.tex_type, safe_tex)

    const_col = tgather(scene.tex_cols, safe_tex)[..., 0, :]
    col = jnp.where((has_tex & (ttype == ir.TEX_CONST))[..., None],
                    const_col, col)
    checker = _checker_color(scene, safe_tex, hit.uv)
    col = jnp.where((has_tex & (ttype == ir.TEX_CHECKER))[..., None],
                    checker, col)

    if scene.has_image_tex:
        img = image_color_at_hit(scene, safe_tex, hit, cone_width, ray_dir)
        col = jnp.where((has_tex & (ttype == ir.TEX_IMAGE))[..., None],
                        img, col)
    return col


# ---------------------------------------------------------------------------
# flat atlas lookups
# ---------------------------------------------------------------------------

def _wrap_repeat(x):
    # reference handle_wrapping Repeat: fract with negative fixup
    f = x - jnp.trunc(x)
    return jnp.where(f < 0.0, 1.0 + f, f)


def _atlas_fetch_bilinear(scene: ir.Scene, level, tex_id, uv):
    """Bilinear fetch; ``level``/``tex_id`` are (B,) int arrays."""
    n_levels = scene.atlas_meta.shape[1]
    level = jnp.clip(level, 0, n_levels - 1)
    meta = scene.atlas_meta[tex_id, level]   # (B, 3): offset, w, h
    off = meta[..., 0]
    w = meta[..., 1]
    h = meta[..., 2]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    pu = _wrap_repeat(uv[..., 0]) * wf
    pv = _wrap_repeat(uv[..., 1]) * hf
    x0 = jnp.clip(pu.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(pv.astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (pu - x0.astype(jnp.float32))[..., None]
    fy = (pv - y0.astype(jnp.float32))[..., None]

    def at(xi, yi):
        return scene.atlas[off + yi * w + xi]

    a = at(x0, y0) * (1 - fx) + at(x1, y0) * fx
    b = at(x0, y1) * (1 - fx) + at(x1, y1) * fx
    return a * (1 - fy) + b * fy


def atlas_trilinear(scene: ir.Scene, tex_id, uv, lod):
    """Trilinear (bilinear x 2 mip levels) lookup; lod is float per ray
    (reference col_mipmap_interpolate)."""
    n_levels = scene.atlas_meta.shape[1]
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]
    l0i = l0.astype(jnp.int32)
    c0 = _atlas_fetch_bilinear(scene, l0i, tex_id, uv)
    c1 = _atlas_fetch_bilinear(scene, l0i + 1, tex_id, uv)
    return c0 * (1 - frac) + c1 * frac


def texture_lod(scene: ir.Scene, tex_id, hit, cone_width, ray_dir):
    """Ray-cone LOD (reference texture_RGB.h:138-149), minus the fixed -2
    bias applied by the caller (col_at_ray_hit)."""
    from vimg_tpu.core.math import dot
    meta = scene.atlas_meta[tex_id, 0]
    wh = (meta[..., 1] * meta[..., 2]).astype(jnp.float32)
    lam = 0.5 * jnp.log2(jnp.maximum(hit.uv_area, 1e-30)
                         / jnp.maximum(hit.prim_area, 1e-30))
    lam = lam + jnp.log2(jnp.maximum(jnp.abs(cone_width), 1e-30)
                         / jnp.maximum(jnp.abs(dot(ray_dir, hit.n_g)), 1e-30))
    lam = lam + 0.5 * jnp.log2(jnp.maximum(wh, 1.0))
    return jnp.where(jnp.isnan(lam), 0.0, lam)


def image_color_at_hit(scene: ir.Scene, tex_id, hit, cone_width, ray_dir):
    atlas_id = jnp.maximum(scene.tex_atlas[tex_id], 0)
    if cone_width is None or ray_dir is None:
        lod = jnp.zeros(hit.uv.shape[:-1])
    else:
        lod = texture_lod(scene, atlas_id, hit, cone_width, ray_dir) - 2.0
    return atlas_trilinear(scene, atlas_id, hit.uv, lod)


def metal_rough_at_uv(scene: ir.Scene, tex_id, uv):
    """(metallic, roughness) from texture (glTF: B=metal, G=rough), or
    (1, 1) when untextured (reference principled.cpp:15-20)."""
    has = tex_id >= 0
    safe = jnp.maximum(tex_id, 0)
    c = _atlas_fetch_bilinear(scene, jnp.zeros_like(safe), safe, uv)
    mr = jnp.stack([c[..., 2], c[..., 1]], axis=-1)
    return jnp.where(has[..., None], mr, 1.0)


def normal_at_uv(scene: ir.Scene, tex_id, uv):
    """Tangent-space normal from a normal map (atlas stores decoded
    [-1,1] vectors); normalized after bilinear filtering (reference
    get_normal)."""
    from vimg_tpu.core.math import normalize
    safe = jnp.maximum(tex_id, 0)
    c = _atlas_fetch_bilinear(scene, jnp.zeros_like(safe), safe, uv)
    return normalize(c)
