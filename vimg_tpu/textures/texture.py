"""Texture evaluation: const colors, checkerboard, and (mip-mapped) image
atlas lookups with ray-cone LOD.

Reference: include/texture/texture_RGB.h (ConstColor, Checkerboard,
ImageTexture trilinear + ray-cone LOD), include/texture/texture_RG.h,
src/image_texture.cpp. Image textures are packed into one atlas per mip
level so a whole wavefront's fetches become two gathers per level.
"""
from __future__ import annotations

import jax.numpy as jnp

from vimg_tpu.scene import ir


def _checker_color(scene: ir.Scene, tex_id, uv):
    wh = scene.tex_wh[tex_id]
    u_board = jnp.floor(uv[..., 0] * wh[..., 0]).astype(jnp.int32)
    v_board = jnp.floor(uv[..., 1] * wh[..., 1]).astype(jnp.int32)
    even = ((u_board + v_board) % 2) == 0
    cols = scene.tex_cols[tex_id]            # (B, 2, 3)
    return jnp.where(even[..., None], cols[..., 0, :], cols[..., 1, :])


def base_color_at_hit(scene: ir.Scene, mat_id, hit, cone_width=None,
                      ray_dir=None):
    """Base color/albedo for each ray's material at its hit point.

    Plain materials use ``mat_base``; a texture id >= 0 overrides it with a
    procedural or image lookup (ray-cone LOD for images).
    """
    col = scene.mat_base[mat_id]
    tex_id = scene.mat_tex[mat_id, 0]
    has_tex = tex_id >= 0
    safe_tex = jnp.maximum(tex_id, 0)
    ttype = scene.tex_type[safe_tex]

    const_col = scene.tex_cols[safe_tex, 0, :]
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
# image atlas (filled in by the glTF loader)
# ---------------------------------------------------------------------------

def _wrap_repeat(x):
    f = x - jnp.trunc(x)
    return jnp.where(f < 0.0, 1.0 + f, f)


def _atlas_fetch_bilinear(scene: ir.Scene, level, tex_id, uv):
    """Bilinear fetch from atlas mip ``level`` (static int) for (B,) tex ids."""
    page = scene.atlas[level]
    scale = 1.0 / (1 << level)
    meta = scene.atlas_meta[tex_id]          # (B, 4): x0, y0, w, h at mip 0
    x0 = jnp.floor(meta[..., 0] * scale)
    y0 = jnp.floor(meta[..., 1] * scale)
    w = jnp.maximum(jnp.floor(meta[..., 2] * scale), 1.0)
    h = jnp.maximum(jnp.floor(meta[..., 3] * scale), 1.0)

    u = _wrap_repeat(uv[..., 0]) * w
    v = _wrap_repeat(uv[..., 1]) * h
    iu = jnp.clip(jnp.floor(u), 0.0, w - 1.0)
    iv = jnp.clip(jnp.floor(v), 0.0, h - 1.0)
    fu = u - iu
    fv = v - iv
    iu2 = jnp.minimum(iu + 1.0, w - 1.0)
    iv2 = jnp.minimum(iv + 1.0, h - 1.0)

    def at(ix, iy):
        xi = (x0 + ix).astype(jnp.int32)
        yi = (y0 + iy).astype(jnp.int32)
        return page[yi, xi]

    c00 = at(iu, iv)
    c10 = at(iu2, iv)
    c01 = at(iu, iv2)
    c11 = at(iu2, iv2)
    a = c00 * (1 - fu)[..., None] + c10 * fu[..., None]
    b = c01 * (1 - fu)[..., None] + c11 * fu[..., None]
    return a * (1 - fv)[..., None] + b * fv[..., None]


def atlas_trilinear(scene: ir.Scene, tex_id, uv, lod):
    """Trilinear (bilinear x 2 mips) lookup; lod is a float per ray."""
    n_levels = len(scene.atlas)
    lod = jnp.clip(lod, 0.0, n_levels - 1.0)
    l0 = jnp.floor(lod)
    frac = lod - l0
    out = jnp.zeros(uv.shape[:-1] + (3,), jnp.float32)
    for lvl in range(n_levels):
        w0 = jnp.where(l0 == lvl, 1.0 - frac, 0.0)
        w0 = w0 + jnp.where((l0 == lvl - 1), frac, 0.0)
        w0 = jnp.where((lvl == n_levels - 1) & (l0 == lvl), 1.0, w0)
        need = w0 > 0.0
        c = _atlas_fetch_bilinear(scene, lvl, tex_id, uv)
        out = out + jnp.where(need[..., None], c * w0[..., None], 0.0)
    return out


def texture_lod(scene: ir.Scene, tex_id, hit, cone_width, ray_dir):
    """Ray-cone LOD (reference texture_RGB.h:138-149)."""
    meta = scene.atlas_meta[tex_id]
    w = meta[..., 2]
    h = meta[..., 3]
    lam = 0.5 * jnp.log2(jnp.maximum(hit.uv_area, 1e-30)
                         / jnp.maximum(hit.prim_area, 1e-30))
    from vimg_tpu.core.math import dot
    lam = lam + jnp.log2(jnp.maximum(jnp.abs(cone_width), 1e-30)
                         / jnp.maximum(jnp.abs(dot(ray_dir, hit.n_g)), 1e-30))
    lam = lam + 0.5 * jnp.log2(jnp.maximum(w * h, 1.0))
    return jnp.where(jnp.isnan(lam), 0.0, lam)


def image_color_at_hit(scene: ir.Scene, tex_id, hit, cone_width, ray_dir):
    if cone_width is None or ray_dir is None:
        lod = jnp.zeros(hit.uv.shape[:-1])
    else:
        lod = texture_lod(scene, tex_id, hit, cone_width, ray_dir)
    return atlas_trilinear(scene, tex_id, hit.uv, lod)


def metal_rough_at_uv(scene: ir.Scene, tex_id, uv):
    """(metallic, roughness) from texture (glTF: B=metal, G=rough), or
    (1, 1) when untextured (reference principled.cpp:15-20)."""
    has = tex_id >= 0
    safe = jnp.maximum(tex_id, 0)
    c = _atlas_fetch_bilinear(scene, 0, safe, uv)
    mr = jnp.stack([c[..., 2], c[..., 1]], axis=-1)
    return jnp.where(has[..., None], mr, 1.0)


def normal_at_uv(scene: ir.Scene, tex_id, uv):
    """Tangent-space normal from a normal map (already decoded to [-1, 1]
    vectors in the atlas); normalized after bilinear filtering."""
    from vimg_tpu.core.math import normalize
    c = _atlas_fetch_bilinear(scene, 0, jnp.maximum(tex_id, 0), uv)
    return normalize(c)
