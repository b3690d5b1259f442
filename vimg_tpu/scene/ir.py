"""Scene intermediate representation: flat SoA device arrays.

The reference keeps an object graph (Surface*/Material* pointers,
include/geometry/surface.h, include/material/material.h). On TPU everything
is a flat array indexed by integer ids so that intersection/shading are pure
vectorized gathers:

- triangles reference a shared vertex buffer (``tri_vidx`` -> ``verts``)
- materials are a type id + parameter rows (branchless switch at shade time)
- lights are (type, index) rows into the geometry tables
- the background is either a constant color or a lat-long env map with a
  row/conditional CDF for importance sampling

Static (shape-affecting or dispatch-affecting) facts live in meta fields so
jit specializes per scene layout, not per scene content.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vimg_tpu.render.camera import Camera

# material type ids
MAT_LAMBERTIAN = 0
MAT_DIELECTRIC = 1
MAT_DIFFUSE_LIGHT = 2
MAT_PRINCIPLED = 3

# columns of mat_scalars
MS_IOR = 0          # dielectric ior / principled eta
MS_SPEC_TRANS = 1
MS_SUBSURFACE = 2
MS_SPECULAR = 3
MS_SPEC_TINT = 4
MS_ANISO = 5
MS_SHEEN = 6
MS_SHEEN_TINT = 7
MS_CLEARCOAT = 8
MS_CLEARCOAT_GLOSS = 9
MS_METALLIC = 10
MS_ROUGHNESS = 11
N_MAT_SCALARS = 12

# texture type ids
TEX_CONST = 0
TEX_CHECKER = 1
TEX_IMAGE = 2

# light type ids
LIGHT_TRI = 0
LIGHT_SPHERE = 1
LIGHT_BACKGROUND = 2

# prim type ids (unified primitive table used by the BVH)
PRIM_TRI = 0
PRIM_SPHERE = 1

# triangle flag bits
TRI_HAS_NORMALS = 1
TRI_HAS_UV = 2
TRI_HAS_UV_NORMALMAP = 4
TRI_HAS_UV_MR = 8


def _meta():
    return field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Scene:
    # ---- geometry ----
    verts: jax.Array        # (V, 3) f32
    vnormals: jax.Array     # (V, 3) f32 (zeros when absent)
    vuv: jax.Array          # (V, 2) f32 color uv set
    vuv_nmap: jax.Array     # (V, 2) f32 normal-map uv set
    vuv_mr: jax.Array       # (V, 2) f32 metallic-roughness uv set
    tri_vidx: jax.Array     # (T, 3) i32
    tri_mat: jax.Array      # (T,) i32
    tri_flags: jax.Array    # (T,) i32 bitmask of TRI_HAS_*
    sph_center: jax.Array   # (S, 3) f32
    sph_radius: jax.Array   # (S,) f32
    sph_mat: jax.Array      # (S,) i32

    # ---- materials / textures ----
    mat_type: jax.Array     # (NM,) i32
    mat_base: jax.Array     # (NM, 3) f32 albedo / emission / base color
    mat_scalars: jax.Array  # (NM, N_MAT_SCALARS) f32
    mat_tex: jax.Array      # (NM, 3) i32: base/normal/metal-rough tex id, -1 none
    tex_type: jax.Array     # (NT,) i32
    tex_cols: jax.Array     # (NT, 2, 3) f32
    tex_wh: jax.Array       # (NT, 2) f32
    tex_atlas: jax.Array    # (NT,) i32 atlas entry for TEX_IMAGE (-1 none)

    # ---- lights ----
    light_type: jax.Array   # (L,) i32
    light_idx: jax.Array    # (L,) i32

    # ---- background ----
    bg_color: jax.Array     # (3,) f32 (const background)

    # ---- image texture atlas: flat rows + per-texture-per-level offsets ----
    atlas: jax.Array                   # (N, 3) f32: all mips of all textures
    atlas_meta: jax.Array              # (NT, L, 3) i32: offset, w, h

    # ---- env map ----
    env_mips: Tuple[jax.Array, ...]    # tuple of (H_l, W_l, 3) radiance maps
    # alias-method importance sampler over the flat (H*W,) luminance*sin
    # distribution: one (prob, alias) gather per sample instead of a
    # binary search per CDF row (lights/envmap.py)
    env_alias: jax.Array               # (H*W,) i32
    env_prob: jax.Array                # (H*W,) f32 accept probability
    env_pdf_w: jax.Array               # (H*W,) f32: p_texel * W*H / (2 pi^2)
    env_to_world: jax.Array            # (4, 4)
    world_to_env: jax.Array            # (4, 4)
    env_scale: jax.Array               # () radiance scale

    # ---- camera ----
    camera: Camera

    # ---- static meta ----
    has_lambertian: bool = _meta()
    has_dielectric: bool = _meta()
    has_diffuse_light: bool = _meta()
    has_principled: bool = _meta()
    has_envmap: bool = _meta()
    has_image_tex: bool = _meta()
    has_normal_maps: bool = _meta()
    bg_is_emissive: bool = _meta()
    lights_have_tri: bool = _meta()
    lights_have_sphere: bool = _meta()
    lights_have_bg: bool = _meta()
    # static Disney lobe pruning: skip lobes whose parameters are zero for
    # every material in the scene (big VPU savings per shade)
    has_sheen: bool = _meta()
    has_clearcoat: bool = _meta()
    has_aniso: bool = _meta()
    has_spec_trans: bool = _meta()
    has_checker: bool = _meta()

    @property
    def needs_uv(self):
        """Hit UVs only matter when some texture consumes them."""
        return self.has_image_tex or self.has_checker

    @property
    def needs_cones(self):
        """Ray cones drive mip LOD; without image textures or an env map
        the cone updates (incl. the costly refraction construction) are
        dead weight."""
        return self.has_image_tex or self.has_envmap

    def n_tris(self):
        return self.tri_vidx.shape[0]

    def n_spheres(self):
        return self.sph_center.shape[0]

    def n_mats(self):
        return self.mat_type.shape[0]

    def n_lights(self):
        return self.light_type.shape[0]

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class RenderSettings:
    """Static render configuration (python-level dispatch, not traced)."""
    width: int = 512
    height: int = 512
    spp: int = 30
    max_depth: int = 30
    integrator: str = "s_normal"   # s_normal | g_normal | material | mis
    tonemap: str = "clamp"         # clamp | agx | reinhard | aces
    # rays processed per device launch; whole frame is chunked to this
    # size. None = renderer-chosen default (1<<20 for chunked renders,
    # wavefront.MAX_LANES for the refill wavefront); an explicit value is
    # always authoritative — None (not a sentinel value) marks "unset" so
    # any explicit request, including the old default, is honoured
    batch_size: int | None = None
    # BSDF eval/pdf precision in the megakernel: "f32" (default) or "bf16"
    # (the VERDICT round-2 experiment: Disney mixture in bf16, geometry and
    # sampled directions stay f32)
    shading_dtype: str = "f32"


def _empty_env():
    eye = jnp.eye(4, dtype=jnp.float32)
    return dict(
        env_mips=(jnp.zeros((1, 1, 3), jnp.float32),),
        env_alias=jnp.zeros((1,), jnp.int32),
        env_prob=jnp.ones((1,), jnp.float32),
        env_pdf_w=jnp.zeros((1,), jnp.float32),
        env_to_world=eye, world_to_env=eye,
        env_scale=jnp.float32(1.0))


def _empty_atlas():
    return dict(atlas=jnp.zeros((1, 3), jnp.float32),
                atlas_meta=jnp.zeros((1, 1, 3), jnp.int32))


def build_scene(
    *,
    verts, tri_vidx, tri_mat, tri_flags,
    vnormals=None, vuv=None, vuv_nmap=None, vuv_mr=None,
    sph_center=None, sph_radius=None, sph_mat=None,
    mat_type, mat_base, mat_scalars, mat_tex=None,
    tex_type=None, tex_cols=None, tex_wh=None, tex_atlas=None,
    light_type=None, light_idx=None,
    bg_color=(0.0, 0.0, 0.0), camera=None,
    env=None, atlas=None, bg_light=False,
) -> Scene:
    """Assemble a Scene from host (numpy) buffers, filling defaults."""
    verts = jnp.asarray(verts, jnp.float32).reshape(-1, 3)
    nv = verts.shape[0]
    tri_vidx = jnp.asarray(tri_vidx, jnp.int32).reshape(-1, 3)
    nt = tri_vidx.shape[0]

    def _opt(x, shape, dtype=jnp.float32):
        if x is None:
            return jnp.zeros(shape, dtype)
        return jnp.asarray(x, dtype).reshape(shape)

    vnormals = _opt(vnormals, (nv, 3))
    vuv = _opt(vuv, (nv, 2))
    vuv_nmap = _opt(vuv_nmap, (nv, 2))
    vuv_mr = _opt(vuv_mr, (nv, 2))
    tri_mat = _opt(tri_mat, (nt,), jnp.int32)
    tri_flags = _opt(tri_flags, (nt,), jnp.int32)

    ns = 0 if sph_center is None else np.asarray(sph_center).reshape(-1, 3).shape[0]
    sph_center = _opt(sph_center, (ns, 3))
    sph_radius = _opt(sph_radius, (ns,))
    sph_mat = _opt(sph_mat, (ns,), jnp.int32)

    mat_type = jnp.asarray(mat_type, jnp.int32).reshape(-1)
    nm = mat_type.shape[0]
    mat_base = jnp.asarray(mat_base, jnp.float32).reshape(nm, 3)
    mat_scalars = jnp.asarray(mat_scalars, jnp.float32).reshape(nm, N_MAT_SCALARS)
    if mat_tex is None:
        mat_tex = -jnp.ones((nm, 3), jnp.int32)
    else:
        mat_tex = jnp.asarray(mat_tex, jnp.int32).reshape(nm, 3)

    if tex_type is None:
        tex_type = jnp.zeros((1,), jnp.int32)
        tex_cols = jnp.zeros((1, 2, 3), jnp.float32)
        tex_wh = jnp.ones((1, 2), jnp.float32)
        tex_atlas = -jnp.ones((1,), jnp.int32)
    else:
        tex_type = jnp.asarray(tex_type, jnp.int32).reshape(-1)
        ntex = tex_type.shape[0]
        tex_cols = jnp.asarray(tex_cols, jnp.float32).reshape(ntex, 2, 3)
        tex_wh = jnp.asarray(tex_wh, jnp.float32).reshape(ntex, 2)
        if tex_atlas is None:
            tex_atlas = -jnp.ones((ntex,), jnp.int32)
        else:
            tex_atlas = jnp.asarray(tex_atlas, jnp.int32).reshape(ntex)

    nl = 0 if light_type is None else np.asarray(light_type).reshape(-1).shape[0]
    light_type = _opt(light_type, (nl,), jnp.int32)
    light_idx = _opt(light_idx, (nl,), jnp.int32)

    bg_color = jnp.asarray(bg_color, jnp.float32).reshape(3)
    mt_host = np.asarray(mat_type)

    env_kw = _empty_env() if env is None else env
    atlas_kw = _empty_atlas() if atlas is None else atlas

    has_envmap = env is not None
    bg_is_emissive = has_envmap or bool(np.any(np.asarray(bg_color) != 0.0))

    return Scene(
        verts=verts, vnormals=vnormals, vuv=vuv, vuv_nmap=vuv_nmap,
        vuv_mr=vuv_mr, tri_vidx=tri_vidx, tri_mat=tri_mat,
        tri_flags=tri_flags, sph_center=sph_center, sph_radius=sph_radius,
        sph_mat=sph_mat, mat_type=mat_type, mat_base=mat_base,
        mat_scalars=mat_scalars, mat_tex=mat_tex, tex_type=tex_type,
        tex_cols=tex_cols, tex_wh=tex_wh, tex_atlas=tex_atlas,
        light_type=light_type,
        light_idx=light_idx, bg_color=bg_color,
        camera=camera,
        has_lambertian=bool(np.any(mt_host == MAT_LAMBERTIAN)),
        has_dielectric=bool(np.any(mt_host == MAT_DIELECTRIC)),
        has_diffuse_light=bool(np.any(mt_host == MAT_DIFFUSE_LIGHT)),
        has_principled=bool(np.any(mt_host == MAT_PRINCIPLED)),
        has_envmap=has_envmap,
        has_image_tex=atlas is not None,
        has_normal_maps=bool(np.any(np.asarray(mat_tex)[:, 1] >= 0)),
        bg_is_emissive=bg_is_emissive,
        lights_have_tri=bool(np.any(np.asarray(light_type) == LIGHT_TRI)),
        lights_have_sphere=bool(np.any(np.asarray(light_type) == LIGHT_SPHERE)),
        lights_have_bg=bool(np.any(np.asarray(light_type) == LIGHT_BACKGROUND)),
        has_sheen=bool(np.any(np.asarray(mat_scalars)[:, MS_SHEEN] != 0.0)),
        has_clearcoat=bool(np.any(
            np.asarray(mat_scalars)[:, MS_CLEARCOAT] != 0.0)),
        has_aniso=bool(np.any(np.asarray(mat_scalars)[:, MS_ANISO] != 0.0)),
        has_spec_trans=bool(np.any(
            np.asarray(mat_scalars)[:, MS_SPEC_TRANS] != 0.0)),
        has_checker=bool(np.any(np.asarray(tex_type) == TEX_CHECKER)),
        **env_kw, **atlas_kw)
