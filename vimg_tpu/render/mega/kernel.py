"""Persistent-path Pallas megakernel: the MIS integrator as ONE TPU kernel.

Work decomposition (see package docstring): the frame's pixels are split
into blocks of P = rows*128; grid step g owns pixels [g*P, (g+1)*P). Every
lane owns exactly one pixel and runs that pixel's ``spp`` paths back to
back inside an in-kernel while_loop (regeneration == wavefront refill with
a static schedule). The lane accumulator IS the film pixel, so the film
write is one aligned (rows, 128) block store per channel — the reference's
shared-image atomic adds (and round 1's scatter-adds) have no analogue
here at all.

Estimator semantics are identical to render/wavefront.py (same counter RNG
keys per (pixel, sample, bounce, draw), same MIS/RR rules, reference
src/integrators/mis_integrator.cpp); scene support is gated by
``supports_megakernel`` (small analytic scenes: the reference's json scene
class — see geometry/trace.py for the mesh path).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimg_tpu.core import rng
from vimg_tpu.render.mega import shade
from vimg_tpu.render.mega.v3 import (V3, bsel, dot, normalize,
                                     onb_from_normal, where)
from vimg_tpu.scene import ir

MIN_T = 1e-4                 # reference Ray.minT
SHADOW_EPS = 1e-4            # reference mis_integrator.cpp:62
ROULETTE_THRESHOLD = 5       # reference mis_integrator.cpp:31
ROULETTE_CLAMP = 0.95
INV_4PI = 1.0 / (4.0 * math.pi)

DEFAULT_ROWS = 32            # lanes per block = ROWS * 128
TILE_W = 64                  # mesh-mode pixel-tile width (tile = TILE_W x
                             # P/TILE_W); square-ish tiles keep each block's
                             # ray frustum tight for the cluster-tree walk
MESH_CLUSTER_K = 64          # tris per leaf cluster for the in-kernel walk


# ---------------------------------------------------------------------------
# gating + host-side scene packing
# ---------------------------------------------------------------------------

# mesh-mode size tiers for the in-kernel cluster walk: below the VMEM
# budget the packed cluster table is VMEM-resident (~64 B/tri padded,
# ~16 MB VMEM on v5e); above it the table lives in HBM and live leaves DMA
# their (rpc, 128) block into a VMEM scratch inside the leaf branch (the
# cluster_trace.py "resident_dma"/"stream" pattern). The stream cap only
# bounds host build time, not correctness.
MESH_VMEM_BUDGET = 10 * 2 ** 20
MESH_MEGA_MAX_TRIS = 2_000_000
_FORCE_STREAM = False        # test hook: stream even below the budget

# Per-lane material params resolve via static select chains (gather_mat):
# O(n_mats) VPU work per bounce (1 compare + up to 15 selects per
# material). Measured slope on the 100k-tri terrain at glTF scale
# (bench_records/r4_many_mats.json): the chain stays a minor fraction of
# the mesh walk per bounce, so the cap sits at 256 — covering real glTF
# conversions (reference turns every material into Principled,
# gltf_loading.cpp:547-690) — before routing to the XLA wavefront, whose
# per-lane fetch is one jnp.take (0.1-1.3 ns/row, r3_probe_c) and flat
# in n_mats. The O(1)-in-n alternative (exact one-hot MXU gathers,
# ops/mxu_gather.py, probe-validated bit-exact on-chip) is queued for the
# inner loop once dot-kernel compile times are workable (~9 min cold).
MEGA_MAX_MATERIALS = 256
# light cap raised 48 -> 256 in round 5: the NEE light-fetch select chain
# is O(n_lights) but its measured slope is gentle (bench_records/
# r5_probe_h.json, many-lights sphere scene 512x256@32spp: 16 lights
# 134.9 Mpaths/s, 48 -> 115.3, 128 -> 80.3, 256 -> 52.8 — still ~10x the
# XLA wavefront on the same scene; compile 36 s at 256). Real glTF scenes
# register every emissive primitive as a light (gltf_loading.cpp:87-104).
MEGA_MAX_LIGHTS = 256
MEGA_MAX_SPHERES = 256


def supports_megakernel(scene: ir.Scene, settings: ir.RenderSettings) -> bool:
    """True when the scene fits the megakernel's compiled feature set:
    const-color materials, tri/sphere lights, constant background, MIS or
    material (no-NEE) integrator. Small analytic scenes (<=64 prims) run
    fully unrolled; larger meshes (up to MESH_MEGA_MAX_TRIS) run the
    in-kernel cluster-tree walk (geometry/cluster_trace.py layout)."""
    if settings.integrator not in ("mis", "material"):
        return False
    n_prims = scene.n_tris() + scene.n_spheres()
    if not (0 < n_prims):
        return False
    if scene.n_tris() > MESH_MEGA_MAX_TRIS \
            or scene.n_spheres() > MEGA_MAX_SPHERES:
        return False
    if (scene.mat_type.shape[0] > MEGA_MAX_MATERIALS
            or scene.n_lights() > MEGA_MAX_LIGHTS):
        return False
    if scene.has_envmap or scene.has_image_tex or scene.has_checker:
        return False
    if scene.lights_have_bg:
        return False
    # UV flags are irrelevant here: no texture consumers (gated above),
    # and the UV-derived tangent frame only matters for anisotropic
    # materials, whose frame-sensitive lobes we only allow on spheres
    # (where the XLA path also uses the ONB frame, intersect.py:388).
    if scene.n_tris():
        if scene.has_aniso:
            aniso_mats = set(np.nonzero(
                np.asarray(scene.mat_scalars)[:, ir.MS_ANISO] != 0.0)[0])
            if any(int(m) in aniso_mats for m in np.asarray(scene.tri_mat)):
                return False
    # materials must resolve to constant base colors
    mtex = np.asarray(scene.mat_tex)
    if mtex.size:
        has_tex = mtex[:, 0] >= 0
        if np.any(has_tex):
            ttypes = np.asarray(scene.tex_type)[np.maximum(mtex[:, 0], 0)]
            if np.any(has_tex & (ttypes != ir.TEX_CONST)):
                return False
    return True


# --- shared packing helpers (BOTH scene modes): f32 op order matches the
# XLA path exactly (intersect.py n_g, emitters.py areas) so epsilon races
# decide the same way — see the tri_n note in _pack_scene ---------------

def _f32_cross(a, b):
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    return np.stack([a[1] * b[2] - a[2] * b[1],
                     a[2] * b[0] - a[0] * b[2],
                     a[0] * b[1] - a[1] * b[0]])


def _f32_norm2(c):
    return (c[0] * c[0] + c[1] * c[1]) + c[2] * c[2]


def _resolved_mat_base(scene):
    """Effective base colors: TEX_CONST textures resolved host-side."""
    mat_base = np.asarray(scene.mat_base, np.float32).copy()
    mtex = np.asarray(scene.mat_tex)
    for k in range(mat_base.shape[0]):
        if mtex.size and mtex[k, 0] >= 0:
            mat_base[k] = np.asarray(scene.tex_cols)[mtex[k, 0], 0]
    return mat_base


def _cam_row(scene):
    cam = scene.camera
    c2w = np.asarray(cam.cam2world, np.float32)
    return np.concatenate([
        [float(cam.vfov_deg), float(cam.aperture_radius),
         float(cam.focal_dist), 0.0],
        c2w[:3, :3].reshape(-1), c2w[:3, 3],
        np.asarray(scene.bg_color, np.float32)]).astype(np.float32)


def _light_rows32(scene, mat_base):
    """32-wide light rows, one layout for both kernel modes.

    tri -> p0, p1, p2, unit face normal, area, emit, then slots 16..24 the
    per-vertex normals n0/n1/n2 (face normal x3 when the tri has none —
    interpolating them reproduces emitters._sample_tri:50-66 bit-exactly
    in both cases). sphere -> center, radius, emit."""
    nt, ns = scene.n_tris(), scene.n_spheres()
    lt = np.asarray(scene.light_type)
    li = np.asarray(scene.light_idx)
    light_rows = np.zeros((max(len(lt), 1), 32), np.float32)
    verts32 = np.asarray(scene.verts, np.float32)
    tvidx = np.asarray(scene.tri_vidx)
    tri_mat = np.asarray(scene.tri_mat) if nt else np.zeros(0, np.int32)
    sph_mat = np.asarray(scene.sph_mat) if ns else np.zeros(0, np.int32)
    tri_flags = np.asarray(scene.tri_flags) if nt else np.zeros(0, np.int32)
    vnorm32 = np.asarray(scene.vnormals, np.float32) \
        if scene.vnormals is not None else None
    sph_center32 = np.asarray(scene.sph_center, np.float32) \
        if ns else np.zeros((0, 3), np.float32)
    sph_radius32 = np.asarray(scene.sph_radius, np.float32) \
        if ns else np.zeros((0,), np.float32)
    for l, (t, idx) in enumerate(zip(lt, li)):
        if t == ir.LIGHT_TRI:
            p0, p1, p2 = verts32[tvidx[idx]]
            c = _f32_cross(p1 - p0, p2 - p0)
            n2 = _f32_norm2(c)
            nrm = c * (np.float32(1.0)
                       / np.sqrt(np.maximum(n2, np.float32(1e-38))))
            # emitters._sample_tri area: sqrt(max(length2(cross(e2,e1)),0))/2
            a2 = _f32_norm2(_f32_cross(p2 - p0, p1 - p0))
            area = np.sqrt(np.maximum(a2, np.float32(0.0))) / np.float32(2.0)
            emit = mat_base[int(tri_mat[idx])]
            if vnorm32 is not None and (tri_flags[idx]
                                        & ir.TRI_HAS_NORMALS):
                ln0, ln1, ln2 = vnorm32[tvidx[idx]]
            else:
                ln0 = ln1 = ln2 = nrm
            light_rows[l, :25] = np.concatenate(
                [p0, p1, p2, nrm, [area], emit,
                 ln0, ln1, ln2]).astype(np.float32)
        elif t == ir.LIGHT_SPHERE:
            emit = mat_base[int(sph_mat[idx])]
            light_rows[l, :7] = np.concatenate(
                [sph_center32[idx], [sph_radius32[idx]], emit])
    return light_rows


def _pack_scene(scene: ir.Scene):
    """Flatten the scene into small numpy tables (the kernel's SMEM args)
    plus static python metadata baked into the trace.

    Scenes with more than 64 triangles switch to MESH mode: per-tri select
    chains are impossible at that scale, so the tris ship as the cluster
    tables of geometry/cluster_trace.py (packed (K,16) blocks + skip-link
    cluster tree) and the kernel walks the tree instead of unrolling."""
    from vimg_tpu.geometry.soa_intersect import build_constants
    tri_c, sph_c = build_constants(scene)
    nt = scene.n_tris()
    ns = scene.n_spheres()
    has_vnormals = bool(nt) and bool(
        np.any(np.asarray(scene.tri_flags) & ir.TRI_HAS_NORMALS))
    mesh = nt > 64 or has_vnormals

    # tables padded to >=1 row (zero-row SMEM operands don't lower)
    tri_c = np.asarray(tri_c, np.float32) if tri_c is not None and not mesh \
        else np.zeros((1, 12), np.float32)
    sph_c = np.asarray(sph_c, np.float32) if sph_c is not None \
        else np.zeros((1, 4), np.float32)
    if mesh:
        return _pack_scene_mesh(scene, sph_c)

    # tri vertex rows (p0, p1, p2, unit n) for barycentric hit points: the
    # hit point must be u*p0 + v*p1 + w*p2 exactly like
    # geometry/intersect.py:257 — ro + t*rd accumulates ~|ro|*eps error,
    # comparable to MIN_T on large scenes, and stochastic self-intersection
    # diverges whole paths. The unit normal is appended below (f32, XLA op
    # order) once computed.
    if nt:
        v32 = np.asarray(scene.verts, np.float32)
        tv = np.asarray(scene.tri_vidx)
        tri_v = np.concatenate([v32[tv[:, 0]], v32[tv[:, 1]],
                                v32[tv[:, 2]]], axis=1).astype(np.float32)
    else:
        tri_v = np.zeros((1, 12), np.float32)

    # per-prim static metadata (material ids/types are scene-layout facts)
    mat_type = np.asarray(scene.mat_type)
    tri_mat = [int(m) for m in np.asarray(scene.tri_mat)] if nt else []
    sph_mat = [int(m) for m in np.asarray(scene.sph_mat)] if ns else []
    prim_mat = tri_mat + sph_mat
    prim_emissive = [mat_type[m] == ir.MAT_DIFFUSE_LIGHT for m in prim_mat]

    # tri normals/areas in f32 with the SAME op order as the XLA path
    # (intersect.py n_g, emitters.surf_pdf): ulp-exact values keep the
    # epsilon races (shadow dist-eps, one-sided tests) deciding the same way
    tri_area = []
    tri_n = np.zeros((max(nt, 1), 3), np.float32)
    if nt:
        v32 = np.asarray(scene.verts, np.float32)
        tv = np.asarray(scene.tri_vidx)
        for i in range(nt):
            p0, p1, p2 = v32[tv[i, 0]], v32[tv[i, 1]], v32[tv[i, 2]]
            e1 = p1 - p0
            e2 = p2 - p0
            c = _f32_cross(e1, e2)
            n2 = _f32_norm2(c)
            tri_n[i] = c * (np.float32(1.0)
                            / np.sqrt(np.maximum(n2, np.float32(1e-38))))
            # surf_pdf area: sqrt(max(length2(cross(p2-p0, p1-p0)), 0)) / 2
            a2 = _f32_norm2(_f32_cross(e2, e1))
            tri_area.append(float(np.sqrt(np.maximum(a2, np.float32(0.0)))
                                  / np.float32(2.0)))
        tri_v = np.concatenate([tri_v, tri_n], axis=1)

    mat_base = _resolved_mat_base(scene)
    mat_scalars = np.asarray(scene.mat_scalars, np.float32)
    lt = np.asarray(scene.light_type)
    light_is_tri = [bool(t == ir.LIGHT_TRI) for t in lt]
    light_rows = _light_rows32(scene, mat_base)
    cam_row = _cam_row(scene)

    static = dict(
        nt=nt, ns=ns, n_mats=int(mat_type.shape[0]),
        n_lights=int(lt.shape[0]),
        mat_type=[int(t) for t in mat_type],
        prim_mat=prim_mat, prim_emissive=prim_emissive, tri_area=tri_area,
        light_is_tri=light_is_tri,
        has_dof=float(scene.camera.aperture_radius) > 0.0,
        any_sphere_light_prim=any(
            prim_emissive[nt + j] for j in range(ns)) if ns else False,
    )
    tables = dict(tri_c=tri_c, tri_v=tri_v, sph_c=sph_c, mat_base=mat_base,
                  mat_scalars=mat_scalars, light_rows=light_rows,
                  cam_row=cam_row)
    return tables, static


def _pack_scene_mesh(scene: ir.Scene, sph_c):
    """MESH-mode packing: cluster tables for the tris (VMEM + SMEM tree),
    small SMEM tables for everything else. Per-tri shading data (normal,
    material, area) is NOT tabulated per tri — the kernel captures it from
    the cluster rows at hit time (plane normal = rows 0..2, material id =
    row 12, tri area = |plane normal| / 2)."""
    from vimg_tpu.geometry.cluster_trace import ClusterData
    nt, ns = scene.n_tris(), scene.n_spheres()
    has_vnormals = bool(nt) and bool(
        np.any(np.asarray(scene.tri_flags) & ir.TRI_HAS_NORMALS))
    cd = ClusterData(scene, max_k=MESH_CLUSTER_K, with_attrs=has_vnormals)

    mat_base = _resolved_mat_base(scene)
    mat_scalars = np.asarray(scene.mat_scalars, np.float32)
    mat_type = np.asarray(scene.mat_type)
    sph_mat = [int(m) for m in np.asarray(scene.sph_mat)] if ns else []
    sph_emissive = [mat_type[m] == ir.MAT_DIFFUSE_LIGHT for m in sph_mat]

    lt = np.asarray(scene.light_type)
    light_is_tri = [bool(t == ir.LIGHT_TRI) for t in lt]
    light_rows = _light_rows32(scene, mat_base)
    cam_row = _cam_row(scene)

    table_bytes = cd.tri_rows.nbytes + (cd.attr_rows.nbytes
                                        if cd.attr_rows is not None else 0)
    static = dict(
        mesh=True, nt=nt, ns=ns, n_mats=int(mat_type.shape[0]),
        n_lights=int(lt.shape[0]),
        mat_type=[int(t) for t in mat_type],
        prim_mat=sph_mat, prim_emissive=sph_emissive, tri_area=[],
        light_is_tri=light_is_tri,
        has_dof=float(scene.camera.aperture_radius) > 0.0,
        any_sphere_light_prim=any(sph_emissive),
        n_nodes=cd.n_nodes, max_k=cd.max_k,
        rows_per_cluster=cd.max_k * 16 // 128,
        has_vnormals=has_vnormals,
        mesh_stream=table_bytes > MESH_VMEM_BUDGET or _FORCE_STREAM,
        tree_depth=cd.tree_depth,
    )
    tables = dict(node_aabbs=cd.node_aabbs, node_cid=cd.node_cid,
                  node_skip=cd.node_skip, node_right=cd.node_right,
                  node_order=cd.node_order, ctri=cd.tri_rows, sph_c=sph_c,
                  mat_base=mat_base, mat_scalars=mat_scalars,
                  light_rows=light_rows, cam_row=cam_row)
    if has_vnormals:
        tables["cattr"] = cd.attr_rows
    return tables, static


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _uniform4(pix, samp, bounce, draw):
    """rng.uniform4 with the TPU-kernel-safe uint32->f32 route (Mosaic has
    no u32->f32 cast; values are < 2^24 after the shift so int32 is exact)."""
    def tofloat(u):
        return ((u >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
                * jnp.float32(5.9604645e-08))
    x, y, z, w = rng.pcg4d(pix, samp, bounce, draw)
    return tofloat(x), tofloat(y), tofloat(z), tofloat(w)


def _balance(pdf1, pdf2):
    return pdf1 / jnp.maximum(pdf1 + pdf2, 1e-20)


def _fdiv(a, b, guard=1e-30):
    """Finite-safe divide (miss lanes masked later)."""
    bad = jnp.abs(b) < guard
    return jnp.where(bad, 0.0, a / jnp.where(bad, 1.0, b))


def _to_dtype(x, dt):
    """Cast V3 / float arrays to ``dt`` (bools and ints pass through)."""
    if isinstance(x, V3):
        return V3(*(_to_dtype(c, dt) for c in x))
    if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.bfloat16):
        return x.astype(dt)
    return x


def _make_eval_pdf(settings):
    """shade.eval_pdf, optionally run in bf16 (RenderSettings.shading_dtype
    — the BSDF-precision experiment: eval/pdf math only; geometry, sampled
    directions and MIS weights stay f32)."""
    if getattr(settings, "shading_dtype", "f32") != "bf16":
        return shade.eval_pdf
    bf = jnp.bfloat16

    def eval_pdf_bf16(scene, mp, wi, wo, hit, regularize):
        mp16 = {k: _to_dtype(v, bf) for k, v in mp.items()}
        hit16 = shade.Hit(*(_to_dtype(v, bf) for v in hit))
        f, pdf = shade.eval_pdf(scene, mp16, _to_dtype(wi, bf),
                                _to_dtype(wo, bf), hit16, regularize)
        return _to_dtype(f, jnp.float32), _to_dtype(pdf, jnp.float32)

    return eval_pdf_bf16


# ---------------------------------------------------------------------------
# kernel factory
# ---------------------------------------------------------------------------

def _make_kernel(scene: ir.Scene, settings: ir.RenderSettings, static,
                 rows, n_pixels, walk_batch=1, regen_frac=1.0,
                 walk_mode="skip"):
    """Returns the Pallas kernel function (closes over static metadata and
    the Scene only for its static feature flags). ``walk_batch`` unrolls
    that many dependent node steps per while-loop iteration of the mesh
    cluster-tree walk (the loop's fixed per-iteration overhead — branch +
    scalar/vector sync, ~1 us measured — dominates interior visits).

    ``regen_frac`` gates lane regeneration on block occupancy: idle lanes
    restart only once the block's live fraction drops to <= regen_frac
    (1.0 = regenerate eagerly, the round-2 behavior; 0.0 = full lockstep —
    a block finishes its whole sample cohort before starting the next).
    Lower values keep each cluster-tree walk within one path GENERATION:
    mixed walks pay the union of a primary frustum AND bounce hemispheres,
    which is what made mesh walks coverage-bound. Estimator-exact: the
    per-(pixel, sample) RNG streams and per-lane accumulation order are
    unchanged — only the schedule moves."""
    nt, ns = static["nt"], static["ns"]
    NL = static["n_lights"]
    W, H, spp = settings.width, settings.height, settings.spp
    max_depth = settings.max_depth
    P = rows * 128
    Draw = rng.Draw
    # "mis" = NEE + balance-heuristic weights (mis_integrator.cpp);
    # "material" = forward tracing, no NEE (mat_integrator.cpp) — emission
    # collected on absorb, background added on every miss, analytic
    # eval_div_pdf cancellations (lambertian -> albedo, dielectric -> 1)
    mis = settings.integrator == "mis"

    mesh = bool(static.get("mesh", False))
    has_vn = bool(static.get("has_vnormals", False))
    stream = bool(static.get("mesh_stream", False))
    eval_pdf_fn = _make_eval_pdf(settings)

    def kernel(*refs):
        cattr_ref = None
        ctri_buf = ctri_sem = cattr_buf = cattr_sem = None
        stack_ref = None
        if mesh:
            # trailing SMEM traversal stack (stack walk only; harmless
            # 512 B scratch otherwise)
            refs, stack_ref = refs[:-1], refs[-1]
        if mesh and stream:
            # then the VMEM cluster buffer(s) + DMA semaphore(s)
            n_scratch = 4 if has_vn else 2
            refs, scratch = refs[:-n_scratch], refs[-n_scratch:]
            ctri_buf, ctri_sem = scratch[0], scratch[1]
            if has_vn:
                cattr_buf, cattr_sem = scratch[2], scratch[3]
        right_ref = order_ref = None
        if mesh and walk_mode == "stack":
            # right/order tables ride only for the stack walk: at large
            # node counts they would blow the ~1 MB SMEM budget (500k
            # tris: aabbs 708K + 2 tables 177K already fills it)
            if has_vn:
                (aabb_ref, cid_ref, skip_ref, right_ref, order_ref,
                 ctri_ref, cattr_ref, sph_ref, matb_ref, mats_ref,
                 light_ref, cam_ref, pix0_ref, film_r, film_g, film_b,
                 stats_ref) = refs
            else:
                (aabb_ref, cid_ref, skip_ref, right_ref, order_ref,
                 ctri_ref, sph_ref, matb_ref, mats_ref, light_ref,
                 cam_ref, pix0_ref, film_r, film_g, film_b,
                 stats_ref) = refs
        elif mesh and has_vn:
            (aabb_ref, cid_ref, skip_ref, ctri_ref, cattr_ref, sph_ref,
             matb_ref, mats_ref, light_ref, cam_ref, pix0_ref,
             film_r, film_g, film_b, stats_ref) = refs
        elif mesh:
            (aabb_ref, cid_ref, skip_ref, ctri_ref, sph_ref, matb_ref,
             mats_ref, light_ref, cam_ref, pix0_ref,
             film_r, film_g, film_b, stats_ref) = refs
        else:
            (tri_ref, triv_ref, sph_ref, matb_ref, mats_ref, light_ref,
             cam_ref, pix0_ref, film_r, film_g, film_b, stats_ref) = refs
        g = pl.program_id(0)

        # ---- scene constants: read once, closure-captured --------------
        n_unroll = 0 if mesh else nt
        tris = [tuple(tri_ref[i, k] for k in range(12))
                for i in range(n_unroll)]
        triv = [tuple(triv_ref[i, k] for k in range(12))
                for i in range(n_unroll)]
        sphs = [tuple(sph_ref[j, k] for k in range(4)) for j in range(ns)]
        mat_base = [tuple(matb_ref[m, k] for k in range(3))
                    for m in range(static["n_mats"])]
        mat_sc = [tuple(mats_ref[m, k] for k in range(ir.N_MAT_SCALARS))
                  for m in range(static["n_mats"])]
        lights = [tuple(light_ref[l, k] for k in range(32))
                  for l in range(NL)]
        cam = tuple(cam_ref[0, k] for k in range(19))
        vfov_deg, aperture, focal = cam[0], cam[1], cam[2]
        rot = cam[4:13]
        trans = cam[13:16]
        bg = cam[16:19]

        shape = (rows, 128)
        f0 = jnp.zeros(shape, jnp.float32)
        i0 = jnp.zeros(shape, jnp.int32)
        b0 = f0 > 1.0
        z3 = V3(f0, f0, f0)

        lane = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        # one pixel per lane; pix0 = this shard's first slot (0 unsharded)
        slot = pix0_ref[0, 0] + g * P + lane
        samp_off = pix0_ref[0, 1]   # global sample-id shift (checkpoints)
        if mesh:
            # MESH MODE: blocks are square-ish image TILES, not scanline
            # stripes. A 2048-lane stripe block is 4 rows x 512 px — its
            # rays fan over a wide frustum and each tree walk visits ~1/3
            # of all clusters (measured); a 64x32 tile's frustum is ~8x
            # tighter, and bounce/shadow rays inherit the locality of the
            # tile's hit points. pix stays the true pixel id, so RNG
            # streams and the estimator are unchanged; the driver inverts
            # the tiling when assembling the film.
            tw = TILE_W
            th = P // tw
            tiles_x = -(-W // tw)
            tile = slot // P
            local = slot - tile * P
            lx = local % tw
            ly = local // tw
            x_img = (tile % tiles_x) * tw + lx
            y_img = (tile // tiles_x) * th + ly
            pix = y_img * W + x_img
            in_frame = (x_img < W) & (y_img < H)
        else:
            pix = slot
            in_frame = pix < n_pixels

        # ---- stages ----------------------------------------------------
        def primary_ray(samp):
            """Camera ray for this lane's pixel at sample ``samp``
            (port of integrators._primary_rays + camera.generate_rays;
            op-for-op so the f32 results are bit-identical — see tri_n
            note in _pack_scene)."""
            x = pix % W
            y = (H - 1) - pix // W
            ox, oy = rng.r2_sequence(x + y + samp)
            px = x.astype(jnp.float32) + ox
            py = y.astype(jnp.float32) + oy
            theta = (f0 + vfov_deg) * (math.pi / 180.0)
            img_h = 2.0 * jnp.tan(theta / 2.0)
            img_w = img_h * (W / H)
            x_dir = img_w * (px / W) - img_w / 2.0
            y_dir = img_h * (py / H) - img_h / 2.0
            d = normalize(V3(x_dir, y_dir, jnp.full(shape, -1.0)))
            o = z3
            if static["has_dof"]:
                l1, l2, _, _ = _uniform4(pix, samp, 0, Draw.CAMERA_LENS)
                dx, dy = shade.sample_disk(l1, l2)
                o = V3(dx * aperture, dy * aperture, f0)
                ft = focal / jnp.abs(d.z)
                d = normalize(d * ft - o)
            wo = V3(rot[0] * o.x + rot[1] * o.y + rot[2] * o.z + trans[0],
                    rot[3] * o.x + rot[4] * o.y + rot[5] * o.z + trans[1],
                    rot[6] * o.x + rot[7] * o.y + rot[8] * o.z + trans[2])
            wd = normalize(
                V3(rot[0] * d.x + rot[1] * d.y + rot[2] * d.z,
                   rot[3] * d.x + rot[4] * d.y + rot[5] * d.z,
                   rot[6] * d.x + rot[7] * d.y + rot[8] * d.z))
            return wo, wd

        def trace(ro, rd, minT, maxT, any_hit=False):
            """Unrolled closest/any-hit over all prims (port of
            soa_intersect._trace_impl; same select semantics)."""
            best_t = maxT
            best_id = jnp.full(shape, -1, jnp.int32)
            best_u = f0
            best_v = f0
            for i, (nx, ny, nz, d0, m1x, m1y, m1z, c1,
                    m2x, m2y, m2z, c2) in enumerate(tris):
                ro_n = ro.x * nx + ro.y * ny + ro.z * nz
                rd_n = rd.x * nx + rd.y * ny + rd.z * nz
                par = jnp.abs(rd_n) < 1e-22
                t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                u = (ro.x * m1x + ro.y * m1y + ro.z * m1z - c1
                     + t * (rd.x * m1x + rd.y * m1y + rd.z * m1z))
                v = (ro.x * m2x + ro.y * m2y + ro.z * m2z - c2
                     + t * (rd.x * m2x + rd.y * m2y + rd.z * m2z))
                hit = (~par & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t >= minT) & (t < best_t))
                best_id = jnp.where(hit, i, best_id)
                best_u = jnp.where(hit, u, best_u)
                best_v = jnp.where(hit, v, best_v)
                best_t = jnp.where(hit, t, best_t)
            if ns:
                best_t, best_id = sphere_pass(ro, rd, minT, best_t, best_id,
                                              lambda j: nt + j)
            if any_hit:
                return best_id >= 0
            return best_t, best_id, best_u, best_v

        def sphere_pass(ro, rd, minT, best_t, best_id, idf):
            """Analytic sphere tests merged into (best_t, best_id); the id
            of sphere j is idf(j) (nt+j unrolled, 1+j in mesh mode)."""
            ro_rd = dot(ro, rd)
            ro2 = dot(ro, ro)
            rd2 = dot(rd, rd)
            for j, (cx, cy, cz, r2) in enumerate(sphs):
                ro_c = ro.x * cx + ro.y * cy + ro.z * cz
                rd_c = rd.x * cx + rd.y * cy + rd.z * cz
                b_prime = rd_c - ro_rd
                cc = ro2 - 2.0 * ro_c + (cx * cx + cy * cy + cz * cz) - r2
                disc4 = b_prime * b_prime - rd2 * cc
                has = disc4 >= 0.0
                sq = jnp.sqrt(jnp.maximum(disc4, 0.0))
                sign = jnp.where(b_prime > 0.0, 1.0, -1.0)
                q = b_prime + sign * sq
                x0 = _fdiv(cc, q)
                x1 = _fdiv(q, rd2)
                t0 = jnp.minimum(x0, x1)
                t1 = jnp.maximum(x0, x1)
                t0_ok = (t0 >= minT) & (t0 < best_t)
                t1_ok = (t1 >= minT) & (t1 < best_t)
                t = jnp.where(t0_ok, t0, t1)
                hit = has & (t0_ok | t1_ok)
                best_id = jnp.where(hit, idf(j), best_id)
                best_t = jnp.where(hit, t, best_t)
            return best_t, best_id

        # ---- mesh-mode traversal (geometry/cluster_trace.py layout) ----
        # One in-kernel walk of the skip-link cluster tree per trace; the
        # packed tri table is VMEM-resident and read directly with a
        # dynamic row offset (the measured-fastest cluster mode). Shading
        # inputs are captured AT HIT TIME from the cluster rows (plane
        # normal rows 0..2, material id row 12) — no per-tri gather ever
        # happens; the hit point is ro + t*rd (documented divergence from
        # the XLA path's barycentric reconstruction).
        if mesh:
            n_nodes = static["n_nodes"]
            rpc = static["rows_per_cluster"]
            max_k = static["max_k"]
            n_sub = max(max_k // 16, 1)

        def trace_mesh(ro, rd, minT, tmax, any_hit=False):
            ox, oy, oz = ro.x, ro.y, ro.z
            dx, dy, dz = rd.x, rd.y, rd.z
            idx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            idy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            idz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
            # hoist o*inv_d so each slab plane is bound*inv - oi (one fms)
            oix = ox * idx
            oiy = oy * idy
            oiz = oz * idz

            def cond(carry):
                return carry[0] < n_nodes

            def step(carry):
                if any_hit:
                    n, nv0, nl0, bt0 = carry
                elif has_vn:
                    (n, nv0, nl0, bt0, code0, nx0, ny0, nz0, mat0,
                     vx0, vy0, vz0) = carry
                else:
                    n, nv0, nl0, bt0, code0, nx0, ny0, nz0, mat0 = carry
                # with walk_batch > 1 a step may run past the walk's end:
                # clamp reads and no-op via ``valid`` (n stays put, so the
                # loop cond still sees a terminated walk)
                valid = n < n_nodes
                nr = jnp.minimum(n, n_nodes - 1)
                cid = cid_ref[nr // 128, nr % 128]
                c = jnp.maximum(cid, 0)

                if stream:
                    # tri table in HBM: tri_tests DMAs cluster c's block
                    # into the VMEM scratch first, reads go there
                    def tconst(k, j):
                        flat = k * 16 + j
                        return ctri_buf[flat // 128, flat % 128]

                    def tattr(k, j):
                        flat = k * 16 + j
                        return cattr_buf[flat // 128, flat % 128]
                else:
                    def tconst(k, j):
                        flat = k * 16 + j
                        return ctri_ref[c * rpc + flat // 128, flat % 128]

                    def tattr(k, j):
                        flat = k * 16 + j
                        return cattr_ref[c * rpc + flat // 128, flat % 128]

                arow = nr // 16
                acol = (nr % 16) * 8
                bxl = aabb_ref[arow, acol + 0]
                byl = aabb_ref[arow, acol + 1]
                bzl = aabb_ref[arow, acol + 2]
                bxh = aabb_ref[arow, acol + 3]
                byh = aabb_ref[arow, acol + 4]
                bzh = aabb_ref[arow, acol + 5]
                t0x = bxl * idx - oix
                t1x = bxh * idx - oix
                t0y = byl * idy - oiy
                t1y = byh * idy - oiy
                t0z = bzl * idz - oiz
                t1z = bzh * idz - oiz
                tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                              jnp.minimum(t0y, t1y)),
                                  jnp.maximum(jnp.minimum(t0z, t1z), minT))
                tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.minimum(jnp.maximum(t0z, t1z), bt0))
                live = tin <= tout
                if any_hit:
                    live = live & (bt0 > -jnp.inf)
                any_live = jnp.any(live) & valid

                def test16(sub0, carry, width=16):
                    if any_hit:
                        (bt,) = carry
                    elif has_vn:
                        bt, code, nx, ny, nz, mat, vx, vy, vz = carry
                    else:
                        bt, code, nx, ny, nz, mat = carry
                    for k in range(sub0, min(sub0 + width, max_k)):
                        tnx = tconst(k, 0)
                        tny = tconst(k, 1)
                        tnz = tconst(k, 2)
                        d0 = tconst(k, 3)
                        m1x = tconst(k, 4)
                        m1y = tconst(k, 5)
                        m1z = tconst(k, 6)
                        c1 = tconst(k, 7)
                        m2x = tconst(k, 8)
                        m2y = tconst(k, 9)
                        m2z = tconst(k, 10)
                        c2 = tconst(k, 11)
                        ro_n = ox * tnx + oy * tny + oz * tnz
                        rd_n = dx * tnx + dy * tny + dz * tnz
                        par = jnp.abs(rd_n) < 1e-22
                        t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                        u = (ox * m1x + oy * m1y + oz * m1z - c1
                             + t * (dx * m1x + dy * m1y + dz * m1z))
                        v = (ox * m2x + oy * m2y + oz * m2z - c2
                             + t * (dx * m2x + dy * m2y + dz * m2z))
                        hh = (~par & (u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t >= minT) & (t < bt)
                              & live)
                        if any_hit:
                            bt = jnp.where(hh, -jnp.inf, bt)
                        else:
                            code = jnp.where(hh, 0.0, code)
                            nx = jnp.where(hh, tnx, nx)
                            ny = jnp.where(hh, tny, ny)
                            nz = jnp.where(hh, tnz, nz)
                            mat = jnp.where(hh, tconst(k, 12), mat)
                            bt = jnp.where(hh, t, bt)
                            if has_vn:
                                # interpolated vertex normal, captured at
                                # hit time from the attr table (weights:
                                # (1-u-v, u, v) of (n0, n1, n2) — the
                                # intersect.py:251 convention via the
                                # ClusterTracer (u, v) mapping)
                                wz = 1.0 - u - v
                                vx = jnp.where(
                                    hh, tattr(k, 0) * wz + tattr(k, 3) * u
                                    + tattr(k, 6) * v, vx)
                                vy = jnp.where(
                                    hh, tattr(k, 1) * wz + tattr(k, 4) * u
                                    + tattr(k, 7) * v, vy)
                                vz = jnp.where(
                                    hh, tattr(k, 2) * wz + tattr(k, 5) * u
                                    + tattr(k, 8) * v, vz)
                    if any_hit:
                        return (bt,)
                    if has_vn:
                        return bt, code, nx, ny, nz, mat, vx, vy, vz
                    return bt, code, nx, ny, nz, mat

                # leaf gating stays at 16-tri granularity: measured on-chip,
                # 8-tri gates LOSE (9.8s vs 7.2s on the 100k-tri scene) —
                # each any()+cond gate costs ~0.34us of vector->scalar sync,
                # more than the halved tri tests save. (The packer also
                # stores 8-tri boxes; unused here.)
                def sub_gate(row_lo, row_hi, bt):
                    slx = tconst(row_lo, 13)
                    sly = tconst(row_lo, 14)
                    slz = tconst(row_lo, 15)
                    shx = tconst(row_hi, 13)
                    shy = tconst(row_hi, 14)
                    shz = tconst(row_hi, 15)
                    s0x = slx * idx - oix
                    s1x = shx * idx - oix
                    s0y = sly * idy - oiy
                    s1y = shy * idy - oiy
                    s0z = slz * idz - oiz
                    s1z = shz * idz - oiz
                    stin = jnp.maximum(
                        jnp.maximum(jnp.minimum(s0x, s1x),
                                    jnp.minimum(s0y, s1y)),
                        jnp.maximum(jnp.minimum(s0z, s1z), minT))
                    stout = jnp.minimum(
                        jnp.minimum(jnp.maximum(s0x, s1x),
                                    jnp.maximum(s0y, s1y)),
                        jnp.minimum(jnp.maximum(s0z, s1z), bt))
                    return jnp.any(live & (stin <= stout))

                def tri_tests(carry):
                    if stream:
                        dma = pltpu.make_async_copy(
                            ctri_ref.at[pl.ds(c * rpc, rpc), :],
                            ctri_buf, ctri_sem)
                        dma.start()
                        # shadow (any_hit) walks never read vertex-normal
                        # attrs — skipping the cattr DMA halves per-leaf
                        # DMA latency on streamed smooth-shaded meshes
                        if has_vn and not any_hit:
                            dma2 = pltpu.make_async_copy(
                                cattr_ref.at[pl.ds(c * rpc, rpc), :],
                                cattr_buf, cattr_sem)
                            dma2.start()
                            dma2.wait()
                        dma.wait()
                    if n_sub == 1:
                        return test16(0, carry)
                    for s in range(n_sub):
                        s_any = sub_gate(2 * s, 2 * s + 1, carry[0])
                        carry = jax.lax.cond(
                            s_any, functools.partial(test16, s * 16),
                            lambda cr: cr, carry)
                    return carry

                is_leaf = cid >= 0
                nv = nv0 + jnp.where(valid, 1.0, 0.0)
                nl = nl0 + jnp.where(any_live & is_leaf, 1.0, 0.0)
                if any_hit:
                    (bt,) = jax.lax.cond(any_live & is_leaf, tri_tests,
                                         lambda cr: cr, (bt0,))
                    n_next = jnp.where(
                        valid, jnp.where(any_live, nr + 1,
                                         skip_ref[nr // 128, nr % 128]), n)
                    return n_next, nv, nl, bt
                hit_carry = (bt0, code0, nx0, ny0, nz0, mat0)
                if has_vn:
                    hit_carry = hit_carry + (vx0, vy0, vz0)
                hit_carry = jax.lax.cond(any_live & is_leaf, tri_tests,
                                         lambda cr: cr, hit_carry)
                n_next = jnp.where(
                    valid, jnp.where(any_live, nr + 1,
                                     skip_ref[nr // 128, nr % 128]), n)
                return (n_next, nv, nl) + hit_carry

            def body(carry):
                for _ in range(walk_batch):
                    carry = step(carry)
                if any_hit:
                    # all-occluded early exit, checked once per batch (one
                    # reduction instead of one per node step)
                    n_stop = jnp.where(jnp.any(carry[3] > -jnp.inf),
                                       carry[0], n_nodes)
                    carry = (n_stop,) + carry[1:]
                return carry

            fz = jnp.float32(0.0)
            if any_hit:
                _, nv, nl, bt = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), fz, fz, tmax))
                occ = bt == -jnp.inf
                if ns:
                    bt_s, id_s = sphere_pass(ro, rd, minT, tmax,
                                             jnp.full(shape, -1, jnp.int32),
                                             lambda j: 1 + j)
                    occ = occ | (id_s >= 0)
                return occ, nv, nl
            init = (jnp.int32(0), fz, fz, tmax, f0 - 1.0, f0, f0,
                    f0 + 1.0, f0)
            if has_vn:
                init = init + (f0, f0, f0 + 1.0)
            out = jax.lax.while_loop(cond, body, init)
            _, nv, nl, bt, code, nx, ny, nz, mat = out[:9]
            vn = V3(*out[9:12]) if has_vn else None
            best_id = jnp.where(code >= 0.0, 0, -1)
            if ns:
                bt, best_id = sphere_pass(ro, rd, minT, bt, best_id,
                                          lambda j: 1 + j)
            return bt, best_id, V3(nx, ny, nz), vn, mat, nv, nl

        def trace_mesh_stack(ro, rd, minT, tmax, any_hit=False):
            """Near-first ordered cluster-tree walk with an explicit
            per-block SMEM stack — the reference's far-then-near push
            (bvh.h:200-213) at tile granularity. The descend-first child
            is picked by the block's majority direction octant via the
            packed per-node order bits (cut_clusters); descending the
            near side first shrinks best_t early, so far subtrees fail
            their slab tests and are popped without tri work. Results
            are identical to the skip-link walk (same hit set; order
            only affects performance)."""
            ox, oy, oz = ro.x, ro.y, ro.z
            dx, dy, dz = rd.x, rd.y, rd.z
            idx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            idy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            idz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
            oix = ox * idx
            oiy = oy * idy
            oiz = oz * idz

            # majority direction octant over live lanes (4 reductions,
            # once per walk; oct bit set = negative direction)
            livef = jnp.where(tmax > -jnp.inf, 1.0, 0.0)
            half = jnp.sum(livef) * 0.5
            sx = jnp.sum(jnp.where(dx < 0.0, livef, 0.0))
            sy = jnp.sum(jnp.where(dy < 0.0, livef, 0.0))
            sz = jnp.sum(jnp.where(dz < 0.0, livef, 0.0))
            oct_ = ((sx > half).astype(jnp.int32)
                    + 2 * (sy > half).astype(jnp.int32)
                    + 4 * (sz > half).astype(jnp.int32))

            def cond(carry):
                return carry[0] >= 0

            def step(carry):
                if any_hit:
                    n, sp, nv0, nl0, bt0 = carry
                elif has_vn:
                    (n, sp, nv0, nl0, bt0, code0, nx0, ny0, nz0, mat0,
                     vx0, vy0, vz0) = carry
                else:
                    (n, sp, nv0, nl0, bt0, code0, nx0, ny0, nz0,
                     mat0) = carry
                valid = n >= 0
                nr = jnp.maximum(n, 0)
                cid = cid_ref[nr // 128, nr % 128]
                c = jnp.maximum(cid, 0)

                if stream:
                    def tconst(k, j):
                        flat = k * 16 + j
                        return ctri_buf[flat // 128, flat % 128]

                    def tattr(k, j):
                        flat = k * 16 + j
                        return cattr_buf[flat // 128, flat % 128]
                else:
                    def tconst(k, j):
                        flat = k * 16 + j
                        return ctri_ref[c * rpc + flat // 128, flat % 128]

                    def tattr(k, j):
                        flat = k * 16 + j
                        return cattr_ref[c * rpc + flat // 128, flat % 128]

                arow = nr // 16
                acol = (nr % 16) * 8
                bxl = aabb_ref[arow, acol + 0]
                byl = aabb_ref[arow, acol + 1]
                bzl = aabb_ref[arow, acol + 2]
                bxh = aabb_ref[arow, acol + 3]
                byh = aabb_ref[arow, acol + 4]
                bzh = aabb_ref[arow, acol + 5]
                t0x = bxl * idx - oix
                t1x = bxh * idx - oix
                t0y = byl * idy - oiy
                t1y = byh * idy - oiy
                t0z = bzl * idz - oiz
                t1z = bzh * idz - oiz
                tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                              jnp.minimum(t0y, t1y)),
                                  jnp.maximum(jnp.minimum(t0z, t1z), minT))
                tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.minimum(jnp.maximum(t0z, t1z), bt0))
                live = tin <= tout
                if any_hit:
                    live = live & (bt0 > -jnp.inf)
                any_live = jnp.any(live) & valid

                def test16(sub0, carry, width=16):
                    if any_hit:
                        (bt,) = carry
                    elif has_vn:
                        bt, code, nx, ny, nz, mat, vx, vy, vz = carry
                    else:
                        bt, code, nx, ny, nz, mat = carry
                    for k in range(sub0, min(sub0 + width, max_k)):
                        tnx = tconst(k, 0)
                        tny = tconst(k, 1)
                        tnz = tconst(k, 2)
                        d0 = tconst(k, 3)
                        m1x = tconst(k, 4)
                        m1y = tconst(k, 5)
                        m1z = tconst(k, 6)
                        c1 = tconst(k, 7)
                        m2x = tconst(k, 8)
                        m2y = tconst(k, 9)
                        m2z = tconst(k, 10)
                        c2 = tconst(k, 11)
                        ro_n = ox * tnx + oy * tny + oz * tnz
                        rd_n = dx * tnx + dy * tny + dz * tnz
                        par = jnp.abs(rd_n) < 1e-22
                        t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                        u = (ox * m1x + oy * m1y + oz * m1z - c1
                             + t * (dx * m1x + dy * m1y + dz * m1z))
                        v = (ox * m2x + oy * m2y + oz * m2z - c2
                             + t * (dx * m2x + dy * m2y + dz * m2z))
                        hh = (~par & (u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t >= minT) & (t < bt)
                              & live)
                        if any_hit:
                            bt = jnp.where(hh, -jnp.inf, bt)
                        else:
                            code = jnp.where(hh, 0.0, code)
                            nx = jnp.where(hh, tnx, nx)
                            ny = jnp.where(hh, tny, ny)
                            nz = jnp.where(hh, tnz, nz)
                            mat = jnp.where(hh, tconst(k, 12), mat)
                            bt = jnp.where(hh, t, bt)
                            if has_vn:
                                wz = 1.0 - u - v
                                vx = jnp.where(
                                    hh, tattr(k, 0) * wz + tattr(k, 3) * u
                                    + tattr(k, 6) * v, vx)
                                vy = jnp.where(
                                    hh, tattr(k, 1) * wz + tattr(k, 4) * u
                                    + tattr(k, 7) * v, vy)
                                vz = jnp.where(
                                    hh, tattr(k, 2) * wz + tattr(k, 5) * u
                                    + tattr(k, 8) * v, vz)
                    if any_hit:
                        return (bt,)
                    if has_vn:
                        return bt, code, nx, ny, nz, mat, vx, vy, vz
                    return bt, code, nx, ny, nz, mat

                def sub_gate(row_lo, row_hi, bt):
                    slx = tconst(row_lo, 13)
                    sly = tconst(row_lo, 14)
                    slz = tconst(row_lo, 15)
                    shx = tconst(row_hi, 13)
                    shy = tconst(row_hi, 14)
                    shz = tconst(row_hi, 15)
                    s0x = slx * idx - oix
                    s1x = shx * idx - oix
                    s0y = sly * idy - oiy
                    s1y = shy * idy - oiy
                    s0z = slz * idz - oiz
                    s1z = shz * idz - oiz
                    stin = jnp.maximum(
                        jnp.maximum(jnp.minimum(s0x, s1x),
                                    jnp.minimum(s0y, s1y)),
                        jnp.maximum(jnp.minimum(s0z, s1z), minT))
                    stout = jnp.minimum(
                        jnp.minimum(jnp.maximum(s0x, s1x),
                                    jnp.maximum(s0y, s1y)),
                        jnp.minimum(jnp.maximum(s0z, s1z), bt))
                    return jnp.any(live & (stin <= stout))

                def tri_tests(carry):
                    if stream:
                        dma = pltpu.make_async_copy(
                            ctri_ref.at[pl.ds(c * rpc, rpc), :],
                            ctri_buf, ctri_sem)
                        dma.start()
                        if has_vn and not any_hit:
                            dma2 = pltpu.make_async_copy(
                                cattr_ref.at[pl.ds(c * rpc, rpc), :],
                                cattr_buf, cattr_sem)
                            dma2.start()
                            dma2.wait()
                        dma.wait()
                    if n_sub == 1:
                        return test16(0, carry)
                    for s in range(n_sub):
                        s_any = sub_gate(2 * s, 2 * s + 1, carry[0])
                        carry = jax.lax.cond(
                            s_any, functools.partial(test16, s * 16),
                            lambda cr: cr, carry)
                    return carry

                is_leaf = cid >= 0
                nv = nv0 + jnp.where(valid, 1.0, 0.0)
                nl = nl0 + jnp.where(any_live & is_leaf, 1.0, 0.0)
                if any_hit:
                    hit_carry = jax.lax.cond(any_live & is_leaf, tri_tests,
                                             lambda cr: cr, (bt0,))
                else:
                    hit_carry = (bt0, code0, nx0, ny0, nz0, mat0)
                    if has_vn:
                        hit_carry = hit_carry + (vx0, vy0, vz0)
                    hit_carry = jax.lax.cond(any_live & is_leaf, tri_tests,
                                             lambda cr: cr, hit_carry)

                # near-first advance: descend into the octant-ordered
                # near child, pushing the far child; otherwise pop
                rt = right_ref[nr // 128, nr % 128]
                ob = (order_ref[nr // 128, nr % 128] >> oct_) & 1
                left = nr + 1
                near = jnp.where(ob == 1, rt, left)
                far = jnp.where(ob == 1, left, rt)
                descend = any_live & ~is_leaf

                @pl.when(descend)
                def _():
                    stack_ref[sp] = far

                popped = stack_ref[jnp.maximum(sp - 1, 0)]
                n_next = jnp.where(
                    valid,
                    jnp.where(descend, near,
                              jnp.where(sp > 0, popped, -1)),
                    n)
                sp_next = jnp.where(
                    valid,
                    jnp.where(descend, sp + 1, jnp.maximum(sp - 1, 0)),
                    sp)
                return (n_next, sp_next, nv, nl) + hit_carry

            def body(carry):
                for _ in range(walk_batch):
                    carry = step(carry)
                if any_hit:
                    # all-occluded early exit, once per batch
                    n_stop = jnp.where(jnp.any(carry[4] > -jnp.inf),
                                       carry[0], -1)
                    carry = (n_stop,) + carry[1:]
                return carry

            fz = jnp.float32(0.0)
            if any_hit:
                _, _, nv, nl, bt = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), jnp.int32(0), fz, fz, tmax))
                occ = bt == -jnp.inf
                if ns:
                    bt_s, id_s = sphere_pass(ro, rd, minT, tmax,
                                             jnp.full(shape, -1, jnp.int32),
                                             lambda j: 1 + j)
                    occ = occ | (id_s >= 0)
                return occ, nv, nl
            init = (jnp.int32(0), jnp.int32(0), fz, fz, tmax, f0 - 1.0,
                    f0, f0, f0 + 1.0, f0)
            if has_vn:
                init = init + (f0, f0, f0 + 1.0)
            out = jax.lax.while_loop(cond, body, init)
            _, _, nv, nl, bt, code, nx, ny, nz, mat = out[:10]
            vn = V3(*out[10:13]) if has_vn else None
            best_id = jnp.where(code >= 0.0, 0, -1)
            if ns:
                bt, best_id = sphere_pass(ro, rd, minT, bt, best_id,
                                          lambda j: 1 + j)
            return bt, best_id, V3(nx, ny, nz), vn, mat, nv, nl

        def trace_mesh_defer(ro, rd, minT, tmax, any_hit=False):
            """Skip-link walk with DEFERRED liveness: iteration i issues
            the slab-test chain for node n_{i+1} and consumes its
            vector->scalar reduction only at iteration i+1, so the scalar
            unit never stalls on a just-issued vector chain (probe:
            the any() itself costs ~1ns when its operand chain has had an
            iteration to drain — r3_probe_b/c). Sub-gate reductions at
            leaves are likewise all issued before the first cond.
            Successor slabs use the pre-leaf best_t (conservative: best_t
            only shrinks; the exact t < best_t test still clamps)."""
            ox, oy, oz = ro.x, ro.y, ro.z
            dx, dy, dz = rd.x, rd.y, rd.z
            idx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
            idy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
            idz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
            oix = ox * idx
            oiy = oy * idy
            oiz = oz * idz

            def slab6(xl, yl, zl, xh, yh, zh, btv):
                t0x = xl * idx - oix
                t1x = xh * idx - oix
                t0y = yl * idy - oiy
                t1y = yh * idy - oiy
                t0z = zl * idz - oiz
                t1z = zh * idz - oiz
                tin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                              jnp.minimum(t0y, t1y)),
                                  jnp.maximum(jnp.minimum(t0z, t1z), minT))
                tout = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.minimum(jnp.maximum(t0z, t1z), btv))
                return tin <= tout

            def node_live(nr, btv):
                arow = nr // 16
                acol = (nr % 16) * 8
                live = slab6(aabb_ref[arow, acol + 0],
                             aabb_ref[arow, acol + 1],
                             aabb_ref[arow, acol + 2],
                             aabb_ref[arow, acol + 3],
                             aabb_ref[arow, acol + 4],
                             aabb_ref[arow, acol + 5], btv)
                if any_hit:
                    live = live & (btv > -jnp.inf)
                return live

            def cond(carry):
                return carry[0] < n_nodes

            def step(carry):
                if any_hit:
                    n, live_f, nv0, nl0, bt0 = carry
                elif has_vn:
                    (n, live_f, nv0, nl0, bt0, code0, nx0, ny0, nz0, mat0,
                     vx0, vy0, vz0) = carry
                else:
                    (n, live_f, nv0, nl0, bt0, code0, nx0, ny0, nz0,
                     mat0) = carry
                valid = n < n_nodes
                nr = jnp.minimum(n, n_nodes - 1)
                live = live_f > 0.0
                any_n = jnp.any(live) & valid
                cid = cid_ref[nr // 128, nr % 128]
                c = jnp.maximum(cid, 0)
                is_leaf = cid >= 0

                if stream:
                    def tconst(k, j):
                        flat = k * 16 + j
                        return ctri_buf[flat // 128, flat % 128]

                    def tattr(k, j):
                        flat = k * 16 + j
                        return cattr_buf[flat // 128, flat % 128]
                else:
                    def tconst(k, j):
                        flat = k * 16 + j
                        return ctri_ref[c * rpc + flat // 128, flat % 128]

                    def tattr(k, j):
                        flat = k * 16 + j
                        return cattr_ref[c * rpc + flat // 128, flat % 128]

                def test16(sub0, carry, width=16):
                    if any_hit:
                        (bt,) = carry
                    elif has_vn:
                        bt, code, nx, ny, nz, mat, vx, vy, vz = carry
                    else:
                        bt, code, nx, ny, nz, mat = carry
                    for k in range(sub0, min(sub0 + width, max_k)):
                        tnx = tconst(k, 0)
                        tny = tconst(k, 1)
                        tnz = tconst(k, 2)
                        d0 = tconst(k, 3)
                        m1x = tconst(k, 4)
                        m1y = tconst(k, 5)
                        m1z = tconst(k, 6)
                        c1 = tconst(k, 7)
                        m2x = tconst(k, 8)
                        m2y = tconst(k, 9)
                        m2z = tconst(k, 10)
                        c2 = tconst(k, 11)
                        ro_n = ox * tnx + oy * tny + oz * tnz
                        rd_n = dx * tnx + dy * tny + dz * tnz
                        par = jnp.abs(rd_n) < 1e-22
                        t = (d0 - ro_n) / jnp.where(par, 1.0, rd_n)
                        u = (ox * m1x + oy * m1y + oz * m1z - c1
                             + t * (dx * m1x + dy * m1y + dz * m1z))
                        v = (ox * m2x + oy * m2y + oz * m2z - c2
                             + t * (dx * m2x + dy * m2y + dz * m2z))
                        hh = (~par & (u >= 0.0) & (v >= 0.0)
                              & (u + v <= 1.0) & (t >= minT) & (t < bt)
                              & live)
                        if any_hit:
                            bt = jnp.where(hh, -jnp.inf, bt)
                        else:
                            code = jnp.where(hh, 0.0, code)
                            nx = jnp.where(hh, tnx, nx)
                            ny = jnp.where(hh, tny, ny)
                            nz = jnp.where(hh, tnz, nz)
                            mat = jnp.where(hh, tconst(k, 12), mat)
                            bt = jnp.where(hh, t, bt)
                            if has_vn:
                                wz = 1.0 - u - v
                                vx = jnp.where(
                                    hh, tattr(k, 0) * wz + tattr(k, 3) * u
                                    + tattr(k, 6) * v, vx)
                                vy = jnp.where(
                                    hh, tattr(k, 1) * wz + tattr(k, 4) * u
                                    + tattr(k, 7) * v, vy)
                                vz = jnp.where(
                                    hh, tattr(k, 2) * wz + tattr(k, 5) * u
                                    + tattr(k, 8) * v, vz)
                    if any_hit:
                        return (bt,)
                    if has_vn:
                        return bt, code, nx, ny, nz, mat, vx, vy, vz
                    return bt, code, nx, ny, nz, mat

                def tri_tests(carry):
                    if stream:
                        dma = pltpu.make_async_copy(
                            ctri_ref.at[pl.ds(c * rpc, rpc), :],
                            ctri_buf, ctri_sem)
                        dma.start()
                        if has_vn and not any_hit:
                            dma2 = pltpu.make_async_copy(
                                cattr_ref.at[pl.ds(c * rpc, rpc), :],
                                cattr_buf, cattr_sem)
                            dma2.start()
                            dma2.wait()
                        dma.wait()
                    if n_sub == 1:
                        return test16(0, carry)
                    # all sub-box chains + reductions issued before the
                    # first cond: the 4 reduces pipeline instead of each
                    # paying a fresh chain drain (entry bt for all —
                    # conservative)
                    bt_in = carry[0]
                    s_anys = []
                    for s in range(n_sub):
                        lo_r, hi_r = 2 * s, 2 * s + 1
                        sl = slab6(tconst(lo_r, 13), tconst(lo_r, 14),
                                   tconst(lo_r, 15), tconst(hi_r, 13),
                                   tconst(hi_r, 14), tconst(hi_r, 15),
                                   bt_in)
                        s_anys.append(jnp.any(live & sl))
                    for s in range(n_sub):
                        carry = jax.lax.cond(
                            s_anys[s], functools.partial(test16, s * 16),
                            lambda cr: cr, carry)
                    return carry

                nv = nv0 + jnp.where(valid, 1.0, 0.0)
                nl = nl0 + jnp.where(any_n & is_leaf, 1.0, 0.0)
                if any_hit:
                    hit_carry = jax.lax.cond(any_n & is_leaf, tri_tests,
                                             lambda cr: cr, (bt0,))
                else:
                    hit_carry = (bt0, code0, nx0, ny0, nz0, mat0)
                    if has_vn:
                        hit_carry = hit_carry + (vx0, vy0, vz0)
                    hit_carry = jax.lax.cond(any_n & is_leaf, tri_tests,
                                             lambda cr: cr, hit_carry)

                # successor: leaf's skip == n+1, so one select covers all
                skipv = skip_ref[nr // 128, nr % 128]
                n_next = jnp.where(
                    valid,
                    jnp.where(any_n & ~is_leaf, nr + 1, skipv), n)
                # issue the successor's slab chain NOW (vs pre-leaf bt0,
                # conservative); its reduce lands next iteration
                nn = jnp.minimum(n_next, n_nodes - 1)
                live_next = node_live(nn, bt0)
                live_next_f = jnp.where(live_next, 1.0, 0.0)
                return (n_next, live_next_f, nv, nl) + hit_carry

            def body(carry):
                for _ in range(walk_batch):
                    carry = step(carry)
                if any_hit:
                    n_stop = jnp.where(jnp.any(carry[4] > -jnp.inf),
                                       carry[0], n_nodes)
                    carry = (n_stop,) + carry[1:]
                return carry

            fz = jnp.float32(0.0)
            live0 = jnp.where(node_live(jnp.int32(0), tmax), 1.0, 0.0)
            if any_hit:
                _, _, nv, nl, bt = jax.lax.while_loop(
                    cond, body, (jnp.int32(0), live0, fz, fz, tmax))
                occ = bt == -jnp.inf
                if ns:
                    bt_s, id_s = sphere_pass(ro, rd, minT, tmax,
                                             jnp.full(shape, -1, jnp.int32),
                                             lambda j: 1 + j)
                    occ = occ | (id_s >= 0)
                return occ, nv, nl
            init = (jnp.int32(0), live0, fz, fz, tmax, f0 - 1.0,
                    f0, f0, f0 + 1.0, f0)
            if has_vn:
                init = init + (f0, f0, f0 + 1.0)
            out = jax.lax.while_loop(cond, body, init)
            _, _, nv, nl, bt, code, nx, ny, nz, mat = out[:10]
            vn = V3(*out[10:13]) if has_vn else None
            best_id = jnp.where(code >= 0.0, 0, -1)
            if ns:
                bt, best_id = sphere_pass(ro, rd, minT, bt, best_id,
                                          lambda j: 1 + j)
            return bt, best_id, V3(nx, ny, nz), vn, mat, nv, nl

        if mesh:
            trace_mesh_fn = {"stack": trace_mesh_stack,
                             "defer": trace_mesh_defer}.get(walk_mode,
                                                            trace_mesh)

        def hit_frame(ro, rd, t, best_id, bu, bv):
            """Shading data for the winning prim: position, normals, ONB
            frame, material params (select chains over the tiny tables).
            Tri hit points are barycentric (see _pack_scene tri_v note);
            (bu, bv) are the e1/e2 coefficients from the dual-basis test."""
            p = ro + rd * t
            n = z3
            if nt:
                p0, p1, p2 = z3, z3, z3
                is_tri = (best_id >= 0) & (best_id < nt)
                for i in range(nt):
                    m = best_id == i
                    tv = triv[i]
                    n = where(m, V3(f0 + tv[9], f0 + tv[10], f0 + tv[11]), n)
                    p0 = where(m, V3(f0 + tv[0], f0 + tv[1], f0 + tv[2]), p0)
                    p1 = where(m, V3(f0 + tv[3], f0 + tv[4], f0 + tv[5]), p1)
                    p2 = where(m, V3(f0 + tv[6], f0 + tv[7], f0 + tv[8]), p2)
                # weights of (p0, p1, p2) from the (e1, e2) coefficients,
                # summed in geometry/intersect.py:257 operand order
                wu = 1.0 - bu - bv
                p_tri = p0 * wu + p1 * bu + p2 * bv
                p = where(is_tri, p_tri, p)
            if ns:
                csel = z3
                is_sph = best_id >= nt
                for j, (cx, cy, cz, r2) in enumerate(sphs):
                    m = best_id == nt + j
                    csel = where(m, V3(f0 + cx, f0 + cy, f0 + cz), csel)
                # normalize(hit_p - center), like intersect.py:372
                n = where(is_sph, normalize(p - csel), n)

            mat_id = i0
            for i in range(nt + ns):
                mat_id = jnp.where(best_id == i, static["prim_mat"][i],
                                   mat_id)
            tangent, bitangent = onb_from_normal(n)
            return p, n, shade.Hit(n_s=n, n_g=n, tangent=tangent,
                                   bitangent=bitangent), mat_id

        def hit_frame_mesh(ro, rd, t, best_id, n_tri, vn_tri, mat_tri):
            """Mesh-mode shading frame: tri normal/material were captured
            from the cluster rows during the walk (best_id 0 = tri,
            1+j = sphere j); hit point is ro + t*rd. ``vn_tri`` is the
            unnormalized interpolated vertex normal (None when the scene
            has no vertex normals — then n_s == n_g)."""
            p = ro + rd * t
            is_tri = best_id == 0
            nn = normalize(n_tri)
            n = where(is_tri, nn, z3)
            mat_id = jnp.where(is_tri, mat_tri.astype(jnp.int32), 0)
            if ns:
                csel = z3
                is_sph = best_id >= 1
                for j, (cx, cy, cz, r2) in enumerate(sphs):
                    m = best_id == 1 + j
                    csel = where(m, V3(f0 + cx, f0 + cy, f0 + cz), csel)
                    mat_id = jnp.where(m, static["prim_mat"][j], mat_id)
                n = where(is_sph, normalize(p - csel), n)
            n_s = where(is_tri, normalize(vn_tri), n) if has_vn else n
            tangent, bitangent = onb_from_normal(n_s)
            return p, n, shade.Hit(n_s=n_s, n_g=n, tangent=tangent,
                                   bitangent=bitangent), mat_id

        def sphere_light_pdf(pdf, best_id, ro, p, rd, idf, emissive_at):
            """Fold each emissive sphere's area pdf into ``pdf`` where
            best_id == idf(j) (the reference Sphere::surf_pdf cone/inside
            rule) — shared by both kernel modes, which differ only in the
            id base and the emissive-prim indexing."""
            for j, (cx, cy, cz, r2) in enumerate(sphs):
                if not emissive_at(j):
                    continue
                c = V3(f0 + cx, f0 + cy, f0 + cz)
                toc = ro - c
                d2 = dot(toc, toc)
                inside = d2 <= r2
                sa = 4.0 * math.pi * r2
                cos_max = jnp.sqrt(jnp.clip(
                    1.0 - r2 / jnp.maximum(d2, 1e-20), 0.0, 1.0))
                pdf_cone = 1.0 / (2.0 * math.pi
                                  * jnp.maximum(1.0 - cos_max, 1e-12))
                nrm = normalize(p - c)
                cosine = jnp.abs(dot(nrm, -rd))
                dd = p - ro
                dist2 = dot(dd, dd)
                spdf = jnp.where(inside, 1.0 / sa,
                                 pdf_cone * cosine
                                 / jnp.maximum(dist2, 1e-20))
                pdf = jnp.where(best_id == idf(j), spdf, pdf)
            return pdf

        def surf_pdf_mesh(best_id, n_tri, ro, p, rd):
            """Mesh-mode area pdf of a BSDF-sampled light hit: tri area is
            |plane normal|/2 (the unnormalized cross product the cluster
            rows carry); spheres as in the unrolled path."""
            area = 0.5 * jnp.sqrt(jnp.maximum(dot(n_tri, n_tri), 0.0))
            pdf = jnp.where(best_id == 0,
                            1.0 / jnp.maximum(area, 1e-20), f0)
            if static["any_sphere_light_prim"]:
                pdf = sphere_light_pdf(
                    pdf, best_id, ro, p, rd, lambda j: 1 + j,
                    lambda j: static["prim_emissive"][j])
            return pdf

        def gather_mat(mat_id):
            """Per-lane material params via select chains (the in-kernel
            tgather; material types are static)."""
            mp = dict(base=z3, eta=f0 + 1.0)
            for key in ("spec_trans", "subsurface", "specular", "spec_tint",
                        "anisotropic", "sheen", "sheen_tint", "clearcoat",
                        "clearcoat_gloss", "metallic", "roughness"):
                mp[key] = f0
            cols = dict(eta=ir.MS_IOR, spec_trans=ir.MS_SPEC_TRANS,
                        subsurface=ir.MS_SUBSURFACE, specular=ir.MS_SPECULAR,
                        spec_tint=ir.MS_SPEC_TINT, anisotropic=ir.MS_ANISO,
                        sheen=ir.MS_SHEEN, sheen_tint=ir.MS_SHEEN_TINT,
                        clearcoat=ir.MS_CLEARCOAT,
                        clearcoat_gloss=ir.MS_CLEARCOAT_GLOSS,
                        metallic=ir.MS_METALLIC, roughness=ir.MS_ROUGHNESS)
            is_lamb, is_diel, is_light, is_prin = b0, b0, b0, b0
            for k in range(static["n_mats"]):
                m = mat_id == k
                t = static["mat_type"][k]
                mp["base"] = where(m, V3(f0 + mat_base[k][0],
                                         f0 + mat_base[k][1],
                                         f0 + mat_base[k][2]), mp["base"])
                if t == ir.MAT_LAMBERTIAN:
                    is_lamb = is_lamb | m
                elif t == ir.MAT_DIELECTRIC:
                    is_diel = is_diel | m
                    mp["eta"] = jnp.where(m, mat_sc[k][ir.MS_IOR], mp["eta"])
                elif t == ir.MAT_DIFFUSE_LIGHT:
                    is_light = is_light | m
                elif t == ir.MAT_PRINCIPLED:
                    is_prin = is_prin | m
                    for key, c in cols.items():
                        mp[key] = jnp.where(m, mat_sc[k][c], mp[key])
            mp.update(is_lamb=is_lamb, is_diel=is_diel, is_light=is_light,
                      is_prin=is_prin)
            return mp

        def surf_pdf(best_id, ro, p, rd):
            """Area pdf of the hit point on the hit (emissive) prim — MIS
            for BSDF light hits (port of emitters.surf_pdf)."""
            pdf = f0
            for i in range(nt):
                if static["prim_emissive"][i]:
                    pdf = jnp.where(best_id == i,
                                    1.0 / max(static["tri_area"][i], 1e-20),
                                    pdf)
            if static["any_sphere_light_prim"]:
                pdf = sphere_light_pdf(
                    pdf, best_id, ro, p, rd, lambda j: nt + j,
                    lambda j: static["prim_emissive"][nt + j])
            return pdf

        def sample_lights(look_from, pick, r1, r2):
            """Uniform light pick + per-type sampling (port of
            emitters.sample_lights); returns (rad, wi, pdf, dist, G)."""
            idx = jnp.clip((pick * NL).astype(jnp.int32), 0, NL - 1)
            rad, wi = z3, z3
            pdf, dist, G = f0, f0, f0
            # selected params per type
            any_tri = any(static["light_is_tri"])
            any_sph = not all(static["light_is_tri"])
            if any_tri:
                p0, p1, p2, nrm, emit = z3, z3, z3, z3, z3
                ln0, ln1, ln2 = z3, z3, z3
                area = f0
                is_tri = b0
                for l, row in enumerate(lights):
                    if not static["light_is_tri"][l]:
                        continue
                    m = idx == l
                    is_tri = is_tri | m
                    p0 = where(m, V3(f0 + row[0], f0 + row[1], f0 + row[2]), p0)
                    p1 = where(m, V3(f0 + row[3], f0 + row[4], f0 + row[5]), p1)
                    p2 = where(m, V3(f0 + row[6], f0 + row[7], f0 + row[8]), p2)
                    nrm = where(m, V3(f0 + row[9], f0 + row[10],
                                      f0 + row[11]), nrm)
                    area = jnp.where(m, row[12], area)
                    emit = where(m, V3(f0 + row[13], f0 + row[14],
                                       f0 + row[15]), emit)
                    ln0 = where(m, V3(f0 + row[16], f0 + row[17],
                                      f0 + row[18]), ln0)
                    ln1 = where(m, V3(f0 + row[19], f0 + row[20],
                                      f0 + row[21]), ln1)
                    ln2 = where(m, V3(f0 + row[22], f0 + row[23],
                                      f0 + row[24]), ln2)
                u, v = shade.sample_triangle_uv(r1, r2)
                w = 1.0 - u - v
                # op order of emitters._sample_tri:54-66 (per-vertex light
                # normals interpolate like emitters.py:57; the packer fills
                # ln0 == ln1 == ln2 == face normal when a tri has no vertex
                # normals — interpolation then reproduces the old
                # normalize(nrm*u + nrm*v + nrm*w) bit-exactly)
                hit_p = p0 * u + p1 * v + p2 * w
                hit_n = normalize(ln0 * u + ln1 * v + ln2 * w)
                dvec = hit_p - look_from
                dist2 = dot(dvec, dvec)
                t_wi = normalize(dvec)
                t_pdf = 1.0 / jnp.maximum(area, 1e-20)
                t_G = jnp.abs(dot(hit_n, -t_wi)) / jnp.maximum(dist2, 1e-20)
                front = dot(hit_n, t_wi) < 0.0
                t_rad = where(front, emit, z3)
                rad = where(is_tri, t_rad, rad)
                wi = where(is_tri, t_wi, wi)
                pdf = jnp.where(is_tri, t_pdf, pdf)
                dist = jnp.where(is_tri, jnp.sqrt(dist2), dist)
                G = jnp.where(is_tri, t_G, G)
            if any_sph:
                c, emit = z3, z3
                radius = f0
                is_sph = b0
                for l, row in enumerate(lights):
                    if static["light_is_tri"][l]:
                        continue
                    m = idx == l
                    is_sph = is_sph | m
                    c = where(m, V3(f0 + row[0], f0 + row[1], f0 + row[2]), c)
                    radius = jnp.where(m, row[3], radius)
                    emit = where(m, V3(f0 + row[4], f0 + row[5],
                                       f0 + row[6]), emit)
                to_c = look_from - c
                d2 = dot(to_c, to_c)
                inside = d2 <= radius * radius
                cos_max = jnp.sqrt(jnp.clip(
                    1.0 - (radius * radius) / jnp.maximum(d2, 1e-20),
                    0.0, 1.0))
                dir_c = normalize(to_c)
                u_ax, v_ax = onb_from_normal(dir_c)
                zdir = shade.sample_sphere_cap(r1, r2, cos_max)
                p_out = normalize(u_ax * zdir.x + v_ax * zdir.y
                                  + dir_c * zdir.z) * radius + c
                p_in = shade.sample_sphere(r1, r2) * radius + c
                hit_p = where(inside, p_in, p_out)
                nrm = normalize(hit_p - c)
                dvec = hit_p - look_from
                dist2 = dot(dvec, dvec)
                s_wi = normalize(dvec)
                s_G = jnp.abs(dot(nrm, -s_wi)) / jnp.maximum(dist2, 1e-20)
                sa = 4.0 * math.pi * radius * radius
                pdf_cone = 1.0 / (2.0 * math.pi
                                  * jnp.maximum(1.0 - cos_max, 1e-12))
                s_pdf = jnp.where(inside, 1.0 / sa, pdf_cone * s_G)
                front = dot(nrm, s_wi) < 0.0
                s_rad = where(front, emit, z3)
                rad = where(is_sph, s_rad, rad)
                wi = where(is_sph, s_wi, wi)
                pdf = jnp.where(is_sph, s_pdf, pdf)
                dist = jnp.where(is_sph, jnp.sqrt(dist2), dist)
                G = jnp.where(is_sph, s_G, G)
            return rad, wi, pdf / NL, dist, G

        # ---- the persistent loop ---------------------------------------
        def body(st):
            (m, d, active_i, fresh_i, prev_delta_i, non_spec_i,
             ro, rd, tp, res, acc, eta_scale, prev_pdf,
             nseg, nshadow, nvisit, nleaf, nvisit_s, nleaf_s) = st
            # bool lane flags ride the while carry as i32 — Mosaic can't
            # legalize scf.yield of i1 vectors
            active = active_i != 0
            fresh = fresh_i != 0
            prev_delta = prev_delta_i != 0
            non_spec = non_spec_i != 0

            # regenerate idle lanes (wavefront refill, static schedule);
            # with regen_frac < 1 regeneration waits until the block has
            # drained to that live fraction (walk-union coherence)
            busy = m < spp
            gen = busy & ~active
            if regen_frac < 1.0:
                n_act = jnp.sum(active_i, dtype=jnp.int32)
                gen = gen & (n_act <= jnp.int32(int(regen_frac * P)))
            samp = m + samp_off   # global sample index: RNG streams and
                                  # the r2 jitter continue across slabs
            ro_new, rd_new = primary_ray(samp)
            ro = where(gen, ro_new, ro)
            rd = where(gen, rd_new, rd)
            tp = where(gen, V3(f0 + 1.0, f0 + 1.0, f0 + 1.0), tp)
            res = where(gen, z3, res)
            d = jnp.where(gen, 0, d)
            eta_scale = jnp.where(gen, 1.0, eta_scale)
            prev_pdf = jnp.where(gen, 0.0, prev_pdf)
            prev_delta = prev_delta & ~gen
            non_spec = non_spec & ~gen
            fresh = fresh | gen
            # == busy when regen_frac == 1.0; otherwise ungated idle lanes
            # stay parked (they contribute nothing to walks: tmax = -inf)
            active = active | gen
            nseg = nseg + jnp.sum(active, dtype=jnp.float32)

            # ---- 1. trace + emissive/miss termination ------------------
            minT = f0 + MIN_T
            infT = f0 + jnp.inf
            if mesh:
                # idle lanes get tmax = -inf: they keep no tree node live,
                # so drained blocks walk straight out (same trick as the
                # cluster tracer's padding lanes)
                tmax_act = jnp.where(active, infT, -jnp.inf)
                (best_t, best_id, n_tri, vn_tri, mat_tri, nv_t,
                 nl_t) = trace_mesh_fn(ro, rd, minT, tmax_act)
                nvisit = nvisit + nv_t
                nleaf = nleaf + nl_t
                hit = best_id >= 0
                t_safe = jnp.where(hit, best_t, 1.0)
                p, n_g, hi, mat_id = hit_frame_mesh(ro, rd, t_safe, best_id,
                                                    n_tri, vn_tri, mat_tri)
            else:
                best_t, best_id, bu, bv = trace(ro, rd, minT, infT)
                hit = best_id >= 0
                t_safe = jnp.where(hit, best_t, 1.0)
                p, n_g, hi, mat_id = hit_frame(ro, rd, t_safe, best_id,
                                               bu, bv)
            mp = gather_mat(mat_id)

            found = active & hit
            missed = active & ~hit
            front = dot(hi.n_s, rd) < 0.0
            em = where(front, mp["base"], z3)
            bg_col = V3(f0 + bg[0], f0 + bg[1], f0 + bg[2])

            if mis:
                emissive = found & mp["is_light"]
                if mesh:
                    light_pdf = surf_pdf_mesh(best_id, n_tri, ro, p,
                                              rd) / max(NL, 1)
                else:
                    light_pdf = surf_pdf(best_id, ro, p, rd) / max(NL, 1)
                dvec = ro - p
                dist2 = jnp.maximum(dot(dvec, dvec), 1e-20)
                G2 = jnp.abs(dot(n_g, normalize(dvec))) / dist2
                w1 = fresh | prev_delta | (prev_pdf == 0.0)
                # clamp the solid-angle->area product: a near-singular BSDF
                # pdf (GGX spike x grazing G2) can overflow f32 to inf and
                # _balance(inf, x) = inf/inf = NaN; the physical limit of a
                # huge BSDF pdf is weight -> 1, which the clamp preserves
                w_hit = jnp.where(w1, 1.0,
                                  _balance(jnp.minimum(prev_pdf * G2, 1e30),
                                           light_pdf))
                res = where(emissive, res + tp * em * w_hit, res)

                # background on miss (mis_integrator.cpp:36-38, 173-186)
                bgp = INV_4PI / max(NL, 1)
                w_bg = jnp.where(w1, 1.0, _balance(prev_pdf, bgp))
                add_bg = missed & (fresh | bool(scene.bg_is_emissive))
                res = where(add_bg, res + tp * bg_col * w_bg, res)

                terminated = missed | emissive
                cont = found & ~emissive
            else:
                # material integrator: every miss collects the background
                # unweighted (mat_integrator.cpp:74-80); emissive hits fall
                # through to sample_mat, which absorbs them below
                res = where(missed, res + tp * bg_col, res)
                terminated = missed
                cont = found

            # ---- russian roulette (mis_integrator.cpp:153-167) ---------
            # the XLA loop draws RR with key d AFTER the bounce-d BSDF
            # sample and trace; at this point in the restructured loop the
            # counter is already d+1, so key/threshold use d-1 for exact
            # estimator parity with integrators.py
            rr_rand, _, _, _ = _uniform4(pix, samp, d - 1, Draw.ROULETTE)
            inv_es = 1.0 / eta_scale
            rr_max = jnp.minimum(
                jnp.maximum(tp.x * inv_es,
                            jnp.maximum(tp.y * inv_es, tp.z * inv_es)),
                ROULETTE_CLAMP)
            survive = rr_rand <= rr_max
            do_rr = cont & (d - 1 > ROULETTE_THRESHOLD) & ~fresh
            tp = where(do_rr & survive,
                       tp / jnp.maximum(rr_max, 1e-20), tp)
            rr_kill = do_rr & ~survive
            terminated = terminated | rr_kill
            cont = cont & ~rr_kill
            if max_depth < 2 ** 30:
                depth_kill = cont & (d + 1 > max_depth)
                terminated = terminated | depth_kill
                cont = cont & ~depth_kill

            # ---- 2. NEE (MIS only) -------------------------------------
            mat_delta = mp["is_diel"]
            if NL > 0 and mis:
                pick, lr1, lr2, _ = _uniform4(pix, samp, d, Draw.LIGHT_SAMPLE)
                ls_rad, ls_wi, ls_pdf, ls_dist, ls_G = sample_lights(
                    p, pick, lr1, lr2)
                do_nee = cont & ~mat_delta & (ls_pdf != 0.0)
                shadow_max = jnp.where(jnp.isfinite(ls_dist),
                                       ls_dist - SHADOW_EPS, infT)
                if mesh:
                    occl, nv_s, nl_s = trace_mesh_fn(
                        p, ls_wi, minT,
                        jnp.where(do_nee, shadow_max, -jnp.inf),
                        any_hit=True)
                    nvisit_s = nvisit_s + nv_s
                    nleaf_s = nleaf_s + nl_s
                else:
                    occl = trace(p, ls_wi, minT, shadow_max, any_hit=True)
                nshadow = nshadow + jnp.sum(do_nee, dtype=jnp.float32)
                f, mpdf = eval_pdf_fn(scene, mp, rd, ls_wi, hi, non_spec)
                ok = do_nee & ~occl & (mpdf != 0.0) & ~jnp.isnan(mpdf)
                w = _balance(ls_pdf, mpdf * ls_G)
                contrib = tp * f * ls_rad * (w * ls_G
                                             / jnp.maximum(ls_pdf, 1e-20))
                contrib = where(jnp.isnan(contrib.x) | jnp.isnan(contrib.y)
                                | jnp.isnan(contrib.z), z3, contrib)
                res = where(ok, res + contrib, res)

            # ---- 3. BSDF sampling --------------------------------------
            b1, b2, b3, b4 = _uniform4(pix, samp, d, Draw.BSDF_SAMPLE)
            rands = {"lobe": b1, "u": b2, "v": b3, "fresnel": b4}
            wo, s_eta, is_spec, valid = shade.sample_mat(
                scene, mp, rd, hi, rands, non_spec)
            absorbed = cont & ~valid
            if not mis:
                # absorb == emissive hit (DiffuseLight sample is invalid) or
                # back-face: collect one-sided emission (mat_integrator.cpp)
                res = where(absorbed & mp["is_light"], res + tp * em, res)
            terminated = terminated | absorbed
            cont = cont & valid
            non_spec = non_spec | (cont & ~is_spec)

            refr = s_eta != 0.0
            eta_scale = jnp.where(refr & cont,
                                  eta_scale / jnp.maximum(s_eta * s_eta,
                                                          1e-20), eta_scale)

            if mis:
                f2, pdf2 = eval_pdf_fn(scene, mp, rd, wo, hi, non_spec)
                nan_pdf = jnp.isnan(pdf2)
                terminated = terminated | (cont & nan_pdf)
                cont = cont & ~nan_pdf

                ratio = where(mat_delta, V3(f0 + 1.0, f0 + 1.0, f0 + 1.0),
                              f2 / jnp.maximum(pdf2, 1e-20))
                ratio = V3(*(jnp.where(jnp.isnan(r) | jnp.isinf(r), 0.0, r)
                             for r in ratio))
                prev_pdf = jnp.where(cont, pdf2, prev_pdf)
                prev_delta = bsel(cont, mat_delta, prev_delta)
            else:
                # analytic eval_div_pdf cancellations (bsdf.eval_div_pdf):
                # lambertian -> albedo, dielectric -> 1, principled -> f/pdf
                # guarded to 0 on pdf <= 0 / NaN
                if scene.has_principled:
                    f2, pdf2 = eval_pdf_fn(scene, mp, rd, wo, hi,
                                           non_spec)
                    ratio = where(pdf2 > 0.0,
                                  f2 / jnp.maximum(pdf2, 1e-20), z3)
                else:
                    ratio = z3
                if scene.has_lambertian:
                    ratio = where(mp["is_lamb"], mp["base"], ratio)
                if scene.has_dielectric:
                    ratio = where(mp["is_diel"],
                                  V3(f0 + 1.0, f0 + 1.0, f0 + 1.0), ratio)
            tp = where(cont, tp * ratio, tp)

            ro = where(cont, p, ro)
            rd = where(cont, wo, rd)
            d = jnp.where(cont, d + 1, d)
            fresh = fresh & ~active

            # ---- 4. retire ---------------------------------------------
            acc = where(terminated, acc + res, acc)
            m = jnp.where(terminated, m + 1, m)
            active = cont
            return (m, d, active.astype(jnp.int32),
                    fresh.astype(jnp.int32), prev_delta.astype(jnp.int32),
                    non_spec.astype(jnp.int32),
                    ro, rd, tp, res, acc, eta_scale, prev_pdf,
                    nseg, nshadow, nvisit, nleaf, nvisit_s, nleaf_s)

        def cond(st):
            return jnp.any(st[0] < spp)

        m0 = jnp.where(in_frame, 0, spp)
        st = (m0, i0, i0, i0, i0, i0, z3, z3, z3, z3, z3,
              f0 + 1.0, f0, jnp.float32(0.0), jnp.float32(0.0),
              jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
              jnp.float32(0.0))
        st = jax.lax.while_loop(cond, body, st)
        acc = st[10]
        nseg, nshadow, nvisit, nleaf = st[13], st[14], st[15], st[16]
        nvisit_s, nleaf_s = st[17], st[18]

        film_r[:] = acc.x
        film_g[:] = acc.y
        film_b[:] = acc.z
        col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        stats_ref[:] = (jnp.where(col == 0, nseg, 0.0)
                        + jnp.where(col == 1, nshadow, 0.0)
                        + jnp.where(col == 2, nvisit, 0.0)
                        + jnp.where(col == 3, nleaf, 0.0)
                        + jnp.where(col == 4, nvisit_s, 0.0)
                        + jnp.where(col == 5, nleaf_s, 0.0))

    return kernel


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _build_renderer(scene_key, settings: ir.RenderSettings, static_key,
                    rows, n_blocks, n_pixels, interpret, walk_batch=1,
                    regen_frac=1.0, walk_mode="skip"):
    """Compiled pallas_call wrapper; cached on static configuration.
    scene_key/static_key are hashable digests built by render_megakernel —
    the actual scene tables are passed as runtime args."""
    scene, static = _MEGA_CACHE[scene_key]
    kernel = _make_kernel(scene, settings, static, rows, n_pixels,
                          walk_batch, regen_frac, walk_mode)

    scratch_shapes = []
    if static.get("mesh"):
        # node tables + scalars in SMEM; the packed cluster tri table (and
        # the attr table when vertex normals exist) are full-array VMEM
        # operands (resident_direct cluster mode) — or HBM operands with a
        # per-leaf DMA scratch when they exceed the VMEM budget
        n_tab = 2 if static.get("has_vnormals") else 1
        if static.get("mesh_stream"):
            tab_space = pl.ANY
            rpc = static["rows_per_cluster"]
            for _ in range(n_tab):
                scratch_shapes += [pltpu.VMEM((rpc, 128), jnp.float32),
                                   pltpu.SemaphoreType.DMA(())]
        else:
            tab_space = pltpu.VMEM
        # SMEM traversal stack for the near-first ordered walk (sized to
        # the cluster tree's max depth + slack; tiny either way)
        scratch_shapes += [pltpu.SMEM(
            (max(static.get("tree_depth", 64) + 8, 32),), jnp.int32)]
        n_node_tabs = 5 if walk_mode == "stack" else 3
        in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_node_tabs
                    + [pl.BlockSpec(memory_space=tab_space)] * n_tab
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 6)
    else:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 8

    film_shape = jax.ShapeDtypeStruct((n_blocks * rows, 128), jnp.float32)
    fn = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_shape=(film_shape, film_shape, film_shape,
                   jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.float32)),
        out_specs=(
            pl.BlockSpec((rows, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )
    return jax.jit(fn)


_MEGA_CACHE = {}
_PACK_CACHE = {}


def _mega_cache_put(key, scene, static):
    """Bounded insert: each entry pins a Scene + packed tables (up to
    ~100 MB for streamed meshes) — long-lived processes sweeping configs
    must not grow this without limit. _build_renderer reads the entry
    synchronously during its (cached) build, so evicting older keys is
    safe: a future cache-miss re-inserts before building."""
    if len(_MEGA_CACHE) > 16:
        _MEGA_CACHE.clear()
    _MEGA_CACHE[key] = (scene, static)


def _pack_scene_cached(scene):
    """Cache packed tables per Scene object — mesh packing builds the
    cluster tables (a host SAH build), too slow to repeat per render call.
    The cache holds the scene itself so id() can't be reused."""
    key = id(scene)
    hit = _PACK_CACHE.get(key)
    if hit is not None and hit[0] is scene:
        return hit[1], hit[2]
    tables, static = _pack_scene(scene)
    if len(_PACK_CACHE) > 16:
        _PACK_CACHE.clear()
    _PACK_CACHE[key] = (scene, tables, static)
    return tables, static


def _runtime_args(tables, static, walk_mode="skip"):
    """Ordered runtime operands matching the kernel signature."""
    if static.get("mesh"):
        order = ((tables["node_right"], tables["node_order"])
                 if walk_mode == "stack" else ())
        attr = (tables["cattr"],) if static.get("has_vnormals") else ()
        return (tables["node_aabbs"], tables["node_cid"],
                tables["node_skip"]) + order + (tables["ctri"],) + attr + (
                tables["sph_c"],
                tables["mat_base"], tables["mat_scalars"],
                tables["light_rows"], tables["cam_row"].reshape(1, -1))
    return (tables["tri_c"], tables["tri_v"], tables["sph_c"],
            tables["mat_base"], tables["mat_scalars"],
            tables["light_rows"], tables["cam_row"].reshape(1, -1))


def _static_key(scene, static):
    """Hashable digest of the static layout facts the kernel bakes in
    (numeric table VALUES are runtime args)."""
    return (static["nt"], static["ns"], static["n_mats"],
            static["n_lights"], tuple(static["mat_type"]),
            tuple(static["prim_mat"]),
            tuple(bool(e) for e in static["prim_emissive"]),
            tuple(static["tri_area"]),
            tuple(static["light_is_tri"]), static["has_dof"],
            static["any_sphere_light_prim"],
            bool(static.get("mesh", False)), static.get("n_nodes", 0),
            static.get("max_k", 0), bool(static.get("has_vnormals", False)),
            bool(static.get("mesh_stream", False)),
            static.get("tree_depth", 0),
            scene.has_lambertian, scene.has_dielectric,
            scene.has_principled, scene.has_sheen, scene.has_clearcoat,
            scene.has_aniso, scene.has_spec_trans,
            bool(scene.bg_is_emissive))


def _block_layout(is_mesh, W, H, P):
    """Block count + slot->pixel map. Mesh mode tiles the image into
    TILE_W x (P/TILE_W) windows (one per block) for walk locality; sphere
    mode keeps linear scanline blocks."""
    if not is_mesh:
        return -(-W * H // P), None
    tw = TILE_W
    th = max(P // tw, 1)
    tiles_x = -(-W // tw)
    tiles_y = -(-H // th)
    return tiles_x * tiles_y, (tw, th, tiles_x)


def _assemble_film(films, is_mesh, W, H, P, n_blocks, spp):
    """(film_r, film_g, film_b) device blocks -> (H, W, 3) image."""
    if not is_mesh:
        return np.stack([np.asarray(f).reshape(-1)[:W * H] for f in films],
                        axis=-1).reshape(H, W, 3) / spp
    tw, th, tiles_x = _block_layout(True, W, H, P)[1]
    slots = np.arange(n_blocks * P)
    tile, local = slots // P, slots % P
    x = (tile % tiles_x) * tw + local % tw
    y = (tile // tiles_x) * th + local // tw
    valid = (x < W) & (y < H)
    img = np.zeros((H, W, 3), np.float32)
    for c, f in enumerate(films):
        flat = np.asarray(f).reshape(-1)[:slots.size]
        img[y[valid], x[valid], c] = flat[valid]
    return img / spp


DEFAULT_REGEN_FRAC = 1.0     # mesh regen occupancy gate (see _make_kernel):
                             # swept on-chip in round 3 (tools/probe_regen,
                             # bench_records/r3_probe_regen.json) — eager
                             # regen wins; lower fracs spread the same rays
                             # over more (cheaper) walks and lose net

DEFAULT_WALK_MODE = "defer"  # mesh traversal: "defer" (deferred-liveness
                             # skip walk — r3 sweep winner), "skip", or
                             # "stack" (near-first ordered)
DEFAULT_MESH_ROWS = 16       # r3 sweep: rows=16 wb=4 beats rows=32 for
                             # the defer walk (bench_records/r3_probe_defer)
DEFAULT_MESH_WALK_BATCH = 4  # r3: the while_loop's data-dependent cond
                             # costs ~0.4us per ITERATION (probe_walkablate
                             # — body content/carry size barely matter);
                             # unrolling 4 node steps per iteration
                             # amortizes it. The round-2 wb=2 default
                             # predates the defer walk.


def render_megakernel(scene: ir.Scene, settings: ir.RenderSettings,
                      rows=None, return_stats=False, progress=False,
                      walk_batch=None, sample_offset=0, regen_frac=None,
                      walk=None):
    """Full-frame MIS render with the persistent Pallas megakernel.

    ``sample_offset`` shifts every per-pixel sample id (and so every RNG
    stream) — checkpoint slabs use it to continue a render exactly.
    ``walk`` picks the mesh traversal: "skip" (preorder skip links) or
    "stack" (near-first ordered, SMEM stack)."""
    import time

    tables, static = _pack_scene_cached(scene)
    W, H, spp = settings.width, settings.height, settings.spp
    n_pixels = W * H
    is_mesh = bool(static.get("mesh", False))
    if rows is None:
        rows = DEFAULT_MESH_ROWS if is_mesh else DEFAULT_ROWS
    P = rows * 128
    while rows > 1 and (rows // 2) * 128 >= n_pixels:
        rows //= 2
        P = rows * 128
    n_blocks, _ = _block_layout(is_mesh, W, H, P)

    interpret = jax.default_backend() == "cpu"
    if settings.shading_dtype == "bf16" and not interpret:
        # Mosaic cannot lower bf16 comparisons to i1 vector masks on this
        # toolchain ("Invalid relayout ... vector<32x128xi1>" out of
        # principled_frame's flip compare); the experiment runs on the CPU
        # interpreter only. Measured there: mean |d| ~ 5e-4 linear vs f32.
        import warnings
        warnings.warn("shading_dtype=bf16 is CPU-interpret only (Mosaic "
                      "i1-relayout gap); falling back to f32 on TPU")
        import dataclasses as _dc
        settings = _dc.replace(settings, shading_dtype="f32")

    stream = bool(static.get("mesh_stream", False))
    if walk_batch is None:
        walk_batch = ((2 if stream else DEFAULT_MESH_WALK_BATCH)
                      if is_mesh else 1)
    if regen_frac is None:
        regen_frac = DEFAULT_REGEN_FRAC if is_mesh else 1.0
    if walk is None:
        # HBM-streamed tables: the defer walk's speculative successor
        # slab inside the DMA'd leaf branch crashes the Mosaic compile
        # helper (r3_probe_e) — streamed scenes keep the proven skip walk
        walk = (("skip" if stream else DEFAULT_WALK_MODE)
                if is_mesh else "skip")
    static_key = _static_key(scene, static)
    scene_key = (static_key, settings, rows, n_blocks, walk_batch,
                 regen_frac, walk)
    _mega_cache_put(scene_key, scene, static)
    fn = _build_renderer(scene_key, settings, static_key, rows, n_blocks,
                         n_pixels, interpret, walk_batch, regen_frac, walk)

    args = _runtime_args(tables, static, walk) + (
        np.array([[0, sample_offset]], np.int32),)
    t0 = time.time()
    film_r, film_g, film_b, stats = jax.block_until_ready(fn(*args))
    dt = time.time() - t0

    img = _assemble_film((film_r, film_g, film_b), is_mesh, W, H, P,
                         n_blocks, spp)
    # counters live in row 0, columns 0..3 (the kernel broadcasts each
    # scalar down a column; an earlier reader indexed [:, 1, 0] which is
    # column 0 again, double-reporting segments as shadow rays)
    st = np.asarray(stats).reshape(n_blocks, 8, 128)
    segs = float(st[:, 0, 0].sum())
    shadow = float(st[:, 0, 1].sum())
    nvisit = float(st[:, 0, 2].sum())
    nleaf = float(st[:, 0, 3].sum())
    nvisit_s = float(st[:, 0, 4].sum())
    nleaf_s = float(st[:, 0, 5].sum())
    if progress:
        total = n_pixels * spp
        print(f"Megakernel: {total / max(dt, 1e-9) / 1e6:.2f} Mpaths/s, "
              f"{(segs + shadow) / max(dt, 1e-9) / 1e6:.2f} Mrays/s "
              f"({segs / 1e6:.1f}M segments + {shadow / 1e6:.1f}M shadow)")
    if return_stats:
        return img, dict(segments=segs, shadow_rays=shadow, seconds=dt,
                         node_visits=nvisit, leaf_visits=nleaf,
                         node_visits_shadow=nvisit_s,
                         leaf_visits_shadow=nleaf_s)
    return img


def render_megakernel_sharded(scene: ir.Scene, settings: ir.RenderSettings,
                              mesh=None, rows=DEFAULT_ROWS,
                              return_stats=False, walk_batch=None,
                              sample_offset=0):
    """Multi-device megakernel render: pixel blocks are embarrassingly
    parallel (each block writes a disjoint film window), so the block axis
    is sharded over the mesh with shard_map — no collectives at all, the
    per-device films concatenate into the frame. This is the megakernel's
    analogue of parallel/sharding.py's ray-DP for the wavefront.

    ``sample_offset`` shifts every per-pixel sample id exactly like
    render_megakernel's — checkpoint slabs can use either path."""
    import time
    from jax.sharding import Mesh, PartitionSpec
    shard_map = jax.shard_map

    if mesh is None:
        mesh = Mesh(np.asarray(jax.devices()), ("blocks",))
    axis = mesh.axis_names[0]
    n_dev = mesh.size

    tables, static = _pack_scene_cached(scene)
    W, H, spp = settings.width, settings.height, settings.spp
    n_pixels = W * H
    P = rows * 128
    is_mesh = bool(static.get("mesh", False))
    n_blocks, _ = _block_layout(is_mesh, W, H, P)
    blocks_per_dev = -(-n_blocks // n_dev)

    stream = bool(static.get("mesh_stream", False))
    if walk_batch is None:
        walk_batch = ((2 if stream else DEFAULT_MESH_WALK_BATCH)
                      if is_mesh else 1)
    regen_frac = DEFAULT_REGEN_FRAC if is_mesh else 1.0
    walk_mode = (("skip" if stream else DEFAULT_WALK_MODE)
                 if is_mesh else "skip")
    static_key = _static_key(scene, static)
    scene_key = (static_key, settings, rows, blocks_per_dev, "sharded",
                 walk_batch, regen_frac, walk_mode)
    _mega_cache_put(scene_key, scene, static)
    interpret = jax.default_backend() == "cpu"
    fn = _build_renderer(scene_key, settings, static_key, rows,
                         blocks_per_dev, n_pixels, interpret, walk_batch,
                         regen_frac, walk_mode)

    args = _runtime_args(tables, static, walk_mode)

    def shard_fn(*tb):
        i = jax.lax.axis_index(axis)
        pix0 = jnp.stack([(i * (blocks_per_dev * P)).astype(jnp.int32),
                          jnp.int32(sample_offset)]).reshape(1, 2)
        return fn(*tb, pix0)

    rep = PartitionSpec()
    sh = PartitionSpec(axis)
    sharded = jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(rep,) * len(args),
        out_specs=(sh, sh, sh, sh), check_vma=False))
    t0 = time.time()
    film_r, film_g, film_b, stats = jax.block_until_ready(
        sharded(*(jnp.asarray(a) for a in args)))
    dt = time.time() - t0

    img = _assemble_film((film_r, film_g, film_b), is_mesh, W, H, P,
                         blocks_per_dev * n_dev, spp)
    if return_stats:
        st = np.asarray(stats).reshape(-1, 8, 128)
        return img, dict(segments=float(st[:, 0, 0].sum()),
                         shadow_rays=float(st[:, 0, 1].sum()), seconds=dt)
    return img


