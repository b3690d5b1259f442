"""Texture pipeline + glTF loader tests."""
import io
import json
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from vimg_tpu.scene import ir
from vimg_tpu.textures.mipmap import (AtlasBuilder, build_mip_chain,
                                      rgb_to_normal, srgb_to_linear)


class TestMipmap:
    def test_chain_shapes(self):
        img = np.random.default_rng(0).random((64, 32, 3)).astype(np.float32)
        mips = build_mip_chain(img)
        assert mips[0].shape == (64, 32, 3)
        assert mips[1].shape == (32, 16, 3)
        # levels = ceil(log2(min(W,H))) = 5
        assert len(mips) == 5

    def test_constant_image_preserved(self):
        img = np.full((32, 32, 3), 0.25, np.float32)
        mips = build_mip_chain(img)
        for m in mips:
            # Wronski filter weights sum to 4*0.37487566-4*0.12487566 = 1
            assert np.allclose(m, 0.25, atol=1e-3), m.shape

    def test_srgb_roundtrip(self):
        x = np.linspace(0, 1, 64, dtype=np.float32).reshape(-1, 1)
        lin = srgb_to_linear(x)
        assert lin.min() >= 0 and lin.max() <= 1
        assert lin[32] < x[32]  # srgb curve is above linear

    def test_normal_decode(self):
        flat = np.full((4, 4, 3), 127.5, np.float32)
        flat[..., 2] = 255.0
        n = rgb_to_normal(flat)
        assert np.allclose(n, [0, 0, 1], atol=1e-3)


class TestAtlas:
    def _scene_with_tex(self, img):
        from vimg_tpu.scene.json_loader import SceneBuilder
        from vimg_tpu.render.camera import Camera
        from vimg_tpu.core.math import look_at
        ab = AtlasBuilder()
        aid = ab.add(img)
        atlas_arr, meta, _ = ab.finalize()
        b = SceneBuilder()
        tex = b.add_texture(ir.TEX_IMAGE, atlas_id=aid)
        m = b.add_material(ir.MAT_LAMBERTIAN, base=(1, 1, 1),
                           tex=(tex, -1, -1))
        b.add_sphere((0, 0, 0), 1.0, m)
        cam = Camera.make(look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), 8, 8, 45)
        return b.build(camera=cam,
                       atlas=dict(atlas=jnp.asarray(atlas_arr),
                                  atlas_meta=jnp.asarray(meta)))

    def test_bilinear_texel_centers(self):
        img = np.zeros((4, 4, 3), np.float32)
        img[0, 0] = [1, 0, 0]
        img[3, 3] = [0, 1, 0]
        scene = self._scene_with_tex(img)
        from vimg_tpu.textures.texture import _atlas_fetch_bilinear
        # reference convention: pixel = uv * W, floor -> texel (0,0) spans
        # uv [0, .25)x[0, .25)
        uv = jnp.asarray([[0.01, 0.01], [0.76, 0.76]])
        lvl = jnp.zeros((2,), jnp.int32)
        tid = jnp.zeros((2,), jnp.int32)
        c = np.asarray(_atlas_fetch_bilinear(scene, lvl, tid, uv))
        assert c[0, 0] > 0.9 and c[0, 1] < 0.1
        assert c[1, 1] > 0.9 and c[1, 0] < 0.1

    def test_trilinear_levels(self):
        img = np.random.default_rng(3).random((16, 16, 3)).astype(np.float32)
        scene = self._scene_with_tex(img)
        from vimg_tpu.textures.texture import atlas_trilinear
        tid = jnp.zeros((1,), jnp.int32)
        uv = jnp.asarray([[0.37, 0.53]])
        c_hi = np.asarray(atlas_trilinear(scene, tid, uv, jnp.asarray([0.0])))
        c_mid = np.asarray(atlas_trilinear(scene, tid, uv, jnp.asarray([0.5])))
        c_lo = np.asarray(atlas_trilinear(scene, tid, uv, jnp.asarray([3.0])))
        # coarse level approaches the image mean; the fractional lod blends
        assert abs(c_lo.mean() - img.mean()) < 0.25
        assert not np.allclose(c_hi, c_lo)
        assert np.all((np.minimum(c_hi, 1) != c_mid) | (c_hi == c_lo))
        # clamped past the last level is finite
        c_over = np.asarray(atlas_trilinear(scene, tid, uv, jnp.asarray([9.0])))
        assert np.all(np.isfinite(c_over))


def make_test_glb(tmp_path, with_texture=True):
    """Build a minimal GLB: textured quad + emissive quad + camera."""
    from PIL import Image

    # geometry: floor quad (z=0), light quad above
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0],
                    [-0.5, -0.5, 2], [0.5, -0.5, 2], [0.5, 0.5, 2],
                    [-0.5, 0.5, 2]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                   [0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx_floor = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    idx_light = np.array([4, 6, 5, 4, 7, 6], np.uint16)

    bin_parts = [pos.tobytes(), uv.tobytes(), idx_floor.tobytes(),
                 idx_light.tobytes()]
    img_bytes = b""
    if with_texture:
        tex = np.zeros((8, 8, 3), np.uint8)
        tex[::2, ::2] = 255
        tex[1::2, 1::2] = 255
        buf = io.BytesIO()
        Image.fromarray(tex).save(buf, format="PNG")
        img_bytes = buf.getvalue()
        bin_parts.append(img_bytes + b"\x00" * ((4 - len(img_bytes) % 4) % 4))
    offsets = []
    off = 0
    for p in bin_parts:
        offsets.append(off)
        off += len(p) + (4 - len(p) % 4) % 4
    bin_blob = b"".join(p + b"\x00" * ((4 - len(p) % 4) % 4)
                        for p in bin_parts)

    views = [
        {"buffer": 0, "byteOffset": offsets[0], "byteLength": pos.nbytes},
        {"buffer": 0, "byteOffset": offsets[1], "byteLength": uv.nbytes},
        {"buffer": 0, "byteOffset": offsets[2],
         "byteLength": idx_floor.nbytes},
        {"buffer": 0, "byteOffset": offsets[3],
         "byteLength": idx_light.nbytes},
    ]
    if with_texture:
        views.append({"buffer": 0, "byteOffset": offsets[4],
                      "byteLength": len(img_bytes)})

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0},
            {"mesh": 1},
            {"camera": 0, "translation": [0, 0, 5]},
        ],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.8, "aspectRatio": 1.0}}],
        "meshes": [
            {"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2, "material": 0}]},
            {"primitives": [{
                "attributes": {"POSITION": 0},
                "indices": 3, "material": 1}]},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 8,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 8,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": views,
        "buffers": [{"byteLength": len(bin_blob)}],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "metallicFactor": 0.0, "roughnessFactor": 0.8,
                **({"baseColorTexture": {"index": 0}} if with_texture
                   else {})}},
            {"emissiveFactor": [1, 1, 1],
             "extensions": {"KHR_materials_emissive_strength":
                            {"emissiveStrength": 5.0}}},
        ],
    }
    if with_texture:
        gltf["textures"] = [{"source": 0}]
        gltf["images"] = [{"bufferView": 4, "mimeType": "image/png"}]

    jbytes = json.dumps(gltf).encode()
    jbytes += b" " * ((4 - len(jbytes) % 4) % 4)
    glb = (b"glTF" + struct.pack("<II", 2, 28 + len(jbytes) + len(bin_blob))
           + struct.pack("<II", len(jbytes), 0x4E4F534A) + jbytes
           + struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob)
    p = tmp_path / "test.glb"
    p.write_bytes(glb)
    return p


class TestGLTF:
    def test_load_counts(self, tmp_path):
        from vimg_tpu.scene.gltf_loader import load_gltf_scene
        p = make_test_glb(tmp_path)
        scene, settings = load_gltf_scene(p)
        assert scene.n_tris() == 4
        assert scene.n_mats() == 2
        assert scene.n_lights() == 2   # emissive quad tris
        assert scene.has_principled
        assert scene.has_image_tex
        assert settings.width == settings.height == 768

    def test_companion_json(self, tmp_path):
        from vimg_tpu.scene.gltf_loader import load_gltf_scene
        p = make_test_glb(tmp_path, with_texture=False)
        cj = tmp_path / "settings.json"
        cj.write_text(json.dumps({"spp": 7, "depth": 3, "integrator": "mis",
                                  "yres": 64,
                                  "background": [0.2, 0.3, 0.4]}))
        scene, settings = load_gltf_scene(p, cj)
        assert settings.spp == 7 and settings.max_depth == 3
        assert settings.integrator == "mis"
        assert settings.height == 64
        assert scene.bg_is_emissive
        assert scene.lights_have_bg

    def test_render_textured(self, tmp_path):
        import dataclasses
        from vimg_tpu.scene.gltf_loader import load_gltf_scene
        from vimg_tpu.render.render import render
        p = make_test_glb(tmp_path)
        scene, settings = load_gltf_scene(p)
        scene = scene.replace(camera=dataclasses.replace(
            scene.camera, width=32, height=32))
        settings = dataclasses.replace(settings, width=32, height=32, spp=16,
                                       max_depth=4, integrator="mis",
                                       batch_size=32 * 32 * 16)
        img = render(scene, settings, integrator="mis")
        assert not np.any(np.isnan(img))
        assert img.mean() > 1e-4  # light illuminates the floor


class TestEnvAlias:
    """Alias-table env importance sampler (lights/envmap.py): same texel
    distribution as the reference's row x conditional CDF
    (background.h:110-139), via one (prob, alias) gather."""

    def _scene(self):
        from vimg_tpu.lights import envmap
        rs = np.random.RandomState(0)
        H, W = 32, 64
        img = rs.rand(H, W, 3).astype(np.float32) * 0.2
        img[5, 10] = [300, 280, 250]          # sun texel
        env = envmap.build_env_tables(img)
        scene = ir.build_scene(
            verts=np.zeros((3, 3)), tri_vidx=[[0, 1, 2]], tri_mat=[0],
            tri_flags=[0], mat_type=[0], mat_base=[[1, 1, 1]],
            mat_scalars=[[0.0] * 12], env=env, bg_light=True)
        return scene, img, H, W

    def test_importance_integral(self):
        """MC integral of env radiance via sample/pdf matches the direct
        texel sum (unbiasedness of the alias draw + pdf table)."""
        from vimg_tpu.lights import envmap
        scene, img, H, W = self._scene()
        rs = np.random.RandomState(1)
        B = 200_000
        r1 = jnp.asarray(rs.rand(B).astype(np.float32))
        r2 = jnp.asarray(rs.rand(B).astype(np.float32))
        rad, wi, pdf = envmap.env_sample(scene, r1, r2)
        est = np.asarray((rad / jnp.maximum(pdf, 1e-20)[:, None]).mean(0))
        v = (np.arange(H) + 0.5) / H
        dw = (np.pi / H) * (2 * np.pi / W) * np.sin(np.pi * v)
        direct = (img * dw[:, None, None]).sum((0, 1))
        rel = np.abs(est - direct) / direct
        assert (rel < 0.03).all(), rel

    def test_pdf_query_matches_sample_pdf(self):
        """env_pdf(wi) equals the sampling pdf (shared per-texel table);
        mismatches only at texel boundaries from float uv rounding."""
        from vimg_tpu.lights import envmap
        scene, *_ = self._scene()
        rs = np.random.RandomState(2)
        B = 50_000
        r1 = jnp.asarray(rs.rand(B).astype(np.float32))
        r2 = jnp.asarray(rs.rand(B).astype(np.float32))
        _, wi, pdf = envmap.env_sample(scene, r1, r2)
        q = envmap.env_pdf(scene, wi)
        d = np.abs(np.asarray(q) - np.asarray(pdf)) \
            / np.maximum(np.asarray(pdf), 1e-9)
        assert float((d > 1e-3).mean()) < 0.02
