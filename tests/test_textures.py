"""Texture subsystem tests: atlas sampling, DDS/BC decode, normal mapping,
textured render."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.builder import SceneBuilder, affine
from gfxexp_tpu.scene.compile import compile_scene
from gfxexp_tpu.scene.textures import (
    AtlasBuilder,
    _decode_bc4_channel,
    decode_normal_map,
    sample_bilinear,
)


def test_atlas_bilinear_roundtrip():
    ab = AtlasBuilder(size=8)
    img = np.zeros((8, 8, 3), np.float32)
    img[0, 0] = [1, 0, 0]      # v=1 (top row), u=0
    img[7, 7] = [0, 1, 0]      # v=0 (bottom), u=1
    tid = ab.add(img)
    atlas = ab.build()
    # sample at texel centers
    uv = jnp.asarray([[0.5 / 8, 1.0 - 0.5 / 8], [7.5 / 8, 0.5 / 8]])
    out = np.asarray(sample_bilinear(atlas, jnp.asarray([tid, tid]), uv))
    assert np.allclose(out[0, :3], [1, 0, 0], atol=1e-5)
    assert np.allclose(out[1, :3], [0, 1, 0], atol=1e-5)


def test_bc4_decode_flat():
    # a0=128, a1=0 (a0>a1: 8-value mode), all selectors 0 -> a0 everywhere
    block = np.zeros((1, 8), np.uint8)
    block[0, 0] = 128
    vals = _decode_bc4_channel(block)
    assert np.allclose(vals, 128 / 255.0)


def test_dds_bc4_roundtrip(tmp_path):
    """Synthesize a BC4 DDS (the reference's height-map format; its bundled
    .dds files are git-LFS stubs) and decode it."""
    import struct

    from gfxexp_tpu.scene.textures import load_dds

    w = h = 8
    header = struct.pack("<I", 0x20534444)
    header += struct.pack("<I", 124)  # dwSize
    header += struct.pack("<I", 0x1007)  # flags
    header += struct.pack("<II", h, w)
    header += b"\x00" * (76 - len(header))
    # pixel format at file offset 76: size, flags(FOURCC), fourcc
    pf = struct.pack("<II4s", 32, 0x4, b"ATI1") + b"\x00" * 20
    header += pf
    header += b"\x00" * (128 - len(header))
    # 4 blocks of BC4: a0 = 64, 128, 192, 255, selectors all 0
    blocks = b""
    for a0 in (64, 128, 192, 255):
        blocks += bytes([a0, 0]) + b"\x00" * 6
    path = tmp_path / "t.dds"
    path.write_bytes(header + blocks)
    img = load_dds(str(path))
    assert img.shape == (8, 8, 1)
    assert np.allclose(img[0, 0, 0], 64 / 255.0, atol=1e-5)
    assert np.allclose(img[0, 4, 0], 128 / 255.0, atol=1e-5)
    assert np.allclose(img[4, 0, 0], 192 / 255.0, atol=1e-5)
    assert np.allclose(img[4, 4, 0], 1.0, atol=1e-5)


def test_normal_map_decode():
    flat = jnp.asarray([[0.5, 0.5, 1.0, 1.0]])
    n = np.asarray(decode_normal_map(flat))
    assert np.allclose(n, [[0, 0, 1]], atol=1e-2)


def test_textured_render():
    """A checkerboard diffuse texture must show up in the rendered floor."""
    from gfxexp_tpu.scene.textures import ATLAS_SIZE

    b = SceneBuilder()
    s = ATLAS_SIZE
    check = (np.indices((s, s)) // (s // 2)).sum(0) % 2  # 2x2 blocks at atlas res
    tex = np.stack([check, check, check], axis=-1).astype(np.float32)
    tid = b.add_texture(tex)
    from gfxexp_tpu.scene.builder import HostMaterial

    mat = b.add_material(HostMaterial(diffuse_color=(1, 1, 1), diffuse_tex=tid))
    light = b.add_lambert_material((0, 0, 0), emittance=(50.0,) * 3)
    floor = b.add_rectangle(4.0, 4.0, mat)
    b.add_instance(floor)
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    lamp = b.add_rectangle(1.0, 1.0, light)
    b.add_instance(lamp, affine(rotation=flip, translation=[0, 3.0, 0]))
    scene, bvh = compile_scene(b)
    cam = make_camera([0, 2.5, 0.01], fov_y=np.deg2rad(50), aspect=1.0,
                      target=[0, 0, 0])
    acc = np.zeros((32 * 32, 3), np.float64)
    for s in range(32):
        acc += np.asarray(render_sample(
            scene, bvh, cam, 32, 32, jnp.uint32(s),
            PTConfig(max_path_length=2)))
    img = (acc / 32).reshape(32, 32, 3)
    lum = img.mean(-1)
    interior = lum[4:-4, 4:-4]
    bright = interior[interior > np.median(interior)].mean()
    dark = interior[interior <= np.median(interior)].mean()
    assert bright > 2.5 * max(dark, 1e-6), (bright, dark)
