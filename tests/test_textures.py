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


def test_normal_from_height_map():
    """Height-map normal reader (reference: readModifiedNormalFromHeightMap,
    common_device.cuh:227-240): a height ramp along u must tilt the local
    normal toward -x; flat regions give +z."""
    import jax.numpy as jnp

    from gfxexp_tpu.scene.textures import AtlasBuilder, normal_from_height_map

    b = AtlasBuilder(size=64)
    x = np.linspace(0, 1, 64, dtype=np.float32)
    ramp = np.tile(x[None, :], (64, 1))  # h = u
    tid = b.add(ramp)
    flat = b.add(np.full((64, 64), 0.5, np.float32))
    atlas = b.build()

    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    n_ramp = np.asarray(normal_from_height_map(atlas, jnp.asarray([tid]), uv))
    n_flat = np.asarray(normal_from_height_map(atlas, jnp.asarray([flat]), uv))
    assert n_ramp[0, 0] < -0.5  # slope dh/du = 1 -> nx ~ -0.707
    assert abs(n_ramp[0, 1]) < 0.1
    assert np.allclose(n_flat[0], [0, 0, 1], atol=1e-3)


def test_two_channel_normal_decode():
    """2-channel reader reconstructs z (reference:
    readModifiedNormalFromNormalMap2ch, common_device.cuh:217)."""
    import jax.numpy as jnp

    from gfxexp_tpu.scene.textures import decode_normal_map

    texel = jnp.asarray([[0.5 + 0.3, 0.5, 0.0, 1.0]])  # nx=0.6, ny=0
    n = np.asarray(decode_normal_map(texel, two_channel=True))
    assert abs(n[0, 0] - 0.6) < 1e-5
    assert abs(n[0, 2] - 0.8) < 1e-5


def test_debug_draw_ply(tmp_path):
    """vdb-equivalent debug stream writes a valid PLY (reference:
    ENABLE_VDB drawPoint/drawLine/drawAabb, common_host.h:26-122)."""
    from gfxexp_tpu.utils.debug_draw import DebugDraw

    dd = DebugDraw()
    dd.set_color(1, 0, 0).point([0, 0, 0])
    dd.set_color(0, 1, 0).line([0, 0, 0], [1, 1, 1])
    dd.aabb([-1, -1, -1], [1, 1, 1])
    dd.triangle([0, 0, 0], [1, 0, 0], [0, 1, 0])
    dd.cross([2, 2, 2], size=0.5)
    path = dd.save(str(tmp_path / "dbg.ply"))
    txt = open(path).read()
    nv, ne, nf = dd.counts
    assert f"element vertex {nv}" in txt
    assert f"element edge {ne}" in txt
    assert "element face 1" in txt
    assert txt.count("\n") > nv  # rows written


def test_ply_roundtrip(tmp_path):
    """PLY import (ascii + binary) — multi-format asset loading step
    (reference: assimp import, common_host.cpp:2150)."""
    from gfxexp_tpu.scene.builder import SceneBuilder
    from gfxexp_tpu.scene.loaders import load_mesh

    # ascii
    p = tmp_path / "tri.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0 0 1\n1 0 0 0 0 1\n0 1 0 0 0 1\n"
        "3 0 1 2\n")
    b = SceneBuilder()
    gids = load_mesh(str(p), b)
    g = b.geometries[gids[0]]
    assert g.positions.shape == (3, 3)
    assert g.indices.shape == (1, 3)
    assert np.allclose(g.normals, [[0, 0, 1]] * 3)

    # binary little endian
    import struct

    pb = tmp_path / "tri_bin.ply"
    hdr = ("ply\nformat binary_little_endian 1.0\n"
           "element vertex 3\n"
           "property float x\nproperty float y\nproperty float z\n"
           "element face 1\nproperty list uchar int vertex_indices\n"
           "end_header\n").encode()
    body = b"".join(struct.pack("<fff", *v)
                    for v in [(0, 0, 0), (2, 0, 0), (0, 2, 0)])
    body += struct.pack("<B3i", 3, 0, 1, 2)
    pb.write_bytes(hdr + body)
    b2 = SceneBuilder()
    gids2 = load_mesh(str(pb), b2)
    g2 = b2.geometries[gids2[0]]
    assert g2.positions.shape == (3, 3)
    assert float(g2.positions.max()) == 2.0


def test_bc2_decode():
    """BC2 = BC1 colors + explicit 4-bit alpha (reference:
    dds_loader.cpp DXT3). One hand-built block: solid red colors,
    ramping alpha nibbles."""
    import struct

    from gfxexp_tpu.scene.textures import _decode_bc

    # alpha: texel i gets nibble i (0..15)
    a = 0
    for i in range(16):
        a |= i << (4 * i)
    alpha_bytes = a.to_bytes(8, "little")
    red565 = 31 << 11
    color = struct.pack("<HHI", red565, red565, 0)  # both endpoints red
    block = alpha_bytes + color
    out = _decode_bc(block, 0, 4, 4, "BC2")
    assert out.shape == (4, 4, 4)
    assert np.allclose(out[..., 0], 1.0, atol=0.04)  # red everywhere
    flat_a = out[..., 3].reshape(16)
    assert np.allclose(flat_a, np.arange(16) / 15.0, atol=1e-6)


# ---------------------------------------------------------------------------
# BC7 / BC6H (scene/bc67.py)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.v = 0
        self.pos = 0

    def put(self, val, n):
        self.v |= (int(val) & ((1 << n) - 1)) << self.pos
        self.pos += n

    def block(self):
        assert self.pos <= 128, self.pos
        return self.v.to_bytes(16, "little")


def test_bc7_mode6_constant_and_gradient():
    from gfxexp_tpu.scene.bc67 import decode_bc7_block

    # constant: both endpoints 0x55 (7-bit) with P=1 -> expand8(0xAB, 8)
    bw = _BitWriter()
    bw.put(1 << 6, 7)  # mode 6 marker (bit 6 set)
    for _ in range(8):  # R,G,B,A x 2 endpoints, 7 bits each
        bw.put(0x55, 7)
    bw.put(1, 1)
    bw.put(1, 1)  # P bits
    bw.put(0, 3)  # anchor texel 0: 3 index bits
    for _ in range(15):
        bw.put(0, 4)
    out = decode_bc7_block(bw.block())
    assert np.allclose(out, 0xAB / 255.0)

    # gradient: e0=0 (P=0) -> 0, e1=127 (P=1) -> 255; index k at texel k%16
    bw = _BitWriter()
    bw.put(1 << 6, 7)
    for _ in range(4):
        bw.put(0, 7)
        bw.put(127, 7)
    bw.put(0, 1)
    bw.put(1, 1)
    bw.put(0, 3)
    for t in range(1, 16):
        bw.put(t, 4)
    out = decode_bc7_block(bw.block())
    w4 = [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64]
    exp = np.array([((64 - w) * 0 + w * 255 + 32) >> 6 for w in w4],
                   np.float32) / 255.0
    assert np.allclose(out, exp[:, None] * np.ones((16, 4), np.float32))


def test_bc7_mode5_rotation():
    from gfxexp_tpu.scene.bc67 import decode_bc7_block

    # rotation=1 swaps R and A after interpolation. RGB endpoints = 0x7F
    # (7-bit max -> 255), alpha endpoints = 0x40 (8-bit, stays 0x40).
    bw = _BitWriter()
    bw.put(1 << 5, 6)  # mode 5
    bw.put(1, 2)  # rotation: swap A,R
    for _ in range(6):
        bw.put(0x7F, 7)  # RGB endpoints
    bw.put(0x40, 8)
    bw.put(0x40, 8)  # alpha endpoints
    bw.put(0, 1)  # color anchor
    for _ in range(15):
        bw.put(0, 2)
    bw.put(0, 1)  # alpha anchor
    for _ in range(15):
        bw.put(0, 2)
    out = decode_bc7_block(bw.block())
    # R channel now carries the alpha value and vice versa
    assert np.allclose(out[:, 0], 0x40 / 255.0)
    assert np.allclose(out[:, 1], 1.0)
    assert np.allclose(out[:, 2], 1.0)
    assert np.allclose(out[:, 3], 1.0)


def test_bc7_mode1_two_subsets():
    from gfxexp_tpu.scene.bc67 import decode_bc7_block

    # partition 0 (left half subset 0, right half subset 1 per 0xCCCC),
    # subset 0 endpoints = 0 -> black, subset 1 endpoints = 63 (6-bit max,
    # shared P=1 -> 127 -> 255) -> white; all indices 0
    bw = _BitWriter()
    bw.put(1 << 1, 2)  # mode 1
    bw.put(0, 6)  # partition 0
    for _ in range(3):  # R, G, B channel-major
        bw.put(0, 6)
        bw.put(0, 6)  # subset 0
        bw.put(63, 6)
        bw.put(63, 6)  # subset 1
    bw.put(0, 1)
    bw.put(1, 1)  # shared P per subset
    # indices: texel 0 anchored (2 bits), texel 15 anchored (2 bits)
    for t in range(16):
        anchored = t in (0, 15)
        bw.put(0, 2 if anchored else 3)
    out = decode_bc7_block(bw.block())
    pat = [0, 0, 1, 1] * 4
    exp = np.array([[p * 1.0] * 3 + [1.0] for p in pat], np.float32)
    assert np.allclose(out, exp)


def test_bc6h_mode3_constant():
    from gfxexp_tpu.scene.bc67 import decode_bc6h_block

    # mode value 0x03 (10.10, untransformed, one subset): e0 == e1 == q
    # -> every texel = half_bits((unquantize(q) * 31) >> 6)
    q = 0x155
    bw = _BitWriter()
    bw.put(0x03, 5)
    for _ in range(2):
        for _ in range(3):
            bw.put(q, 10)
    bw.put(0, 3)  # anchor texel 0: 3 bits
    for _ in range(15):
        bw.put(0, 4)
    out = decode_bc6h_block(bw.block())
    unq = ((q << 16) + 0x8000) >> 10
    half = np.frombuffer(
        np.uint16((unq * 31) >> 6).tobytes(), np.float16)[0]
    assert np.allclose(out, np.float32(half))
    assert out.shape == (16, 3)


def test_bc6h_mode0_delta_zero():
    from gfxexp_tpu.scene.bc67 import decode_bc6h_block

    # mode 0 (10.555 transformed, 2 subsets): all deltas 0 -> constant
    # equal to the base endpoint everywhere regardless of partition
    q = 0x2A7
    bw = _BitWriter()
    bw.put(0x00, 2)
    bw.put(0, 3)  # g2[4], b2[4], b3[4]
    bw.put(q, 10)
    bw.put(q, 10)
    bw.put(q, 10)  # r0 g0 b0
    # r1(5) g3[4] g2[3:0] g1(5) b3[0] g3[3:0] b1(5) b3[1] b2[3:0]
    # r2(5) b3[2] r3(5) b3[3] -- all zero deltas
    bw.put(0, 5 + 1 + 4 + 5 + 1 + 4 + 5 + 1 + 4 + 5 + 1 + 5 + 1)
    bw.put(7, 5)  # partition 7 (arbitrary)
    # indices: anchors at texel 0 and _ANCHOR2[7]=15 -> 2 bits each
    for t in range(16):
        bw.put(0, 2 if t in (0, 15) else 3)
    out = decode_bc6h_block(bw.block())
    unq = ((q << 16) + 0x8000) >> 10
    half = np.frombuffer(
        np.uint16((unq * 31) >> 6).tobytes(), np.float16)[0]
    assert np.allclose(out, np.float32(half))


def test_dds_bc7_roundtrip(tmp_path):
    """BC7 DDS via the DX10 header path decodes through load_dds."""
    import struct

    from gfxexp_tpu.scene.textures import load_dds

    bw = _BitWriter()
    bw.put(1 << 6, 7)
    for _ in range(8):
        bw.put(0x55, 7)
    bw.put(1, 1)
    bw.put(1, 1)
    bw.put(0, 3)
    for _ in range(15):
        bw.put(0, 4)
    block = bw.block()

    w = h = 4
    header = struct.pack("<I", 0x20534444)
    header += struct.pack("<I", 124)
    header += struct.pack("<I", 0x1007)
    header += struct.pack("<II", h, w)
    header += b"\x00" * (76 - len(header))
    pf = struct.pack("<II4s", 32, 0x4, b"DX10") + b"\x00" * 20
    header += pf
    header += b"\x00" * (128 - len(header))
    dx10 = struct.pack("<IIIII", 98, 3, 0, 1, 0)  # BC7_UNORM, tex2d
    path = tmp_path / "t7.dds"
    path.write_bytes(header + dx10 + block)
    img = load_dds(str(path))
    assert img.shape == (4, 4, 4)
    assert np.allclose(img, 0xAB / 255.0)


def test_trilinear_mip_sampling():
    """Level-k trilinear samples must equal the level-k average: a 1-texel
    checkerboard averages to 0.5 grey at mip 1+, stays binary at mip 0."""
    from gfxexp_tpu.scene.textures import AtlasBuilder, sample_trilinear

    s = 16
    check = ((np.indices((s, s)).sum(0)) % 2).astype(np.float32)
    tex = np.stack([check] * 3, axis=-1)
    ab = AtlasBuilder(size=s, mips=True)
    tid = ab.add(tex)
    atlas = ab.build()
    assert atlas.n_levels == 5  # 16, 8, 4, 2, 1
    uv = jnp.asarray([[0.5 / s, 1.0 - 0.5 / s], [3.5 / s, 1.0 - 2.5 / s]],
                     jnp.float32)
    tids = jnp.asarray([tid, tid])
    # lod 0: exact texel values (texel centers)
    out0 = np.asarray(sample_trilinear(atlas, tids, uv, jnp.zeros(2)))
    assert np.allclose(out0[0, :3], check[0, 0], atol=1e-5)
    assert np.allclose(out0[1, :3], check[2, 3], atol=1e-5)
    # lod >= 1: every 2x2 block of the checkerboard averages to 0.5
    out1 = np.asarray(sample_trilinear(atlas, tids, uv, jnp.full(2, 1.0)))
    assert np.allclose(out1[:, :3], 0.5, atol=1e-5)
    # fractional lod blends the two levels
    outh = np.asarray(sample_trilinear(atlas, tids, uv, jnp.full(2, 0.5)))
    assert np.allclose(outh, 0.5 * (out0 + out1), atol=1e-5)
    # top level = global mean
    outt = np.asarray(sample_trilinear(atlas, tids, uv, jnp.full(2, 4.0)))
    assert np.allclose(outt[:, :3], 0.5, atol=1e-5)


def test_texture_lod_render():
    """PTConfig.texture_lod renders a distant checkered floor without the
    structured aliasing the non-mipped path shows: the far half of the
    image converges toward the 0.5-grey texture mean."""
    from gfxexp_tpu.scene.builder import HostMaterial
    from gfxexp_tpu.scene.textures import ATLAS_SIZE

    b = SceneBuilder(texture_mips=True)
    s = ATLAS_SIZE
    check = (np.indices((s, s)).sum(0) % 2).astype(np.float32)  # 1-texel
    tex = np.stack([check] * 3, axis=-1)
    tid = b.add_texture(tex)
    mat = b.add_material(HostMaterial(diffuse_color=(1, 1, 1),
                                      diffuse_tex=tid))
    light = b.add_lambert_material((0, 0, 0), emittance=(50.0,) * 3)
    floor = b.add_rectangle(40.0, 40.0, mat)
    b.add_instance(floor)
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    lamp = b.add_rectangle(2.0, 2.0, light)
    b.add_instance(lamp, affine(rotation=flip, translation=[0, 6.0, 0]))
    scene, bvh = compile_scene(b)
    assert scene.textures.mip_flat is not None
    cam = make_camera([0, 0.6, 9.5], fov_y=np.deg2rad(55), aspect=1.0,
                      target=[0, 0, 0])
    cfg = PTConfig(max_path_length=2, texture_lod=True)
    img = np.asarray(render_sample(scene, bvh, cam, 32, 32, jnp.uint32(3),
                                   cfg)).reshape(32, 32, 3)
    # the floor occupies the lower image; at this distance every pixel
    # footprint spans many texels -> mipped samples sit near the mean, so
    # the relative spread across floor pixels is small
    floor_px = img[22:30, 4:-4].mean(-1)
    assert floor_px.std() / max(floor_px.mean(), 1e-6) < 0.25
    # sanity: same scene WITHOUT lod keeps the binary checker -> high spread
    img0 = np.asarray(render_sample(scene, bvh, cam, 32, 32, jnp.uint32(3),
                                    PTConfig(max_path_length=2)))
    floor0 = img0.reshape(32, 32, 3)[22:30, 4:-4].mean(-1)
    assert floor0.std() / max(floor0.mean(), 1e-6) > \
        1.5 * floor_px.std() / max(floor_px.mean(), 1e-6)


# ---------------------------------------------------------------------------
# glTF loader (scene/loaders.py load_gltf)
# ---------------------------------------------------------------------------


def _make_quad_glb(tmp_path, translation=(0.0, 0.0, 0.0)):
    """Minimal GLB: one quad (4 verts, 2 tris, uint16 indices), a PBR
    material, a node with a translation."""
    import json
    import struct

    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    blobs = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes()]
    offsets, off = [], 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + (-len(b)) % 4
    bin_chunk = b"".join(
        b + b"\x00" * ((-len(b)) % 4) for b in blobs)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": list(translation)}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"name": "pbr", "pbrMetallicRoughness": {
            "baseColorFactor": [0.2, 0.4, 0.8, 1.0],
            "roughnessFactor": 0.35, "metallicFactor": 0.1},
            "emissiveFactor": [0.0, 0.0, 0.0]}],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    glb = (struct.pack("<III", 0x46546C67, 2, total)
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    p = tmp_path / "quad.glb"
    p.write_bytes(glb)
    return str(p)


def test_gltf_glb_load(tmp_path):
    from gfxexp_tpu.scene.builder import SceneBuilder
    from gfxexp_tpu.scene.loaders import load_gltf
    from gfxexp_tpu.scene.types import BSDF_SIMPLE_PBR

    path = _make_quad_glb(tmp_path, translation=(2.0, 0.5, -1.0))
    b = SceneBuilder()
    geoms = load_gltf(path, b)
    assert len(geoms) == 1
    g = b.geometries[geoms[0]]
    assert g.positions.shape == (4, 3)
    assert g.indices.shape == (2, 3)
    assert np.allclose(g.normals, [0, 0, 1])
    # uv v-flip for the GL-origin sampler
    assert np.allclose(g.texcoords[2], [1.0, 0.0])
    m = b.materials[g.material]
    assert m.bsdf_type == BSDF_SIMPLE_PBR
    assert np.allclose(m.diffuse_color, [0.2, 0.4, 0.8])
    assert abs(m.roughness - 0.35) < 1e-6
    # node translation became the instance transform
    assert len(b.instances) == 1
    tf = b.instances[0].transform
    assert np.allclose(tf[:, 3], [2.0, 0.5, -1.0])


def test_gltf_json_data_uri(tmp_path):
    """The .gltf JSON form with a base64 data-URI buffer parses too, and
    the scene renders through the pipeline."""
    import base64
    import json
    import struct as _s

    import jax.numpy as jnp

    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.scene.loaders import load_gltf

    pos = np.array([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]],
                   np.float32)
    idx = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    blob = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1}]}],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 24}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": 6,
             "type": "SCALAR"}],
    }
    p = tmp_path / "floor.gltf"
    p.write_text(json.dumps(doc))

    b = SceneBuilder()
    load_gltf(str(p), b)
    light = b.add_lambert_material((0, 0, 0), emittance=(60.0,) * 3)
    lg = b.add_rectangle(0.6, 0.6, light)
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(lg, affine(rotation=flip, translation=[0, 1.4, 0]))
    scene, bvh = compile_scene(b)
    cam = make_camera([0, 1.2, 2.2], fov_y=np.deg2rad(50), aspect=1.0,
                      target=[0, 0, 0])
    img = np.asarray(render_sample(scene, bvh, cam, 24, 24, jnp.uint32(1),
                                   PTConfig(max_path_length=2)))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3  # lit floor visible
