"""Texture subsystem: fixed-size layer atlas + bilinear sampling + DDS/BC
decode + normal mapping.

Reference counterparts: cudau::Array textures + texture caching
(common_host.cpp:992-1164 loadTexture/createImmTexture), BC1-7 DDS reader
(common/dds_loader.h/.cpp), normal-map readers
(readModifiedNormalFromNormalMap[2ch]/FromHeightMap, common_device.cuh:
205-240) and bump application (applyBumpMapping :176).

TPU re-architecture: no hardware samplers — textures are resampled at load to
one of a few power-of-two layer sizes and stacked into [N, S, S, 4] arrays;
sampling is an explicit bilinear gather with wrap addressing. Constant colors
stay constants (no 1x1 textures); a material's texture slot of -1 selects the
constant (render/bsdf.py material_params_textured)."""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct as fstruct

ATLAS_SIZE = 512  # layer resolution (loads are resampled to this)


@fstruct.dataclass
class TextureAtlas:
    """All scene textures in one gatherable stack.

    When built with mips, `mip_flat` packs every level of every layer into
    one flat texel array (level l of layer n spans
    mip_flat[n, mip_offsets[l] : mip_offsets[l] + (S>>l)^2]) so a per-lane
    DYNAMIC mip level is a plain address computation + gather — the TPU
    analogue of the reference's mipmapped CUDA arrays (cuda_util.h:897)."""

    layers: jnp.ndarray  # [N, S, S, 4] float32 linear (level 0)
    count: int = fstruct.field(pytree_node=False, default=0)
    mip_flat: jnp.ndarray = None  # [N, sum_l (S>>l)^2, 4] or None
    mip_offsets: jnp.ndarray = None  # [L] int32 texel offsets per level
    n_levels: int = fstruct.field(pytree_node=False, default=0)


def empty_atlas() -> TextureAtlas:
    return TextureAtlas(
        layers=jnp.zeros((1, 1, 1, 4), jnp.float32), count=0)


class AtlasBuilder:
    def __init__(self, size: int = ATLAS_SIZE, mips: bool = False):
        self.size = size
        self.mips = mips
        self.images: List[np.ndarray] = []

    def add(self, image: np.ndarray) -> int:
        """image: [H, W, C] float linear (C in 1..4). Returns texture id."""
        img = np.asarray(image, np.float32)
        if img.ndim == 2:
            img = img[:, :, None]
        c = img.shape[2]
        if c < 4:
            pad = np.ones(img.shape[:2] + (4 - c,), np.float32)
            if c == 1:
                img = np.concatenate([img, img, img, pad[..., :1]], axis=2)
            else:
                img = np.concatenate([img, pad], axis=2)
        img = _resample(img[:, :, :4], self.size)
        self.images.append(img)
        return len(self.images) - 1

    def build(self) -> TextureAtlas:
        if not self.images:
            return empty_atlas()
        stack = np.stack(self.images)
        if not self.mips:
            return TextureAtlas(layers=jnp.asarray(stack),
                                count=len(self.images))
        # full average mip chain per layer, flattened level-major
        levels = [stack]
        while levels[-1].shape[1] > 1:
            m = levels[-1]
            levels.append(0.25 * (m[:, 0::2, 0::2] + m[:, 1::2, 0::2]
                                  + m[:, 0::2, 1::2] + m[:, 1::2, 1::2]))
        offsets = np.cumsum([0] + [lv.shape[1] * lv.shape[2]
                                   for lv in levels[:-1]])
        flat = np.concatenate(
            [lv.reshape(lv.shape[0], -1, 4) for lv in levels], axis=1)
        return TextureAtlas(
            layers=jnp.asarray(stack), count=len(self.images),
            mip_flat=jnp.asarray(flat.astype(np.float32)),
            mip_offsets=jnp.asarray(offsets, jnp.int32),
            n_levels=len(levels),
        )


def _resample(img: np.ndarray, size: int) -> np.ndarray:
    """Box/bilinear resample to size x size (host, numpy)."""
    h, w = img.shape[:2]
    if (h, w) == (size, size):
        return img
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    return (
        img[y0][:, x0] * (1 - fy) * (1 - fx)
        + img[y0][:, x1] * (1 - fy) * fx
        + img[y1][:, x0] * fy * (1 - fx)
        + img[y1][:, x1] * fy * fx
    ).astype(np.float32)


def sample_bilinear(atlas: TextureAtlas, tex_id, uv):
    """Bilinear wrap sampling. tex_id [R] int32 (-1 allowed, clamped to 0 —
    mask at the caller), uv [R, 2]. Returns [R, 4]."""
    s = atlas.layers.shape[1]
    layer = jnp.clip(tex_id, 0, max(atlas.count - 1, 0))
    # wrap addressing; v flipped (image row 0 = v 1, like GL texture origin)
    u = uv[:, 0] % 1.0
    v = (1.0 - uv[:, 1] % 1.0) % 1.0
    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0w = x0 % s
    y0w = y0 % s
    x1w = (x0 + 1) % s
    y1w = (y0 + 1) % s
    l = atlas.layers
    return (
        l[layer, y0w, x0w] * (1 - fy) * (1 - fx)
        + l[layer, y0w, x1w] * (1 - fy) * fx
        + l[layer, y1w, x0w] * fy * (1 - fx)
        + l[layer, y1w, x1w] * fy * fx
    )


def _sample_mip_level(atlas: TextureAtlas, layer, uv, level):
    """Bilinear sample at integer mip `level` [R] from the flat mip pack.
    Wrap addressing; per-lane dynamic level (address arithmetic + gather)."""
    S = atlas.layers.shape[1]
    s = (S >> jnp.clip(level, 0, atlas.n_levels - 1)).astype(jnp.int32)
    base = atlas.mip_offsets[jnp.clip(level, 0, atlas.n_levels - 1)]
    sf = s.astype(jnp.float32)
    u = uv[:, 0] % 1.0
    v = (1.0 - uv[:, 1] % 1.0) % 1.0
    x = u * sf - 0.5
    y = v * sf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0w = x0 % s
    y0w = y0 % s
    x1w = (x0 + 1) % s
    y1w = (y0 + 1) % s
    f = atlas.mip_flat

    def tex(yw, xw):
        return f[layer, base + yw * s + xw]

    return (tex(y0w, x0w) * (1 - fy) * (1 - fx)
            + tex(y0w, x1w) * (1 - fy) * fx
            + tex(y1w, x0w) * fy * (1 - fx)
            + tex(y1w, x1w) * fy * fx)


def sample_trilinear(atlas: TextureAtlas, tex_id, uv, lod):
    """Trilinear (mipmapped) sampling: bilinear at floor/ceil mip levels,
    blended by the fractional LOD (reference: mipmapped cudau::Array +
    hardware trilinear filtering, cuda_util.h:897). Falls back to plain
    bilinear when the atlas carries no mip chain. lod: [R] float32 (0 =
    full resolution)."""
    if atlas.mip_flat is None or atlas.n_levels <= 1:
        return sample_bilinear(atlas, tex_id, uv)
    layer = jnp.clip(tex_id, 0, max(atlas.count - 1, 0))
    lod = jnp.clip(jnp.asarray(lod, jnp.float32), 0.0,
                   float(atlas.n_levels - 1))
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0.astype(jnp.float32))[:, None]
    c0 = _sample_mip_level(atlas, layer, uv, l0)
    c1 = _sample_mip_level(atlas, layer, uv, jnp.minimum(
        l0 + 1, atlas.n_levels - 1))
    return c0 * (1.0 - f) + c1 * f


def build_mip_pyramid(image: np.ndarray) -> List[np.ndarray]:
    """Full average mip chain (host). Used by env importance + TFDM minmax
    derivative products."""
    mips = [np.asarray(image, np.float32)]
    while min(mips[-1].shape[:2]) > 1:
        m = mips[-1]
        h2, w2 = m.shape[0] // 2, m.shape[1] // 2
        mips.append(
            0.25 * (m[0:2*h2:2, 0:2*w2:2] + m[1:2*h2:2, 0:2*w2:2]
                    + m[0:2*h2:2, 1:2*w2:2] + m[1:2*h2:2, 1:2*w2:2]))
    return mips


# ---------------------------------------------------------------------------
# normal mapping (reference: readModifiedNormal* + applyBumpMapping,
# common_device.cuh:176-240)
# ---------------------------------------------------------------------------


def decode_normal_map(texel, two_channel: bool = False):
    """Texel [R,4] -> local-space modified normal [R,3] (z-up)."""
    if two_channel:
        nx = texel[:, 0] * 2.0 - 1.0
        ny = texel[:, 1] * 2.0 - 1.0
        nz = jnp.sqrt(jnp.maximum(1.0 - nx * nx - ny * ny, 0.0))
    else:
        nx = texel[:, 0] * 2.0 - 1.0
        ny = texel[:, 1] * 2.0 - 1.0
        nz = jnp.maximum(texel[:, 2] * 2.0 - 1.0, 1e-3)
    n = jnp.stack([nx, ny, nz], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def apply_bump(shading_normal, tangent, bitangent, local_normal):
    """Rotate the shading frame by the tangent-space modified normal."""
    return (
        local_normal[:, 0:1] * tangent
        + local_normal[:, 1:2] * bitangent
        + local_normal[:, 2:3] * shading_normal
    )


def normal_from_height_map(atlas: TextureAtlas, tex_id, uv,
                           bump_scale: float = 1.0):
    """Local-space modified normal from a HEIGHT texture by central
    differences (reference: readModifiedNormalFromHeightMap,
    common_device.cuh:227-240 — reads neighbor texels and builds
    normalize(-dh/du, -dh/dv, 1)). Channel 0 is the height; `bump_scale`
    scales the gradient like the reference's height scale."""
    s = atlas.layers.shape[1]
    eps = 1.0 / s
    du = jnp.asarray([eps, 0.0], jnp.float32)
    dv = jnp.asarray([0.0, eps], jnp.float32)
    h_r = sample_bilinear(atlas, tex_id, uv + du)[:, 0]
    h_l = sample_bilinear(atlas, tex_id, uv - du)[:, 0]
    h_u = sample_bilinear(atlas, tex_id, uv + dv)[:, 0]
    h_d = sample_bilinear(atlas, tex_id, uv - dv)[:, 0]
    gx = bump_scale * (h_r - h_l) / (2.0 * eps)
    gy = bump_scale * (h_u - h_d) / (2.0 * eps)
    n = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# DDS loading with BC1 / BC3 / BC4 / BC5 decode
# (reference: common/dds_loader.cpp — BC1-7 reader; BC6/7 omitted here, the
# reference's bundled assets are BC1/BC4-class height maps)
# ---------------------------------------------------------------------------

_DDS_MAGIC = 0x20534444
_FOURCC = {b"DXT1": "BC1", b"DXT3": "BC2", b"DXT5": "BC3", b"BC4U": "BC4", b"ATI1": "BC4",
           b"BC5U": "BC5", b"ATI2": "BC5", b"DX10": "DX10"}
_DXGI_TO_BC = {71: "BC1", 72: "BC1", 74: "BC2", 75: "BC2", 77: "BC3",
               78: "BC3", 80: "BC4", 83: "BC5", 95: "BC6H", 98: "BC7",
               99: "BC7"}


def load_dds(path: str) -> np.ndarray:
    """Returns [H, W, C] float32 in [0,1]."""
    with open(path, "rb") as f:
        data = f.read()
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _DDS_MAGIC:
        raise ValueError(f"{path}: not a DDS file")
    height, width = struct.unpack_from("<II", data, 12)
    (pf_flags,) = struct.unpack_from("<I", data, 80)
    fourcc = data[84:88]
    off = 128
    fmt = None
    if pf_flags & 0x4:  # DDPF_FOURCC
        fmt = _FOURCC.get(fourcc)
        if fmt == "DX10":
            (dxgi,) = struct.unpack_from("<I", data, 128)
            fmt = _DXGI_TO_BC.get(dxgi)
            off = 148
    if fmt is None:
        raise ValueError(f"{path}: unsupported DDS format {fourcc!r}")
    if fmt == "BC7":
        from gfxexp_tpu.scene.bc67 import decode_bc7

        return decode_bc7(data, off, width, height)
    if fmt == "BC6H":
        from gfxexp_tpu.scene.bc67 import decode_bc6h

        return decode_bc6h(data, off, width, height)
    return _decode_bc(data, off, width, height, fmt)


def _decode_bc(data: bytes, off: int, width: int, height: int, fmt: str):
    bw = (width + 3) // 4
    bh = (height + 3) // 4
    block_size = 8 if fmt in ("BC1", "BC4") else 16
    out_c = {"BC1": 4, "BC2": 4, "BC3": 4, "BC4": 1, "BC5": 2}[fmt]
    out = np.zeros((bh * 4, bw * 4, out_c), np.float32)
    blocks = np.frombuffer(
        data, np.uint8, count=bh * bw * block_size, offset=off
    ).reshape(bh * bw, block_size)

    if fmt in ("BC1", "BC2", "BC3"):
        color_off = 0 if fmt == "BC1" else 8
        c0 = blocks[:, color_off] | (blocks[:, color_off + 1].astype(np.uint32) << 8)
        c1 = blocks[:, color_off + 2] | (blocks[:, color_off + 3].astype(np.uint32) << 8)
        idx = (
            blocks[:, color_off + 4].astype(np.uint32)
            | (blocks[:, color_off + 5].astype(np.uint32) << 8)
            | (blocks[:, color_off + 6].astype(np.uint32) << 16)
            | (blocks[:, color_off + 7].astype(np.uint32) << 24)
        )

        def c565(c):
            r = ((c >> 11) & 31) / 31.0
            g = ((c >> 5) & 63) / 63.0
            b = (c & 31) / 31.0
            return np.stack([r, g, b], axis=-1)

        p0, p1 = c565(c0), c565(c1)
        four = (c0 > c1) | (fmt in ("BC2", "BC3"))
        pal = np.zeros((len(blocks), 4, 3), np.float32)
        pal[:, 0] = p0
        pal[:, 1] = p1
        pal[:, 2] = np.where(four[:, None], (2 * p0 + p1) / 3, (p0 + p1) / 2)
        pal[:, 3] = np.where(four[:, None], (p0 + 2 * p1) / 3, 0.0)
        sel = ((idx[:, None] >> (2 * np.arange(16)[None, :])) & 3)  # [B,16]
        rgb = np.take_along_axis(pal, sel[..., None].astype(np.int64), axis=1)
        alpha = np.ones((len(blocks), 16, 1), np.float32)
        if fmt == "BC3":
            alpha = _decode_bc4_channel(blocks[:, 0:8])[..., None]
        elif fmt == "BC2":
            # explicit 4-bit alpha, LSB-first nibbles
            # (reference: dds_loader BC2 path)
            a64 = np.zeros(len(blocks), np.uint64)
            for i in range(8):
                a64 |= blocks[:, i].astype(np.uint64) << np.uint64(8 * i)
            nib = (a64[:, None] >> (4 * np.arange(16, dtype=np.uint64)[None, :])
                   ) & np.uint64(15)
            alpha = (nib.astype(np.float32) / 15.0)[..., None]
        texels = np.concatenate([rgb, alpha], axis=-1)
    elif fmt == "BC4":
        texels = _decode_bc4_channel(blocks[:, 0:8])[..., None]
    else:  # BC5
        r = _decode_bc4_channel(blocks[:, 0:8])
        g = _decode_bc4_channel(blocks[:, 8:16])
        texels = np.stack([r, g], axis=-1)

    texels = texels.reshape(bh, bw, 4, 4, out_c).transpose(0, 2, 1, 3, 4)
    out = texels.reshape(bh * 4, bw * 4, out_c)
    return out[:height, :width]


def _decode_bc4_channel(blocks8: np.ndarray) -> np.ndarray:
    """blocks8 [B, 8] uint8 -> [B, 16] float values."""
    a0 = blocks8[:, 0].astype(np.float32)
    a1 = blocks8[:, 1].astype(np.float32)
    bits = np.zeros(len(blocks8), np.uint64)
    for i in range(6):
        bits |= blocks8[:, 2 + i].astype(np.uint64) << np.uint64(8 * i)
    sel = (bits[:, None] >> (3 * np.arange(16, dtype=np.uint64)[None, :])) & np.uint64(7)
    sel = sel.astype(np.int64)
    pal = np.zeros((len(blocks8), 8), np.float32)
    pal[:, 0] = a0
    pal[:, 1] = a1
    six = a0 > a1
    for i in range(1, 7):
        pal[:, 1 + i] = np.where(
            six, ((7 - i) * a0 + i * a1) / 7.0,
            0.0,
        )
    for i in range(1, 5):
        pal[:, 1 + i] = np.where(six, pal[:, 1 + i], ((5 - i) * a0 + i * a1) / 5.0)
    pal[:, 6] = np.where(six, pal[:, 6], 0.0)
    pal[:, 7] = np.where(six, pal[:, 7], 255.0)
    return np.take_along_axis(pal, sel, axis=1) / 255.0
