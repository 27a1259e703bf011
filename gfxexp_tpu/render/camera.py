"""Perspective camera (reference: shared::PerspectiveCamera and ray generation
in path_tracing/gpu_kernels/optix_gbuffer_kernels.cu:5-25).

Convention (matches reference exactly): camera space has +z forward; a pixel
(px, py) with jitter (jx, jy) maps to direction
    orientation @ (vw * (0.5 - x), vh * (0.5 - y), 1), normalized
with x = (px+jx)/W, y = (py+jy)/H, vh = 2 tan(fovY/2), vw = aspect * vh.
So +x_cam points screen-left and +y_cam screen-up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.core.math import normalize


@struct.dataclass
class Camera:
    position: jnp.ndarray  # [3]
    orientation: jnp.ndarray  # [3, 3] camera-to-world (columns: left, up, fwd)
    fov_y: jnp.ndarray  # [] radians
    aspect: jnp.ndarray  # [] width / height


def make_camera(position, fov_y, aspect, orientation=None, target=None,
                up=(0.0, 1.0, 0.0)) -> Camera:
    position = jnp.asarray(position, jnp.float32)
    if orientation is None:
        fwd = normalize(jnp.asarray(target, jnp.float32) - position)
        right = normalize(jnp.cross(fwd, jnp.asarray(up, jnp.float32)))
        true_up = jnp.cross(right, fwd)
        orientation = jnp.stack([-right, true_up, fwd], axis=-1)
    return Camera(
        position=position,
        orientation=jnp.asarray(orientation, jnp.float32),
        fov_y=jnp.asarray(fov_y, jnp.float32),
        aspect=jnp.asarray(aspect, jnp.float32),
    )


BLOCK_W = 16
BLOCK_H = 16


def blocked_order(width: int, height: int) -> bool:
    return width % BLOCK_W == 0 and height % BLOCK_H == 0


def _morton_blocks(width: int, height: int) -> bool:
    """Z-curve block ordering applies on square power-of-two block grids."""
    bx = width // BLOCK_W
    by = height // BLOCK_H
    return bx == by and bx > 1 and (bx & (bx - 1)) == 0


def _part1by1(x):
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _compact1by1(x):
    x = x & 0x55555555
    x = (x | (x >> 1)) & 0x33333333
    x = (x | (x >> 2)) & 0x0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF
    return x


def pixel_from_lane(lane, width: int, height: int):
    """Lane (render order) -> linear pixel index. Lanes are block-major
    (16x16 screen blocks) with the BLOCKS ordered along a Morton Z-curve
    (square pow2 grids), so a traversal tile (32 consecutive blocks at
    rows=64) covers a compact ~128x64-pixel region instead of a full-width
    strip — the tile frustum that per-tile chunk/instance culling tests is
    ~4x tighter. RNG and camera rays stay keyed by the PIXEL, so the image
    is invariant to this ordering. Falls back to row-major blocks on
    non-square grids, and to raw row-major when not block-divisible."""
    if not blocked_order(width, height):
        return lane
    lane = lane.astype(jnp.int32)
    per_block = BLOCK_W * BLOCK_H
    blocks_x = width // BLOCK_W
    block = lane // per_block
    within = lane % per_block
    if _morton_blocks(width, height):
        bx = _compact1by1(block)
        by = _compact1by1(block >> 1)
    else:
        bx = block % blocks_x
        by = block // blocks_x
    px = bx * BLOCK_W + within % BLOCK_W
    py = by * BLOCK_H + within // BLOCK_W
    return (py * width + px).astype(jnp.uint32)


def lane_from_pixel(pixel, width: int, height: int):
    """Inverse of pixel_from_lane."""
    if not blocked_order(width, height):
        return pixel
    pixel = pixel.astype(jnp.int32)
    px = pixel % width
    py = pixel // width
    blocks_x = width // BLOCK_W
    if _morton_blocks(width, height):
        block = _part1by1(px // BLOCK_W) | (_part1by1(py // BLOCK_H) << 1)
    else:
        block = (py // BLOCK_H) * blocks_x + px // BLOCK_W
    within = (py % BLOCK_H) * BLOCK_W + px % BLOCK_W
    return (block * (BLOCK_W * BLOCK_H) + within).astype(jnp.uint32)


def generate_rays(camera: Camera, width: int, height: int, jx, jy):
    """Primary rays for every pixel. jx, jy: [H*W] jitter in [0,1) (use 0.5
    for pixel centers). Returns (origins [N,3], directions [N,3])."""
    lane = jnp.arange(width * height, dtype=jnp.uint32)
    return generate_rays_for_lanes(camera, width, height, lane, jx, jy)


def generate_rays_for_lanes(camera: Camera, width: int, height: int, lane, jx, jy):
    """Primary rays for an arbitrary set of linear pixel indices `lane`."""
    n = lane.shape[0]
    lane_i = lane.astype(jnp.int32)
    px = (lane_i % width).astype(jnp.float32)
    py = (lane_i // width).astype(jnp.float32)
    x = (px + jx) / width
    y = (py + jy) / height
    vh = 2.0 * jnp.tan(camera.fov_y * 0.5)
    vw = camera.aspect * vh
    d_cam = jnp.stack(
        [vw * (0.5 - x), vh * (0.5 - y), jnp.ones_like(x)], axis=-1
    )
    # precision=HIGHEST: XLA's default lowers f32 matmuls to bf16 on TPU,
    # which skews ray directions by whole pixels at 512px (core/math.py _HI
    # convention)
    d_world = jnp.matmul(
        d_cam, camera.orientation.T, precision=jax.lax.Precision.HIGHEST
    )
    d_world = normalize(d_world)
    o = jnp.broadcast_to(camera.position, (n, 3))
    return o, d_world


def screen_position(camera: Camera, p):
    """World point -> screen uv in [0,1]^2 (for motion vectors; reference:
    PerspectiveCamera::calcScreenPosition)."""
    rel = p - camera.position
    # inverse of orthonormal orientation; HIGHEST precision — feeds motion
    # vectors (SVGF reprojection validity, ReSTIR temporal lookup)
    local = jnp.matmul(
        rel, camera.orientation, precision=jax.lax.Precision.HIGHEST
    )
    z = jnp.maximum(local[..., 2], 1e-8)
    vh = 2.0 * jnp.tan(camera.fov_y * 0.5)
    vw = camera.aspect * vh
    x = 0.5 - local[..., 0] / (z * vw)
    y = 0.5 - local[..., 1] / (z * vh)
    return jnp.stack([x, y], axis=-1)
