"""Film: progressive accumulation buffers + display mapping.

Counterpart of the reference's screen-buffer set and visualize kernels
(reference: path_tracing_main.cpp:964-1084 accum beauty/albedo/normal buffers,
copy_buffers.cu kernelVisualizeToOutputBuffer + sRGB blit shaders).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.core.math import linear_to_srgb


@struct.dataclass
class Film:
    """Progressive accumulation state, carried (and donatable) across frames
    (reference: beauty/albedo/normal accum buffers + numAccumFrames)."""

    beauty: jnp.ndarray  # [H, W, 3] running mean radiance
    albedo: jnp.ndarray  # [H, W, 3]
    normal: jnp.ndarray  # [H, W, 3]
    num_accum: jnp.ndarray  # [] int32


def make_film(width: int, height: int) -> Film:
    z = jnp.zeros((height, width, 3), jnp.float32)
    return Film(beauty=z, albedo=z, normal=z, num_accum=jnp.int32(0))


def add_sample(film: Film, beauty, albedo=None, normal=None) -> Film:
    """Running-mean update (reference: optix_pathtracing_kernels.cu:206-214)."""
    w = 1.0 / (1.0 + film.num_accum.astype(jnp.float32))
    new_beauty = (1.0 - w) * film.beauty + w * beauty
    new_albedo = film.albedo if albedo is None else (1.0 - w) * film.albedo + w * albedo
    new_normal = film.normal if normal is None else (1.0 - w) * film.normal + w * normal
    return Film(
        beauty=new_beauty,
        albedo=new_albedo,
        normal=new_normal,
        num_accum=film.num_accum + 1,
    )


def reset(film: Film) -> Film:
    return film.replace(
        beauty=jnp.zeros_like(film.beauty),
        albedo=jnp.zeros_like(film.albedo),
        normal=jnp.zeros_like(film.normal),
        num_accum=jnp.int32(0),
    )


def to_display(hdr, brightness: float = 1.0):
    """Linear HDR -> sRGB display (reference: simple scale + OETF in
    shaders/drawOptiXResult.frag; brightness is the ImGui slider)."""
    return linear_to_srgb(jnp.clip(hdr * brightness, 0.0, 1.0))
