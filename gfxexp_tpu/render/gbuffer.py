"""G-buffer pass: primary visibility, surface attributes, motion vectors.

Counterpart of the reference's G-buffer pipeline (reference:
path_tracing/gpu_kernels/optix_gbuffer_kernels.cu — setupGBuffers RG:5 camera
ray + jitter, CH:95 attribute interpolation + curToPrevTransform motion
vector + denoiser albedo/normal, MS:176 env uv; layout
path_tracing_shared.h GBuffer0/1/2Elements).

Here the G-buffer is a pytree of [H, W] SoA planes produced by one batched
primary trace. Motion vectors are computed from the instance tables'
prev_transform and the previous camera (render/camera.py screen_position).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.accel.bvh_build import BVH
from gfxexp_tpu.accel.traverse import intersect_closest
from gfxexp_tpu.core.math import make_frame, normalize, to_local, transform_point
from gfxexp_tpu.core.rng import SampleStream
from gfxexp_tpu.render.bsdf import bsdf_dh_reflectance, material_params_textured
from gfxexp_tpu.render.camera import (
    Camera,
    generate_rays_for_lanes,
    lane_from_pixel,
    pixel_from_lane,
    screen_position,
)
from gfxexp_tpu.render.pathtrace import compute_surface_point
from gfxexp_tpu.scene.types import SceneData


@struct.dataclass
class GBuffer:
    """Per-pixel primary-hit attributes, [H, W, ...] planes."""

    position: jnp.ndarray  # [H, W, 3] world position (0 on miss)
    normal: jnp.ndarray  # [H, W, 3] shading normal
    geom_normal: jnp.ndarray  # [H, W, 3]
    albedo: jnp.ndarray  # [H, W, 3] DH-reflectance estimate (denoiser albedo)
    emittance: jnp.ndarray  # [H, W, 3]
    texcoord: jnp.ndarray  # [H, W, 2]
    motion: jnp.ndarray  # [H, W, 2] screen-space motion (cur - prev), pixels
    depth: jnp.ndarray  # [H, W] hit distance (inf on miss)
    tri: jnp.ndarray  # [H, W] int32 triangle id (-1 miss)
    bary: jnp.ndarray  # [H, W, 2] barycentric (u, v)
    unit: jnp.ndarray  # [H, W] int32 unit slot (-1 miss)
    material: jnp.ndarray  # [H, W] int32 material slot (-1 miss)
    hit: jnp.ndarray  # [H, W] bool
    view_dir: jnp.ndarray  # [H, W, 3] unit direction from camera (ray dir)


@functools.partial(jax.jit, static_argnames=("width", "height", "enable_jitter"))
def render_gbuffer(
    scene: SceneData,
    bvh: BVH,
    camera: Camera,
    prev_camera: Camera,
    width: int,
    height: int,
    sample_idx,
    enable_jitter: bool = True,
) -> GBuffer:
    n = width * height
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, width, height)  # block-major ray coherence
    rs = SampleStream(pixel, jnp.asarray(sample_idx, jnp.uint32), stream=0xFFFF)
    if enable_jitter:
        jx, jy = rs.next2()  # same stream/dims as the PT camera jitter
    else:
        jx = jnp.full((n,), 0.5, jnp.float32)
        jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, width, height, pixel, jx, jy)

    hit = intersect_closest(bvh, scene.triangles, ray_o, ray_d, t_min=0.0, t_max=1e30)
    sp = compute_surface_point(scene, hit.tri, hit.u, hit.v, inst=hit.inst)
    hm = hit.hit
    hm3 = hm[..., None]

    # denoiser albedo via DH-reflectance estimate (reference: CH :159)
    v_out = -ray_d
    t, b = make_frame(sp.shading_normal)
    v_out_local = to_local(t, b, sp.shading_normal, v_out)
    params = material_params_textured(scene.materials, scene.textures, sp.material, sp.texcoord)
    albedo = bsdf_dh_reflectance(params, v_out_local)

    # motion vector: world pos -> object space (inverse cur transform) ->
    # previous world (prev transform) -> previous screen position
    inst = scene.units.instance[sp.unit]
    inv_cur = scene.instances.inv_transform[inst]
    prev_m = scene.instances.prev_transform[inst]
    obj_p = transform_point(inv_cur, sp.position)  # HIGHEST-precision einsum
    prev_p = transform_point(prev_m, obj_p)
    cur_uv = screen_position(camera, sp.position)
    prev_uv = screen_position(prev_camera, prev_p)
    motion = (cur_uv - prev_uv) * jnp.asarray([width, height], jnp.float32)
    motion = jnp.where(hm[..., None], motion, 0.0)

    order = lane_from_pixel(jnp.arange(n, dtype=jnp.uint32), width, height)

    def img(x, ch=None):
        x = x[order]  # lane order -> row-major pixel order
        if ch is None:
            return x.reshape(height, width)
        return x.reshape(height, width, ch)

    return GBuffer(
        position=img(jnp.where(hm3, sp.position, 0.0), 3),
        normal=img(jnp.where(hm3, sp.shading_normal, 0.0), 3),
        geom_normal=img(jnp.where(hm3, sp.geom_normal, 0.0), 3),
        albedo=img(jnp.where(hm3, albedo, 0.0), 3),
        emittance=img(jnp.where(hm3, sp.emittance, 0.0), 3),
        texcoord=img(jnp.where(hm[..., None], sp.texcoord, 0.0), 2),
        motion=img(motion, 2),
        depth=img(jnp.where(hm, hit.t, jnp.inf)),
        tri=img(jnp.where(hm, hit.tri, -1)),
        bary=img(jnp.stack([hit.u, hit.v], axis=-1), 2),
        unit=img(jnp.where(hm, sp.unit, -1)),
        material=img(jnp.where(hm, sp.material, -1)),
        hit=img(hm),
        view_dir=img(ray_d, 3),
    )
