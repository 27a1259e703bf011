"""Wavefront path tracer: NEE + implicit-hit MIS (power heuristic) + Russian
roulette, progressive accumulation.

Faithful TPU re-architecture of the reference's baseline path tracer
(reference: path_tracing/gpu_kernels/optix_pathtracing_kernels.cu —
pathTrace_rayGen_generic:73, closest-hit :218, miss :310,
performNextEventEstimation:18; MIS weights use the power heuristic and
hypothetical area pdf exactly as the reference). Where the reference runs one
divergent megakernel per pixel with OptiX payloads, this integrator advances
ALL paths one vertex at a time over SoA state with masked lanes — the
wavefront formulation that XLA/TPU wants (SURVEY.md §7 design stance).

Config toggles mirror the reference's compile-time constants
(optix_pathtracing_kernels.cu:12-16).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.accel.bvh_build import BVH
from gfxexp_tpu.accel.traverse import intersect_any, intersect_closest
from gfxexp_tpu.core.math import (
    luminance,
    make_frame,
    normalize,
    offset_ray_origin,
    to_local,
    to_world,
)
from gfxexp_tpu.core.rng import SampleStream
from gfxexp_tpu.render.bsdf import (
    bsdf_evaluate,
    bsdf_pdf,
    bsdf_sample,
    material_params,
    material_params_textured,
)
from gfxexp_tpu.render.camera import (
    Camera,
    generate_rays_for_lanes,
    lane_from_pixel,
    pixel_from_lane,
)
from gfxexp_tpu.scene.lights import (
    env_pdf,
    env_radiance,
    light_selection_probs,
    pack_light_rows,
    sample_light,
    surface_light_pdf,
)
from gfxexp_tpu.scene.types import SceneData

_PI = jnp.pi


@dataclasses.dataclass(frozen=True)
class PTConfig:
    """Static (trace-time) integrator configuration (reference: compile-time
    constants + per-frame params, path_tracing_shared.h:131-186)."""

    max_path_length: int = 5
    enable_jitter: bool = True
    enable_env: bool = True
    use_implicit_light_sampling: bool = True
    use_explicit_light_sampling: bool = True
    russian_roulette: bool = True
    count_rays: bool = False  # also return the number of rays actually traced
    enable_bump_mapping: bool = False  # reference: plp.f->enableBumpMapping
    # sort secondary rays by direction octant before traversal — tightens the
    # per-tile union footprint of the tile-shared traverser (SURVEY.md §7
    # "ray sorting/binning for coherence")
    sort_secondary_rays: bool = False
    # stable-partition lanes alive-first at each bounce: dead lanes scattered
    # across 128-ray rows force whole-row walks for a few live rays; after
    # compaction dead rows exit the traversal in one step. Image is
    # bit-identical (RNG is keyed by pixel, not lane). MEASURED SLOWER on
    # v5e (XLA's 1D scatter + 10 gathers of 262k lanes cost more than the
    # row-exit savings: 326 vs 236 ms/sample on the bench scene) — default
    # off; revisit if compaction moves into a Pallas kernel.
    compact_rays: bool = False
    # solid-angle triangle sampling for NEE (reference:
    # useSolidAngleSampling, off by default like the reference)
    use_solid_angle_sampling: bool = False
    # roughen specular lobes after the first bounce to suppress fireflies
    # (reference: BSDFFlags::Regularize — smoothness *= 0.5 at BSDF setup,
    # common_device.cuh:795-797; toggled by SVGF's mollifySpecular)
    mollify_specular: bool = False
    # displaced geometry (scene.displaced): trace shadow rays against it too
    # (self-shadowing); costs one narrow-phase pass per NEE
    displaced_shadows: bool = True
    # trilinear mip LOD for material textures, selected by a pixel-footprint
    # distance heuristic (reference: mipmapped cudau::Array sampling,
    # cuda_util.h:897). Requires SceneBuilder(texture_mips=True).
    texture_lod: bool = False
    # batch each bounce's NEE shadow rays with the NEXT bounce's closest
    # rays into ONE traversal launch (the reference's megakernel traces
    # both from one program, optix_pathtracing_kernels.cu:73-300): halves
    # kernel launches per bounce at the cost of closest-hit work on
    # shadow rays (no any-hit early exit). Identical estimator — NEE
    # visibility is applied one step deferred. Ignored with displaced
    # geometry, ray sorting/compaction, or a custom nee_fn.
    fuse_shadow_rays: bool = False

    @property
    def use_mis(self):
        return self.use_implicit_light_sampling and self.use_explicit_light_sampling


@struct.dataclass
class SurfacePoint:
    """Per-lane surface interaction (reference: computeSurfacePoint,
    path_tracing_shared.h:484-621)."""

    position: jnp.ndarray  # [R, 3]
    geom_normal: jnp.ndarray  # [R, 3] unit geometric normal
    shading_normal: jnp.ndarray  # [R, 3]
    texcoord: jnp.ndarray  # [R, 2]
    tangent: jnp.ndarray  # [R, 3] texcoord-0 direction (for normal mapping)
    unit: jnp.ndarray  # [R] int32
    material: jnp.ndarray  # [R] int32
    emittance: jnp.ndarray  # [R, 3]
    # sqrt(uv_area / world_area): texels-per-world-unit factor for mip LOD
    # selection (None when the packed table predates the column)
    texel_density: jnp.ndarray = None


def pack_tri_attrs(tris, scene: SceneData = None) -> jnp.ndarray:
    """Concatenate the per-triangle shading attributes into one [T, 27] row
    table so compute_surface_point costs ONE row gather instead of ten
    scattered [T,3]/[T,2] gathers (measured 5.0 -> 1.7 ms per 262k lanes on
    v5e). Col 24 is the bitcast unit id; col 25 (when `scene` is given and
    non-instanced) is the hypothetical NEE area pdf of the triangle
    (unit_pmf * tri_pmf / area) for one-gather implicit-hit MIS
    (reference: computeHypotheticalAreaPDensity); col 26 is the texel
    density for mip LOD selection. Built inside jit from the traced scene
    arrays — a 16k x 27 concat is negligible and the caller hoists it once
    per frame (render_lanes)."""
    cols = [
        tris.p0, tris.e1, tris.e2, tris.n0, tris.n1, tris.n2,
        tris.uv0, tris.uv1, tris.uv2,
        jax.lax.bitcast_convert_type(tris.unit_id, jnp.float32)[:, None],
    ]
    cr_len = jnp.linalg.norm(jnp.cross(tris.e1, tris.e2), axis=-1)
    if scene is not None and not scene.is_instanced:
        rec_area = 2.0 / jnp.maximum(cr_len, 1e-20)
        pdf = (scene.light_unit_pmf[tris.unit_id]
               * scene.units.light_tri_pmf * rec_area)
        cols.append(pdf[:, None])
    else:
        cols.append(jnp.zeros((tris.p0.shape[0], 1), jnp.float32))
    # col 26: texel density sqrt(uv_area / world_area) for mip LOD
    # (uv_area = |det(duv)|/2, world_area = |e1 x e2|/2)
    duv1 = tris.uv1 - tris.uv0
    duv2 = tris.uv2 - tris.uv0
    uv_det = jnp.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    cols.append(jnp.sqrt(uv_det / jnp.maximum(cr_len, 1e-20))[:, None])
    return jnp.concatenate(cols, axis=1)


def compute_surface_point(scene: SceneData, tri_idx, u, v,
                          inst=None, packed=None) -> SurfacePoint:
    tris = scene.triangles
    tri_idx = jnp.maximum(tri_idx, 0)  # missed lanes gather slot 0 (masked out later)
    if packed is None:
        packed = pack_tri_attrs(tris)
    rows = packed[tri_idx]  # [R, 25] one gather for all attributes
    p0 = rows[:, 0:3]
    e1 = rows[:, 3:6]
    e2 = rows[:, 6:9]
    if scene.is_instanced:
        # triangles are OBJECT space; bring geometry into world space via
        # the hit instance (reference: CH programs read the OptiX
        # object-to-world transform the same way)
        insti = jnp.maximum(jnp.asarray(inst), 0)
        m = scene.instances.transform[insti]  # [R, 3, 4]
        rot = m[:, :, :3]
        hi = jax.lax.Precision.HIGHEST
        p0 = jnp.einsum("nij,nj->ni", rot, p0, precision=hi) + m[:, :, 3]
        e1 = jnp.einsum("nij,nj->ni", rot, e1, precision=hi)
        e2 = jnp.einsum("nij,nj->ni", rot, e2, precision=hi)
    position = p0 + u[..., None] * e1 + v[..., None] * e2
    gn = normalize(jnp.cross(e1, e2))
    w = 1.0 - u - v
    sn = (
        w[..., None] * rows[:, 9:12]
        + u[..., None] * rows[:, 12:15]
        + v[..., None] * rows[:, 15:18]
    )
    if scene.is_instanced:
        # normals transform by the inverse-transpose rotation
        ninv = scene.instances.inv_transform[insti][:, :, :3]
        sn = jnp.einsum("nji,nj->ni", ninv, sn,
                        precision=jax.lax.Precision.HIGHEST)
    sn = normalize(sn)
    uv0 = rows[:, 18:20]
    uv1 = rows[:, 20:22]
    uv2 = rows[:, 22:24]
    tc = w[..., None] * uv0 + u[..., None] * uv1 + v[..., None] * uv2
    # texcoord-0 direction (reference: texCoord0DirInWorld) from uv edges
    duv1 = uv1 - uv0
    duv2 = uv2 - uv0
    det = duv1[..., 0] * duv2[..., 1] - duv1[..., 1] * duv2[..., 0]
    tan = duv2[..., 1:2] * e1 - duv1[..., 1:2] * e2
    degenerate = jnp.abs(det) < 1e-12
    fallback, _ = make_frame(sn)
    tan = jnp.where(degenerate[..., None], fallback, tan)
    tan = normalize(tan - jnp.sum(tan * sn, axis=-1, keepdims=True) * sn)
    texel_density = rows[:, 26] if rows.shape[1] > 26 else None
    unit_id = jax.lax.bitcast_convert_type(rows[:, 24], jnp.int32)
    if scene.is_instanced:
        unit = scene.inst_unit_base[insti] + unit_id
    else:
        unit = unit_id
    mat = scene.units.material[unit]
    emit = scene.materials.emittance[mat]
    if scene.textures is not None and getattr(scene.textures, "count", 0) > 0:
        from gfxexp_tpu.scene.textures import sample_bilinear

        etid = scene.materials.emittance_tex[mat]
        etex = sample_bilinear(scene.textures, etid, tc)
        emit = jnp.where((etid >= 0)[:, None], etex[:, :3], emit)
    return SurfacePoint(
        position=position,
        geom_normal=gn,
        shading_normal=sn,
        texcoord=tc,
        tangent=tan,
        unit=unit,
        material=mat,
        emittance=emit,
        texel_density=texel_density,
    )


def _displaced_closest(scene, ray_o, ray_d, tmax):
    """Closest hit against every displaced geometry in the scene (returns
    None when there is none). Reference: TFDM/NRTDSM register displaced
    surfaces as custom primitives in the same GAS the path tracer walks
    (tfdm/gpu_kernels/optix_pathtracing_kernels.cu); here they are a
    post-pass composited with the triangle hit by distance."""
    if not scene.displaced:
        return None
    from gfxexp_tpu.core.curves import (
        CurveSegments,
        CurveSpans,
        intersect_curve_segments,
        intersect_curve_spans,
    )
    from gfxexp_tpu.techniques.shell import ShellGeometry, intersect_shell
    from gfxexp_tpu.techniques.tfdm import TFDMGeometry, intersect_tfdm_v2

    best = None
    for gi, g in enumerate(scene.displaced):
        if isinstance(g, TFDMGeometry):
            dh = intersect_tfdm_v2(g, ray_o, ray_d, t_min=1e-4, t_max=tmax)
            mat = jnp.full_like(dh.prim, g.material)
        elif isinstance(g, CurveSegments):
            # direct round-linear swept-sphere curves (reference: curve
            # primitives in the GAS, curve_evaluator.h:309)
            dh = intersect_curve_segments(g, ray_o, ray_d, t_min=1e-4,
                                          t_max=tmax)
            mat = jnp.full_like(dh.prim, g.material)
        elif isinstance(g, CurveSpans):
            # exact higher-order swept-sphere spans (canal-surface Newton)
            dh = intersect_curve_spans(g, ray_o, ray_d, t_min=1e-4,
                                       t_max=tmax)
            mat = jnp.full_like(dh.prim, g.material)
        elif isinstance(g, ShellGeometry):
            dh = intersect_shell(g, ray_o, ray_d, t_min=1e-4, t_max=tmax)
            mat = dh.mat  # multi-material shells
        else:  # NRTDSMGeometry
            from gfxexp_tpu.techniques.nrtdsm import (
                intersect_nrtdsm_exact,
                intersect_nrtdsm_v2,
            )
            from gfxexp_tpu.techniques.tfdm import (
                LOCAL_INTERSECTION_TWO_TRIANGLE,
            )

            if (g.params.local_intersection_type
                    == LOCAL_INTERSECTION_TWO_TRIANGLE):
                # exact cubic roots against the two-triangle micro surface
                dh = intersect_nrtdsm_exact(g, ray_o, ray_d, t_min=1e-4,
                                            t_max=tmax)
            else:
                dh = intersect_nrtdsm_v2(g, ray_o, ray_d, t_min=1e-4,
                                         t_max=tmax)
            mat = jnp.full_like(dh.prim, g.material)
        if best is None:
            best = (dh.t, dh.hit, dh.position, dh.normal, dh.uv, mat)
        else:
            take = dh.hit & (dh.t < best[0])
            best = (
                jnp.where(take, dh.t, best[0]),
                best[1] | dh.hit,
                jnp.where(take[:, None], dh.position, best[2]),
                jnp.where(take[:, None], dh.normal, best[3]),
                jnp.where(take[:, None], dh.uv, best[4]),
                jnp.where(take, mat, best[5]),
            )
    return best


def _displaced_occluded(scene, o, d, tmax):
    """Any-hit against displaced geometry for shadow rays."""
    occ = jnp.zeros(o.shape[:1], bool)
    if not scene.displaced:
        return occ
    from gfxexp_tpu.core.curves import (
        CurveSegments,
        CurveSpans,
        intersect_curve_segments,
        intersect_curve_spans,
    )
    from gfxexp_tpu.techniques.shell import ShellGeometry, intersect_shell
    from gfxexp_tpu.techniques.tfdm import TFDMGeometry, intersect_tfdm_v2

    for g in scene.displaced:
        if isinstance(g, TFDMGeometry):
            dh = intersect_tfdm_v2(g, o, d, t_min=1e-4, t_max=tmax)
        elif isinstance(g, CurveSegments):
            dh = intersect_curve_segments(g, o, d, t_min=1e-4, t_max=tmax)
        elif isinstance(g, CurveSpans):
            dh = intersect_curve_spans(g, o, d, t_min=1e-4, t_max=tmax)
        elif isinstance(g, ShellGeometry):
            dh = intersect_shell(g, o, d, t_min=1e-4, t_max=tmax)
        else:
            from gfxexp_tpu.techniques.nrtdsm import (
                intersect_nrtdsm_exact,
                intersect_nrtdsm_v2,
            )
            from gfxexp_tpu.techniques.tfdm import (
                LOCAL_INTERSECTION_TWO_TRIANGLE,
            )

            if (g.params.local_intersection_type
                    == LOCAL_INTERSECTION_TWO_TRIANGLE):
                dh = intersect_nrtdsm_exact(g, o, d, t_min=1e-4, t_max=tmax)
            else:
                dh = intersect_nrtdsm_v2(g, o, d, t_min=1e-4, t_max=tmax)
        occ = occ | dh.hit
    return occ


def _intersect_closest_sorted(bvh, tris, ray_o, ray_d, alive):
    """Closest hit with direction-octant ray sorting: bounce rays are
    incoherent in pixel order, which blows up the tile-shared traverser's
    union footprint; grouping by octant (dead lanes sorted last with
    zero-work tmax) restores coherence. One argsort + two gathers."""
    from gfxexp_tpu.accel.traverse import HitInfo

    key = (
        (ray_d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (ray_d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (ray_d[:, 2] >= 0).astype(jnp.int32)
    )
    key = jnp.where(alive, key, 8)  # dead lanes grouped at the end
    perm = jnp.argsort(key)
    inv = jnp.argsort(perm)
    t_max = jnp.where(alive[perm], 1e30, -1.0)  # dead lanes: no traversal
    hit = intersect_closest(bvh, tris, ray_o[perm], ray_d[perm],
                            t_min=0.0, t_max=t_max)
    return HitInfo(t=hit.t[inv], tri=hit.tri[inv], u=hit.u[inv],
                   v=hit.v[inv], hit=hit.hit[inv],
                   inst=None if hit.inst is None else hit.inst[inv])


def _next_event_setup(scene, sp: SurfacePoint, v_out_local, frame, params,
                      rs, cfg: PTConfig, alive=None, light_packed=None,
                      env_off=None):
    """Everything of NEE except the occlusion trace: light sample, MIS
    weight, unshadowed contribution, and the shadow ray. Returns
    (contrib_unshadowed [R, 3], shadow_dir [R, 3], shadow_tmax [R]) —
    shadow_tmax < 0 on non-contributing lanes (zero traversal work).
    `env_off` (traced bool) zeroes env-light samples (debug switch bit 3)."""
    t, b, n = frame
    u_light = rs.next()
    u0, u1 = rs.next2()
    if cfg.use_solid_angle_sampling:
        from gfxexp_tpu.scene.lights import sample_light_solid_angle

        ls = sample_light_solid_angle(scene, sp.position, u_light, u0, u1)
    else:
        ls = sample_light(scene, u_light, u0, u1, packed=light_packed)

    shadow_vec = jnp.where(
        ls.at_infinity[..., None], ls.position, ls.position - sp.position
    )
    dist2 = jnp.maximum(jnp.sum(shadow_vec * shadow_vec, axis=-1), 1e-12)
    dist = jnp.sqrt(dist2)
    shadow_dir = shadow_vec / dist[..., None]
    v_in_local = to_local(t, b, n, shadow_dir)

    lp_cos = jnp.sum(-shadow_dir * ls.normal, axis=-1)
    sp_cos = v_in_local[..., 2]

    # MIS weight (power heuristic) against the BSDF strategy
    if cfg.use_mis:
        lp_cos_abs = jnp.abs(lp_cos)
        bsdf_p = bsdf_pdf(params, v_out_local, v_in_local) * lp_cos_abs / dist2
        bsdf_p = jnp.where(jnp.isfinite(bsdf_p), bsdf_p, 0.0)
        light_p = ls.pdf
        mis = jnp.where(
            light_p > 0.0,
            light_p**2 / jnp.maximum(bsdf_p**2 + light_p**2, 1e-30),
            0.0,
        )
    else:
        mis = jnp.ones_like(ls.pdf)

    potential = (ls.pdf > 0.0) & (lp_cos > 0.0)
    if alive is not None:
        potential = potential & alive
    if env_off is not None:
        potential = potential & ~(env_off & ls.at_infinity)
    # shadow ray (reference traces with tmax = 0.9999 dist; env dist = 1e10);
    # tmax < 0 on non-contributing lanes = zero traversal work
    shadow_tmax = jnp.where(ls.at_infinity, 1e10, dist * 0.9999)
    shadow_tmax = jnp.where(potential, shadow_tmax, -1.0)

    le = ls.emittance / _PI  # diffuse emitter
    f_val = bsdf_evaluate(params, v_out_local, v_in_local)
    g = lp_cos * jnp.abs(sp_cos) / dist2
    g = jnp.where(ls.at_infinity, jnp.abs(sp_cos), g)  # env: dist=1, lpCos=1
    contrib = f_val * le * (g * mis / jnp.maximum(ls.pdf, 1e-30))[..., None]
    contrib = jnp.where(potential[..., None], contrib, 0.0)
    return contrib, shadow_dir, shadow_tmax


def _next_event(scene, bvh, sp: SurfacePoint, v_out_local, frame, params, rs,
                cfg: PTConfig, alive=None, light_packed=None, env_off=None):
    """NEE with MIS (reference: performNextEventEstimation,
    optix_pathtracing_kernels.cu:18-48 + performDirectLighting,
    path_tracing_shared.h:419-457). Returns [R, 3] contribution. `alive`
    masks the shadow-ray tmax so dead/zero-potential lanes cost the
    traverser nothing (on late bounces most lanes are dead)."""
    contrib, shadow_dir, shadow_tmax = _next_event_setup(
        scene, sp, v_out_local, frame, params, rs, cfg, alive,
        light_packed, env_off=env_off)
    occluded = intersect_any(
        bvh, scene.triangles, sp.position, shadow_dir, t_min=0.0, t_max=shadow_tmax
    )
    if scene.displaced and cfg.displaced_shadows:
        occluded = occluded | _displaced_occluded(
            scene, sp.position, shadow_dir, shadow_tmax)
    return jnp.where(occluded[..., None], 0.0, contrib)


def render_lanes(
    scene: SceneData,
    bvh: BVH,
    camera: Camera,
    width: int,
    height: int,
    lane_start,
    lane_count: int,
    sample_idx,
    cfg: PTConfig = PTConfig(),
    nee_fn=None,
    nee_aux=None,
    debug_switches=None,
):
    """Render one sample for `lane_count` consecutive pixels starting at
    linear pixel index `lane_start` (traced — enables tiling and per-device
    sharding). Returns radiance [lane_count, 3] (plus traced-ray count when
    cfg.count_rays).

    `nee_fn(scene, bvh, sp, v_out_local, frame, params, rs, cfg, alive, aux)`
    overrides next-event estimation (used by ReGIR's cell resampling) and must
    return `(radiance, aux)`. `aux` is an arbitrary pytree carried through the
    bounce scan (initial value: `nee_aux`) — the hook may NOT stash traced
    values in Python state (that leaks tracers out of `lax.scan`); anything it
    wants back (e.g. ReGIR's per-cell touch counts) must flow through aux.
    When `nee_aux` is not None the final aux is returned alongside radiance.

    `debug_switches` is a TRACED uint32 bitfield — the TPU analogue of the
    reference's 8 per-frame debug switches (path_tracing_shared.h:173-180):
    runtime toggles that do not recompile. Assignments: bit 0 = disable
    explicit light sampling (NEE), bit 1 = disable implicit/env emitter
    contributions past the primary hit, bit 2 = disable Russian roulette,
    bit 3 = disable the environment light (implicit AND NEE samples,
    reference enableEnvLight), bit 4 = disable bump/normal mapping
    (reference enableBumpMapping), bit 5 = disable pixel jitter (reference
    enableJittering), bit 6 = white-albedo override (0.8 diffuse — furnace
    debugging), bit 7 = shade with geometric normals."""
    n = lane_count
    lane = jnp.asarray(lane_start, jnp.uint32) + jnp.arange(n, dtype=jnp.uint32)
    # lanes are block-major over the screen (16x16 blocks) so consecutive
    # lanes form spatially-coherent tiles for the tile-shared traverser;
    # RNG and camera rays are keyed by the PIXEL for determinism
    pixel = pixel_from_lane(lane, width, height)
    sample_idx = jnp.asarray(sample_idx, jnp.uint32)
    rays_traced = jnp.zeros((), jnp.float32)

    # 8 generic traced debug switches (reference: the debugSwitches uint32 in
    # PerFramePipelineLaunchParameters, path_tracing_shared.h:173-180 — one
    # bitfield forwarded to kernels every frame, toggled without recompile):
    #   bit 0  disable NEE             bit 4  disable bump/normal mapping
    #   bit 1  disable implicit hits   bit 5  disable pixel jitter
    #   bit 2  disable Russian roulette bit 6 white-albedo override (furnace)
    #   bit 3  disable env light        bit 7 shade with geometric normals
    if debug_switches is None:
        debug_switches = jnp.zeros((), jnp.uint32)
    sw = jnp.asarray(debug_switches, jnp.uint32)
    dbg_no_nee = (sw & 1) != 0
    dbg_no_implicit = (sw & 2) != 0
    dbg_no_rr = (sw & 4) != 0
    dbg_no_env = (sw & 8) != 0
    dbg_no_bump = (sw & 16) != 0
    dbg_no_jitter = (sw & 32) != 0
    dbg_white_albedo = (sw & 64) != 0
    dbg_geom_normal = (sw & 128) != 0

    rs_cam = SampleStream(pixel, sample_idx, stream=0xFFFF)
    if cfg.enable_jitter:
        jx, jy = rs_cam.next2()
        jx = jnp.where(dbg_no_jitter, 0.5, jx)
        jy = jnp.where(dbg_no_jitter, 0.5, jy)
    else:
        jx = jnp.full((n,), 0.5, jnp.float32)
        jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, width, height, pixel, jx, jy)

    contribution = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,), jnp.float32)  # solid-angle pdf of prev bounce

    use_env = cfg.enable_env and scene.env is not None
    p_env_sel, p_surf_sel = light_selection_probs(scene)
    # hoisted packed tables: one row gather per lane instead of ~12 scattered
    # gathers (scan-constant across bounces)
    tri_packed = pack_tri_attrs(scene.triangles, scene)
    light_packed = pack_light_rows(scene) if cfg.use_explicit_light_sampling else None

    fuse = (cfg.fuse_shadow_rays and cfg.use_explicit_light_sampling
            and nee_fn is None and not scene.displaced
            and not cfg.sort_secondary_rays and not cfg.compact_rays)

    # Bounce loop structure: peel the first bounce (MIS weights are 1 there),
    # lax.scan the uniform middle bounces, peel the last (collect-only — no
    # NEE / no direction sample). Three traversal-kernel instantiations total
    # instead of max_path_length: cuts trace+compile time by ~L/3 with
    # byte-identical output (RNG is counter-based, streams keyed by bounce).
    def step(state, bounce, first: bool, collect_only: bool):
        (ray_o, ray_d, throughput, alive, prev_pdf, contribution,
         pixel, lane_ids, rays_traced, nee_aux, pending) = state
        p_contrib, p_o, p_d, p_tmax = pending
        if cfg.compact_rays and not first:
            # stable alive-first partition: dead lanes collect into whole
            # rows, which exit the row-traversal kernels in one step. O(n)
            # cumsum + one scatter; output identical (RNG keys by pixel).
            a = alive.astype(jnp.int32)
            n_alive = jnp.cumsum(a)
            pos = jnp.where(alive, n_alive - 1,
                            n_alive[-1] + jnp.cumsum(1 - a) - 1)
            order = jnp.zeros((n,), jnp.int32).at[pos].set(
                jnp.arange(n, dtype=jnp.int32))
            ray_o, ray_d = ray_o[order], ray_d[order]
            throughput, alive = throughput[order], alive[order]
            prev_pdf, contribution = prev_pdf[order], contribution[order]
            pixel, lane_ids = pixel[order], lane_ids[order]
        rs = SampleStream(pixel, sample_idx, stream=bounce)
        if cfg.count_rays:
            rays_traced = rays_traced + jnp.sum(alive.astype(jnp.float32))
        if fuse:
            # ONE traversal launch per step: this bounce's closest rays
            # batched with the PREVIOUS bounce's NEE shadow rays (whose
            # visibility resolves here, one step deferred)
            bo = jnp.concatenate([ray_o, p_o], axis=0)
            bd = jnp.concatenate([ray_d, p_d], axis=0)
            btmax = jnp.concatenate([jnp.where(alive, 1e30, -1.0), p_tmax])
            bhit = intersect_closest(bvh, scene.triangles, bo, bd,
                                     t_min=0.0, t_max=btmax)
            from gfxexp_tpu.accel.traverse import HitInfo as _HI

            hit = _HI(t=bhit.t[:n], tri=bhit.tri[:n], u=bhit.u[:n],
                      v=bhit.v[:n], hit=bhit.hit[:n],
                      inst=None if bhit.inst is None else bhit.inst[:n])
            # p_contrib already carries throughput + gating masks
            contribution = contribution + jnp.where(
                bhit.hit[n:][..., None], 0.0, p_contrib)
        elif cfg.sort_secondary_rays and not first and not scene.displaced:
            hit = _intersect_closest_sorted(bvh, scene.triangles, ray_o,
                                            ray_d, alive)
        else:
            # dead lanes trace with tmax < 0 => zero traversal work
            tmax = jnp.where(alive, 1e30, -1.0)
            hit = intersect_closest(bvh, scene.triangles, ray_o, ray_d,
                                    t_min=0.0, t_max=tmax)
        # empty pending (tmax < 0 = no-op shadow rays); replaced when NEE
        # emits below
        pending_next = (jnp.zeros((n, 3), jnp.float32), ray_o, ray_d,
                        jnp.full((n,), -1.0, jnp.float32))
        disp = _displaced_closest(
            scene, ray_o, ray_d, jnp.where(alive, hit.t, -1.0))
        if disp is not None:
            # displaced hits were clipped by the triangle hit's t, so any
            # reported hit is the closer one
            d_t, d_hit, d_pos, d_nrm, d_uv, d_mat = disp
            d_take = alive & d_hit
            hit = hit.replace(t=jnp.where(d_take, d_t, hit.t),
                              hit=hit.hit | d_take)
        hit_ok = alive & hit.hit
        miss = alive & ~hit.hit

        # ---- miss: environment contribution -----------------------------
        if use_env:
            env_l = env_radiance(scene.env, ray_d)
            if first or not cfg.use_mis:
                env_mis = jnp.ones((n,), jnp.float32)
            else:
                light_p = p_env_sel * env_pdf(scene.env, ray_d)
                env_mis = prev_pdf**2 / jnp.maximum(prev_pdf**2 + light_p**2, 1e-30)
            env_gate = miss if cfg.use_implicit_light_sampling or first else jnp.zeros_like(miss)
            env_gate = env_gate & ~dbg_no_env
            if not first:
                env_gate = env_gate & ~dbg_no_implicit
            contribution = contribution + jnp.where(
                env_gate[..., None], throughput * env_l * env_mis[..., None], 0.0
            )

        sp = compute_surface_point(scene, hit.tri, hit.u, hit.v,
                                   inst=hit.inst, packed=tri_packed)
        if disp is not None:
            # overlay displaced-surface attributes (reference: the custom-IS
            # CH program fills the same hit-point params)
            from gfxexp_tpu.core.math import make_frame as _mf

            d_tan, _ = _mf(d_nrm)
            d3 = d_take[..., None]
            sp = sp.replace(
                position=jnp.where(d3, d_pos, sp.position),
                geom_normal=jnp.where(d3, d_nrm, sp.geom_normal),
                shading_normal=jnp.where(d3, d_nrm, sp.shading_normal),
                texcoord=jnp.where(d3, d_uv, sp.texcoord),
                tangent=jnp.where(d3, d_tan, sp.tangent),
                material=jnp.where(d_take, d_mat, sp.material),
                emittance=jnp.where(
                    d3, scene.materials.emittance[d_mat], sp.emittance),
            )
        v_out = -ray_d
        front = jnp.sum(v_out * sp.geom_normal, axis=-1) >= 0.0
        gn_signed = jnp.where(front[..., None], sp.geom_normal, -sp.geom_normal)
        pos_off = offset_ray_origin(sp.position, gn_signed)
        nrm = sp.shading_normal
        if cfg.enable_bump_mapping and scene.textures is not None:
            # reference: applyBumpMapping (common_device.cuh:176) with the
            # texcoord-aligned frame
            from gfxexp_tpu.scene.textures import (
                apply_bump,
                decode_normal_map,
                normal_from_height_map,
                sample_bilinear,
            )

            ntid = scene.materials.normal_tex[sp.material]
            texel = sample_bilinear(scene.textures, ntid, sp.texcoord)
            # reader select (reference: the three readModifiedNormal*
            # callables, common_device.cuh:205-240)
            if scene.materials.normal_map_kind is not None:
                kind = scene.materials.normal_map_kind[sp.material]
            else:
                kind = jnp.zeros_like(ntid)
            n3 = decode_normal_map(texel)
            n2 = decode_normal_map(texel, two_channel=True)
            nh = normal_from_height_map(scene.textures, ntid, sp.texcoord)
            local_n = jnp.where((kind == 2)[:, None], nh,
                                jnp.where((kind == 1)[:, None], n2, n3))
            bit = jnp.cross(nrm, sp.tangent)
            bumped = normalize(apply_bump(nrm, sp.tangent, bit, local_n))
            nrm = jnp.where(dbg_no_bump | (ntid < 0)[:, None], nrm, bumped)
        nrm = jnp.where(dbg_geom_normal, gn_signed, nrm)
        t, b = make_frame(nrm)
        v_out_local = to_local(t, b, nrm, v_out)

        # ---- implicit emitter contribution ------------------------------
        emissive = jnp.any(sp.emittance > 0.0, axis=-1) & (v_out_local[..., 2] > 0.0)
        if cfg.use_implicit_light_sampling or first:
            if first or not cfg.use_mis:
                mis_w = jnp.ones((n,), jnp.float32)
            else:
                dist2 = jnp.maximum(hit.t**2, 1e-12)
                if scene.is_instanced:
                    hyp_area = surface_light_pdf(
                        scene, jnp.maximum(hit.tri, 0), inst=hit.inst)
                else:
                    # baked pdf column: the row gather is shared (CSE) with
                    # compute_surface_point's gather of the same indices
                    hyp_area = tri_packed[jnp.maximum(hit.tri, 0)][:, 25]
                light_p = (
                    p_surf_sel
                    * hyp_area
                    * dist2
                    / jnp.maximum(v_out_local[..., 2], 1e-6)
                )
                mis_w = prev_pdf**2 / jnp.maximum(prev_pdf**2 + light_p**2, 1e-30)
            gate = hit_ok & emissive
            if not first:
                gate = gate & ~dbg_no_implicit
            contribution = contribution + jnp.where(
                gate[..., None], throughput * sp.emittance * (mis_w / _PI)[..., None], 0.0
            )

        alive = hit_ok

        # ---- Russian roulette (reference: CH :264-268; init importance is
        # the camera-path luminance 1.0). At the last bounce RR cannot change
        # the image (contribution is already collected), so collect-only
        # steps skip it. -------------------------------------------------
        if cfg.russian_roulette and not first and not collect_only:
            cont_prob = jnp.minimum(luminance(throughput), 1.0)
            cont_prob = jnp.where(dbg_no_rr, 1.0, cont_prob)
            u_rr = rs.next()
            alive = alive & (u_rr < cont_prob)
            throughput = throughput / jnp.maximum(cont_prob, 1e-8)[..., None]
        if collect_only:
            return (ray_o, ray_d, throughput, alive, prev_pdf, contribution,
                    pixel, lane_ids, rays_traced, nee_aux, pending_next)

        # ---- NEE ---------------------------------------------------------
        lod = None
        if (cfg.texture_lod and scene.textures is not None
                and getattr(scene.textures, "mip_flat", None) is not None
                and sp.texel_density is not None):
            # pixel-footprint heuristic: world-space footprint of one pixel
            # at distance t, projected by the grazing angle, converted to
            # texels via the triangle's uv density (ray differentials
            # degenerate to this for primary rays; bounces reuse the last
            # segment's distance)
            pixel_angle = 2.0 * jnp.tan(camera.fov_y * 0.5) / height
            cosg = jnp.abs(jnp.sum(v_out * sp.geom_normal, axis=-1))
            S = scene.textures.layers.shape[1]
            footprint = hit.t * pixel_angle / jnp.maximum(cosg, 0.1)
            lod = jnp.log2(jnp.maximum(
                footprint * sp.texel_density * S, 1.0))
        params = material_params_textured(
            scene.materials, scene.textures, sp.material, sp.texcoord,
            lod=lod)
        if cfg.mollify_specular and not first:
            # smoothness *= 0.5 <=> roughness -> 1 - 0.5*(1 - roughness)
            params = params.replace(
                roughness=1.0 - 0.5 * (1.0 - params.roughness))
        params = params.replace(diffuse=jnp.where(
            dbg_white_albedo, 0.8, params.diffuse))
        sp_off = sp.replace(position=pos_off)
        if cfg.use_explicit_light_sampling:
            if cfg.count_rays:
                rays_traced = rays_traced + jnp.sum(alive.astype(jnp.float32))
            if fuse:
                # emit the shadow ray for the NEXT step's batched launch;
                # throughput + gates fold into the pending contribution now
                nee_c, sdir, stmax = _next_event_setup(
                    scene, sp_off, v_out_local, (t, b, nrm), params, rs,
                    cfg, alive, light_packed=light_packed,
                    env_off=dbg_no_env)
                gate = (alive & ~dbg_no_nee)[..., None]
                pending_next = (
                    jnp.where(gate, throughput * nee_c, 0.0),
                    pos_off, sdir,
                    jnp.where(gate[..., 0], stmax, -1.0),
                )
            elif nee_fn is not None:
                nee, nee_aux = nee_fn(scene, bvh, sp_off, v_out_local,
                                      (t, b, nrm), params, rs, cfg, alive,
                                      nee_aux)
                contribution = contribution + jnp.where(
                    (alive & ~dbg_no_nee)[..., None], throughput * nee, 0.0
                )
            else:
                nee = _next_event(scene, bvh, sp_off, v_out_local, (t, b, nrm),
                                  params, rs, cfg, alive,
                                  light_packed=light_packed,
                                  env_off=dbg_no_env)
                contribution = contribution + jnp.where(
                    (alive & ~dbg_no_nee)[..., None], throughput * nee, 0.0
                )

        # ---- sample next direction --------------------------------------
        u0, u1 = rs.next2()
        v_in_local, f_val, pdf = bsdf_sample(params, v_out_local, u0, u1)
        valid = (pdf > 0.0) & jnp.isfinite(pdf)
        thr = f_val * (jnp.abs(v_in_local[..., 2]) / jnp.maximum(pdf, 1e-30))[..., None]
        throughput = jnp.where((alive & valid)[..., None], throughput * thr, throughput)
        alive = alive & valid
        v_in = to_world(t, b, nrm, v_in_local)
        return (pos_off, normalize(v_in), throughput, alive, pdf, contribution,
                pixel, lane_ids, rays_traced, nee_aux, pending_next)

    L = cfg.max_path_length
    lane_ids = jnp.arange(n, dtype=jnp.int32)
    pending0 = (jnp.zeros((n, 3), jnp.float32), ray_o, ray_d,
                jnp.full((n,), -1.0, jnp.float32))
    state = (ray_o, ray_d, throughput, alive, prev_pdf, contribution,
             pixel, lane_ids, rays_traced, nee_aux, pending0)
    state = step(state, jnp.uint32(1), first=True, collect_only=(L == 1))
    if L > 2:
        def scan_body(s, bounce):
            return step(s, bounce, first=False, collect_only=False), None

        state, _ = jax.lax.scan(
            scan_body, state, jnp.arange(2, L, dtype=jnp.uint32))
    if L > 1:
        state = step(state, jnp.uint32(L), first=False, collect_only=True)
    contribution, lane_ids = state[5], state[7]
    rays_traced, final_aux = state[8], state[9]
    if cfg.compact_rays and L > 1:
        # undo the cumulative alive-first permutations
        contribution = jnp.zeros_like(contribution).at[lane_ids].set(
            contribution)

    result = (contribution, rays_traced) if cfg.count_rays else contribution
    if nee_aux is not None:
        return result, final_aux
    return result


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg"))
def render_sample(
    scene: SceneData,
    bvh: BVH,
    camera: Camera,
    width: int,
    height: int,
    sample_idx,
    cfg: PTConfig = PTConfig(),
    debug_switches=None,
):
    """Render one sample for every pixel; returns radiance [H*W, 3] in
    row-major PIXEL order (render_lanes' internal block-major lane order is
    inverted here).

    Jitted with scene/bvh/camera as *traced* arguments — do NOT close over
    scene arrays in an outer jit (XLA would embed them as constants and
    recompile per scene)."""
    out = render_lanes(scene, bvh, camera, width, height, 0, width * height,
                       sample_idx, cfg, debug_switches=debug_switches)
    order = lane_from_pixel(jnp.arange(width * height, dtype=jnp.uint32),
                            width, height)
    if cfg.count_rays:
        contribution, nrays = out
        return contribution[order], nrays
    return out[order]


@functools.partial(
    jax.jit, static_argnames=("width", "height", "lane_count", "cfg")
)
def render_tile(
    scene: SceneData,
    bvh: BVH,
    camera: Camera,
    width: int,
    height: int,
    lane_start,
    lane_count: int,
    sample_idx,
    cfg: PTConfig = PTConfig(),
):
    """Jitted tile renderer: one compile serves every tile position (lane
    start is traced). Used by bench + big-resolution drivers to bound the
    live-state memory (per-lane traversal stacks)."""
    return render_lanes(scene, bvh, camera, width, height, lane_start,
                        lane_count, sample_idx, cfg)


def accumulate(accum, new_sample, num_accum_frames):
    """Progressive running mean (reference: optix_pathtracing_kernels.cu:
    206-214)."""
    w = 1.0 / (1.0 + num_accum_frames)
    return (1.0 - w) * accum + w * new_sample


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "lane_count", "n_samples", "cfg"))
def render_tile_accumulate(
    scene: SceneData,
    bvh: BVH,
    camera: Camera,
    width: int,
    height: int,
    lane_start,
    lane_count: int,
    start_idx,
    n_samples: int,
    cfg: PTConfig = PTConfig(),
):
    """render_tile x render_accumulate: n_samples progressive samples of one
    lane tile inside ONE jitted program (big resolutions keep per-lane live
    state bounded by the tile while still amortizing per-program dispatch).
    Returns (summed radiance [lane_count, 3] in LANE order, total rays when
    cfg.count_rays)."""
    start_idx = jnp.asarray(start_idx, jnp.uint32)

    def body(s, carry):
        acc, rays = carry
        out = render_lanes(scene, bvh, camera, width, height, lane_start,
                           lane_count, start_idx + s.astype(jnp.uint32), cfg)
        if cfg.count_rays:
            img, nr = out
            rays = rays + nr
        else:
            img = out
        return acc + img, rays

    return jax.lax.fori_loop(
        0, n_samples, body,
        (jnp.zeros((lane_count, 3), jnp.float32), jnp.zeros((), jnp.float32)))


@functools.partial(
    jax.jit, static_argnames=("width", "height", "n_samples", "cfg"))
def render_accumulate(
    scene: SceneData,
    bvh: BVH,
    camera: Camera,
    width: int,
    height: int,
    start_idx,
    n_samples: int,
    cfg: PTConfig = PTConfig(),
):
    """Accumulate n_samples progressive samples inside ONE jitted program
    (a lax.fori_loop over sample indices): amortizes per-program dispatch
    through the remote-execution tunnel vs a host loop of render_sample
    calls. Returns (mean radiance [H*W, 3] in pixel order, total rays when
    cfg.count_rays). Identical estimator — sample s uses the same RNG
    streams as render_sample(sample_idx=start_idx+s)."""
    start_idx = jnp.asarray(start_idx, jnp.uint32)
    n = width * height

    def body(s, carry):
        acc, rays = carry
        out = render_lanes(scene, bvh, camera, width, height, 0, n,
                           start_idx + s.astype(jnp.uint32), cfg)
        if cfg.count_rays:
            img, nr = out
            rays = rays + nr
        else:
            img = out
        return acc + img, rays

    acc, rays = jax.lax.fori_loop(
        0, n_samples, body,
        (jnp.zeros((n, 3), jnp.float32), jnp.zeros((), jnp.float32)))
    order = lane_from_pixel(jnp.arange(n, dtype=jnp.uint32), width, height)
    mean = (acc / n_samples)[order]
    if cfg.count_rays:
        return mean, rays
    return mean
