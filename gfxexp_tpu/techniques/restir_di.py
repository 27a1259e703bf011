"""ReSTIR DI: reservoir-based spatiotemporal resampled direct illumination.

Faithful re-derivation of the reference's ReSTIR DI renderer (reference:
restir_di/restir_di_shared.h — Reservoir:107 (streaming WRS update),
ReservoirInfo:141 {recPDFEstimate, targetDensity}, convertToWeight:82
(target = mean(RGB)); gpu_kernels/optix_restir_di_kernels.cu —
performInitialAndTemporalRIS:15 (streaming RIS over 2^k candidates with
stratified env allocation :64-77, visibility kill :124-133, temporal reuse
with 20x stream clamp :148-189, unbiased MIS weights :192-266),
performSpatialRIS:300 (neighbor merge, low-discrepancy disk offsets, unbiased
pass re-evaluating targets at neighbors :414-529), testNeighbor:748
(depth 10% + normal dot 0.9 similarity), final shading :559-637).

TPU re-architecture: every pass is one batched kernel over [H*W] pixels;
reservoirs are SoA pytrees; the candidate stream is a static unrolled loop;
neighbor reuse is a gather + masked merge. The resolved light-sample record
(position/normal/emittance) is stored directly instead of the reference's
(inst, geomInst, prim) ids — equivalent within a frame, cheaper to re-evaluate.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gfxexp_tpu.accel.traverse import intersect_any
from gfxexp_tpu.core.math import make_frame, offset_ray_origin, to_local
from gfxexp_tpu.core.rng import SampleStream
from gfxexp_tpu.render.bsdf import BSDFParams, bsdf_evaluate, material_params_textured
from gfxexp_tpu.render.camera import Camera
from gfxexp_tpu.render.gbuffer import GBuffer
from gfxexp_tpu.scene.lights import (
    PROB_SAMPLE_ENV,
    sample_env_light,
    sample_surface_light,
)
from gfxexp_tpu.scene.types import SceneData

_PI = jnp.pi


@dataclasses.dataclass(frozen=True)
class ReSTIRConfig:
    """reference: per-frame params restir_di_shared.h:257-271 + GUI defaults."""

    log2_num_candidates: int = 3
    enable_temporal_reuse: bool = True
    enable_spatial_reuse: bool = True
    num_spatial_passes: int = 2
    num_spatial_neighbors: int = 3
    spatial_radius: float = 20.0
    use_unbiased_estimator: bool = False
    reuse_visibility: bool = True
    use_low_discrepancy_neighbors: bool = True
    use_mis_ris: bool = True  # reference: useMIS_RIS compile-time constant
    # "Rearchitecting Spatiotemporal Resampling for Production" pipeline
    # (reference: restir_di_shared.h:8-9 kNumLightSubsets=128 x 1024 presampled
    # lights/frame, per_pixel_ris.cu, decoupled visibility + shading in
    # optix_restir_di_rearch_kernels.cu): presampled pool + per-8x8-tile
    # subset candidate draws + a dedicated trace_shadow_rays pass producing
    # SampleVisibility flags consumed by the ray-free shade_and_resample.
    use_rearchitected_pipeline: bool = False
    num_light_subsets: int = 128
    light_subset_size: int = 1024
    # rearch only: reuse the previous frame's selected-sample visibility for
    # the temporal candidate instead of tracing a shadow ray (reference:
    # plp.f->reuseVisibilityForTemporal; biased estimator only) — halves the
    # pipeline's shadow rays
    reuse_visibility_for_temporal: bool = False


@struct.dataclass
class ReservoirSoA:
    """Per-pixel reservoir + info, flat [N] SoA."""

    pos: jnp.ndarray  # [N, 3] light-sample position (or env direction)
    nrm: jnp.ndarray  # [N, 3]
    emit: jnp.ndarray  # [N, 3]
    at_inf: jnp.ndarray  # [N] bool
    sum_w: jnp.ndarray  # [N]
    stream_len: jnp.ndarray  # [N] float32
    rec_pdf: jnp.ndarray  # [N] recPDFEstimate
    target: jnp.ndarray  # [N] targetDensity of the selected sample


def empty_reservoir(n: int) -> ReservoirSoA:
    z3 = jnp.zeros((n, 3), jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    return ReservoirSoA(
        pos=z3, nrm=z3, emit=z3, at_inf=jnp.zeros((n,), bool),
        sum_w=z, stream_len=z, rec_pdf=z, target=z,
    )


@struct.dataclass
class PixelCtx:
    """Per-pixel shading context reconstructed from the G-buffer."""

    pos: jnp.ndarray  # [N, 3] offset surface position
    v_out_local: jnp.ndarray  # [N, 3]
    t: jnp.ndarray
    b: jnp.ndarray
    n: jnp.ndarray
    params: BSDFParams
    valid: jnp.ndarray  # [N]
    cam_dist: jnp.ndarray  # [N]


@struct.dataclass
class SampleVisibility:
    """Per-pixel shadow-ray results of the decoupled visibility pass, SoA
    (reference: SampleVisibility bitfield, restir_di_shared.h:146). All
    flags refer to the CURRENT frame's samples; `selected` is written by
    shade_and_resample and read back next frame when
    reuse_visibility_for_temporal is on."""

    new: jnp.ndarray  # [N] new (per-pixel RIS) sample visible at cur surface
    temporal_passed: jnp.ndarray  # [N] temporal neighbor heuristic passed
    temporal: jnp.ndarray  # [N] temporal sample visible at cur surface
    new_on_temporal: jnp.ndarray  # [N] new sample visible at the temporal
    #     neighbor's surface (unbiased cross term)
    selected: jnp.ndarray  # [N] visibility of the finally selected sample


def empty_sample_visibility(n: int) -> SampleVisibility:
    f = jnp.zeros((n,), bool)
    return SampleVisibility(new=f, temporal_passed=f, temporal=f,
                            new_on_temporal=f, selected=f)


def pixel_ctx(scene: SceneData, gb: GBuffer, camera: Camera) -> PixelCtx:
    h, w = gb.depth.shape
    n = h * w
    pos = gb.position.reshape(n, 3)
    gn = gb.geom_normal.reshape(n, 3)
    sn = gb.normal.reshape(n, 3)
    v_out = camera.position[None, :] - pos
    dist = jnp.linalg.norm(v_out, axis=-1)
    v_out = v_out / jnp.maximum(dist[:, None], 1e-12)
    front = jnp.sum(v_out * gn, axis=-1) >= 0.0
    pos_off = offset_ray_origin(pos, jnp.where(front[:, None], gn, -gn))
    t, b = make_frame(sn)
    v_out_local = to_local(t, b, sn, v_out)
    mat = jnp.maximum(gb.material.reshape(n), 0)
    params = material_params_textured(
        scene.materials, scene.textures, mat, gb.texcoord.reshape(n, 2))
    return PixelCtx(
        pos=pos_off, v_out_local=v_out_local, t=t, b=b, n=sn,
        params=params, valid=gb.hit.reshape(n), cam_dist=dist,
    )


def _unshadowed_contribution(ctx: PixelCtx, ls_pos, ls_nrm, ls_emit, ls_inf):
    """performDirectLighting without visibility (path_tracing_shared.h:419)."""
    shadow_vec = jnp.where(ls_inf[:, None], ls_pos, ls_pos - ctx.pos)
    dist2 = jnp.maximum(jnp.sum(shadow_vec**2, axis=-1), 1e-12)
    sdir = shadow_vec / jnp.sqrt(dist2)[:, None]
    v_in_local = to_local(ctx.t, ctx.b, ctx.n, sdir)
    lp_cos = jnp.sum(-sdir * ls_nrm, axis=-1)
    sp_cos = v_in_local[..., 2]
    le = ls_emit / _PI
    f = bsdf_evaluate(ctx.params, ctx.v_out_local, v_in_local)
    g = jnp.where(ls_inf, jnp.abs(sp_cos), lp_cos * jnp.abs(sp_cos) / dist2)
    cont = f * le * g[:, None]
    ok = (lp_cos > 0.0) & ctx.valid
    return jnp.where(ok[:, None], cont, 0.0)


def _target_density(cont):
    """convertToWeight (restir_di_shared.h:82): mean of RGB."""
    return jnp.mean(cont, axis=-1)


def _shadow_dir_dist(ctx: PixelCtx, ls_pos, ls_inf):
    vec = jnp.where(ls_inf[:, None], ls_pos, ls_pos - ctx.pos)
    dist = jnp.linalg.norm(vec, axis=-1)
    sdir = vec / jnp.maximum(dist[:, None], 1e-12)
    tmax = jnp.where(ls_inf, 1e10, dist * 0.9999)
    return sdir, tmax


def _visibility(scene, bvh, ctx: PixelCtx, ls_pos, ls_inf, valid):
    sdir, tmax = _shadow_dir_dist(ctx, ls_pos, ls_inf)
    tmax = jnp.where(valid, tmax, -1.0)  # dead lanes: no traversal work
    occluded = intersect_any(bvh, scene.triangles, ctx.pos, sdir,
                             t_min=0.0, t_max=tmax)
    return ~occluded & valid


def _reservoir_update(res: ReservoirSoA, new_pos, new_nrm, new_emit, new_inf,
                      weight, u, new_target, selected_target):
    """Streaming WRS update (reference: Reservoir::update,
    restir_di_shared.h:119-126), batched + masked. Returns
    (reservoir, selected_target, accept_mask)."""
    sum_w = res.sum_w + weight
    accept = (u * sum_w < weight) & (weight > 0.0)
    sel = lambda a, b: jnp.where(accept[:, None] if a.ndim == 2 else accept, a, b)
    return (
        res.replace(
            pos=sel(new_pos, res.pos),
            nrm=sel(new_nrm, res.nrm),
            emit=sel(new_emit, res.emit),
            at_inf=jnp.where(accept, new_inf, res.at_inf),
            sum_w=sum_w,
            stream_len=res.stream_len + 1.0,
        ),
        jnp.where(accept, new_target, selected_target),
        accept,
    )


def _sample_light_stratified(scene: SceneData, u, u0, u1, prob_env_strat):
    """Candidate light sample with stratified env allocation (reference:
    optix_restir_di_kernels.cu:64-88): the selection uses prob_env_strat but
    the pdf uses the marginal 0.25/0.75 split."""
    surface_ok = scene.total_emissive_importance > 0.0
    if scene.env is None:
        ls = sample_surface_light(scene, u, u0, u1)
        return ls.replace(pdf=jnp.where(surface_ok, ls.pdf, 0.0))

    env_on = jnp.where(scene.env.enabled, 1.0, 0.0)
    p_strat = jnp.where(surface_ok, prob_env_strat, 1.0) * env_on
    p_marginal = jnp.where(surface_ok, PROB_SAMPLE_ENV, 1.0) * env_on
    pick_env = u < p_strat
    u_env = jnp.clip(u / jnp.maximum(p_strat, 1e-8), 0.0, 1.0 - 1e-7)
    u_surf = jnp.clip((u - p_strat) / jnp.maximum(1.0 - p_strat, 1e-8),
                      0.0, 1.0 - 1e-7)
    del u_env  # env branch uses (u0, u1) only, like the reference
    surf = sample_surface_light(scene, u_surf, u0, u1)
    envs = sample_env_light(scene, u0, u1)

    def sel(e, s):
        m = pick_env
        while m.ndim < e.ndim:
            m = m[..., None]
        return jnp.where(m, e, s)

    pdf = jnp.where(
        pick_env,
        envs.pdf * p_marginal,
        jnp.where(surface_ok, surf.pdf * (1.0 - p_marginal), 0.0),
    )
    return envs.replace(
        position=sel(envs.position, surf.position),
        normal=sel(envs.normal, surf.normal),
        emittance=sel(envs.emittance, surf.emittance),
        pdf=pdf,
        at_infinity=pick_env,
    )


# ---------------------------------------------------------------------------
# passes
# ---------------------------------------------------------------------------


def initial_ris(scene, bvh, ctx: PixelCtx, pixel, frame_idx,
                cfg: ReSTIRConfig):
    """Streaming RIS over 2^k candidates; returns (reservoir, rec_pdf,
    target)."""
    n = ctx.pos.shape[0]
    n_cand = 1 << cfg.log2_num_candidates
    rs = SampleStream(pixel, frame_idx, stream=0x5151)
    res = empty_reservoir(n)
    selected_target = jnp.zeros((n,), jnp.float32)

    for i in range(n_cand):
        u_l = rs.next()
        # stratified env allocation across the candidate stream
        prob = float(np.clip(PROB_SAMPLE_ENV * n_cand - i, 0.0, 1.0))
        u0, u1 = rs.next2()
        ls = _sample_light_stratified(scene, u_l, u0, u1, prob)
        cont = _unshadowed_contribution(ctx, ls.position, ls.normal,
                                        ls.emittance, ls.at_infinity)
        target = _target_density(cont)
        weight = jnp.where(ls.pdf > 0.0, target / jnp.maximum(ls.pdf, 1e-30), 0.0)
        res, selected_target, _ = _reservoir_update(
            res, ls.position, ls.normal, ls.emittance, ls.at_infinity,
            weight, rs.next(), target, selected_target,
        )

    rec_pdf = res.sum_w / jnp.maximum(selected_target * res.stream_len, 1e-30)
    bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
    rec_pdf = jnp.where(bad, 0.0, rec_pdf)
    selected_target = jnp.where(bad, 0.0, selected_target)

    if cfg.reuse_visibility:
        vis = _visibility(scene, bvh, ctx, res.pos, res.at_inf,
                          ctx.valid & (selected_target > 0.0))
        rec_pdf = jnp.where(vis, rec_pdf, 0.0)
        selected_target = jnp.where(vis, selected_target, 0.0)

    return res.replace(rec_pdf=rec_pdf, target=selected_target)


def presample_lights(scene: SceneData, frame_idx, cfg: ReSTIRConfig):
    """Per-frame light pre-sampling pool (reference: performLightPreSampling,
    per_pixel_ris.cu:6 — kNumLightSubsets x kLightSubsetSize entries drawn
    from the light hierarchy each frame). Returns SoA dict with rec_pdf =
    1/p(light) so pool picks behave like hierarchy samples."""
    n = cfg.num_light_subsets * cfg.light_subset_size
    lane = jnp.arange(n, dtype=jnp.uint32)
    rs = SampleStream(lane, jnp.asarray(frame_idx, jnp.uint32), stream=0x9135)
    u = rs.next()
    u0, u1 = rs.next2()
    ls = _sample_light_stratified(scene, u, u0, u1, PROB_SAMPLE_ENV)
    rec_pdf = jnp.where(ls.pdf > 0.0, 1.0 / jnp.maximum(ls.pdf, 1e-30), 0.0)
    return {
        "pos": ls.position, "nrm": ls.normal, "emit": ls.emittance,
        "at_inf": ls.at_infinity, "rec_pdf": rec_pdf,
    }


def initial_ris_presampled(scene, bvh, ctx: PixelCtx, pool, gb: GBuffer,
                           pixel, frame_idx, cfg: ReSTIRConfig):
    """Initial RIS drawing candidates from one presampled subset per 8x8
    screen tile (reference: performPerPixelRIS, per_pixel_ris.cu:44)."""
    h, w = gb.depth.shape
    n = h * w
    n_cand = 1 << cfg.log2_num_candidates
    rs = SampleStream(pixel, jnp.asarray(frame_idx, jnp.uint32), stream=0x5152)
    px = pixel.astype(jnp.int32) % w
    py = pixel.astype(jnp.int32) // w
    tile = (py // 8) * ((w + 7) // 8) + (px // 8)
    # per-tile subset selection, rotated per frame (reference hashes tile +
    # frame into the subset index)
    from gfxexp_tpu.core.rng import pcg3d

    sub_bits, _, _ = pcg3d(tile.astype(jnp.uint32),
                           jnp.asarray(frame_idx, jnp.uint32), 77)
    subset = (sub_bits % jnp.uint32(cfg.num_light_subsets)).astype(jnp.int32)

    res = empty_reservoir(n)
    selected_target = jnp.zeros((n,), jnp.float32)
    for _ in range(n_cand):
        u = rs.next()
        slot = subset * cfg.light_subset_size + jnp.minimum(
            (u * cfg.light_subset_size).astype(jnp.int32),
            cfg.light_subset_size - 1)
        p_pos = pool["pos"][slot]
        p_nrm = pool["nrm"][slot]
        p_emit = pool["emit"][slot]
        p_inf = pool["at_inf"][slot]
        p_rec = pool["rec_pdf"][slot]
        cont = _unshadowed_contribution(ctx, p_pos, p_nrm, p_emit, p_inf)
        target = _target_density(cont)
        weight = target * p_rec
        res, selected_target, _ = _reservoir_update(
            res, p_pos, p_nrm, p_emit, p_inf, weight, rs.next(),
            target, selected_target)

    rec_pdf = res.sum_w / jnp.maximum(selected_target * res.stream_len, 1e-30)
    bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
    rec_pdf = jnp.where(bad, 0.0, rec_pdf)
    selected_target = jnp.where(bad, 0.0, selected_target)
    if cfg.reuse_visibility:
        vis = _visibility(scene, bvh, ctx, res.pos, res.at_inf,
                          ctx.valid & (selected_target > 0.0))
        rec_pdf = jnp.where(vis, rec_pdf, 0.0)
        selected_target = jnp.where(vis, selected_target, 0.0)
    return res.replace(rec_pdf=rec_pdf, target=selected_target)


def _neighbor_ok(gb_prev_pos, gb_prev_nrm, gb_prev_hit, nb_idx, in_bounds,
                 ctx: PixelCtx, camera_pos, test_geometry: bool):
    """testNeighbor (restir_di_shared.h:748)."""
    ok = in_bounds & gb_prev_hit[nb_idx] & ctx.valid
    if test_geometry:
        nb_pos = gb_prev_pos[nb_idx]
        nb_nrm = gb_prev_nrm[nb_idx]
        nb_dist = jnp.linalg.norm(camera_pos[None, :] - nb_pos, axis=-1)
        ok = ok & (
            jnp.abs(nb_dist - ctx.cam_dist) / jnp.maximum(ctx.cam_dist, 1e-6)
            <= 0.1
        ) & (jnp.sum(ctx.n * nb_nrm, axis=-1) >= 0.9)
    return ok


def _reproject(gb: GBuffer, pixel, w, h):
    """Reprojected previous-frame pixel index via the motion vector."""
    n = w * h
    px = pixel.astype(jnp.int32) % w
    py = pixel.astype(jnp.int32) // w
    motion = gb.motion.reshape(n, 2)
    nbx = jnp.floor(px.astype(jnp.float32) + 0.5 - motion[:, 0]).astype(jnp.int32)
    nby = jnp.floor(py.astype(jnp.float32) + 0.5 - motion[:, 1]).astype(jnp.int32)
    in_bounds = (nbx >= 0) & (nbx < w) & (nby >= 0) & (nby < h)
    nb_idx = jnp.clip(nby, 0, h - 1) * w + jnp.clip(nbx, 0, w - 1)
    return nb_idx, in_bounds


def trace_shadow_rays(scene, bvh, ctx: PixelCtx, res: ReservoirSoA,
                      prev_res: ReservoirSoA, prev_vis: SampleVisibility,
                      prev_ctx: PixelCtx, gb: GBuffer,
                      prev_hit, prev_pos_img, prev_nrm_img,
                      camera: Camera, pixel, cfg: ReSTIRConfig):
    """Decoupled visibility pass (reference: traceShadowRays*,
    optix_restir_di_rearch_kernels.cu:15-255): traces shadow rays for the
    new per-pixel-RIS sample and the temporal neighbor's sample, producing
    SampleVisibility flags that shade_and_resample consumes ray-free. With
    reuse_visibility_for_temporal (biased only) the temporal sample's ray
    is skipped and the previous frame's selected-sample visibility at the
    neighbor stands in — the production visibility-reuse trick.

    Returns (SampleVisibility, rays_traced scalar)."""
    h, w = gb.depth.shape
    n = h * w
    rays = jnp.zeros((), jnp.float32)

    new_valid = ctx.valid & (res.sum_w > 0.0)
    vis_new = _visibility(scene, bvh, ctx, res.pos, res.at_inf, new_valid)
    rays = rays + jnp.sum(new_valid.astype(jnp.float32))

    nb_idx, in_bounds = _reproject(gb, pixel, w, h)
    passed = _neighbor_ok(
        prev_pos_img, prev_nrm_img, prev_hit, nb_idx, in_bounds, ctx,
        camera.position, test_geometry=not cfg.use_unbiased_estimator)

    t_pos = prev_res.pos[nb_idx]
    t_inf = prev_res.at_inf[nb_idx]
    t_valid = passed & (prev_res.sum_w[nb_idx] > 0.0)
    if cfg.reuse_visibility_for_temporal and not cfg.use_unbiased_estimator:
        vis_temporal = prev_vis.selected[nb_idx] & t_valid
    else:
        vis_temporal = _visibility(scene, bvh, ctx, t_pos, t_inf, t_valid)
        rays = rays + jnp.sum(t_valid.astype(jnp.float32))

    if cfg.use_unbiased_estimator:
        # cross term: the new sample seen from the temporal neighbor's
        # surface (reference: newSampleOnTemporal)
        nb_ctx = jax.tree_util.tree_map(lambda x: x[nb_idx], prev_ctx)
        cross_valid = new_valid & passed
        vis_new_on_t = _visibility(scene, bvh, nb_ctx, res.pos, res.at_inf,
                                   cross_valid)
        rays = rays + jnp.sum(cross_valid.astype(jnp.float32))
    else:
        vis_new_on_t = jnp.zeros((n,), bool)

    return SampleVisibility(
        new=vis_new, temporal_passed=passed, temporal=vis_temporal,
        new_on_temporal=vis_new_on_t,
        selected=jnp.zeros((n,), bool),
    ), rays


def shade_and_resample(scene, res: ReservoirSoA, prev_res: ReservoirSoA,
                       vis: SampleVisibility, ctx: PixelCtx,
                       prev_ctx: PixelCtx, gb: GBuffer, pixel, frame_idx,
                       cfg: ReSTIRConfig):
    """Ray-free temporal resample + shade from SampleVisibility flags
    (reference: shadeAndResample*,
    optix_restir_di_rearch_kernels.cu:403-681). Visibility enters the
    candidate target densities (visibility-killed samples lose), and the
    winner is shaded with its already-traced visibility. Returns
    (color [H,W,3], reservoir, SampleVisibility with `selected` filled)."""
    h, w = gb.depth.shape
    n = h * w
    rs = SampleStream(pixel, jnp.asarray(frame_idx, jnp.uint32),
                      stream=0x7e40)

    self_len = res.stream_len
    # visibility-kill the new sample (reference: shadeAndResample zeroes
    # the reservoir when the traced visibility failed)
    new_dead = ~vis.new
    res0 = res.replace(
        sum_w=jnp.where(new_dead, 0.0, res.sum_w),
        stream_len=jnp.where(new_dead, 0.0, res.stream_len),
        target=jnp.where(new_dead, 0.0, res.target),
    )
    selected_target = res0.target
    max_prev_len = 20.0 * self_len

    nb_idx, _ = _reproject(gb, pixel, w, h)
    accepted = vis.temporal_passed

    nb_pos = prev_res.pos[nb_idx]
    nb_nrm = prev_res.nrm[nb_idx]
    nb_emit = prev_res.emit[nb_idx]
    nb_inf = prev_res.at_inf[nb_idx]
    nb_len = jnp.minimum(prev_res.stream_len[nb_idx], max_prev_len)
    nb_rec_pdf = prev_res.rec_pdf[nb_idx]

    cont = _unshadowed_contribution(ctx, nb_pos, nb_nrm, nb_emit, nb_inf)
    # the temporal candidate's target at the current surface is gated by
    # its TRACED (or reused) visibility — the decoupling's whole point
    target = jnp.where(vis.temporal, _target_density(cont), 0.0)
    weight = jnp.where(accepted, target * nb_rec_pdf * nb_len, 0.0)
    merged, selected_target, neighbor_selected = _reservoir_update(
        res0, nb_pos, nb_nrm, nb_emit, nb_inf, weight, rs.next(),
        target, selected_target)
    merged = merged.replace(
        stream_len=self_len + jnp.where(accepted, nb_len, 0.0))

    if cfg.use_unbiased_estimator:
        cont_self = _unshadowed_contribution(
            ctx, merged.pos, merged.nrm, merged.emit, merged.at_inf)
        sel_vis_cur = jnp.where(neighbor_selected, vis.temporal, vis.new)
        td_self = jnp.where(sel_vis_cur, _target_density(cont_self), 0.0)
        if cfg.use_mis_ris:
            num_w = jnp.where(neighbor_selected, 0.0, td_self)
            den_w = td_self * self_len
        else:
            num_w = jnp.ones((n,), jnp.float32)
            den_w = jnp.where(td_self > 0.0, self_len, 0.0)
        nb_ctx = jax.tree_util.tree_map(lambda x: x[nb_idx], prev_ctx)
        cont_nb = _unshadowed_contribution(
            nb_ctx, merged.pos, merged.nrm, merged.emit, merged.at_inf)
        # the survivor's visibility at the NEIGHBOR surface: the temporal
        # sample was visible there last frame iff it was selected there;
        # the new sample's cross visibility was traced
        sel_vis_nb = jnp.where(neighbor_selected, vis.temporal,
                               vis.new_on_temporal)
        td_nb = jnp.where(accepted & sel_vis_nb,
                          _target_density(cont_nb), 0.0)
        if cfg.use_mis_ris:
            den_w = den_w + td_nb * jnp.where(accepted, nb_len, 0.0)
            num_w = jnp.where(neighbor_selected, td_nb, num_w)
        else:
            den_w = den_w + jnp.where(accepted & (td_nb > 0.0), nb_len, 0.0)
        weight_for_estimate = num_w / jnp.maximum(den_w, 1e-30)
    else:
        weight_for_estimate = 1.0 / jnp.maximum(merged.stream_len, 1e-30)

    rec_pdf = weight_for_estimate * merged.sum_w / jnp.maximum(
        selected_target, 1e-30)
    bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
    merged = merged.replace(
        rec_pdf=jnp.where(bad, 0.0, rec_pdf),
        target=jnp.where(bad, 0.0, selected_target),
    )

    # selected-sample visibility: already known from the flags — shading
    # traces NOTHING here
    sel_vis = jnp.where(neighbor_selected, vis.temporal, vis.new)
    emit = gb.emittance.reshape(n, 3)
    direct_emit = jnp.where(
        (ctx.valid & (ctx.v_out_local[:, 2] > 0))[:, None], emit / _PI, 0.0)
    cont_sel = _unshadowed_contribution(
        ctx, merged.pos, merged.nrm, merged.emit, merged.at_inf)
    use = ctx.valid & (merged.rec_pdf > 0.0) & sel_vis
    color = direct_emit + jnp.where(
        use[:, None], cont_sel * merged.rec_pdf[:, None], 0.0)
    return (color.reshape(h, w, 3), merged,
            vis.replace(selected=sel_vis))


def temporal_reuse(scene, res: ReservoirSoA, prev_res: ReservoirSoA,
                   ctx: PixelCtx, prev_ctx: PixelCtx, gb: GBuffer,
                   prev_hit, prev_pos_img, prev_nrm_img,
                   camera: Camera, pixel, frame_idx, cfg: ReSTIRConfig):
    """Temporal reservoir merge with 20x stream-length clamp (reference:
    optix_restir_di_kernels.cu:138-288)."""
    h, w = gb.depth.shape
    n = h * w
    rs = SampleStream(pixel, frame_idx, stream=0x7e39)

    self_len = res.stream_len
    # a killed sample must not propagate (reference :145-147)
    dead = res.rec_pdf == 0.0
    res = res.replace(
        sum_w=jnp.where(dead, 0.0, res.sum_w),
        stream_len=jnp.where(dead, 0.0, res.stream_len),
        target=jnp.where(dead, 0.0, res.target),
    )
    selected_target = res.target
    max_prev_len = 20.0 * self_len

    # reprojected integer pixel coordinate
    px = pixel.astype(jnp.int32) % w
    py = pixel.astype(jnp.int32) // w
    motion = gb.motion.reshape(n, 2)
    nbx = jnp.floor(px.astype(jnp.float32) + 0.5 - motion[:, 0]).astype(jnp.int32)
    nby = jnp.floor(py.astype(jnp.float32) + 0.5 - motion[:, 1]).astype(jnp.int32)
    in_bounds = (nbx >= 0) & (nbx < w) & (nby >= 0) & (nby < h)
    nb_idx = jnp.clip(nby, 0, h - 1) * w + jnp.clip(nbx, 0, w - 1)

    accepted = _neighbor_ok(
        prev_pos_img, prev_nrm_img, prev_hit, nb_idx, in_bounds, ctx,
        camera.position, test_geometry=not cfg.use_unbiased_estimator,
    )

    nb_pos = prev_res.pos[nb_idx]
    nb_nrm = prev_res.nrm[nb_idx]
    nb_emit = prev_res.emit[nb_idx]
    nb_inf = prev_res.at_inf[nb_idx]
    nb_len = jnp.minimum(prev_res.stream_len[nb_idx], max_prev_len)
    nb_rec_pdf = prev_res.rec_pdf[nb_idx]

    cont = _unshadowed_contribution(ctx, nb_pos, nb_nrm, nb_emit, nb_inf)
    target = _target_density(cont)
    weight = jnp.where(accepted, target * nb_rec_pdf * nb_len, 0.0)
    res, selected_target, neighbor_selected = _reservoir_update(
        res, nb_pos, nb_nrm, nb_emit, nb_inf, weight, rs.next(),
        target, selected_target,
    )
    res = res.replace(
        stream_len=self_len + jnp.where(accepted, nb_len, 0.0)
    )

    if cfg.use_unbiased_estimator:
        # evaluate the survivor's target at self and at the neighbor's
        # previous-frame surface (reference :192-266)
        cont_self = _unshadowed_contribution(
            ctx, res.pos, res.nrm, res.emit, res.at_inf)
        td_self = _target_density(cont_self)
        if cfg.use_mis_ris:
            num_w = jnp.where(neighbor_selected, 0.0, td_self)
            den_w = td_self * self_len
        else:
            num_w = jnp.ones((n,), jnp.float32)
            den_w = jnp.where(td_self > 0.0, self_len, 0.0)
        # neighbor's surface from the previous context
        nb_ctx = jax.tree_util.tree_map(lambda x: x[nb_idx], prev_ctx)
        cont_nb = _unshadowed_contribution(
            nb_ctx, res.pos, res.nrm, res.emit, res.at_inf)
        td_nb = jnp.where(accepted, _target_density(cont_nb), 0.0)
        if cfg.use_mis_ris:
            den_w = den_w + td_nb * jnp.where(accepted, nb_len, 0.0)
            num_w = jnp.where(neighbor_selected, td_nb, num_w)
        else:
            den_w = den_w + jnp.where(accepted & (td_nb > 0.0), nb_len, 0.0)
        weight_for_estimate = num_w / jnp.maximum(den_w, 1e-30)
    else:
        weight_for_estimate = 1.0 / jnp.maximum(res.stream_len, 1e-30)

    rec_pdf = weight_for_estimate * res.sum_w / jnp.maximum(selected_target, 1e-30)
    bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
    return res.replace(
        rec_pdf=jnp.where(bad, 0.0, rec_pdf),
        target=jnp.where(bad, 0.0, selected_target),
    )


def _r2_disk_deltas(count: int = 1024) -> np.ndarray:
    """Low-discrepancy unit-disk offsets (reference precomputes 1024
    spatialNeighborDeltas, restir_di_main.cpp:2352)."""
    g = 1.32471795724474602596
    a1, a2 = 1.0 / g, 1.0 / (g * g)
    i = np.arange(count)
    u = (0.5 + a1 * i) % 1.0
    v = (0.5 + a2 * i) % 1.0
    r = np.sqrt(u)
    th = 2 * np.pi * v
    return np.stack([r * np.cos(th), r * np.sin(th)], axis=-1).astype(np.float32)


_SPATIAL_DELTAS = _r2_disk_deltas()


def spatial_reuse(scene, bvh, res: ReservoirSoA, ctx: PixelCtx, gb: GBuffer,
                  camera: Camera, pixel, frame_idx, pass_idx: int,
                  cfg: ReSTIRConfig):
    """One spatial reuse pass (reference: performSpatialRIS,
    optix_restir_di_kernels.cu:300-555)."""
    h, w = gb.depth.shape
    n = h * w
    rs = SampleStream(pixel, frame_idx, stream=0x5a00 + pass_idx)
    px = pixel.astype(jnp.int32) % w
    py = pixel.astype(jnp.int32) // w
    hit_img = gb.hit.reshape(n)
    pos_img = gb.position.reshape(n, 3)
    nrm_img = gb.normal.reshape(n, 3)
    deltas = jnp.asarray(_SPATIAL_DELTAS)

    combined = empty_reservoir(n)
    keep_self = res.rec_pdf > 0.0
    combined = combined.replace(
        pos=res.pos, nrm=res.nrm, emit=res.emit, at_inf=res.at_inf,
        sum_w=jnp.where(keep_self, res.sum_w, 0.0),
        stream_len=jnp.where(keep_self, res.stream_len, 0.0),
    )
    selected_target = jnp.where(keep_self, res.target, 0.0)
    self_len = res.stream_len
    combined_len = self_len
    selected_nb = jnp.full((n,), -1, jnp.int32)

    nb_indices = []
    nb_accepts = []
    for k in range(cfg.num_spatial_neighbors):
        if cfg.use_low_discrepancy_neighbors:
            # frame-varying base index into the LD table (reference:
            # spatialNeighborBaseIndex, restir_di_main.cpp:2352)
            tbl = (
                frame_idx.astype(jnp.int32)
                * (cfg.num_spatial_passes * cfg.num_spatial_neighbors)
                + pass_idx * cfg.num_spatial_neighbors + k
            ) % 1024
            delta = deltas[tbl]
            dx = jnp.broadcast_to(cfg.spatial_radius * delta[0], (n,))
            dy = jnp.broadcast_to(cfg.spatial_radius * delta[1], (n,))
        else:
            r = cfg.spatial_radius * jnp.sqrt(rs.next())
            ang = 2.0 * _PI * rs.next()
            dx = r * jnp.cos(ang)
            dy = r * jnp.sin(ang)
        nbx = jnp.floor(px.astype(jnp.float32) + 0.5 + dx).astype(jnp.int32)
        nby = jnp.floor(py.astype(jnp.float32) + 0.5 + dy).astype(jnp.int32)
        in_bounds = (nbx >= 0) & (nbx < w) & (nby >= 0) & (nby < h)
        not_self = (nbx != px) | (nby != py)
        nb_idx = jnp.clip(nby, 0, h - 1) * w + jnp.clip(nbx, 0, w - 1)
        accepted = _neighbor_ok(
            pos_img, nrm_img, hit_img, nb_idx, in_bounds & not_self, ctx,
            camera.position,
            test_geometry=not cfg.use_unbiased_estimator,
        )
        nb_indices.append(nb_idx)
        nb_accepts.append(accepted)

        nb_len = res.stream_len[nb_idx]
        cont = _unshadowed_contribution(
            ctx, res.pos[nb_idx], res.nrm[nb_idx], res.emit[nb_idx],
            res.at_inf[nb_idx])
        target = _target_density(cont)
        weight = jnp.where(
            accepted, target * res.rec_pdf[nb_idx] * nb_len, 0.0)
        combined, selected_target, took = _reservoir_update(
            combined, res.pos[nb_idx], res.nrm[nb_idx], res.emit[nb_idx],
            res.at_inf[nb_idx], weight, rs.next(), target, selected_target,
        )
        selected_nb = jnp.where(took, k, selected_nb)
        combined_len = combined_len + jnp.where(accepted, nb_len, 0.0)

    combined = combined.replace(stream_len=combined_len)

    if cfg.use_unbiased_estimator:
        cont_self = _unshadowed_contribution(
            ctx, combined.pos, combined.nrm, combined.emit, combined.at_inf)
        td_self = _target_density(cont_self)
        if cfg.reuse_visibility:
            vis_self = _visibility(scene, bvh, ctx, combined.pos,
                                   combined.at_inf, ctx.valid)
            td_self = jnp.where(vis_self, td_self, 0.0)
        if cfg.use_mis_ris:
            num_w = jnp.where(selected_nb >= 0, 0.0, td_self)
            den_w = td_self * self_len
        else:
            num_w = jnp.ones((n,), jnp.float32)
            den_w = jnp.where(td_self > 0.0, self_len, 0.0)
        for k in range(cfg.num_spatial_neighbors):
            nb_idx = nb_indices[k]
            accepted = nb_accepts[k]
            nb_ctx = jax.tree_util.tree_map(lambda x: x[nb_idx], ctx)
            cont_nb = _unshadowed_contribution(
                nb_ctx, combined.pos, combined.nrm, combined.emit,
                combined.at_inf)
            td_nb = jnp.where(accepted, _target_density(cont_nb), 0.0)
            if cfg.reuse_visibility:
                vis_nb = _visibility(scene, bvh, nb_ctx, combined.pos,
                                     combined.at_inf, accepted & (td_nb > 0))
                td_nb = jnp.where(vis_nb, td_nb, 0.0)
            nb_len = res.stream_len[nb_idx]
            if cfg.use_mis_ris:
                den_w = den_w + td_nb * jnp.where(accepted, nb_len, 0.0)
                num_w = jnp.where(selected_nb == k, td_nb, num_w)
            else:
                den_w = den_w + jnp.where(accepted & (td_nb > 0.0), nb_len, 0.0)
        weight_for_estimate = num_w / jnp.maximum(den_w, 1e-30)
        if cfg.reuse_visibility:
            weight_for_estimate = jnp.where(td_self > 0.0,
                                            weight_for_estimate, 0.0)
    else:
        weight_for_estimate = 1.0 / jnp.maximum(combined.stream_len, 1e-30)

    rec_pdf = weight_for_estimate * combined.sum_w / jnp.maximum(
        selected_target, 1e-30)
    bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
    return combined.replace(
        rec_pdf=jnp.where(bad, 0.0, rec_pdf),
        target=jnp.where(bad, 0.0, selected_target),
    )


def shade(scene, bvh, res: ReservoirSoA, ctx: PixelCtx, gb: GBuffer):
    """Final shading with visibility (reference: shading RG,
    optix_restir_di_kernels.cu:559-637): emitter seen directly + selected
    light sample weighted by recPDFEstimate."""
    h, w = gb.depth.shape
    n = h * w
    emit = gb.emittance.reshape(n, 3)
    direct_emit = jnp.where(
        (ctx.valid & (ctx.v_out_local[:, 2] > 0))[:, None], emit / _PI, 0.0)

    cont = _unshadowed_contribution(ctx, res.pos, res.nrm, res.emit, res.at_inf)
    use = ctx.valid & (res.rec_pdf > 0.0)
    vis = _visibility(scene, bvh, ctx, res.pos, res.at_inf, use)
    color = direct_emit + jnp.where(
        vis[:, None], cont * res.rec_pdf[:, None], 0.0)
    return color.reshape(h, w, 3)


@functools.partial(jax.jit, static_argnames=("cfg",))
def restir_di_frame(
    scene: SceneData,
    bvh,
    gb: GBuffer,
    camera: Camera,
    prev_reservoir: ReservoirSoA,
    prev_ctx: PixelCtx,
    prev_hit,
    prev_pos,
    prev_nrm,
    frame_idx,
    cfg: ReSTIRConfig = ReSTIRConfig(),
    prev_vis: SampleVisibility = None,
):
    """Full ReSTIR DI frame. Classic: initial RIS -> temporal -> N spatial
    passes -> shade. Rearchitected: presampled per-pixel RIS -> decoupled
    trace_shadow_rays -> ray-free shade_and_resample (+ optional fused
    spatial passes before final shading parity). Returns (color [H,W,3],
    reservoir, ctx, SampleVisibility) — carry all four to the next frame
    (vis only matters for the rearch visibility-reuse path)."""
    h, w = gb.depth.shape
    n = h * w
    pixel = jnp.arange(n, dtype=jnp.uint32)
    frame_idx = jnp.asarray(frame_idx, jnp.uint32)
    ctx = pixel_ctx(scene, gb, camera)
    if prev_vis is None:
        prev_vis = empty_sample_visibility(n)

    if cfg.use_rearchitected_pipeline:
        pool = presample_lights(scene, frame_idx, cfg)
        res = initial_ris_presampled(scene, bvh, ctx, pool, gb, pixel,
                                     frame_idx, cfg)
        if cfg.enable_temporal_reuse:
            vis, _ = trace_shadow_rays(
                scene, bvh, ctx, res, prev_reservoir, prev_vis, prev_ctx,
                gb, prev_hit, prev_pos, prev_nrm, camera, pixel, cfg)
            color, res, vis = shade_and_resample(
                scene, res, prev_reservoir, vis, ctx, prev_ctx, gb, pixel,
                frame_idx, cfg)
            if cfg.enable_spatial_reuse:
                for p in range(cfg.num_spatial_passes):
                    res = spatial_reuse(scene, bvh, res, ctx, gb, camera,
                                        pixel, frame_idx, p, cfg)
                color = shade(scene, bvh, res, ctx, gb)
            return color, res, ctx, vis
        res_out = res
    else:
        res = initial_ris(scene, bvh, ctx, pixel, frame_idx, cfg)
        if cfg.enable_temporal_reuse:
            res = temporal_reuse(
                scene, res, prev_reservoir, ctx, prev_ctx, gb,
                prev_hit, prev_pos, prev_nrm, camera, pixel, frame_idx, cfg,
            )
        res_out = res
    if cfg.enable_spatial_reuse:
        for p in range(cfg.num_spatial_passes):
            res_out = spatial_reuse(scene, bvh, res_out, ctx, gb, camera,
                                    pixel, frame_idx, p, cfg)
    color = shade(scene, bvh, res_out, ctx, gb)
    return color, res_out, ctx, empty_sample_visibility(n)
