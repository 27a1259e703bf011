"""NRC-integrated wavefront path tracer: cache-terminated rendering paths +
self-training suffixes.

Faithful re-derivation of the reference's NRC renderer (reference:
neural_radiance_caching/gpu_kernels/optix_pathtracing_kernels.cu —
createRadianceQuery:18 (AABB-normalized position, polar normal/scattered dir,
roughness 1-exp(-r), reflectances), primary spread d^2/(4 pi |cos|) :179,
spread accumulation sqrt(d^2/(pdf |cos|)) :413, termination when
spread^2 > 0.01 * primarySpread :474 (pathTerminationFactor,
neural_radiance_caching_shared.h:8), training path per tile + 1/16 unbiased
tiles :110-130, per-vertex targets initialized with NEE and implicit-hit
radiance added to the previous vertex :230-245 + :426-437, RR skipped for
training paths of length <= 2 :448-451, reflectance factorization
(useReflectanceFactorization = true, shared.h:10); backward propagation
nrc_setup_kernels.cu propagateRadianceValues:94).

TPU re-architecture: the reference's atomic training-data append + host sync
(main.cpp:2299-2305) becomes fixed-capacity per-lane arrays with validity
masks — training lanes are a static stride of the pixel lanes (one per
"tile"), recorded vertices live in [n_train, max_len] SoA, and propagation is
a static backward loop. Everything stays in one jit."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.accel.traverse import intersect_closest
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
    bsdf_sample,
    material_params_textured,
)
from gfxexp_tpu.render.camera import (
    generate_rays_for_lanes,
    lane_from_pixel,
    pixel_from_lane,
)
from gfxexp_tpu.render.pathtrace import (
    PTConfig,
    _next_event,
    compute_surface_point,
)
from gfxexp_tpu.scene.lights import env_pdf, env_radiance, light_selection_probs, surface_light_pdf
from gfxexp_tpu.techniques.nrc.network import NRCConfig, apply as nrc_apply

_PI = jnp.pi
PATH_TERMINATION_FACTOR = 0.01  # reference: neural_radiance_caching_shared.h:8


@dataclasses.dataclass(frozen=True)
class NRCIntegratorConfig:
    max_path_length: int = 5
    train_stride: int = 16  # 1 training path per this many lanes (~tile)
    unbiased_fraction: int = 16  # every Nth training path is unbiased
    enable_jitter: bool = True
    use_reflectance_factorization: bool = True
    radiance_scale: float = 1.0


def scene_aabb(scene):
    """Host-side scene AABB for query normalization."""
    p0 = np.asarray(scene.triangles.p0)
    p1 = p0 + np.asarray(scene.triangles.e1)
    p2 = p0 + np.asarray(scene.triangles.e2)
    lo = np.minimum(np.minimum(p0.min(0), p1.min(0)), p2.min(0))
    hi = np.maximum(np.maximum(p0.max(0), p1.max(0)), p2.max(0))
    return jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)


def _to_polar(v):
    """Direction -> (phi, theta) in [0,1]^2 (reference: convertToPolar)."""
    theta = jnp.arccos(jnp.clip(v[..., 1], -1.0, 1.0)) / _PI
    phi = (jnp.arctan2(v[..., 2], v[..., 0]) / (2.0 * _PI)) % 1.0
    return phi, theta


def make_query(aabb_lo, aabb_hi, position, normal, v_out, params):
    """RadianceQuery [N, 14] (reference: createRadianceQuery)."""
    p = (position - aabb_lo) / jnp.maximum(aabb_hi - aabb_lo, 1e-6)
    n_phi, n_theta = _to_polar(normal)
    d_phi, d_theta = _to_polar(v_out)
    rough = 1.0 - jnp.exp(-params.roughness)
    return jnp.concatenate(
        [
            jnp.clip(p, 0.0, 1.0),
            d_phi[:, None], d_theta[:, None],
            n_phi[:, None], n_theta[:, None],
            rough[:, None],
            params.diffuse, params.f0,
        ],
        axis=-1,
    )


def _query_ref_factor(query):
    """diffuse + specular reflectance from a stored query [..., 14]."""
    return query[..., 8:11] + query[..., 11:14]


def propagate_targets(t_target, t_thru, t_valid, suffix_pred,
                      suffix_has_query):
    """Backward radiance propagation along training suffixes
    (reference nrc_setup_kernels.cu propagateRadianceValues:94): each
    vertex's target = its direct (NEE + implicit) radiance plus its local
    throughput times the NEXT vertex's propagated target; the chain is
    seeded by the cache prediction at the suffix terminal (zero when the
    suffix never terminated into the cache — unbiased tiles).

    t_target/t_thru: [n_train, L, 3]; t_valid: [n_train, L] (True where a
    vertex was recorded); suffix_pred: [n_train, 3]; suffix_has_query:
    [n_train]. Returns propagated targets [n_train, L, 3]."""
    L = t_target.shape[1]
    carry = jnp.where(suffix_has_query[:, None], suffix_pred, 0.0)
    targets = t_target
    for depth in range(L - 1, -1, -1):
        valid_d = t_valid[:, depth]
        new_carry = targets[:, depth] + t_thru[:, depth] * carry
        carry = jnp.where(valid_d[:, None], new_carry, carry)
        targets = targets.at[:, depth].set(
            jnp.where(valid_d[:, None], new_carry, targets[:, depth]))
    return targets


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "nrc_cfg"))
def render_sample_nrc(
    scene,
    bvh,
    camera,
    nrc_params,  # EMA params pytree used for in-loop cache reads
    aabb_lo,
    aabb_hi,
    width: int,
    height: int,
    sample_idx,
    cfg: NRCIntegratorConfig = NRCIntegratorConfig(),
    nrc_cfg: NRCConfig = NRCConfig(),
):
    """One NRC sample. Returns (radiance [H*W,3] pixel order,
    train_query [T,14], train_target [T,3], train_mask [T]) where
    T = n_train_lanes * max_path_length."""
    n = width * height
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, width, height)
    sample_idx = jnp.asarray(sample_idx, jnp.uint32)

    stride = cfg.train_stride
    n_train = n // stride
    # rotate which lane in each tile trains, and which tiles are unbiased
    off_a = sample_idx % jnp.uint32(stride)
    off_b = (sample_idx // jnp.uint32(stride)) % jnp.uint32(cfg.unbiased_fraction)
    is_training = (lane % stride) == off_a
    train_slot = (lane // stride).astype(jnp.int32)  # [n], valid where training
    is_unbiased = is_training & (
        (train_slot.astype(jnp.uint32) % cfg.unbiased_fraction) == off_b)

    pt_cfg = PTConfig(max_path_length=cfg.max_path_length,
                      enable_jitter=cfg.enable_jitter)

    rs_cam = SampleStream(pixel, sample_idx, stream=0xFFFF)
    if cfg.enable_jitter:
        jx, jy = rs_cam.next2()
    else:
        jx = jnp.full((n,), 0.5, jnp.float32)
        jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, width, height, pixel, jx, jy)

    contribution = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,), jnp.float32)
    sqrt_spread = jnp.zeros((n,), jnp.float32)
    primary_spread = jnp.ones((n,), jnp.float32)
    render_ended = jnp.zeros((n,), bool)  # renderingPathEndsWithCache
    suffix_ended = jnp.zeros((n,), bool)
    # rendering-path terminal record
    render_query = jnp.zeros((n, 14), jnp.float32)
    render_alpha = jnp.zeros((n, 3), jnp.float32)

    # training vertex records [n_train, L]
    L = cfg.max_path_length
    tq = jnp.zeros((n_train, L, 14), jnp.float32)
    t_target = jnp.zeros((n_train, L, 3), jnp.float32)
    t_thru = jnp.zeros((n_train, L, 3), jnp.float32)
    t_valid = jnp.zeros((n_train, L), bool)
    # suffix terminal per training lane
    suffix_query = jnp.zeros((n_train, 14), jnp.float32)
    suffix_has_query = jnp.zeros((n_train,), bool)
    prev_vertex = jnp.full((n,), -1, jnp.int32)  # per-lane previous depth idx

    use_env = scene.env is not None
    p_env_sel, p_surf_sel = light_selection_probs(scene)

    for bounce in range(1, cfg.max_path_length + 1):
        rs = SampleStream(pixel, sample_idx, stream=bounce)
        hit = intersect_closest(bvh, scene.triangles, ray_o, ray_d,
                                t_min=0.0, t_max=1e30)
        hit_ok = alive & hit.hit
        miss = alive & ~hit.hit

        if use_env:
            env_l = env_radiance(scene.env, ray_d)
            if bounce == 1:
                env_mis = jnp.ones((n,), jnp.float32)
            else:
                light_p = p_env_sel * env_pdf(scene.env, ray_d)
                env_mis = prev_pdf**2 / jnp.maximum(prev_pdf**2 + light_p**2, 1e-30)
            add = jnp.where(miss[..., None], throughput * env_l * env_mis[..., None], 0.0)
            contribution = contribution + jnp.where(
                render_ended[..., None], 0.0, add)
            # env radiance also terminates training targets via implicit hits
            # on the previous vertex (approx: skipped for env, as reference's
            # implicit accumulation is surface-only in CH; env ends the path)

        sp = compute_surface_point(scene, hit.tri, hit.u, hit.v)
        v_out = -ray_d
        front = jnp.sum(v_out * sp.geom_normal, axis=-1) >= 0.0
        gn_signed = jnp.where(front[..., None], sp.geom_normal, -sp.geom_normal)
        pos_off = offset_ray_origin(sp.position, gn_signed)
        t, b = make_frame(sp.shading_normal)
        nrm = sp.shading_normal
        v_out_local = to_local(t, b, nrm, v_out)
        params = material_params_textured(scene.materials, scene.textures, sp.material, sp.texcoord)

        if bounce == 1:
            d2 = jnp.maximum(hit.t**2, 1e-12)
            cos_vn = jnp.abs(jnp.sum(v_out * sp.geom_normal, axis=-1))
            primary_spread = d2 / (4.0 * _PI * jnp.maximum(cos_vn, 1e-6))
        else:
            d2 = jnp.maximum(hit.t**2, 1e-12)
            inc = jnp.sqrt(
                d2 / jnp.maximum(prev_pdf * jnp.abs(v_out_local[..., 2]), 1e-12))
            sqrt_spread = sqrt_spread + jnp.where(hit_ok, inc, 0.0)

        # ---- implicit emitter contribution (with MIS after bounce 1) ----
        emissive = jnp.any(sp.emittance > 0.0, axis=-1) & (v_out_local[..., 2] > 0.0)
        if bounce == 1:
            mis_w = jnp.ones((n,), jnp.float32)
        else:
            dist2m = jnp.maximum(hit.t**2, 1e-12)
            hyp = surface_light_pdf(scene, jnp.maximum(hit.tri, 0))
            light_p = p_surf_sel * hyp * dist2m / jnp.maximum(
                v_out_local[..., 2], 1e-6)
            mis_w = prev_pdf**2 / jnp.maximum(prev_pdf**2 + light_p**2, 1e-30)
        implicit = jnp.where(
            (hit_ok & emissive)[..., None],
            sp.emittance * (mis_w / _PI)[..., None], 0.0)
        contribution = contribution + jnp.where(
            render_ended[..., None], 0.0, throughput * implicit)
        # add implicit radiance to the PREVIOUS training vertex's target
        if bounce > 1:
            pv_mask = is_training & hit_ok & (prev_vertex >= 0) & emissive
            rows = jnp.where(pv_mask, train_slot, n_train)  # OOB -> dropped
            depth = jnp.maximum(prev_vertex, 0)
            add_val = t_thru[jnp.where(pv_mask, train_slot, 0), depth] * implicit
            t_target = t_target.at[rows, depth].add(add_val, mode="drop")

        alive = hit_ok

        # ---- cache termination check (not on primary) -------------------
        if bounce > 1:
            spread_enough = sqrt_spread**2 > PATH_TERMINATION_FACTOR * primary_spread
            # unbiased training lanes never terminate the suffix into cache
            ends = alive & spread_enough
            # 1) rendering-path terminal (first time)
            rend_term = ends & ~render_ended & ~(is_unbiased & is_training & render_ended)
            q = make_query(aabb_lo, aabb_hi, pos_off, nrm, v_out, params)
            render_query = jnp.where(rend_term[:, None], q, render_query)
            render_alpha = jnp.where(rend_term[:, None], throughput, render_alpha)
            # training lanes reset spread and continue; others stop
            sqrt_spread = jnp.where(rend_term & is_training, 0.0, sqrt_spread)
            new_render_ended = render_ended | rend_term
            # 2) suffix terminal for training lanes (second trigger)
            suf_term = (ends & render_ended & is_training & ~suffix_ended
                        & ~is_unbiased)
            rows = jnp.where(suf_term, train_slot, n_train)  # OOB -> dropped
            suffix_query = suffix_query.at[rows].set(q, mode="drop")
            suffix_has_query = suffix_has_query.at[rows].set(True, mode="drop")
            suffix_ended = suffix_ended | suf_term
            render_ended = new_render_ended
            # non-training lanes stop at render terminal; training lanes stop
            # at suffix terminal
            alive = alive & ~(rend_term & ~is_training) & ~suf_term

        # ---- Russian roulette (training paths skip RR for len <= 2) -----
        if bounce > 1:
            cont_prob = jnp.minimum(luminance(throughput), 1.0)
            u_rr = rs.next()
            do_rr = alive & ~(is_training & (bounce <= 2))
            rr_kill = do_rr & (u_rr >= cont_prob)
            alive = alive & ~rr_kill
            # 1/p compensation only for paths that SURVIVED RR (dead lanes
            # must not keep inflating state — reference applies this after
            # the terminatedByRR return)
            survived = do_rr & alive
            scale = jnp.where(survived, 1.0 / jnp.maximum(cont_prob, 1e-8), 1.0)
            throughput = throughput * scale[..., None]
            # the reference also scales the previous training vertex's local
            # throughput by 1/p (CH :545)
            pv_mask = is_training & (prev_vertex >= 0) & survived
            rows = jnp.where(pv_mask, train_slot, n_train)  # OOB -> dropped
            depth = jnp.maximum(prev_vertex, 0)
            t_thru = t_thru.at[rows, depth].multiply(
                scale[:, None], mode="drop")
        if bounce == cfg.max_path_length:
            break

        # ---- NEE --------------------------------------------------------
        nee = _next_event(scene, bvh, sp.replace(position=pos_off),
                          v_out_local, (t, b, nrm), params, rs, pt_cfg,
                          alive)  # training suffixes still need NEE targets
        contribution = contribution + jnp.where(
            (alive & ~render_ended)[..., None], throughput * nee, 0.0)

        # ---- record training vertex -------------------------------------
        rec = is_training & alive
        depth_idx = bounce - 1
        q = make_query(aabb_lo, aabb_hi, pos_off, nrm, v_out, params)
        rows = jnp.where(rec, train_slot, n_train)  # OOB -> dropped
        tq = tq.at[rows, depth_idx].set(q, mode="drop")
        t_target = t_target.at[rows, depth_idx].set(nee, mode="drop")
        t_valid = t_valid.at[rows, depth_idx].set(True, mode="drop")
        prev_vertex = jnp.where(rec, depth_idx, prev_vertex)

        # ---- sample next direction --------------------------------------
        u0, u1 = rs.next2()
        v_in_local, f_val, pdf = bsdf_sample(params, v_out_local, u0, u1)
        valid = (pdf > 0.0) & jnp.isfinite(pdf)
        local_thr = f_val * (jnp.abs(v_in_local[..., 2]) / jnp.maximum(pdf, 1e-30))[..., None]
        # a failed bsdf sample (pdf ~ 0) means no continuation: its recorded
        # local throughput must be 0, not the garbage ratio
        local_thr = jnp.where(valid[:, None], local_thr, 0.0)
        t_thru = t_thru.at[rows, depth_idx].set(local_thr, mode="drop")
        throughput = jnp.where((alive & valid)[..., None],
                               throughput * local_thr, throughput)
        alive = alive & valid
        ray_o = pos_off
        ray_d = normalize(to_world(t, b, nrm, v_in_local))
        prev_pdf = pdf

    # ---- inference: rendering-path terminals + suffix terminals ---------
    all_queries = jnp.concatenate([render_query, suffix_query], axis=0)
    pred = nrc_apply(nrc_params, all_queries, nrc_cfg)
    pred = jnp.maximum(pred, 0.0) / cfg.radiance_scale
    if cfg.use_reflectance_factorization:
        pred = pred * _query_ref_factor(all_queries)
    render_pred = pred[:n]
    suffix_pred = pred[n:]

    radiance = contribution + jnp.where(
        render_ended[:, None], render_alpha * render_pred, 0.0)

    # ---- propagate targets backward along training suffixes -------------
    targets = propagate_targets(t_target, t_thru, t_valid, suffix_pred,
                                suffix_has_query)

    if cfg.use_reflectance_factorization:
        rf = _query_ref_factor(tq)
        targets = jnp.where(rf > 0.0, targets / jnp.maximum(rf, 1e-6), 0.0)
    targets = targets * cfg.radiance_scale

    order = lane_from_pixel(jnp.arange(n, dtype=jnp.uint32), width, height)
    return (
        radiance[order],
        tq.reshape(n_train * L, 14),
        targets.reshape(n_train * L, 3),
        t_valid.reshape(n_train * L),
    )
