"""ReGIR: world-space grid reservoirs with two-stage streaming RIS.

Faithful re-derivation of the reference's ReGIR renderer (reference:
regir/regir_shared.h — kNumLightSlotsPerCell = 512 :7, grid
origin/cellSize/dimension :209-216; gpu_kernels/build_cell_reservoirs.cu —
sampleIntensity:6 (target = luminous intensity at the cell center with the
half-space cosine bound), buildCellReservoirs[AndTemporalReuse]:76-227
(per-slot streaming RIS over 2^k candidates, accumulated temporal reservoir
with 20x clamp), cell LRU via lastAccessFrameIndices (skip cells idle > 8
frames) + updateLastAccessFrameIndices:235; second-stage resampling at shade
time gpu_kernels/optix_pathtracing_kernels.cu — sampleFromCell:20-80
(jittered cell lookup, 2^k uniform slot picks, target = unshadowed
contribution) wired into NEE :86-110).

TPU re-architecture: the cell build is one batched kernel over
[num_cells * slots] lanes; the LRU is a mask (inactive cells keep their
previous reservoirs); shade-time resampling is a gather + masked merge and
plugs into the wavefront path tracer's NEE hook (render/pathtrace.py
nee_fn)."""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gfxexp_tpu.accel.traverse import intersect_any
from gfxexp_tpu.core.math import to_local
from gfxexp_tpu.core.rng import SampleStream
from gfxexp_tpu.render.bsdf import bsdf_evaluate
from gfxexp_tpu.scene.types import SceneData
from gfxexp_tpu.techniques.restir_di import (
    _sample_light_stratified,
)
from gfxexp_tpu.scene.lights import PROB_SAMPLE_ENV

_PI = jnp.pi


@dataclasses.dataclass(frozen=True)
class ReGIRConfig:
    grid_dimension: tuple = (16, 16, 16)  # reference: regir_main.cpp grid setup
    num_light_slots_per_cell: int = 512  # reference: kNumLightSlotsPerCell
    log2_num_candidates_per_slot: int = 3
    log2_num_candidates_per_cell: int = 3
    enable_temporal_reuse: bool = True
    enable_cell_randomization: bool = True
    lru_idle_frames: int = 8

    @property
    def num_cells(self):
        gx, gy, gz = self.grid_dimension
        return gx * gy * gz


@struct.dataclass
class GridInfo:
    origin: jnp.ndarray  # [3]
    cell_size: jnp.ndarray  # [3]


@struct.dataclass
class ReGIRState:
    """Cell reservoirs, flat [num_cells * slots] SoA + LRU bookkeeping."""

    pos: jnp.ndarray
    nrm: jnp.ndarray
    emit: jnp.ndarray
    at_inf: jnp.ndarray
    sum_w: jnp.ndarray
    stream_len: jnp.ndarray
    rec_pdf: jnp.ndarray
    target: jnp.ndarray
    last_access: jnp.ndarray  # [num_cells] int32 frame index
    num_accesses: jnp.ndarray  # [num_cells] int32 (per-frame touch counter)


def make_grid(scene: SceneData, cfg: ReGIRConfig, margin: float = 0.01) -> GridInfo:
    """Grid over the scene AABB (host-side; reference computes this from the
    initial scene AABB, regir_main.cpp)."""
    p0 = np.asarray(scene.triangles.p0)
    p1 = p0 + np.asarray(scene.triangles.e1)
    p2 = p0 + np.asarray(scene.triangles.e2)
    lo = np.minimum(np.minimum(p0.min(0), p1.min(0)), p2.min(0))
    hi = np.maximum(np.maximum(p0.max(0), p1.max(0)), p2.max(0))
    extent = hi - lo
    lo = lo - margin * extent
    hi = hi + margin * extent
    dims = np.asarray(cfg.grid_dimension, np.float32)
    return GridInfo(
        origin=jnp.asarray(lo, jnp.float32),
        cell_size=jnp.asarray((hi - lo) / dims, jnp.float32),
    )


def make_regir_state(cfg: ReGIRConfig) -> ReGIRState:
    n = cfg.num_cells * cfg.num_light_slots_per_cell
    z3 = jnp.zeros((n, 3), jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    return ReGIRState(
        pos=z3, nrm=z3, emit=z3, at_inf=jnp.zeros((n,), bool),
        sum_w=z, stream_len=z, rec_pdf=z, target=z,
        last_access=jnp.zeros((cfg.num_cells,), jnp.int32),
        num_accesses=jnp.zeros((cfg.num_cells,), jnp.int32),
    )


def _cell_centers(grid: GridInfo, cfg: ReGIRConfig):
    gx, gy, gz = cfg.grid_dimension
    idx = jnp.arange(cfg.num_cells)
    ix = idx % gx
    iy = (idx // gx) % gy
    iz = idx // (gx * gy)
    ijk = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    return grid.origin[None, :] + (ijk + 0.5) * grid.cell_size[None, :]


def _intensity_target(cell_center, half_cell, min_sq_dist, ls_pos, ls_nrm,
                      ls_emit, ls_inf):
    """sampleIntensity (build_cell_reservoirs.cu:6-69): luminous intensity at
    the cell center with the half-space cosine bound."""
    outside = ls_inf | jnp.any(
        (ls_pos < cell_center - half_cell) | (ls_pos > cell_center + half_cell),
        axis=-1,
    )
    shadow_dir = jnp.where(ls_inf[:, None], ls_pos, ls_pos - cell_center)
    perp = jnp.sum(-shadow_dir * ls_nrm, axis=-1)
    dist2_out = jnp.sum(shadow_dir**2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2_out, 1e-20))
    # half-space classification (reference :52-58): note the reference
    # compares lpCos (initialized 1) against minSquaredDistance — reproduced
    # verbatim for parity
    valid_half = (1.0 > min_sq_dist) | ls_inf
    invalid_half = jnp.asarray(1.0) < -min_sq_dist
    lp_cos_out = jnp.where(valid_half, perp / dist,
                           jnp.where(invalid_half, 0.0, 1.0))
    lp_cos = jnp.where(outside, lp_cos_out, 1.0)
    dist2 = jnp.where(outside, dist2_out, min_sq_dist)
    le = ls_emit / _PI
    cont = le * (lp_cos / jnp.maximum(dist2, 1e-20))[:, None]
    cont = jnp.where((lp_cos > 0.0)[:, None], cont, 0.0)
    return jnp.mean(cont, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_cell_reservoirs(
    scene: SceneData,
    state: ReGIRState,
    grid: GridInfo,
    frame_idx,
    cfg: ReGIRConfig = ReGIRConfig(),
) -> ReGIRState:
    """Per-slot streaming RIS + accumulated temporal reuse + LRU gating."""
    n_slots = cfg.num_cells * cfg.num_light_slots_per_cell
    slot = jnp.arange(n_slots, dtype=jnp.uint32)
    cell = (slot // cfg.num_light_slots_per_cell).astype(jnp.int32)
    frame_idx = jnp.asarray(frame_idx, jnp.uint32)
    rs = SampleStream(slot, frame_idx, stream=0x9e61)

    centers = _cell_centers(grid, cfg)[cell]  # [S, 3]
    half_cell = 0.5 * grid.cell_size
    min_sq_dist = jnp.sum(half_cell**2)

    n_cand = 1 << cfg.log2_num_candidates_per_slot
    z3 = jnp.zeros((n_slots, 3), jnp.float32)
    z = jnp.zeros((n_slots,), jnp.float32)
    pos, nrm, emit = z3, z3, z3
    at_inf = jnp.zeros((n_slots,), bool)
    sum_w = z
    stream_len = z
    selected_target = z

    for i in range(n_cand):
        u_l = rs.next()
        prob = float(np.clip(PROB_SAMPLE_ENV * n_cand - i, 0.0, 1.0))
        u0, u1 = rs.next2()
        ls = _sample_light_stratified(scene, u_l, u0, u1, prob)
        target = _intensity_target(
            centers, half_cell[None, :], min_sq_dist,
            ls.position, ls.normal, ls.emittance, ls.at_infinity,
        )
        weight = jnp.where(ls.pdf > 0.0, target / jnp.maximum(ls.pdf, 1e-30), 0.0)
        sum_w = sum_w + weight
        accept = (rs.next() * sum_w < weight) & (weight > 0.0)
        a3 = accept[:, None]
        pos = jnp.where(a3, ls.position, pos)
        nrm = jnp.where(a3, ls.normal, nrm)
        emit = jnp.where(a3, ls.emittance, emit)
        at_inf = jnp.where(accept, ls.at_infinity, at_inf)
        selected_target = jnp.where(accept, target, selected_target)
        stream_len = stream_len + 1.0

    rec_pdf = sum_w / jnp.maximum(selected_target * stream_len, 1e-30)
    bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
    rec_pdf = jnp.where(bad, 0.0, rec_pdf)
    selected_target = jnp.where(bad, 0.0, selected_target)

    if cfg.enable_temporal_reuse:
        self_len = stream_len
        dead = rec_pdf == 0.0
        sum_w = jnp.where(dead, 0.0, sum_w)
        stream_len = jnp.where(dead, 0.0, stream_len)
        selected_target = jnp.where(dead, 0.0, selected_target)
        max_prev = 20.0 * self_len
        prev_len = jnp.minimum(state.stream_len, max_prev)
        corr = prev_len / jnp.maximum(state.stream_len, 1e-30)
        # same target pdf across frames for a static grid (reference :204)
        weight = corr * state.sum_w
        sum_w = sum_w + weight
        accept = (rs.next() * sum_w < weight) & (weight > 0.0)
        a3 = accept[:, None]
        pos = jnp.where(a3, state.pos, pos)
        nrm = jnp.where(a3, state.nrm, nrm)
        emit = jnp.where(a3, state.emit, emit)
        at_inf = jnp.where(accept, state.at_inf, at_inf)
        selected_target = jnp.where(accept, state.target, selected_target)
        stream_len = self_len + prev_len
        rec_pdf = (sum_w / jnp.maximum(stream_len, 1e-30)) / jnp.maximum(
            selected_target, 1e-30)
        bad = ~jnp.isfinite(rec_pdf) | (selected_target <= 0.0)
        rec_pdf = jnp.where(bad, 0.0, rec_pdf)
        selected_target = jnp.where(bad, 0.0, selected_target)

    # LRU: cells idle longer than lru_idle_frames keep their old reservoirs
    # untouched (reference skips the build for them)
    idle = (frame_idx.astype(jnp.int32) - state.last_access) > cfg.lru_idle_frames
    active = ~idle[cell]
    a3 = active[:, None]
    new_state = state.replace(
        pos=jnp.where(a3, pos, state.pos),
        nrm=jnp.where(a3, nrm, state.nrm),
        emit=jnp.where(a3, emit, state.emit),
        at_inf=jnp.where(active, at_inf, state.at_inf),
        sum_w=jnp.where(active, sum_w, state.sum_w),
        stream_len=jnp.where(active, stream_len, state.stream_len),
        rec_pdf=jnp.where(active, rec_pdf, state.rec_pdf),
        target=jnp.where(active, selected_target, state.target),
        num_accesses=jnp.zeros_like(state.num_accesses),
    )
    return new_state


def cell_index(grid: GridInfo, cfg: ReGIRConfig, p):
    """World position -> linear cell index, clamped to the grid."""
    gx, gy, gz = cfg.grid_dimension
    rel = (p - grid.origin[None, :]) / grid.cell_size[None, :]
    ijk = jnp.floor(rel).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
    return ijk[:, 0] + ijk[:, 1] * gx + ijk[:, 2] * gx * gy


def make_regir_nee(state: ReGIRState, grid: GridInfo, cfg: ReGIRConfig):
    """Returns an NEE hook for the wavefront path tracer
    (render/pathtrace.py render_lanes) — the counterpart of the reference's
    useReGIR branch of performNextEventEstimation
    (optix_pathtracing_kernels.cu:86-110). The hook's aux carry is the
    per-cell access-count array [num_cells] i32 (feeds the LRU): the bounce
    loop is a lax.scan, so touch information must flow through the carry —
    Python-side accumulation would leak tracers."""

    slots = cfg.num_light_slots_per_cell
    n_resample = 1 << cfg.log2_num_candidates_per_cell

    def nee_fn(scene, bvh, sp, v_out_local, frame, params, rs, pt_cfg, alive,
               aux):
        t, b, n = frame
        pos = sp.position
        n_lanes = pos.shape[0]
        if cfg.enable_cell_randomization:
            jit_off = (
                jnp.stack([rs.next(), rs.next(), rs.next()], axis=-1) - 0.5
            ) * grid.cell_size[None, :]
        else:
            jit_off = 0.0
        cell = cell_index(grid, cfg, pos + jit_off)
        res_start = cell * slots

        # second-stage RIS over uniformly picked slots
        sel_pos = jnp.zeros((n_lanes, 3), jnp.float32)
        sel_nrm = jnp.zeros((n_lanes, 3), jnp.float32)
        sel_emit = jnp.zeros((n_lanes, 3), jnp.float32)
        sel_inf = jnp.zeros((n_lanes,), bool)
        sel_cont = jnp.zeros((n_lanes, 3), jnp.float32)
        sum_w = jnp.zeros((n_lanes,), jnp.float32)
        comb_len = jnp.zeros((n_lanes,), jnp.float32)
        sel_target = jnp.zeros((n_lanes,), jnp.float32)

        for i in range(n_resample):
            u = rs.next()
            slot_idx = res_start + jnp.minimum(
                (u * slots).astype(jnp.int32), slots - 1)
            r_pos = state.pos[slot_idx]
            r_nrm = state.nrm[slot_idx]
            r_emit = state.emit[slot_idx]
            r_inf = state.at_inf[slot_idx]
            r_len = state.stream_len[slot_idx]
            r_rec = state.rec_pdf[slot_idx]
            comb_len = comb_len + r_len

            # unshadowed contribution at the shading point
            svec = jnp.where(r_inf[:, None], r_pos, r_pos - pos)
            d2 = jnp.maximum(jnp.sum(svec**2, axis=-1), 1e-12)
            sdir = svec / jnp.sqrt(d2)[:, None]
            v_in_local = to_local(t, b, n, sdir)
            lp_cos = jnp.sum(-sdir * r_nrm, axis=-1)
            g = jnp.where(r_inf, jnp.abs(v_in_local[..., 2]),
                          lp_cos * jnp.abs(v_in_local[..., 2]) / d2)
            f = bsdf_evaluate(params, v_out_local, v_in_local)
            cont = f * (r_emit / _PI) * g[:, None]
            cont = jnp.where((lp_cos > 0.0)[:, None], cont, 0.0)
            target = jnp.mean(cont, axis=-1)

            weight = jnp.where(r_rec > 0.0, target * r_rec * r_len, 0.0)
            sum_w = sum_w + weight
            accept = (rs.next() * sum_w < weight) & (weight > 0.0)
            a3 = accept[:, None]
            sel_pos = jnp.where(a3, r_pos, sel_pos)
            sel_nrm = jnp.where(a3, r_nrm, sel_nrm)
            sel_emit = jnp.where(a3, r_emit, sel_emit)
            sel_inf = jnp.where(accept, r_inf, sel_inf)
            sel_cont = jnp.where(a3, cont, sel_cont)
            sel_target = jnp.where(accept, target, sel_target)

        rec_pdf = (sum_w / jnp.maximum(comb_len, 1e-30)) / jnp.maximum(
            sel_target, 1e-30)
        rec_pdf = jnp.where(
            jnp.isfinite(rec_pdf) & (sel_target > 0.0), rec_pdf, 0.0)

        # shadow ray for the selected sample
        svec = jnp.where(sel_inf[:, None], sel_pos, sel_pos - pos)
        dist = jnp.linalg.norm(svec, axis=-1)
        sdir = svec / jnp.maximum(dist[:, None], 1e-12)
        tmax = jnp.where(sel_inf, 1e10, dist * 0.9999)
        tmax = jnp.where(rec_pdf > 0.0, tmax, -1.0)
        occluded = intersect_any(bvh, scene.triangles, pos, sdir,
                                 t_min=0.0, t_max=tmax)
        vis = ~occluded & (rec_pdf > 0.0)
        aux = aux.at[jnp.where(alive, cell, 0)].add(
            alive.astype(jnp.int32), mode="drop")
        return jnp.where(vis[:, None], sel_cont * rec_pdf[:, None], 0.0), aux

    return nee_fn


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "regir_cfg")
)
def render_sample_regir(
    scene: SceneData,
    bvh,
    camera,
    state: ReGIRState,
    grid: GridInfo,
    width: int,
    height: int,
    sample_idx,
    cfg=None,
    regir_cfg: ReGIRConfig = ReGIRConfig(),
):
    """One path-traced sample using ReGIR cell reservoirs for every NEE
    (reference: pathTraceReGIR entry point). Returns (radiance [H*W, 3] in
    pixel order, state with touch counters updated).

    Estimator note: the reference's ReGIR mode feeds an *uninitialized*
    hypothetical light pdf into the implicit-hit MIS weight
    (optix_pathtracing_kernels.cu:321-327 + :348-354 — computeSurfacePoint
    skips the pdf when useReGIR). Resampled-distribution MIS is intractable,
    so here secondary emitter hits are excluded (NEE-only beyond the primary
    vertex) — the standard unbiased choice for ReGIR-style samplers."""
    from gfxexp_tpu.render.camera import lane_from_pixel
    from gfxexp_tpu.render.pathtrace import PTConfig, render_lanes

    if cfg is None:
        cfg = PTConfig()
    cfg = dataclasses.replace(cfg, use_implicit_light_sampling=False)
    nee_fn = make_regir_nee(state, grid, regir_cfg)
    out, counts = render_lanes(
        scene, bvh, camera, width, height, 0, width * height,
        sample_idx, cfg, nee_fn=nee_fn,
        nee_aux=jnp.zeros_like(state.num_accesses))
    new_state = state.replace(num_accesses=state.num_accesses + counts)
    order = lane_from_pixel(jnp.arange(width * height, dtype=jnp.uint32),
                            width, height)
    if cfg.count_rays:
        contribution, nrays = out
        return contribution[order], new_state, nrays
    return out[order], new_state


def touch_cells(state: ReGIRState, cells, alive) -> ReGIRState:
    """updateLastAccessFrameIndices support: count accesses per cell."""
    counts = jnp.zeros_like(state.num_accesses)
    counts = counts.at[jnp.where(alive, cells, 0)].add(
        alive.astype(jnp.int32), mode="drop")
    return state.replace(num_accesses=state.num_accesses + counts)


def finalize_frame(state: ReGIRState, frame_idx) -> ReGIRState:
    """Record last-access frame for touched cells (reference:
    updateLastAccessFrameIndices, build_cell_reservoirs.cu:235)."""
    touched = state.num_accesses > 0
    return state.replace(
        last_access=jnp.where(
            touched, jnp.asarray(frame_idx, jnp.int32), state.last_access),
    )
