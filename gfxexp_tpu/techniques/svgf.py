"""SVGF: spatiotemporal variance-guided filtering + TAA.

Faithful re-derivation of the reference's SVGF app (reference:
svgf/gpu_kernels/svgf.cu — calcDepthWeight:6 (sigma_z=1), calcNormalWeight:14
(sigma_n=128), calcLuminanceWeight:21 (sigma_l=4), estimateVariance:132 with
7x7 bilateral spatial fallback for sample counts < 4, applyATrousFilter 5
stages with step widths 1,2,4,8,16 and 3x3 Gaussian-prefiltered variance;
temporal reprojection in svgf/gpu_kernels/optix_pathtracing_kernels.cu —
reprojectPreviousAccumulation:55 with 4-tap bilinear validity tests (instance
+ material match, normal dot > 0.85, position distance^2 < 0.1) and 1/5 EMA
after a 5-frame cumulative ramp; albedo demodulation + TAA :533).

Everything is [H, W] image-space stencils — the most TPU-natural technique in
the suite (SURVEY.md §7 phase 2): shifts are static pads/slices that XLA
fuses; gathers only for reprojection.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.core.math import luminance
from gfxexp_tpu.render.gbuffer import GBuffer

_EPS = 1e-6


ATROUS_BOX3 = "box3x3"
ATROUS_GAUSS3 = "gauss3x3"
ATROUS_GAUSS5 = "gauss5x5"

# kernel taps: (dy, dx, weight) lists (reference: ATrousKernel templates,
# svgf.cu:137-227)
_G3 = {0: 0.25, 1: 0.125, -1: 0.125}  # 1D [1/4, 1/2, 1/4] split per axis
_G5 = {0: 6 / 16, 1: 4 / 16, -1: 4 / 16, 2: 1 / 16, -2: 1 / 16}
_ATROUS_KERNELS = {
    ATROUS_BOX3: [(i, j, 1.0) for i in (-1, 0, 1) for j in (-1, 0, 1)],
    ATROUS_GAUSS3: [(i, j, (2 * _G3[i]) * (2 * _G3[j]))
                    for i in (-1, 0, 1) for j in (-1, 0, 1)],
    ATROUS_GAUSS5: [(i, j, _G5[i] * _G5[j])
                    for i in range(-2, 3) for j in range(-2, 3)],
}


@dataclasses.dataclass(frozen=True)
class SVGFConfig:
    num_filter_stages: int = 5
    feedback_1st_filtered: bool = False  # reference: feedback1stFilteredResult
    enable_temporal_accumulation: bool = True
    enable_svgf: bool = True
    enable_taa: bool = True
    taa_history_length: int = 8  # reference: svgf_shared.h taaHistoryLength
    sigma_z: float = 1.0
    sigma_n: float = 128.0
    sigma_l: float = 4.0
    # roughen specular after the first bounce (reference: mollifySpecular ->
    # BSDFFlags::Regularize). Forward into the lighting pass via
    # PTConfig(mollify_specular=...) — apps/svgf.py does this.
    mollify_specular: bool = False
    atrous_kernel: str = ATROUS_BOX3  # reference: ATrousKernelType


@struct.dataclass
class SVGFState:
    """Double-buffered temporal state (reference: temporal sets +
    momentPair_sampleInfo / prevNoisyLighting buffers, svgf_shared.h:134-192)."""

    prev_noisy: jnp.ndarray  # [H, W, 3] demodulated lighting history
    moments: jnp.ndarray  # [H, W, 2] (first, second) luminance moments
    sample_count: jnp.ndarray  # [H, W] float32
    # previous-frame G-buffer planes needed by the reprojection validity tests
    prev_position: jnp.ndarray  # [H, W, 3]
    prev_normal: jnp.ndarray  # [H, W, 3]
    prev_unit: jnp.ndarray  # [H, W] int32
    prev_material: jnp.ndarray  # [H, W] int32
    taa_history: jnp.ndarray  # [H, W, 3]
    first_frame: jnp.ndarray  # [] bool


def make_svgf_state(width: int, height: int) -> SVGFState:
    z3 = jnp.zeros((height, width, 3), jnp.float32)
    return SVGFState(
        prev_noisy=z3,
        moments=jnp.zeros((height, width, 2), jnp.float32),
        sample_count=jnp.zeros((height, width), jnp.float32),
        prev_position=z3,
        prev_normal=z3,
        prev_unit=jnp.full((height, width), -1, jnp.int32),
        prev_material=jnp.full((height, width), -1, jnp.int32),
        taa_history=z3,
        first_frame=jnp.asarray(True),
    )


def _shift(img, dy: int, dx: int, fill=0.0):
    """Static-offset 2D shift: out[y, x] = img[y+dy, x+dx], `fill` outside."""
    h, w = img.shape[:2]
    pad_width = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    pad_width += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad_width, constant_values=fill)
    y0 = max(dy, 0)
    x0 = max(dx, 0)
    return p[y0 : y0 + h, x0 : x0 + w]


def _safe_div(a, b):
    return a / jnp.where(jnp.abs(b) > 0, b, 1.0) * (jnp.abs(b) > 0)


def demodulate_albedo(lighting, albedo):
    """reference: demCont = safeDivide(contribution, dhReflectance) with
    tiny albedos clamped to 0 (optix_pathtracing_kernels.cu:325-333)."""
    alb = jnp.where(albedo < 0.001, 0.0, albedo)
    return _safe_div(lighting, alb)


# ---------------------------------------------------------------------------
# temporal reprojection + accumulation
# ---------------------------------------------------------------------------


def _reproject(state: SVGFState, gb: GBuffer, cfg: SVGFConfig):
    """4-tap bilinear history fetch with geometry validity tests.
    Returns (prev_noisy [H,W,3], prev_moments [H,W,2], prev_count [H,W],
    any_valid [H,W])."""
    h, w = gb.depth.shape
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    # previous viewport position (pixels): cur - motion
    prev_x = xx.astype(jnp.float32) + 0.5 - gb.motion[..., 0]
    prev_y = yy.astype(jnp.float32) + 0.5 - gb.motion[..., 1]
    in_screen = (prev_x >= 0) & (prev_y >= 0) & (prev_x < w) & (prev_y < h)

    base_x = jnp.clip(prev_x.astype(jnp.int32), 0, w - 1)
    base_y = jnp.clip(prev_y.astype(jnp.int32), 0, h - 1)
    fdx = prev_x - (base_x.astype(jnp.float32) + 0.5)
    fdy = prev_y - (base_y.astype(jnp.float32) + 0.5)
    sx = jnp.where(fdx < 0, -1, 1)
    sy = jnp.where(fdy < 0, -1, 1)
    s = jnp.abs(fdx)
    t = jnp.abs(fdy)

    taps = [
        (base_y, base_x, (1 - s) * (1 - t)),
        (base_y, jnp.clip(base_x + sx, 0, w - 1), s * (1 - t)),
        (jnp.clip(base_y + sy, 0, h - 1), base_x, (1 - s) * t),
        (jnp.clip(base_y + sy, 0, h - 1), jnp.clip(base_x + sx, 0, w - 1), s * t),
    ]

    sum_w = jnp.zeros((h, w), jnp.float32)
    acc_noisy = jnp.zeros((h, w, 3), jnp.float32)
    acc_mom = jnp.zeros((h, w, 2), jnp.float32)
    acc_cnt = jnp.zeros((h, w), jnp.float32)
    for ty, tx, tw in taps:
        nb_unit = state.prev_unit[ty, tx]
        nb_mat = state.prev_material[ty, tx]
        nb_normal = state.prev_normal[ty, tx]
        nb_pos = state.prev_position[ty, tx]
        ok = (
            in_screen
            & (nb_unit == gb.unit)
            & (nb_mat == gb.material)
            & (jnp.sum(nb_normal * gb.normal, axis=-1) > 0.85)
            & (jnp.sum((nb_pos - gb.position) ** 2, axis=-1) <= 0.1)
        )
        wgt = jnp.where(ok, tw, 0.0)
        sum_w = sum_w + wgt
        acc_noisy = acc_noisy + wgt[..., None] * state.prev_noisy[ty, tx]
        acc_mom = acc_mom + wgt[..., None] * state.moments[ty, tx]
        acc_cnt = acc_cnt + wgt * state.sample_count[ty, tx]

    valid = sum_w > 0
    inv = jnp.where(valid, 1.0 / jnp.where(valid, sum_w, 1.0), 0.0)
    return (
        acc_noisy * inv[..., None],
        acc_mom * inv[..., None],
        jnp.round(acc_cnt * inv),
        valid,
    )


def temporal_accumulate(state: SVGFState, gb: GBuffer, dem_lighting, cfg: SVGFConfig):
    """Blend current demodulated lighting + moments with reprojected history
    (reference: optix_pathtracing_kernels.cu:339-378). Returns
    (noisy [H,W,3], moments [H,W,2], count [H,W])."""
    lum = luminance(dem_lighting)
    sq_lum = lum * lum

    if not cfg.enable_temporal_accumulation:
        mom = jnp.stack([lum, sq_lum], axis=-1)
        return dem_lighting, mom, jnp.ones_like(lum)

    prev_noisy, prev_mom, prev_cnt, valid = _reproject(state, gb, cfg)
    reset = state.first_frame | ~valid
    prev_cnt = jnp.where(reset, 0.0, prev_cnt)
    count = jnp.minimum(prev_cnt + 1.0, 65535.0)

    # EMA weight 1/5 after a 5-frame cumulative ramp (reference :360-366)
    cur_w = jnp.where(count < 5.0, 1.0 / count, 1.0 / 5.0)
    cur_w = jnp.where(count <= 1.0, 1.0, cur_w)
    prev_w = 1.0 - cur_w

    noisy = prev_w[..., None] * prev_noisy + cur_w[..., None] * dem_lighting
    mom_cur = jnp.stack([lum, sq_lum], axis=-1)
    mom = prev_w[..., None] * prev_mom + cur_w[..., None] * mom_cur
    return noisy, mom, count


# ---------------------------------------------------------------------------
# variance estimation (reference: estimateVariance, svgf.cu:30-133)
# ---------------------------------------------------------------------------

_SPATIAL_KERNEL = [0.00598, 0.060626, 0.241843, 0.383103, 0.241843, 0.060626, 0.00598]


def _depth_gradients(depth):
    """dz/dx, dz/dy via one-sided differences toward the image center
    (reference: svgf.cu:72-78)."""
    h, w = depth.shape
    xx = jnp.arange(w)[None, :]
    yy = jnp.arange(h)[:, None]
    dx = jnp.where(xx < w // 2, 1, -1)
    dy = jnp.where(yy < h // 2, 1, -1)
    d_xp = _shift(depth, 0, 1, fill=jnp.inf)
    d_xm = _shift(depth, 0, -1, fill=jnp.inf)
    d_yp = _shift(depth, 1, 0, fill=jnp.inf)
    d_ym = _shift(depth, -1, 0, fill=jnp.inf)
    hnb = jnp.where(dx > 0, d_xp, d_xm)
    vnb = jnp.where(dy > 0, d_yp, d_ym)
    dzdx = (hnb - depth) * dx
    dzdy = (vnb - depth) * dy
    finite = jnp.isfinite(dzdx) & jnp.isfinite(dzdy)
    return jnp.where(finite, dzdx, 0.0), jnp.where(finite, dzdy, 0.0)


def _w_depth(nb_depth, depth, dzdx, dzdy, dx: int, dy: int, sigma_z):
    pred = jnp.abs(dzdx * dx + dzdy * dy)
    return jnp.exp(-jnp.abs(nb_depth - depth) / (sigma_z * pred + _EPS))


def _w_normal(nb_normal, normal, sigma_n):
    d = jnp.maximum(jnp.sum(nb_normal * normal, axis=-1), 0.0)
    return d**sigma_n


def estimate_variance(moments, sample_count, depth, normal, hit, cfg: SVGFConfig):
    """Temporal variance when count >= 4; 7x7 depth/normal bilateral spatial
    moments otherwise."""
    first = moments[..., 0]
    second = moments[..., 1]

    dzdx, dzdy = _depth_gradients(jnp.where(hit, depth, jnp.inf))
    center_w = _SPATIAL_KERNEL[3] ** 2
    sum_first = center_w * first
    sum_second = center_w * second
    sum_w = jnp.full_like(first, center_w)
    for i in range(-3, 4):
        for j in range(-3, 4):
            if i == 0 and j == 0:
                continue
            hy = _SPATIAL_KERNEL[i + 3]
            hx = _SPATIAL_KERNEL[j + 3]
            nb_depth = _shift(depth, i, j, fill=jnp.inf)
            nb_hit = _shift(hit, i, j, fill=False)
            nb_normal = _shift(normal, i, j)
            wz = _w_depth(nb_depth, depth, dzdx, dzdy, j, i, cfg.sigma_z)
            wn = _w_normal(nb_normal, normal, cfg.sigma_n)
            wgt = jnp.where(nb_hit, hy * hx * wz * wn, 0.0)
            sum_first = sum_first + wgt * _shift(first, i, j)
            sum_second = sum_second + wgt * _shift(second, i, j)
            sum_w = sum_w + wgt
    sp_first = sum_first / sum_w
    sp_second = sum_second / sum_w

    use_spatial = sample_count < 4.0
    f = jnp.where(use_spatial, sp_first, first)
    s = jnp.where(use_spatial, sp_second, second)
    return jnp.maximum(s - f * f, 0.0)


# ---------------------------------------------------------------------------
# a-trous filtering (reference: applyATrousFilter_generic, svgf.cu:229-357)
# ---------------------------------------------------------------------------

_STEP_WIDTHS = [1, 2, 4, 8, 16]


def atrous_stage(color, variance, depth, normal, hit, step: int, cfg: SVGFConfig):
    """One box-3x3 a-trous stage with edge-stopping weights. Returns
    (filtered color, filtered variance)."""
    dzdx, dzdy = _depth_gradients(jnp.where(hit, depth, jnp.inf))
    return _atrous_stage_core(color, variance, depth, normal, hit,
                              dzdx, dzdy, step, cfg)


def _atrous_stage_core(color, variance, depth, normal, hit, dzdx, dzdy,
                       step: int, cfg: SVGFConfig):
    """atrous_stage body with the depth gradients passed in — every tap is
    a static _shift + pointwise math, so running it on a halo-padded row
    block and cropping the halo reproduces the full-image result exactly
    (the property the sharded path relies on; gradients must be computed
    GLOBALLY because their one-sided direction flips at the image center
    row, which a row shard cannot see)."""
    lum = luminance(color)

    # 3x3 Gaussian prefilter on variance -> local stddev (reference :288-305)
    g = [0.25, 0.5, 0.25]
    v_acc = jnp.zeros_like(variance)
    w_acc = jnp.zeros_like(variance)
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            wgt = g[i + 1] * g[j + 1]
            # reference clamps indices (edge-replicate)
            v_acc = v_acc + wgt * _shift(variance, i, j, fill=0.0)
            w_acc = w_acc + wgt
    local_std = jnp.sqrt(jnp.maximum(v_acc / w_acc, 0.0))

    taps = _ATROUS_KERNELS[cfg.atrous_kernel]
    center_w = next(wgt for (i, j, wgt) in taps if i == 0 and j == 0)
    sum_w = jnp.full_like(lum, center_w)
    acc_c = center_w * color
    acc_v = (center_w * center_w) * variance
    for i, j, h_w in taps:
        if i == 0 and j == 0:
            continue
        dy, dx = i * step, j * step
        nb_depth = _shift(depth, dy, dx, fill=jnp.inf)
        nb_hit = _shift(hit, dy, dx, fill=False)
        nb_normal = _shift(normal, dy, dx)
        nb_color = _shift(color, dy, dx)
        nb_var = _shift(variance, dy, dx)
        nb_lum = luminance(nb_color)
        wz = _w_depth(nb_depth, depth, dzdx, dzdy, dx, dy, cfg.sigma_z)
        wn = _w_normal(nb_normal, normal, cfg.sigma_n)
        wl = jnp.exp(-jnp.abs(nb_lum - lum) / (cfg.sigma_l * local_std + _EPS))
        wgt = jnp.where(nb_hit, h_w * wz * wn * wl, 0.0)
        acc_c = acc_c + wgt[..., None] * nb_color
        acc_v = acc_v + (wgt * wgt) * nb_var
        sum_w = sum_w + wgt
    return acc_c / sum_w[..., None], acc_v / (sum_w * sum_w)


# ---------------------------------------------------------------------------
# TAA (reference: applyAlbedoModulationAndTemporalAntiAliasing, svgf.cu:533)
# ---------------------------------------------------------------------------


def taa(color, history, motion, first_frame, cfg: SVGFConfig):
    """Neighborhood-clamped exponential TAA."""
    h, w = color.shape[:2]
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    px = xx.astype(jnp.float32) + 0.5 - motion[..., 0]
    py = yy.astype(jnp.float32) + 0.5 - motion[..., 1]
    in_screen = (px >= 0) & (py >= 0) & (px < w) & (py < h)

    # bilinear history fetch
    x0 = jnp.clip(jnp.floor(px - 0.5).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(py - 0.5).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(px - 0.5 - x0.astype(jnp.float32), 0.0, 1.0)
    fy = jnp.clip(py - 0.5 - y0.astype(jnp.float32), 0.0, 1.0)
    hist = (
        history[y0, x0] * ((1 - fx) * (1 - fy))[..., None]
        + history[y0, x1] * (fx * (1 - fy))[..., None]
        + history[y1, x0] * ((1 - fx) * fy)[..., None]
        + history[y1, x1] * (fx * fy)[..., None]
    )

    # 3x3 neighborhood clamp
    nb_min = color
    nb_max = color
    for i in (-1, 0, 1):
        for j in (-1, 0, 1):
            nb = _shift(color, i, j, fill=0.0)
            nb_min = jnp.minimum(nb_min, nb)
            nb_max = jnp.maximum(nb_max, nb)
    hist = jnp.clip(hist, nb_min, nb_max)

    alpha = 1.0 / cfg.taa_history_length
    blend = jnp.where((in_screen & ~first_frame)[..., None], 1.0 - alpha, 0.0)
    return color * (1.0 - blend) + hist * blend


# ---------------------------------------------------------------------------
# full frame
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def _atrous_pyramid(noisy, variance, gb: GBuffer, cfg: SVGFConfig):
    """Default (single-device) à-trous pyramid driver: returns
    (filtered, first_stage_filtered)."""
    color = noisy
    first_filtered = noisy
    for stage, step in enumerate(_STEP_WIDTHS[: cfg.num_filter_stages]):
        color, variance = atrous_stage(
            color, variance, gb.depth, gb.normal, gb.hit, step, cfg
        )
        if stage == 0:
            first_filtered = color
    return color, first_filtered


@functools.partial(jax.jit, static_argnames=("cfg", "pyramid_fn"))
def svgf_frame(
    state: SVGFState,
    gb: GBuffer,
    lighting,
    cfg: SVGFConfig = SVGFConfig(),
    pyramid_fn=None,
):
    """Full SVGF pipeline for one frame. `lighting` is the 1-spp path-traced
    radiance [H, W, 3] (un-demodulated). Returns (final color [H, W, 3],
    new state). Background (miss) pixels pass through untouched (reference:
    fillBackground writes env radiance there).

    `pyramid_fn(noisy, variance, gb, cfg) -> (filtered, first_filtered)`
    overrides the à-trous pyramid driver only (the multi-chip path in
    parallel/sharding.py substitutes a halo-exchange sharded pyramid; the
    temporal/demodulate/TAA pre/post logic is shared here so the two paths
    cannot drift). It is a STATIC argument: pass a module-level (stable-
    identity) callable or retrace on every call. The whole frame is one jit
    program — eager per-op dispatch through the remote tunnel measured
    ~2 s/frame at 512² before this wrapper (perf/RESULTS_r5.md)."""
    hit = gb.hit
    dem = demodulate_albedo(lighting, gb.albedo)

    noisy, moments, count = temporal_accumulate(state, gb, dem, cfg)

    if cfg.enable_svgf:
        variance = estimate_variance(moments, count, gb.depth, gb.normal, hit, cfg)
        filtered, first_filtered = (pyramid_fn or _atrous_pyramid)(
            noisy, variance, gb, cfg)
        feedback = first_filtered if cfg.feedback_1st_filtered else noisy
    else:
        filtered = noisy
        feedback = noisy

    # remodulate albedo; miss pixels keep the raw lighting (env)
    final = filtered * gb.albedo
    final = jnp.where(hit[..., None], final, lighting)

    if cfg.enable_taa:
        final = taa(final, state.taa_history, gb.motion, state.first_frame, cfg)

    new_state = SVGFState(
        prev_noisy=jnp.where(hit[..., None], feedback, 0.0),
        moments=moments,
        sample_count=jnp.where(hit, count, 0.0),
        prev_position=gb.position,
        prev_normal=gb.normal,
        prev_unit=gb.unit,
        prev_material=gb.material,
        taa_history=final,
        first_frame=jnp.asarray(False),
    )
    return final, new_state
