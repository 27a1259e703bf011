"""Light hierarchy sampling + pdf evaluation (device-side, batched).

Reproduces the reference's light subsystem (reference:
path_tracing/path_tracing_shared.h — sampleLight:221-416 incl. env importance
sampling and the low-distortion square->triangle map; probToSampleEnvLight =
0.25 :6; light PMFs built per frame by common/gpu_kernels/compute_light_probs.cu).

Differences by design: the reference's 3-level hierarchy (instance ->
geomInst -> primitive) collapses to 2 levels here (flattened unit ->
primitive) with identical resulting probabilities, because instances are
flattened into world-space units at scene compile (scene/types.py rationale).

Conventions (matching the reference):
- emitters are diffuse: radiance Le = emittance / pi
- surface samples return a pdf w.r.t. area; env samples return pdf w.r.t.
  solid angle (the reference folds this into 'areaPDensity' with dist=1)
- env direction for (u, v): phi = 2 pi u - rotation, theta = pi v, y-up
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.core.distributions import (
    continuous_2d_pdf,
    sample_continuous_2d,
)
from gfxexp_tpu.scene.types import SceneData

_PI = jnp.pi
PROB_SAMPLE_ENV = 0.25  # reference: path_tracing_shared.h:6


@struct.dataclass
class LightSample:
    """SoA light sample (reference: shared::LightSample)."""

    position: jnp.ndarray  # [R, 3] — for env lights this is the unit direction
    normal: jnp.ndarray  # [R, 3]
    emittance: jnp.ndarray  # [R, 3]
    pdf: jnp.ndarray  # [R] area pdf (surface) or solid-angle pdf (env)
    at_infinity: jnp.ndarray  # [R] bool


def _square_to_triangle(u0, u1):
    """Low-distortion square->triangle map (reference: sampleLight:402-411)."""
    b_a = 0.5 * u0
    b_b = 0.5 * u1
    offset = b_b - b_a
    b_b = jnp.where(offset > 0, b_b + offset, b_b)
    b_a = jnp.where(offset > 0, b_a, b_a - offset)
    return b_a, b_b


def _segment_searchsorted(cdf_flat, offset, count, u, max_log2=20):
    """Find largest i in [0, count) with cdf_flat[offset + i] <= u, where each
    segment's cdf starts at 0 (exclusive prefix, final implicit 1.0)."""
    lo = jnp.zeros_like(offset)
    hi = jnp.maximum(count - 1, 0)
    for _ in range(max_log2):
        mid = (lo + hi + 1) // 2
        mid_val = cdf_flat[offset + jnp.minimum(mid, jnp.maximum(count - 1, 0))]
        go_right = (mid_val <= u) & (mid <= hi)
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid - 1)
    return lo


def _alias_pick(prob, alias, idx_base, n, u):
    """Walker alias draw over a window of `n` buckets starting at idx_base
    in the flat (prob, alias) arrays; alias entries are LOCAL indices.
    Returns (local index, remapped uniform). O(1): two gathers, vs ~20
    sequential gathers for the windowed binary search — the difference is
    most of NEE's cost on TPU (measured 88 ms -> see pathtrace NEE note)."""
    scaled = u * n.astype(jnp.float32)
    bucket = jnp.clip(scaled.astype(jnp.int32), 0, jnp.maximum(n - 1, 0))
    frac = scaled - bucket.astype(jnp.float32)
    p = prob[idx_base + bucket]
    keep = frac < p
    local = jnp.where(keep, bucket, alias[idx_base + bucket])
    # conditional-uniform remap so the next stage can reuse the draw
    # (reference remaps through the CDF bin the same way)
    u_re = jnp.where(keep, frac / jnp.maximum(p, 1e-12),
                     (frac - p) / jnp.maximum(1.0 - p, 1e-12))
    return local, jnp.clip(u_re, 0.0, 1.0 - 1e-7)


def _select_light_pos(scene: SceneData, u_sel, u_aux=None):
    """Two-level emissive selection (unit, then triangle within the unit).
    Unit selection uses, in order of preference: the hierarchical
    probability texture (mip quad-descent — reference:
    USE_PROBABILITY_TEXTURE, common_shared.h:19,406) when built, the O(1)
    alias tables (host-compiled scenes), else the CDF binary-search path
    (device-rebuilt light distributions — scene/animation.py).

    Returns (unit, light_pos, u_aux_out): light_pos is the LIGHT-ORDER
    position (tri_offset[unit] + local pick). The probability texture
    consumes a second uniform (u_aux) for its 2D descent and hands back the
    conditionally-remapped value; other paths return it untouched."""
    units = scene.units
    u_aux_out = u_aux
    if scene.light_unit_probtex is not None and u_aux is not None:
        from gfxexp_tpu.core.distributions import sample_probability_texture

        pt = scene.light_unit_probtex
        ix, iy, upmf, u_re, u_aux_out = sample_probability_texture(
            pt, u_sel, u_aux)
        unit = jnp.clip(iy * pt.size + ix, 0, scene.num_units - 1)
    elif scene.light_unit_alias_prob is not None:
        nu = jnp.asarray(scene.num_units, jnp.int32)
        unit, u_re = _alias_pick(
            scene.light_unit_alias_prob, scene.light_unit_alias_idx,
            jnp.zeros((), jnp.int32), jnp.broadcast_to(nu, u_sel.shape),
            u_sel)
    else:
        unit = jnp.clip(
            jnp.searchsorted(scene.light_unit_cdf, u_sel, side="right") - 1,
            0, scene.num_units - 1)
        lo = scene.light_unit_cdf[unit]
        width = scene.light_unit_cdf[unit + 1] - lo
        u_re = jnp.clip(
            jnp.where(width > 0,
                      (u_sel - lo) / jnp.where(width > 0, width, 1.0), 0.0),
            0.0, 1.0 - 1e-7)
    offset = units.tri_offset[unit]
    count = units.tri_count[unit]
    if units.light_tri_alias_prob is not None:
        local, _ = _alias_pick(units.light_tri_alias_prob,
                               units.light_tri_alias_local, offset, count,
                               u_re)
    else:
        local = _segment_searchsorted(units.light_tri_cdf, offset, count,
                                      u_re)
    return unit, offset + local, u_aux_out


def _select_emissive_triangle(scene: SceneData, u_sel, u_aux=None):
    """_select_light_pos resolved to a traversal triangle id + pmfs.
    Returns (unit, tri, unit_pmf, tri_pmf, u_aux_out)."""
    units = scene.units
    unit, light_pos, u_aux_out = _select_light_pos(scene, u_sel, u_aux)
    unit_pmf = scene.light_unit_pmf[unit]
    tri = units.light_tri_index[light_pos]
    if scene.is_instanced:
        # pmf is stored in LIGHT order for instanced scenes (a blas tri id
        # is shared by many units)
        tri_pmf = units.light_tri_pmf[light_pos]
    else:
        tri_pmf = units.light_tri_pmf[tri]
    return unit, tri, unit_pmf, tri_pmf, u_aux_out


def pack_light_rows(scene: SceneData) -> jnp.ndarray:
    """[T, 22] WORLD-space emissive-triangle rows in LIGHT order so a
    surface-light sample costs ONE row gather after selection instead of
    ~10 scattered gathers (measured 11 -> ~3 ms per 262k lanes on v5e).

    Row: p0(0:3) e1(3:6) e2(6:9) n0(9:12) n1(12:15) n2(15:18)
    pdf = unit_pmf*tri_pmf/area (18) emittance(19:22).

    Built from the traced scene arrays (a [T]-sized gather pass, negligible
    next to the [lanes]-sized sampling it accelerates), so it stays valid
    under device-side light rebuilds and animated transforms; callers hoist
    it once per frame (render_lanes)."""
    units = scene.units
    tris = scene.triangles
    t = units.light_tri_index.shape[0]
    j = jnp.arange(t, dtype=jnp.int32)
    # owning unit of each light position: segments are [tri_offset, +count)
    unit = jnp.clip(
        jnp.searchsorted(units.tri_offset, j, side="right") - 1,
        0, scene.num_units - 1)
    tri = units.light_tri_index[j]
    p0, e1, e2 = tris.p0[tri], tris.e1[tri], tris.e2[tri]
    n0, n1, n2 = tris.n0[tri], tris.n1[tri], tris.n2[tri]
    tri_pmf = units.light_tri_pmf[j if scene.is_instanced else tri]
    if scene.is_instanced:
        insti = units.instance[unit]
        m = scene.instances.transform[insti]
        rot = m[:, :, :3]
        hi = jax.lax.Precision.HIGHEST
        p0 = jnp.einsum("nij,nj->ni", rot, p0, precision=hi) + m[:, :, 3]
        e1 = jnp.einsum("nij,nj->ni", rot, e1, precision=hi)
        e2 = jnp.einsum("nij,nj->ni", rot, e2, precision=hi)
        ninv = scene.instances.inv_transform[insti][:, :, :3]
        n0 = jnp.einsum("nji,nj->ni", ninv, n0, precision=hi)
        n1 = jnp.einsum("nji,nj->ni", ninv, n1, precision=hi)
        n2 = jnp.einsum("nji,nj->ni", ninv, n2, precision=hi)
    unit_pmf = scene.light_unit_pmf[unit]
    cr = jnp.cross(e1, e2)
    cr_len = jnp.linalg.norm(cr, axis=-1)
    rec_area = 2.0 / jnp.maximum(cr_len, 1e-20)
    pdf = jnp.where(cr_len > 0, unit_pmf * tri_pmf * rec_area, 0.0)
    emit = scene.materials.emittance[units.material[unit]]
    return jnp.concatenate(
        [p0, e1, e2, n0, n1, n2, pdf[:, None], emit], axis=1)


def env_dir_from_uv(env, u, v):
    """(u, v) in [0,1)^2 -> world direction (y-up lat-long)."""
    phi = 2.0 * _PI * u - env.rotation
    theta = _PI * v
    sin_t = jnp.sin(theta)
    return jnp.stack(
        [sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], axis=-1
    )


def env_uv_from_dir(env, d):
    """World direction -> (u, v) in the rotated env map."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    u = (phi + env.rotation) / (2.0 * _PI)
    u = u - jnp.floor(u)
    v = theta / _PI
    return u, v


def env_radiance(env, d):
    """Environment radiance for escaped rays (reference: PT miss program env
    lookup with powerCoeff — a bilinear CUDA texture fetch; nearest-texel
    shows banding on low-res maps). u wraps, v clamps (poles)."""
    u, v = env_uv_from_dir(env, d)
    h, w = env.radiance.shape[:2]
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0w = x0 % w
    x1w = (x0 + 1) % w
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y0 + 1, 0, h - 1)
    r00 = env.radiance[y0c, x0w]
    r10 = env.radiance[y0c, x1w]
    r01 = env.radiance[y1c, x0w]
    r11 = env.radiance[y1c, x1w]
    r = (
        (1 - ty) * ((1 - tx) * r00 + tx * r10)
        + ty * ((1 - tx) * r01 + tx * r11)
    )
    return r * env.power_coeff


def env_pdf(env, d):
    """Solid-angle pdf of importance-sampling direction d from the env map."""
    u, v = env_uv_from_dir(env, d)
    theta = _PI * v
    uv_pdf = continuous_2d_pdf(env.importance, u, v)
    sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
    return uv_pdf / (2.0 * _PI * _PI * sin_t)


def sample_surface_light(scene: SceneData, u_sel, u0, u1,
                         packed=None) -> LightSample:
    """Hierarchical emissive-surface sample: unit via scene CDF, triangle via
    the unit's CDF, position via the square->triangle map. `packed` is the
    hoisted pack_light_rows table: when given, everything after selection is
    one row gather."""
    if packed is not None:
        unit, light_pos, u0 = _select_light_pos(scene, u_sel, u0)
        row = packed[light_pos]  # [R, 22]
        b_a, b_b = _square_to_triangle(u0, u1)
        b_c = 1.0 - b_a - b_b
        position = (row[:, 0:3] + b_b[..., None] * row[:, 3:6]
                    + b_c[..., None] * row[:, 6:9])
        normal = (b_a[..., None] * row[:, 9:12]
                  + b_b[..., None] * row[:, 12:15]
                  + b_c[..., None] * row[:, 15:18])
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)
        pdf = row[:, 18]
        return LightSample(
            position=position,
            normal=normal,
            emittance=row[:, 19:22],
            pdf=pdf,
            at_infinity=jnp.zeros(pdf.shape, bool),
        )
    tris = scene.triangles
    units = scene.units
    unit, tri, unit_pmf, tri_pmf, u0 = _select_emissive_triangle(
        scene, u_sel, u0)

    b_a, b_b = _square_to_triangle(u0, u1)
    p0 = tris.p0[tri]
    e1 = tris.e1[tri]
    e2 = tris.e2[tri]
    n0 = tris.n0[tri]
    n1 = tris.n1[tri]
    n2 = tris.n2[tri]
    if scene.is_instanced:
        # object->world through the unit's instance; pdf uses WORLD area
        insti = units.instance[unit]
        m = scene.instances.transform[insti]
        rot = m[:, :, :3]
        hi = jax.lax.Precision.HIGHEST
        p0 = jnp.einsum("nij,nj->ni", rot, p0, precision=hi) + m[:, :, 3]
        e1 = jnp.einsum("nij,nj->ni", rot, e1, precision=hi)
        e2 = jnp.einsum("nij,nj->ni", rot, e2, precision=hi)
        ninv = scene.instances.inv_transform[insti][:, :, :3]
        n0 = jnp.einsum("nji,nj->ni", ninv, n0, precision=hi)
        n1 = jnp.einsum("nji,nj->ni", ninv, n1, precision=hi)
        n2 = jnp.einsum("nji,nj->ni", ninv, n2, precision=hi)
    # barycentrics: position = (1-b1-b2) p0 + b1 p1 + b2 p2; corner weights
    # (bcA, bcB, bcC) from the low-distortion map with bcC = 1 - bcA - bcB
    b_c = 1.0 - b_a - b_b
    position = p0 + b_b[..., None] * e1 + b_c[..., None] * e2

    cr = jnp.cross(e1, e2)
    cr_len = jnp.linalg.norm(cr, axis=-1)
    rec_area = 2.0 / jnp.maximum(cr_len, 1e-20)
    pdf = unit_pmf * tri_pmf * rec_area

    normal = b_a[..., None] * n0 + b_b[..., None] * n1 + b_c[..., None] * n2
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-20)

    mat = units.material[unit]
    emittance = scene.materials.emittance[mat]
    pdf = jnp.where(cr_len > 0, pdf, 0.0)

    return LightSample(
        position=position,
        normal=normal,
        emittance=emittance,
        pdf=pdf,
        at_infinity=jnp.zeros(pdf.shape, bool),
    )


def sample_surface_light_solid_angle(scene: SceneData, shading_point,
                                     u_sel, u0, u1) -> LightSample:
    """Uniform sampling in the solid angle subtended by the chosen triangle
    (reference: sampleLight's useSolidAngleSampling branch,
    path_tracing_shared.h:330-400 — Arvo's spherical triangle sampling with
    barycentric restoration; the returned pdf is converted to the area
    measure so it composes with the rest of the light machinery)."""
    tris = scene.triangles
    units = scene.units
    unit, tri, unit_pmf, tri_pmf, u0 = _select_emissive_triangle(
        scene, u_sel, u0)
    light_prob = unit_pmf * tri_pmf

    p_a = tris.p0[tri]
    p_b = p_a + tris.e1[tri]
    p_c = p_a + tris.e2[tri]
    if scene.is_instanced:
        insti = units.instance[unit]
        m = scene.instances.transform[insti]
        rot = m[:, :, :3]
        hi = jax.lax.Precision.HIGHEST
        tr = m[:, :, 3]
        p_a = jnp.einsum("nij,nj->ni", rot, p_a, precision=hi) + tr
        p_b = jnp.einsum("nij,nj->ni", rot, p_b, precision=hi) + tr
        p_c = jnp.einsum("nij,nj->ni", rot, p_c, precision=hi) + tr
    geom_n = jnp.cross(p_b - p_a, p_c - p_a)

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    a = norm(p_a - shading_point)
    b = norm(p_b - shading_point)
    c = norm(p_c - shading_point)
    c_ab = norm(jnp.cross(a, b))
    c_bc = norm(jnp.cross(b, c))
    c_ca = norm(jnp.cross(c, a))
    cos_c = jnp.sum(a * b, axis=-1)
    cos_alpha = -jnp.sum(c_ab * c_ca, axis=-1)
    cos_beta = -jnp.sum(c_bc * c_ab, axis=-1)
    cos_gamma = -jnp.sum(c_ca * c_bc, axis=-1)
    alpha = jnp.arccos(jnp.clip(cos_alpha, -1.0, 1.0))
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - cos_alpha**2, 0.0))
    sph_area = (alpha + jnp.arccos(jnp.clip(cos_beta, -1.0, 1.0))
                + jnp.arccos(jnp.clip(cos_gamma, -1.0, 1.0)) - _PI)

    def project(va, vb):
        return norm(va - jnp.sum(va * vb, axis=-1, keepdims=True) * vb)

    area_hat = sph_area * u0
    s = jnp.sin(area_hat - alpha)
    t = jnp.cos(area_hat - alpha)
    uu = t - cos_alpha
    vv = s + sin_alpha * cos_c
    denom = (vv * s + uu * t) * sin_alpha
    q = jnp.where(jnp.abs(denom) > 1e-12,
                  ((vv * t - uu * s) * cos_alpha - vv)
                  / jnp.where(denom == 0, 1.0, denom), 0.0)
    q = jnp.clip(q, -1.0, 1.0)
    c_hat = q[..., None] * a + jnp.sqrt(jnp.maximum(1 - q**2, 0.0))[..., None] * project(c, a)
    z = 1.0 - u1 * (1.0 - jnp.sum(c_hat * b, axis=-1))
    z = jnp.clip(z, -1.0, 1.0)
    direction = (z[..., None] * b
                 + jnp.sqrt(jnp.maximum(1 - z**2, 0.0))[..., None]
                 * project(c_hat, b))

    # restore barycentrics by intersecting the sampled direction with the
    # triangle plane (reference: restoreBarycentrics lambda)
    e_ab = p_b - p_a
    e_ac = p_c - p_a
    pv = jnp.cross(direction, e_ac)
    det = jnp.sum(e_ab * pv, axis=-1)
    rec_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    tv = shading_point - p_a
    bc_b = jnp.sum(tv * pv, axis=-1) * rec_det
    qv = jnp.cross(tv, e_ab)
    bc_c = jnp.sum(direction * qv, axis=-1) * rec_det
    dist = jnp.sum(e_ac * qv, axis=-1) * rec_det
    bc_a = 1.0 - bc_b - bc_c
    position = (bc_a[..., None] * p_a + bc_b[..., None] * p_b
                + bc_c[..., None] * p_c)

    gn = norm(geom_n)
    dir_pdf = jnp.where(sph_area > 1e-8, 1.0 / jnp.maximum(sph_area, 1e-8), 0.0)
    lp_cos = -jnp.sum(direction * gn, axis=-1)
    pdf = jnp.where(
        (lp_cos > 0.0) & jnp.isfinite(dir_pdf) & (dist > 0.0),
        light_prob * dir_pdf * lp_cos / jnp.maximum(dist**2, 1e-12),
        0.0,
    )

    n0, n1, n2 = tris.n0[tri], tris.n1[tri], tris.n2[tri]
    if scene.is_instanced:
        ninv = scene.instances.inv_transform[insti][:, :, :3]
        hi = jax.lax.Precision.HIGHEST
        n0 = jnp.einsum("nji,nj->ni", ninv, n0, precision=hi)
        n1 = jnp.einsum("nji,nj->ni", ninv, n1, precision=hi)
        n2 = jnp.einsum("nji,nj->ni", ninv, n2, precision=hi)
    normal = norm(bc_a[..., None] * n0 + bc_b[..., None] * n1
                  + bc_c[..., None] * n2)
    mat = units.material[unit]
    return LightSample(
        position=position,
        normal=normal,
        emittance=scene.materials.emittance[mat],
        pdf=pdf,
        at_infinity=jnp.zeros(pdf.shape, bool),
    )


def sample_env_light(scene: SceneData, u0, u1) -> LightSample:
    env = scene.env
    u, v, uv_pdf = sample_continuous_2d(env.importance, u1, u0)
    # note: row pick (v axis) consumes the first uniform in our builder
    direction = env_dir_from_uv(env, u, v)
    sin_t = jnp.maximum(jnp.sin(_PI * v), 1e-6)
    pdf = uv_pdf / (2.0 * _PI * _PI * sin_t)
    # reference multiplies pi * powerCoeff so Le = emittance/pi = coeff * tex;
    # bilinear fetch to match env_radiance (miss-program lookup) exactly —
    # NEE and implicit-hit estimates must agree for MIS consistency
    emittance = _PI * env_radiance(env, direction)
    return LightSample(
        position=direction,
        normal=-direction,
        emittance=emittance,
        pdf=pdf,
        at_infinity=jnp.ones(pdf.shape, bool),
    )


def sample_light(scene: SceneData, u_light, u0, u1, packed=None) -> LightSample:
    """Full light sample mixing env and surface lights with the reference's
    fixed 0.25 env probability (when both exist). u_light selects the family
    and is remapped into the chosen branch (reference:
    performNextEventEstimation, optix_pathtracing_kernels.cu:24-42). The
    returned pdf includes the selection probability. `packed` is a hoisted
    pack_light_rows table (optional fast path)."""
    surface_ok = scene.total_emissive_importance > 0.0

    if scene.env is None:
        surf = sample_surface_light(scene, u_light, u0, u1, packed=packed)
        pdf = jnp.where(surface_ok, surf.pdf, 0.0)
        return surf.replace(pdf=pdf)

    p_env = jnp.where(surface_ok, PROB_SAMPLE_ENV, 1.0) * jnp.where(
        scene.env.enabled, 1.0, 0.0
    )
    pick_env = u_light < p_env
    u_surf = jnp.clip(
        (u_light - p_env) / jnp.maximum(1.0 - p_env, 1e-8), 0.0, 1.0 - 1e-7
    )
    surf = sample_surface_light(scene, u_surf, u0, u1, packed=packed)
    envs = sample_env_light(scene, u0, u1)

    def sel(e, s):
        mask = pick_env
        while mask.ndim < e.ndim:
            mask = mask[..., None]
        return jnp.where(mask, e, s)

    pdf = jnp.where(
        pick_env,
        envs.pdf * p_env,
        jnp.where(surface_ok, surf.pdf * (1.0 - p_env), 0.0),
    )
    return LightSample(
        position=sel(envs.position, surf.position),
        normal=sel(envs.normal, surf.normal),
        emittance=sel(envs.emittance, surf.emittance),
        pdf=pdf,
        at_infinity=pick_env,
    )


def sample_light_solid_angle(scene: SceneData, shading_point, u_light, u0,
                             u1) -> LightSample:
    """sample_light with the solid-angle surface strategy (reference:
    useSolidAngleSampling variant)."""
    surface_ok = scene.total_emissive_importance > 0.0
    if scene.env is None:
        surf = sample_surface_light_solid_angle(scene, shading_point,
                                                u_light, u0, u1)
        return surf.replace(pdf=jnp.where(surface_ok, surf.pdf, 0.0))
    p_env = jnp.where(surface_ok, PROB_SAMPLE_ENV, 1.0) * jnp.where(
        scene.env.enabled, 1.0, 0.0)
    pick_env = u_light < p_env
    u_surf = jnp.clip(
        (u_light - p_env) / jnp.maximum(1.0 - p_env, 1e-8), 0.0, 1.0 - 1e-7)
    surf = sample_surface_light_solid_angle(scene, shading_point, u_surf,
                                            u0, u1)
    envs = sample_env_light(scene, u0, u1)

    def sel(e, s):
        m = pick_env
        while m.ndim < e.ndim:
            m = m[..., None]
        return jnp.where(m, e, s)

    pdf = jnp.where(
        pick_env,
        envs.pdf * p_env,
        jnp.where(surface_ok, surf.pdf * (1.0 - p_env), 0.0),
    )
    return LightSample(
        position=sel(envs.position, surf.position),
        normal=sel(envs.normal, surf.normal),
        emittance=sel(envs.emittance, surf.emittance),
        pdf=pdf,
        at_infinity=pick_env,
    )


def surface_light_pdf(scene: SceneData, tri_idx, inst=None):
    """Area pdf of sampling triangle `tri_idx`'s surface point via
    sample_surface_light — for MIS weighting of implicit hits (reference:
    computeHypotheticalAreaPDensity in CH programs). Instanced scenes need
    the hit instance: pmf is per (instance, tri) and the area is the
    WORLD-space one."""
    tris = scene.triangles
    if scene.is_instanced:
        insti = jnp.maximum(jnp.asarray(inst), 0)
        unit = scene.inst_unit_base[insti] + tris.unit_id[tri_idx]
        light_pos = (scene.units.tri_offset[unit]
                     + scene.tri_light_local[tri_idx]
                     - scene.unit_tri_base[unit])
        tri_pmf = scene.units.light_tri_pmf[light_pos]
        m = scene.instances.transform[insti]
        rot = m[:, :, :3]
        hi = jax.lax.Precision.HIGHEST
        e1 = jnp.einsum("nij,nj->ni", rot, tris.e1[tri_idx], precision=hi)
        e2 = jnp.einsum("nij,nj->ni", rot, tris.e2[tri_idx], precision=hi)
    else:
        unit = tris.unit_id[tri_idx]
        tri_pmf = scene.units.light_tri_pmf[tri_idx]
        e1 = tris.e1[tri_idx]
        e2 = tris.e2[tri_idx]
    unit_pmf = scene.light_unit_pmf[unit]
    cr = jnp.cross(e1, e2)
    cr_len = jnp.linalg.norm(cr, axis=-1)
    rec_area = 2.0 / jnp.maximum(cr_len, 1e-20)
    return unit_pmf * tri_pmf * rec_area


def light_selection_probs(scene: SceneData):
    """(p_env, p_surface) selection probabilities for MIS pdf composition."""
    surface_ok = scene.total_emissive_importance > 0.0
    if scene.env is None:
        return jnp.asarray(0.0), jnp.where(surface_ok, 1.0, 0.0)
    p_env = jnp.where(surface_ok, PROB_SAMPLE_ENV, 1.0) * jnp.where(
        scene.env.enabled, 1.0, 0.0
    )
    return p_env, jnp.where(surface_ok, 1.0 - p_env, 0.0)
