"""Curve primitive evaluators: position/derivative/normal along swept-sphere
curve segments.

Reference: common/curve_evaluator.h (379 LoC, device) — evaluators for the
OptiX curve primitive types: linear, quadratic B-spline, cubic B-spline,
Catmull-Rom, Bezier (curve::Evaluator:309). Here the evaluators are batched
jnp functions over [N, K, 3] control points + [N] radii-interpolating curves;
the round-1 renderer tessellates curves into triangles at scene build
(scene/builder — createLinearSegmentsGeometryInstance counterpart) and these
evaluators provide the exact positions/frames for that tessellation and for
shading normals."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CURVE_LINEAR = "linear"
CURVE_QUADRATIC_BSPLINE = "quadratic_bspline"
CURVE_CUBIC_BSPLINE = "cubic_bspline"
CURVE_CATMULL_ROM = "catmull_rom"
CURVE_BEZIER = "bezier"


def _basis(curve_type: str):
    """Power-basis matrix B such that p(t) = [1 t t^2 t^3] @ B @ P for the
    4-point types, or the 3/2-point equivalents."""
    if curve_type == CURVE_LINEAR:
        return np.array([[1.0, 0.0], [-1.0, 1.0]])
    if curve_type == CURVE_QUADRATIC_BSPLINE:
        return 0.5 * np.array([[1, 1, 0], [-2, 2, 0], [1, -2, 1]], np.float64)
    if curve_type == CURVE_CUBIC_BSPLINE:
        return (1.0 / 6.0) * np.array(
            [[1, 4, 1, 0], [-3, 0, 3, 0], [3, -6, 3, 0], [-1, 3, -3, 1]],
            np.float64)
    if curve_type == CURVE_CATMULL_ROM:
        return 0.5 * np.array(
            [[0, 2, 0, 0], [-1, 0, 1, 0], [2, -5, 4, -1], [-1, 3, -3, 1]],
            np.float64)
    if curve_type == CURVE_BEZIER:
        return np.array(
            [[1, 0, 0, 0], [-3, 3, 0, 0], [3, -6, 3, 0], [-1, 3, -3, 1]],
            np.float64)
    raise ValueError(curve_type)


def _span_stride(curve_type: str) -> int:
    """Control-point step between consecutive spans. B-spline/Catmull-Rom
    bases overlap their windows (stride 1, C^2/C^1 continuity built into
    the basis); BEZIER spans own their control points — consecutive spans
    share only the junction point, so the window must advance by the
    degree (stride 3). A stride-1 Bezier walk would emit spans of
    DIFFERENT, disconnected curves (each window is its own Bezier) and
    any polyline chained across them gains a phantom chord between
    windows — the r3 exact-vs-polyline parity failure was exactly this."""
    return (_basis(curve_type).shape[0] - 1
            if curve_type == CURVE_BEZIER else 1)


def evaluate(curve_type: str, control_points, t, radii=None):
    """Position (and radius) at parameter t.

    control_points: [..., K, 3] with K = 2 (linear), 3 (quadratic) or 4;
    t: [...]; radii: optional [..., K]. Returns (position [..., 3],
    radius [...] or None)."""
    b = jnp.asarray(_basis(curve_type), jnp.float32)
    k = b.shape[0]
    powers = jnp.stack([t**i for i in range(k)], axis=-1)  # [..., K]
    coeff = powers @ b  # [..., K] weights over control points
    pos = jnp.einsum("...k,...kd->...d", coeff, control_points)
    rad = None
    if radii is not None:
        rad = jnp.einsum("...k,...k->...", coeff, radii)
    return pos, rad


def evaluate_derivative(curve_type: str, control_points, t):
    """dP/dt at parameter t — the curve tangent (unnormalized)."""
    b = jnp.asarray(_basis(curve_type), jnp.float32)
    k = b.shape[0]
    dpow = jnp.stack(
        [jnp.zeros_like(t) if i == 0 else i * t ** (i - 1) for i in range(k)],
        axis=-1)
    coeff = dpow @ b
    return jnp.einsum("...k,...kd->...d", coeff, control_points)


def surface_normal(curve_type: str, control_points, t, hit_point, radii=None):
    """Swept-sphere curve surface normal at a hit point (reference:
    calcCurveSurfaceNormal, common_device.cuh:247): the component of
    (hit - axisPos) orthogonal to the tangent."""
    pos, _ = evaluate(curve_type, control_points, t, radii)
    tang = evaluate_derivative(curve_type, control_points, t)
    tang = tang / jnp.maximum(
        jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-20)
    rel = hit_point - pos
    n = rel - jnp.sum(rel * tang, axis=-1, keepdims=True) * tang
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


def tessellate_curve(curve_type: str, control_points: np.ndarray,
                     radii: np.ndarray, n_axial: int = 8, n_radial: int = 8):
    """Host-side tube tessellation of one curve segment into triangles —
    the round-1 rendering path for curve geometry (the reference renders
    curves with hardware OptiX curve intersectors; a direct ray-vs-swept-
    sphere Pallas intersector is a planned extension). Returns
    (positions [V,3], normals [V,3], indices [F,3])."""
    import numpy as _np

    cp = jnp.asarray(control_points, jnp.float32)[None]
    rr = jnp.asarray(radii, jnp.float32)[None]
    ts = _np.linspace(0.0, 1.0, n_axial + 1).astype(_np.float32)
    verts, norms = [], []
    for t in ts:
        tj = jnp.asarray([t])
        pos, rad = evaluate(curve_type, cp, tj, rr)
        tang = evaluate_derivative(curve_type, cp, tj)
        pos = _np.asarray(pos)[0]
        r = float(_np.asarray(rad)[0])
        tg = _np.asarray(tang)[0]
        tn = tg / max(_np.linalg.norm(tg), 1e-20)
        # stable frame about the tangent
        up = _np.array([0.0, 1.0, 0.0]) if abs(tn[1]) < 0.9 else _np.array(
            [1.0, 0.0, 0.0])
        b1 = _np.cross(tn, up)
        b1 /= max(_np.linalg.norm(b1), 1e-20)
        b2 = _np.cross(tn, b1)
        for a in range(n_radial):
            ang = 2 * _np.pi * a / n_radial
            nrm = _np.cos(ang) * b1 + _np.sin(ang) * b2
            verts.append(pos + r * nrm)
            norms.append(nrm)
    idx = []
    for i in range(n_axial):
        for a in range(n_radial):
            v00 = i * n_radial + a
            v01 = i * n_radial + (a + 1) % n_radial
            v10 = (i + 1) * n_radial + a
            v11 = (i + 1) * n_radial + (a + 1) % n_radial
            idx.append([v00, v10, v01])
            idx.append([v01, v10, v11])
    return (_np.asarray(verts, _np.float32), _np.asarray(norms, _np.float32),
            _np.asarray(idx, _np.int32))


# ---------------------------------------------------------------------------
# direct swept-sphere intersection — linear segments
# (reference: OptiX's built-in round-linear curve primitive, enabled by
#  createLinearSegmentsGeometryInstance, common_host.cpp:1999; evaluators
#  curve_evaluator.h. Higher-order bases still render via tessellation —
#  tessellate_curve — matching capability at lower exactness.)
# ---------------------------------------------------------------------------


def intersect_round_linear(p0, r0, p1, r1, o, d, t_min=1e-4, t_max=1e30):
    """Exact closest hit of rays against one round linear segment (a cone-
    sphere / 'rounded cone': the convex hull of spheres (p0, r0), (p1, r1)).

    Vectorized over rays; segment endpoints broadcast ([3]/[R,3]). Returns
    (hit, t, normal [R,3], s in [0,1] along the segment). The lateral
    surface solves the quadratic of the swept-sphere offset cone; endpoint
    caps are sphere intersections clipped to their cap regions."""
    import jax.numpy as jnp

    p0 = jnp.asarray(p0, jnp.float32)
    p1 = jnp.asarray(p1, jnp.float32)
    axis = p1 - p0
    ll = jnp.maximum(jnp.sum(axis * axis, -1), 1e-20)
    l = jnp.sqrt(ll)
    az = axis / l[..., None] if axis.ndim > 1 else axis / l
    dr = (r1 - r0) / l  # radius slope along the axis

    oc = o - p0
    # decompose into axial/perpendicular components
    od_a = jnp.sum(d * az, -1)
    oc_a = jnp.sum(oc * az, -1)
    # lateral surface: |x_perp(t)| = r0 + dr * x_axial(t), squared:
    # |x - p0|^2 - x_a^2 = (r0 + dr x_a)^2
    # quadratic A t^2 + B t + C = 0 with
    dd = jnp.sum(d * d, -1)
    ocd = jnp.sum(oc * d, -1)
    occ = jnp.sum(oc * oc, -1)
    k = 1.0 + dr * dr
    A = dd - k * od_a * od_a
    B = 2.0 * (ocd - k * oc_a * od_a - r0 * dr * od_a)
    C = occ - k * oc_a * oc_a - 2.0 * r0 * dr * oc_a - r0 * r0
    disc = B * B - 4.0 * A * C
    safe_a = jnp.where(jnp.abs(A) > 1e-12, A, 1.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_lat = jnp.where(A > 0, (-B - sq) / (2 * safe_a),
                      (-B + sq) / (2 * safe_a))
    x_a = oc_a + t_lat * od_a  # axial coordinate of the lateral hit
    # the lateral surface is valid between the cap tangent points
    lo_a = -r0 * dr
    hi_a = l - r1 * dr
    lat_ok = ((disc >= 0.0) & (jnp.abs(A) > 1e-12)
              & (t_lat > t_min) & (t_lat < t_max)
              & (x_a >= lo_a) & (x_a <= hi_a))

    def sphere_hit(center, radius):
        co = o - center
        b = jnp.sum(co * d, -1)
        c = jnp.sum(co * co, -1) - radius * radius
        disc_s = b * b - dd * c
        sqs = jnp.sqrt(jnp.maximum(disc_s, 0.0))
        ts = (-b - sqs) / jnp.maximum(dd, 1e-20)
        return (disc_s >= 0.0) & (ts > t_min) & (ts < t_max), ts

    ok0, t0 = sphere_hit(p0, r0)
    x0_a = oc_a + t0 * od_a
    ok0 = ok0 & (x0_a < lo_a)
    ok1, t1 = sphere_hit(p1, r1)
    x1_a = oc_a + t1 * od_a
    ok1 = ok1 & (x1_a > hi_a)

    t_best = jnp.where(lat_ok, t_lat, jnp.inf)
    take0 = ok0 & (t0 < t_best)
    t_best = jnp.where(take0, t0, t_best)
    take1 = ok1 & (t1 < t_best)
    t_best = jnp.where(take1, t1, t_best)
    hit = jnp.isfinite(t_best)

    x = o + t_best[..., None] * d
    xa = jnp.sum((x - p0) * az, -1)
    s = jnp.clip(xa / l, 0.0, 1.0)
    # lateral normal: gradient of F = |x_perp|^2 - (r0 + dr*xa)^2, i.e.
    # x_perp - dr*(r0 + dr*xa)*az  =  x - (p0 + (xa + dr*(r0 + dr*xa))*az)
    closest = p0 + (xa + dr * (r0 + dr * xa))[..., None] * az
    n = x - closest
    # endpoint caps are sphere surfaces: normal = (x - center) / r
    n = jnp.where(take1[..., None], x - p1, n)
    n = jnp.where(take0[..., None], x - p0, n)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    t_out = jnp.where(hit, t_best, t_max)
    return hit, t_out, n, s


# ---------------------------------------------------------------------------
# Scene-level curve primitive: batches of round-linear segments traced
# directly (no tessellation) beside triangles and displaced geometry
# (reference: curve primitives registered in the GAS,
# createLinearSegmentsGeometryInstance common_host.cpp:1999 + the OptiX
# round-linear intersector; evaluators curve_evaluator.h:309). Higher-order
# bases are flattened to round-linear POLYLINES (exact swept-sphere
# intersection of a piecewise-linear center curve) — tessellation to tubes
# remains the triangle-pipeline fallback.
# ---------------------------------------------------------------------------

from flax import struct as _struct  # noqa: E402


@_struct.dataclass
class CurveSegments:
    """Round-linear segment soup (cone-spheres)."""

    p0: jnp.ndarray  # [C, 3]
    p1: jnp.ndarray  # [C, 3]
    r0: jnp.ndarray  # [C]
    r1: jnp.ndarray  # [C]
    material: int = _struct.field(pytree_node=False, default=0)


@_struct.dataclass
class CurveHit:
    t: jnp.ndarray  # [R]
    hit: jnp.ndarray
    position: jnp.ndarray  # [R, 3]
    normal: jnp.ndarray
    uv: jnp.ndarray  # [R, 2] (s along segment, 0.5)
    prim: jnp.ndarray  # [R] segment index (-1 miss)


def build_curve_segments(control_points, radii, material: int = 0,
                         curve_type: str = CURVE_LINEAR,
                         n_subdiv: int = 8) -> CurveSegments:
    """Host build. Linear curves become one segment per control-point pair;
    higher-order bases are evaluated at n_subdiv+1 parameters per span and
    chained into a round-linear polyline."""
    cp = np.asarray(control_points, np.float32)
    rr = np.asarray(radii, np.float32)
    if curve_type == CURVE_LINEAR:
        a, b = cp[:-1], cp[1:]
        ra, rb = rr[:-1], rr[1:]
    else:
        k = _basis(curve_type).shape[0]
        stride = _span_stride(curve_type)
        pts, rads = [], []
        n_spans = (cp.shape[0] - k) // stride + 1
        assert n_spans >= 1, (cp.shape, curve_type)
        assert (cp.shape[0] - k) % stride == 0, (
            f"{curve_type}: {cp.shape[0]} control points leave a partial "
            f"trailing span (need k={k} + m*{stride})")
        for s in range(n_spans):
            c0 = s * stride
            ts = np.linspace(0.0, 1.0, n_subdiv + 1)
            if s > 0:
                ts = ts[1:]  # span boundary shared with the previous span
            pos, rad = evaluate(curve_type, jnp.asarray(cp[c0:c0 + k])[None],
                                jnp.asarray(ts)[:, None],
                                radii=jnp.asarray(rr[c0:c0 + k])[None])
            pts.append(np.asarray(pos[:, 0]))
            rads.append(np.asarray(rad[:, 0]))
        poly = np.concatenate(pts)
        prad = np.concatenate(rads)
        a, b = poly[:-1], poly[1:]
        ra, rb = prad[:-1], prad[1:]
    return CurveSegments(
        p0=jnp.asarray(a), p1=jnp.asarray(b),
        r0=jnp.asarray(ra), r1=jnp.asarray(rb), material=material)


def intersect_curve_segments(geom: CurveSegments, o, d, t_min=1e-4,
                             t_max=1e30, k_candidates: int = 4) -> CurveHit:
    """Closest hit against every segment, streaming candidates
    nearest-first by segment-AABB entry until no unprocessed AABB lies
    closer than the best hit (techniques.tfdm.iterate_candidates — the
    same no-silent-cap driver the displaced primitives use)."""
    from gfxexp_tpu.techniques.tfdm import iterate_candidates

    n_rays = o.shape[0]
    r0b = geom.r0[:, None]
    r1b = geom.r1[:, None]
    lo = jnp.minimum(geom.p0 - r0b, geom.p1 - r1b) - 1e-6
    hi = jnp.maximum(geom.p0 + r0b, geom.p1 + r1b) + 1e-6

    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    state0 = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,)),
        jnp.full((n_rays,), -1, jnp.int32),
        jnp.zeros((n_rays, 3), jnp.float32),  # normal
        jnp.zeros((n_rays,), jnp.float32),    # s
    )

    def process(state, cid, near, far):
        best_t, best_prim, best_n, best_s = state
        b = jnp.maximum(cid, 0)
        hit, t, n, s = intersect_round_linear(
            geom.p0[b], geom.r0[b], geom.p1[b], geom.r1[b], o, d,
            t_min=t_min_v, t_max=best_t)
        take = (cid >= 0) & hit & (t < best_t)
        return (jnp.where(take, t, best_t),
                jnp.where(take, cid, best_prim),
                jnp.where(take[:, None], n, best_n),
                jnp.where(take, s, best_s))

    best_t, best_prim, best_n, best_s = iterate_candidates(
        lo, hi, o, d, t_min, t_max, k_candidates, state0, process,
        lambda st: st[0])
    return CurveHit(
        t=best_t, hit=best_prim >= 0,
        position=o + best_t[:, None] * d,
        normal=best_n,
        uv=jnp.stack([best_s, jnp.full_like(best_s, 0.5)], axis=-1),
        prim=best_prim,
    )


# ---------------------------------------------------------------------------
# direct swept-sphere intersection — higher-order spans (exact)
# (reference: OptiX's built-in quadratic/cubic B-spline, Catmull-Rom and
#  Bezier curve intersectors, enabled through curve_evaluator.h:309. The
#  TPU formulation intersects the canal surface directly: 2D Newton on
#  F1(t,u) = |o + t d - P(u)|^2 - r(u)^2 and the envelope condition
#  F2(t,u) = (o + t d - P(u)).P'(u) + r(u) r'(u), multi-seeded in u —
#  fixed iteration counts, branch-free, VPU-shaped.)
# ---------------------------------------------------------------------------


@_struct.dataclass
class CurveSpans:
    """Power-basis curve spans: P(u) = sum_j coef[s, j] u^j, u in [0, 1],
    r(u) = sum_j rcoef[s, j] u^j. Any supported basis converts exactly
    (cubic bases: 4 coefficients; quadratic pads the cubic term with 0)."""

    coef: jnp.ndarray  # [S, 4, 3]
    rcoef: jnp.ndarray  # [S, 4]
    lo: jnp.ndarray  # [S, 3] conservative span AABBs
    hi: jnp.ndarray  # [S, 3]
    material: int = _struct.field(pytree_node=False, default=0)


def build_curve_spans(control_points, radii, material: int = 0,
                      curve_type: str = CURVE_CUBIC_BSPLINE) -> CurveSpans:
    """Host build: sliding-window spans of the control polygon, each
    converted to power-basis coefficients. Span AABBs are sampled bounds
    widened by the exact second-derivative sag bound (|P''| <= |2 c2| +
    6 |c3| on [0, 1]), so they conservatively contain the swept sphere."""
    cp = np.asarray(control_points, np.float64)
    rr = np.asarray(radii, np.float64)
    B = _basis(curve_type)
    k = B.shape[0]
    stride = _span_stride(curve_type)
    n_spans = (cp.shape[0] - k) // stride + 1
    assert n_spans >= 1, (cp.shape, curve_type)
    assert (cp.shape[0] - k) % stride == 0, (
        f"{curve_type}: {cp.shape[0]} control points leave a partial "
        f"trailing span (need k={k} + m*{stride})")
    coef = np.zeros((n_spans, 4, 3), np.float64)
    rcoef = np.zeros((n_spans, 4), np.float64)
    for s in range(n_spans):
        c0 = s * stride
        coef[s, :k] = B @ cp[c0:c0 + k]
        rcoef[s, :k] = B @ rr[c0:c0 + k]
    # sampled bounds + sag widening
    m = 16
    u = np.linspace(0.0, 1.0, m + 1)
    pw = np.stack([u**j for j in range(4)], axis=-1)  # [m+1, 4]
    pos = np.einsum("uj,sjd->sud", pw, coef)  # [S, m+1, 3]
    rad = np.einsum("uj,sj->su", pw, rcoef)  # [S, m+1]
    sag = (np.abs(2.0 * coef[:, 2]) + 6.0 * np.abs(coef[:, 3])) / (8 * m * m)
    rsag = (np.abs(2.0 * rcoef[:, 2]) + 6.0 * np.abs(rcoef[:, 3])) / (8 * m * m)
    pad = sag + (np.max(rad, axis=1) + rsag)[:, None] + 1e-6
    lo = pos.min(axis=1) - pad
    hi = pos.max(axis=1) + pad
    return CurveSpans(
        coef=jnp.asarray(coef, jnp.float32),
        rcoef=jnp.asarray(rcoef, jnp.float32),
        lo=jnp.asarray(lo, jnp.float32), hi=jnp.asarray(hi, jnp.float32),
        material=material)


def _span_eval(coef, rcoef, u):
    """P, P', P'', r, r', r'' at u. coef [..., 4, 3], rcoef [..., 4],
    u [...] -> tuples of [..., 3] / [...]."""
    u = u[..., None]
    c0, c1, c2, c3 = (coef[..., j, :] for j in range(4))
    p = c0 + u * (c1 + u * (c2 + u * c3))
    dp = c1 + u * (2.0 * c2 + 3.0 * u * c3)
    ddp = 2.0 * c2 + 6.0 * u * c3
    ur = u[..., 0]
    r0, r1, r2, r3 = (rcoef[..., j] for j in range(4))
    r = r0 + ur * (r1 + ur * (r2 + ur * r3))
    dr = r1 + ur * (2.0 * r2 + 3.0 * ur * r3)
    ddr = 2.0 * r2 + 6.0 * ur * r3
    return p, dp, ddp, r, dr, ddr


def intersect_swept_sphere_span(coef, rcoef, o, d, t_min, t_max,
                                n_seeds: int = 8, n_newton: int = 12):
    """Exact closest hit of rays [R, 3] against ONE swept-sphere span per
    ray (coef [R, 4, 3], rcoef [R, 4]). Returns (hit, t, normal, u).

    Multi-seeded damped Newton on the canal-surface system; endpoint
    spheres at u = 0, 1 close the caps (same union-of-spheres semantics
    as intersect_round_linear)."""
    eps = 1e-5
    d2 = jnp.sum(d * d, axis=-1)

    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    best_u = jnp.zeros_like(best_t)
    found = jnp.zeros(o.shape[:1], bool)

    # scale for the residual acceptance: |F1| compares squared lengths,
    # normalize by (r + |q|)^2-ish scale ~ r^2
    for i in range(n_seeds):
        u = jnp.full(o.shape[:1], (i + 0.5) / n_seeds)
        p, dp, _, r, _, _ = _span_eval(coef, rcoef, u)
        # Seed t at the ENTRY of the local sphere, not the projection of
        # the axis point: projection makes q.d == 0 exactly, so df1/dt
        # vanishes at the first Newton step and (for rays perpendicular
        # to the axis, where d.dp == 0 too) the Jacobian is singular —
        # the trivial cylinder case used to miss for exactly this reason.
        # Backing off by r biases every seed toward the entry root.
        t = (jnp.sum((p - o) * d, axis=-1) - r * jnp.sqrt(d2)) \
            / jnp.maximum(d2, 1e-20)
        for _ in range(n_newton):
            p, dp, ddp, r, dr, ddr = _span_eval(coef, rcoef, u)
            q = o + t[:, None] * d - p
            f1 = jnp.sum(q * q, axis=-1) - r * r
            f2 = jnp.sum(q * dp, axis=-1) + r * dr
            a11 = 2.0 * jnp.sum(q * d, axis=-1)
            a12 = -2.0 * f2
            a21 = jnp.sum(d * dp, axis=-1)
            a22 = (-jnp.sum(dp * dp, axis=-1) + jnp.sum(q * ddp, axis=-1)
                   + dr * dr + r * ddr)
            det = a11 * a22 - a12 * a21
            safe = jnp.where(jnp.abs(det) < 1e-12,
                             jnp.where(det < 0, -1e-12, 1e-12), det)
            dt = (f1 * a22 - f2 * a12) / safe
            du = (a11 * f2 - a21 * f1) / safe
            # damp: cap the u step to keep seeds in their basin
            du = jnp.clip(du, -0.25, 0.25)
            t = t - dt
            u = jnp.clip(u - du, -0.05, 1.05)
        p, dp, _, r, dr, _ = _span_eval(coef, rcoef, u)
        q = o + t[:, None] * d - p
        f1 = jnp.sum(q * q, axis=-1) - r * r
        f2 = jnp.sum(q * dp, axis=-1) + r * dr
        scale = jnp.maximum(r * r, 1e-12)
        dscale = jnp.maximum(
            jnp.sqrt(jnp.sum(dp * dp, axis=-1)) * jnp.maximum(r, 1e-6), 1e-12)
        ok = ((jnp.abs(f1) < 1e-3 * scale) & (jnp.abs(f2) < 1e-3 * dscale)
              & (u > -eps) & (u < 1.0 + eps)
              & (t > t_min) & (t < best_t))
        best_t = jnp.where(ok, t, best_t)
        best_u = jnp.where(ok, u, best_u)
        found = found | ok

    # endpoint cap spheres (u = 0 and u = 1)
    for ue in (0.0, 1.0):
        u = jnp.full(o.shape[:1], ue)
        p, _, _, r, _, _ = _span_eval(coef, rcoef, u)
        oc = o - p
        b = jnp.sum(oc * d, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - r * r
        disc = b * b - d2 * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b - sq) / jnp.maximum(d2, 1e-20)
        t1 = (-b + sq) / jnp.maximum(d2, 1e-20)
        for tc in (t0, t1):
            ok = (disc >= 0) & (tc > t_min) & (tc < best_t)
            best_t = jnp.where(ok, tc, best_t)
            best_u = jnp.where(ok, u, best_u)
            found = found | ok

    # normal: (x - P(u)) / r(u) — exact for both envelope and cap points
    p, _, _, r, _, _ = _span_eval(coef, rcoef, best_u)
    x = o + best_t[:, None] * d
    n = (x - p) / jnp.maximum(r, 1e-12)[:, None]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return found, best_t, n, jnp.clip(best_u, 0.0, 1.0)


def intersect_curve_spans(geom: CurveSpans, o, d, t_min=1e-4,
                          t_max=1e30, k_candidates: int = 4) -> CurveHit:
    """Closest hit against every span, streamed nearest-first by span
    AABB entry (no silent candidate cap — same driver as
    intersect_curve_segments)."""
    from gfxexp_tpu.techniques.tfdm import iterate_candidates

    n_rays = o.shape[0]
    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    state0 = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,)),
        jnp.full((n_rays,), -1, jnp.int32),
        jnp.zeros((n_rays, 3), jnp.float32),
        jnp.zeros((n_rays,), jnp.float32),
    )

    def process(state, cid, near, far):
        best_t, best_prim, best_n, best_u = state
        b = jnp.maximum(cid, 0)
        hit, t, n, u = intersect_swept_sphere_span(
            geom.coef[b], geom.rcoef[b], o, d, t_min=t_min_v,
            t_max=best_t)
        take = (cid >= 0) & hit & (t < best_t)
        return (jnp.where(take, t, best_t),
                jnp.where(take, cid, best_prim),
                jnp.where(take[:, None], n, best_n),
                jnp.where(take, u, best_u))

    best_t, best_prim, best_n, best_u = iterate_candidates(
        geom.lo, geom.hi, o, d, t_min, t_max, k_candidates, state0,
        process, lambda st: st[0])
    return CurveHit(
        t=best_t, hit=best_prim >= 0,
        position=o + best_t[:, None] * d,
        normal=best_n,
        uv=jnp.stack([best_u, jnp.full_like(best_u, 0.5)], axis=-1),
        prim=best_prim,
    )
