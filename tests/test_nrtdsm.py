"""NRTDSM math tests — assertion versions of the reference's sandbox checks
(nrtdsm_sandbox.cpp: testSolveCubicEquation:473, testFindHeight:572,
testComputeCanonicalSpaceRayCoeffs:745, testRayVsPrism:1721)."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.techniques.nrtdsm import \
    test_ray_vs_prism as ray_vs_prism  # noqa: alias (pytest collection)
from gfxexp_tpu.techniques.nrtdsm import (
    build_nrtdsm_geometry,
    compute_canonical_space_ray_coeffs,
    eval_cubic,
    find_height,
    intersect_nrtdsm,
    shell_point,
    solve_cubic_in_interval,
)
from gfxexp_tpu.techniques.tfdm import DisplacementParameters


def test_solve_cubic(rng_np):
    """Random cubics with a known root inside the interval."""
    n = 256
    root = rng_np.uniform(0.1, 0.9, n).astype(np.float32)
    k3 = rng_np.uniform(-2, 2, n).astype(np.float32)
    k2 = rng_np.uniform(-2, 2, n).astype(np.float32)
    k1 = rng_np.uniform(0.5, 2, n).astype(np.float32)  # keep slope nonzero
    # construct k0 so that f(root) = 0
    k0 = -(k1 * root + k2 * root**2 + k3 * root**3)
    coeffs = jnp.stack([k0, k1, k2, k3], axis=-1)
    x, found = solve_cubic_in_interval(
        coeffs, jnp.zeros(n), jnp.ones(n))
    found = np.asarray(found)
    assert found.mean() > 0.95  # a few multi-root cubics may bracket oddly
    residual = np.abs(np.asarray(eval_cubic(coeffs, x)))[found]
    assert residual.max() < 1e-3


def test_find_height_roundtrip(rng_np):
    """Points constructed as S(b1, b2, h) must recover (h, b1, b2)."""
    n = 128
    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.1])
    p_c = jnp.asarray([0.2, 0.0, 1.0])
    n_a = jnp.asarray([0.2, 1.0, 0.0]) / np.linalg.norm([0.2, 1.0, 0.0])
    n_b = jnp.asarray([0.0, 1.0, 0.2]) / np.linalg.norm([0.0, 1.0, 0.2])
    n_c = jnp.asarray([-0.1, 1.0, 0.0]) / np.linalg.norm([-0.1, 1.0, 0.0])
    b1 = jnp.asarray(rng_np.uniform(0.05, 0.6, n), jnp.float32)
    b2 = jnp.asarray(rng_np.uniform(0.05, 0.35, n), jnp.float32)
    h = jnp.asarray(rng_np.uniform(0.05, 0.45, n), jnp.float32)
    x = shell_point(p_a, p_b, p_c, n_a, n_b, n_c, b1, b2, h)
    h2, b1r, b2r, found = find_height(
        p_a, p_b, p_c, n_a, n_b, n_c, x,
        jnp.zeros(n), jnp.full((n,), 0.5))
    assert np.asarray(found).all()
    assert np.allclose(np.asarray(h2), np.asarray(h), atol=2e-3)
    assert np.allclose(np.asarray(b1r), np.asarray(b1), atol=5e-3)
    assert np.allclose(np.asarray(b2r), np.asarray(b2), atol=5e-3)


def test_canonical_ray_coeffs_consistency(rng_np):
    """alpha(h), beta(h) from the rational quadratics must match the
    barycentrics of the point where the ray crosses the height-h plane."""
    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.0])
    p_c = jnp.asarray([0.0, 0.0, 1.0])
    n_a = jnp.asarray([0.1, 1.0, 0.0]) / np.linalg.norm([0.1, 1.0, 0.0])
    n_b = jnp.asarray([0.0, 1.0, 0.1]) / np.linalg.norm([0.0, 1.0, 0.1])
    n_c = jnp.asarray([-0.1, 1.0, -0.1]) / np.linalg.norm([-0.1, 1.0, -0.1])
    o = jnp.asarray([[0.3, 1.0, 0.3]])
    d = jnp.asarray([[0.1, -1.0, 0.05]])
    d = d / jnp.linalg.norm(d)
    # e0, e1 orthogonal to d
    e0 = jnp.cross(d[0], jnp.asarray([0.0, 0.0, 1.0]))
    e0 = e0 / jnp.linalg.norm(e0)
    e1 = jnp.cross(d[0], e0)
    bc2, bc1, bc0, dn2, dn1, dn0 = compute_canonical_space_ray_coeffs(
        o, e0, e1, p_a[None], p_b[None], p_c[None],
        n_a[None], n_b[None], n_c[None])
    for h in (0.1, 0.25, 0.4):
        denom = dn2 * h * h + dn1 * h + dn0
        alpha = (bc2[..., 0] * h * h + bc1[..., 0] * h + bc0[..., 0]) / denom
        beta = (bc2[..., 1] * h * h + bc1[..., 1] * h + bc0[..., 1]) / denom
        # ground truth: intersect the ray with the plane of the height-h
        # triangle and solve barycentrics
        a_h = np.asarray(p_a + h * n_a)
        b_h = np.asarray(p_b + h * n_b)
        c_h = np.asarray(p_c + h * n_c)
        nrm = np.cross(b_h - a_h, c_h - a_h)
        t = np.dot(a_h - np.asarray(o[0]), nrm) / np.dot(np.asarray(d[0]), nrm)
        x = np.asarray(o[0]) + t * np.asarray(d[0])
        m = np.stack([b_h - a_h, c_h - a_h], axis=1)
        coef, *_ = np.linalg.lstsq(m, x - a_h, rcond=None)
        assert abs(float(alpha[0]) - coef[0]) < 1e-3, (h, float(alpha[0]), coef)
        assert abs(float(beta[0]) - coef[1]) < 1e-3


def test_prism_interval():
    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.0])
    p_c = jnp.asarray([0.0, 0.0, 1.0])
    up = jnp.asarray([0.0, 1.0, 0.0])
    o = jnp.asarray([[0.2, 2.0, 0.2], [5.0, 2.0, 5.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    near, far, hit = ray_vs_prism(
        o, d, p_a, p_b, p_c, up, up, up, 0.0, 0.5, 1e-4, 1e30)
    assert bool(hit[0]) and not bool(hit[1])
    assert abs(float(near[0]) - 1.5) < 1e-3  # enters at y=0.5
    assert abs(float(far[0]) - 2.0) < 1e-3  # exits at y=0


def test_nonlinear_displacement_intersection():
    """Flat height c with TILTED vertex normals: the hit point must satisfy
    the exact shell equation x = S(b1, b2, c)."""
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
    tilt = np.array([[0.3, 1.0, 0.0], [0.0, 1.0, 0.3],
                     [-0.3, 1.0, 0.0], [0.0, 1.0, -0.3]], np.float32)
    tilt /= np.linalg.norm(tilt, axis=-1, keepdims=True)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    c = 0.3
    geom = build_nrtdsm_geometry(
        positions, indices, uvs, np.full((16, 16), c, np.float32),
        params=DisplacementParameters(), normals=tilt)
    o = jnp.asarray([[0.4, 1.5, 0.45], [0.6, 1.5, 0.5]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.02, -1.0, 0.01]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_nrtdsm(geom, o, d)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    # verify the hit satisfies the shell equation: its recovered height == c
    x = np.asarray(hit.position)
    from gfxexp_tpu.techniques.nrtdsm import find_height

    for i in range(2):
        b = int(hit.prim[i])
        h, b1, b2, found = find_height(
            geom.p0[b], geom.p1[b], geom.p2[b],
            geom.n0[b], geom.n1[b], geom.n2[b],
            jnp.asarray(x[i : i + 1]),
            jnp.zeros(1), jnp.full((1,), 0.6))
        assert bool(found[0])
        assert abs(float(h[0]) - c) < 5e-3, float(h[0])
    assert np.all(np.asarray(hit.steps) > 0)


def test_interval_affine_inclusion():
    """Interval/affine library (core/interval.py, reference
    affine_arithmetic.h): bounds must CONTAIN dense samples of random
    quadratics, and affine bounds must be tighter than naive interval
    evaluation (the correlation between h and h^2)."""
    from gfxexp_tpu.core.interval import (
        aa_poly2,
        aa_to_iv,
        aa_var,
        iv,
        iv_add,
        iv_mul,
        iv_sqr,
    )

    rng = np.random.default_rng(17)
    c2 = rng.normal(size=32).astype(np.float32)
    c1 = rng.normal(size=32).astype(np.float32)
    c0 = rng.normal(size=32).astype(np.float32)
    lo = rng.uniform(-2, 1, 32).astype(np.float32)
    hi = lo + rng.uniform(0.1, 2, 32).astype(np.float32)

    h = aa_var(jnp.asarray(lo), jnp.asarray(hi), 0, 1)
    blo, bhi = aa_to_iv(aa_poly2(jnp.asarray(c2), jnp.asarray(c1),
                                 jnp.asarray(c0), h))
    ts = np.linspace(0, 1, 257)[None]
    xs = lo[:, None] + (hi - lo)[:, None] * ts
    vals = c2[:, None] * xs**2 + c1[:, None] * xs + c0[:, None]
    assert np.all(np.asarray(blo)[:, None] <= vals + 1e-4)
    assert np.all(np.asarray(bhi)[:, None] >= vals - 1e-4)

    # naive interval evaluation for comparison
    x_iv = iv(jnp.asarray(lo), jnp.asarray(hi))
    naive = iv_add(iv_add(iv_mul(iv(jnp.asarray(c2)), iv_sqr(x_iv)),
                          iv_mul(iv(jnp.asarray(c1)), x_iv)),
                   iv(jnp.asarray(c0)))
    w_aa = np.asarray(bhi - blo)
    w_iv = np.asarray(naive[1] - naive[0])
    # affine forms are tighter ON AVERAGE (they can be wider for ranges
    # straddling zero, where iv_sqr's zero-floor beats the condensed
    # quadratic term — a known AA property)
    assert w_aa.mean() < 0.95 * w_iv.mean()


def _curve_setup(rng):
    """A tilted prism + world rays -> texture-space curve coefficients
    and a dense oracle evaluation of the curve."""
    from gfxexp_tpu.techniques.nrtdsm import (
        compute_canonical_space_ray_coeffs,
        compute_texture_space_ray_coeffs,
    )

    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.1])
    p_c = jnp.asarray([0.2, 0.0, 1.0])
    n_a = jnp.asarray([0.3, 1.0, 0.0])
    n_b = jnp.asarray([0.0, 1.0, 0.25])
    n_c = jnp.asarray([-0.2, 1.0, -0.1])
    n_a, n_b, n_c = (x / jnp.linalg.norm(x) for x in (n_a, n_b, n_c))
    tc_a = jnp.asarray([0.0, 0.0])
    tc_b = jnp.asarray([1.0, 0.0])
    tc_c = jnp.asarray([0.0, 1.0])
    o = jnp.asarray([0.45, 1.2, 0.35])
    dvec = jnp.asarray([-0.2, -1.0, 0.15])
    dvec = dvec / jnp.linalg.norm(dvec)
    # e0/e1 span the plane orthogonal to the ray
    up = jnp.asarray([1.0, 0.0, 0.0])
    e0 = jnp.cross(dvec, up)
    e0 = e0 / jnp.linalg.norm(e0)
    e1 = jnp.cross(dvec, e0)
    bc2, bc1, bc0, d2, d1, d0 = compute_canonical_space_ray_coeffs(
        o, e0, e1, p_a, p_b, p_c, n_a, n_b, n_c)
    tc2, tc1, tc0 = compute_texture_space_ray_coeffs(
        tc_a, tc_b, tc_c, bc2, bc1, bc0, d2, d1, d0)

    def curve_uv(h):
        den = d2 * h * h + d1 * h + d0
        return np.stack(
            [np.asarray(tc2[..., i]) * h * h + np.asarray(tc1[..., i]) * h
             + np.asarray(tc0[..., i]) for i in (0, 1)], -1) / den[..., None]

    return (tc2, tc1, tc0, d2, d1, d0), curve_uv


def test_nonlinear_ray_vs_aabb_inclusion():
    """The AA curve bounds contain the true curve: any texel box touched
    by dense curve samples must report overlap, and a far-away box must
    not (the bound is tight enough to cull)."""
    from gfxexp_tpu.techniques.nrtdsm import nonlinear_ray_vs_aabb

    rng = np.random.default_rng(7)
    coeffs, curve_uv = _curve_setup(rng)
    tc2, tc1, tc0, d2, d1, d0 = coeffs
    h_lo, h_hi = jnp.float32(0.05), jnp.float32(0.35)
    hs = np.linspace(0.05, 0.35, 300)
    uvs = curve_uv(hs)  # [300, 2]

    # boxes containing curve samples MUST overlap
    for i in (0, 150, 299):
        blo = jnp.asarray([uvs[i, 0] - 0.01, uvs[i, 1] - 0.01,
                           hs[i] - 0.01])
        bhi = jnp.asarray([uvs[i, 0] + 0.01, uvs[i, 1] + 0.01,
                           hs[i] + 0.01])
        ok = nonlinear_ray_vs_aabb(tc2, tc1, tc0, d2, d1, d0,
                                   h_lo, h_hi, blo, bhi)
        assert bool(ok), i
    # a box far outside the curve's uv range must be culled
    span = uvs.max(0) - uvs.min(0)
    blo = jnp.asarray([uvs[:, 0].max() + 3 * span[0] + 0.5,
                       uvs[:, 1].min(), 0.0])
    bhi = blo + 0.05
    assert not bool(nonlinear_ray_vs_aabb(tc2, tc1, tc0, d2, d1, d0,
                                          h_lo, h_hi, blo, bhi))


def test_nonlinear_ray_vs_micro_triangle_exact():
    """The cubic-substitution root matches a dense-march oracle of the
    curve crossing a texture-space triangle."""
    from gfxexp_tpu.techniques.nrtdsm import nonlinear_ray_vs_micro_triangle

    rng = np.random.default_rng(7)
    coeffs, curve_uv = _curve_setup(rng)
    tc2, tc1, tc0, d2, d1, d0 = coeffs
    hs = np.linspace(0.05, 0.35, 4001)
    uvs = curve_uv(hs)

    # build a triangle in (u, v, h) that the curve pierces at h ~ 0.2:
    # take the curve point there and spread a triangle around it at a
    # slightly tilted plane h = 0.2 + 0.3 (u - u0)
    i0 = 2000
    u0, v0 = uvs[i0]
    pa = jnp.asarray([u0 - 0.08, v0 - 0.05, 0.2 + 0.3 * (-0.08)])
    pb = jnp.asarray([u0 + 0.10, v0 - 0.05, 0.2 + 0.3 * (0.10)])
    pc = jnp.asarray([u0 + 0.00, v0 + 0.12, 0.2 + 0.3 * (0.00)])
    hit, h_root, b1, b2 = nonlinear_ray_vs_micro_triangle(
        tc2, tc1, tc0, d2, d1, d0, pa, pb, pc,
        jnp.float32(0.05), jnp.float32(0.35))
    assert bool(hit)

    # oracle: march the curve, find where it crosses the triangle plane
    n = np.cross(np.asarray(pb - pa), np.asarray(pc - pa))
    cpl = float(np.dot(n, np.asarray(pa)))
    fvals = (n[0] * uvs[:, 0] + n[1] * uvs[:, 1] + n[2] * hs) - cpl
    sgn = np.sign(fvals)
    crossings = np.nonzero(sgn[:-1] != sgn[1:])[0]
    assert crossings.size >= 1
    h_oracle = hs[crossings[0]]
    assert abs(float(h_root) - h_oracle) < 2e-4, (float(h_root), h_oracle)

    # a triangle the curve misses (shifted far in u) must not hit
    off = jnp.asarray([5.0, 0.0, 0.0])
    hit2, _, _, _ = nonlinear_ray_vs_micro_triangle(
        tc2, tc1, tc0, d2, d1, d0, pa + off, pb + off, pc + off,
        jnp.float32(0.05), jnp.float32(0.35))
    assert not bool(hit2)


def _plane_geom_nrtdsm(height, params=None, normals=None):
    from gfxexp_tpu.techniques.nrtdsm import build_nrtdsm_geometry

    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
    if normals is None:
        normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    return build_nrtdsm_geometry(positions, indices, uvs, height,
                                 params=params, normals=normals)


def test_nrtdsm_exact_flat_analytic():
    """Exact narrow phase on a constant-height field: hit t must match
    the analytic plane distance to near float precision (the exact cubic
    root, not a bisection estimate)."""
    from gfxexp_tpu.techniques.nrtdsm import intersect_nrtdsm_exact
    from gfxexp_tpu.techniques.tfdm import DisplacementParameters

    s = 32
    height = np.full((s, s), 0.5, np.float32)
    geom = _plane_geom_nrtdsm(height,
                              DisplacementParameters(h_scale=0.4))
    rng = np.random.default_rng(2)
    n = 64
    o = np.stack([rng.uniform(0.15, 0.85, n), np.full(n, 1.5),
                  rng.uniform(0.15, 0.85, n)], -1).astype(np.float32)
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    h = intersect_nrtdsm_exact(geom, jnp.asarray(o), jnp.asarray(d))
    assert np.asarray(h.hit).all()
    t_exact = 1.5 - 0.5 * 0.4
    assert np.allclose(np.asarray(h.t), t_exact, atol=2e-4), \
        np.abs(np.asarray(h.t) - t_exact).max()
    assert np.allclose(np.asarray(h.normal)[:, 1], 1.0, atol=1e-3)


def test_nrtdsm_exact_agrees_with_v2():
    """Exact TwoTriangle intersector vs the bilinear march on a smooth
    bump field with TILTED normals (curved shells): hits and distances
    agree within the bilinear-vs-two-triangle surface difference."""
    from gfxexp_tpu.techniques.nrtdsm import (
        intersect_nrtdsm_exact,
        intersect_nrtdsm_v2,
    )
    from gfxexp_tpu.techniques.tfdm import DisplacementParameters

    s = 64
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    height = (0.5 + 0.4 * np.sin(xx * 0.25) * np.cos(yy * 0.2)) \
        .astype(np.float32)
    normals = np.array([[0.2, 1, 0], [0, 1, 0.2], [-0.2, 1, 0],
                        [0, 1, -0.2]], np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    geom = _plane_geom_nrtdsm(height, DisplacementParameters(h_scale=0.3),
                              normals=normals)
    rng = np.random.default_rng(8)
    n = 128
    o = np.stack([rng.uniform(0.1, 0.9, n), np.full(n, 1.2),
                  rng.uniform(0.1, 0.9, n)], -1).astype(np.float32)
    to = np.stack([rng.uniform(0.2, 0.8, n), np.zeros(n),
                   rng.uniform(0.2, 0.8, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    he = intersect_nrtdsm_exact(geom, oj, dj, n_h=96)
    hv = intersect_nrtdsm_v2(geom, oj, dj)
    m_e = np.asarray(he.hit)
    m_v = np.asarray(hv.hit)
    assert m_v.mean() > 0.9  # rays aimed at the surface
    agree = (m_e == m_v).mean()
    assert agree > 0.95, agree
    both = m_e & m_v
    dt = np.abs(np.asarray(he.t)[both] - np.asarray(hv.t)[both])
    # the two local surface types differ by patch curvature (~(0.4*0.3)
    # over 2.5-texel wavelengths); distances must agree to that order
    assert np.quantile(dt, 0.9) < 2e-2, np.quantile(dt, 0.9)


def test_nrtdsm_exact_ordered_matches_flat():
    """The MipMapStack-ordered walk (minmax gate first, exact cubic solves
    only at occupied h segments — reference nearest-first descent,
    nrtdsm_intersection_kernels.h:1523-1630) must produce IDENTICAL hits
    to the legacy flat march that ran the solve for every segment, and
    must report the same per-ray occupied-segment counts (its loop trip
    count is max-over-rays of that number, vs always n_h before)."""
    from gfxexp_tpu.techniques.nrtdsm import intersect_nrtdsm_exact
    from gfxexp_tpu.techniques.tfdm import DisplacementParameters

    s = 64
    height = np.zeros((s, s), np.float32)
    height[20:24, 20:24] = 1.0  # sparse: most h segments gate out
    height[40:44, 8:60] = 0.6
    geom = _plane_geom_nrtdsm(height, DisplacementParameters(h_scale=0.35))
    rng = np.random.default_rng(9)
    n = 96
    o = np.stack([rng.uniform(0.05, 0.95, n), np.full(n, 1.1),
                  rng.uniform(0.05, 0.95, n)], -1).astype(np.float32)
    to = np.stack([rng.uniform(0.1, 0.9, n), np.zeros(n),
                   rng.uniform(0.1, 0.9, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    h_ord = intersect_nrtdsm_exact(geom, oj, dj, ordered=True)
    h_flat = intersect_nrtdsm_exact(geom, oj, dj, ordered=False)
    assert (np.asarray(h_ord.hit) == np.asarray(h_flat.hit)).all()
    both = np.asarray(h_ord.hit)
    assert both.sum() > 10, both.sum()
    assert np.allclose(np.asarray(h_ord.t)[both],
                       np.asarray(h_flat.t)[both], atol=1e-5)
    assert (np.asarray(h_ord.steps) == np.asarray(h_flat.steps)).all()
    # sparse map: typically a handful of occupied segments per ray vs the
    # n_h=64-per-candidate the flat walk always solved (a few rays whose
    # h-band tracks a wall stay dense — judge by the distribution)
    steps = np.asarray(h_ord.steps)
    assert float(np.median(steps)) <= 4, np.median(steps)
    assert float(steps.mean()) < 16, steps.mean()


def test_nrtdsm_exact_in_pipeline():
    """LOCAL_INTERSECTION_TWO_TRIANGLE routes NRTDSM geometry through the
    exact intersector inside the common path tracer."""
    import sys

    sys.path.insert(0, "tests")
    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.techniques.tfdm import (
        DisplacementParameters,
        LOCAL_INTERSECTION_TWO_TRIANGLE,
    )

    s = 32
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    height = (0.5 + 0.4 * np.sin(xx * 0.5)).astype(np.float32)
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]

    b = SceneBuilder()
    lamp = b.add_lambert_material((0, 0, 0), emittance=(60.0,) * 3)
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(b.add_rectangle(0.6, 0.6, lamp),
                   affine(rotation=flip, translation=[0.5, 1.8, 0.5]))
    mat = b.add_lambert_material((0.6, 0.55, 0.5))
    b.add_displaced(
        positions, indices, uvs, height,
        params=DisplacementParameters(
            h_scale=0.25,
            local_intersection_type=LOCAL_INTERSECTION_TWO_TRIANGLE),
        material=mat, kind="nrtdsm")
    scene, bvh = compile_scene(b, traversal="widerow")
    cam = make_camera([0.5, 1.0, 1.6], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0.5, 0.1, 0.5])
    img = np.asarray(render_sample(scene, bvh, cam, 20, 20, jnp.uint32(1),
                                   PTConfig(max_path_length=2)))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3
