"""Curve evaluator + Perlin noise tests (reference: curve_evaluator.h,
common_shared.h PerlinNoise)."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.core.curves import (
    CURVE_BEZIER,
    CURVE_CATMULL_ROM,
    CURVE_CUBIC_BSPLINE,
    CURVE_LINEAR,
    CURVE_QUADRATIC_BSPLINE,
    evaluate,
    evaluate_derivative,
    surface_normal,
    tessellate_curve,
)
from gfxexp_tpu.core.noise import multi_octave_perlin3d, perlin3d


def test_linear_curve():
    cp = jnp.asarray([[[0.0, 0, 0], [2.0, 0, 0]]])
    pos, rad = evaluate(CURVE_LINEAR, cp, jnp.asarray([0.25]),
                        radii=jnp.asarray([[0.1, 0.3]]))
    assert np.allclose(np.asarray(pos), [[0.5, 0, 0]], atol=1e-6)
    assert np.allclose(np.asarray(rad), [0.15], atol=1e-6)


def test_bezier_endpoints_and_tangent():
    cp = jnp.asarray([[[0.0, 0, 0], [0, 1, 0], [1, 1, 0], [1.0, 0, 0]]])
    p0, _ = evaluate(CURVE_BEZIER, cp, jnp.asarray([0.0]))
    p1, _ = evaluate(CURVE_BEZIER, cp, jnp.asarray([1.0]))
    assert np.allclose(np.asarray(p0), [[0, 0, 0]], atol=1e-6)
    assert np.allclose(np.asarray(p1), [[1, 0, 0]], atol=1e-6)
    d0 = evaluate_derivative(CURVE_BEZIER, cp, jnp.asarray([0.0]))
    # Bezier derivative at 0 = 3 (P1 - P0)
    assert np.allclose(np.asarray(d0), [[0, 3, 0]], atol=1e-5)


def test_bspline_partition_of_unity():
    """B-spline bases sum to 1: constant control points stay constant."""
    for ct, k in ((CURVE_QUADRATIC_BSPLINE, 3), (CURVE_CUBIC_BSPLINE, 4),
                  (CURVE_CATMULL_ROM, 4)):
        cp = jnp.broadcast_to(jnp.asarray([1.0, 2.0, 3.0]), (1, k, 3))
        for t in (0.0, 0.3, 0.7, 1.0):
            pos, _ = evaluate(ct, cp, jnp.asarray([t]))
            assert np.allclose(np.asarray(pos), [[1, 2, 3]], atol=1e-5), ct


def test_catmull_rom_interpolates():
    """Catmull-Rom passes through P1 at t=0 and P2 at t=1."""
    cp = jnp.asarray([[[0.0, 0, 0], [1, 1, 0], [2, 0, 0], [3, 2, 0]]])
    p0, _ = evaluate(CURVE_CATMULL_ROM, cp, jnp.asarray([0.0]))
    p1, _ = evaluate(CURVE_CATMULL_ROM, cp, jnp.asarray([1.0]))
    assert np.allclose(np.asarray(p0), [[1, 1, 0]], atol=1e-5)
    assert np.allclose(np.asarray(p1), [[2, 0, 0]], atol=1e-5)


def test_surface_normal_orthogonal_to_tangent():
    cp = jnp.asarray([[[0.0, 0, 0], [0, 1, 0], [1, 1, 0], [1.0, 0, 0]]])
    t = jnp.asarray([0.4])
    pos, _ = evaluate(CURVE_BEZIER, cp, t)
    hit = pos + jnp.asarray([[0.0, 0.0, 0.25]])
    n = surface_normal(CURVE_BEZIER, cp, t, hit)
    tang = evaluate_derivative(CURVE_BEZIER, cp, t)
    assert abs(float(jnp.sum(n * tang))) < 1e-4
    assert np.allclose(np.linalg.norm(np.asarray(n)), 1.0, atol=1e-5)


def test_tessellation_closed_tube():
    cp = np.array([[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]], np.float32)
    radii = np.array([0.1, 0.15, 0.15, 0.1], np.float32)
    v, n, f = tessellate_curve(CURVE_BEZIER, cp, radii, n_axial=6, n_radial=6)
    assert v.shape[0] == 7 * 6 and f.shape[0] == 6 * 6 * 2
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    # tube vertices lie at the expected radius from the axis
    pos0, rad0 = evaluate(CURVE_BEZIER, jnp.asarray(cp)[None],
                          jnp.asarray([0.0]), jnp.asarray(radii)[None])
    d = np.linalg.norm(v[:6] - np.asarray(pos0)[0], axis=-1)
    assert np.allclose(d, float(rad0[0]), atol=1e-5)


def test_perlin_properties(rng_np):
    p = jnp.asarray(rng_np.uniform(-10, 10, (5000, 3)), jnp.float32)
    n = np.asarray(perlin3d(p))
    assert np.abs(n).max() <= 1.5
    assert abs(n.mean()) < 0.05
    assert n.std() > 0.05  # actually varies
    # lattice points have zero noise (classic Perlin property)
    lattice = jnp.asarray(rng_np.integers(-5, 5, (64, 3)), jnp.float32)
    assert np.allclose(np.asarray(perlin3d(lattice)), 0.0, atol=1e-6)
    # deterministic
    assert np.allclose(np.asarray(perlin3d(p)), n)
    m = np.asarray(multi_octave_perlin3d(p, num_octaves=4))
    assert np.isfinite(m).all() and abs(m.mean()) < 0.05


def test_round_linear_direct_intersection():
    """Direct swept-sphere (round linear) intersection vs analytic cases
    (reference: OptiX round-linear curve primitive; we previously only
    tessellated)."""
    import jax.numpy as jnp

    from gfxexp_tpu.core.curves import intersect_round_linear

    p0 = np.array([0.0, 0.0, 0.0])
    p1 = np.array([2.0, 0.0, 0.0])
    # uniform radius: a capsule of radius 0.5
    o = jnp.asarray([[1.0, 0.0, 3.0],    # hits the side at z=0.5
                     [-0.4, 0.0, 3.0],   # hits the start cap sphere
                     [1.0, 2.0, 3.0],    # passes 2.0 off-axis: miss
                     [-1.0, 0.0, 3.0]])  # passes 1.0 from p0: miss
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 4)
    hit, t, n, s = intersect_round_linear(p0, 0.5, p1, 0.5, o, d)
    assert bool(hit[0]) and bool(hit[1])
    assert not bool(hit[2]) and not bool(hit[3])
    assert abs(float(t[0]) - 2.5) < 1e-4
    assert np.allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-4)
    # cap: sphere around p0, chord at offset 0.4 -> z = sqrt(0.25 - 0.16)
    assert abs(float(t[1]) - (3.0 - np.sqrt(0.09))) < 1e-4
    assert float(s[1]) == 0.0
    # cap normal is the SPHERE normal (x - p0)/r0, not a radial one
    assert np.allclose(np.asarray(n[1]), [-0.8, 0.0, 0.6], atol=1e-4)

    # cone case: different radii — hit point radius interpolates
    hit2, t2, n2, s2 = intersect_round_linear(
        p0, 0.2, p1, 0.6,
        jnp.asarray([[1.0, 0.0, 3.0]]), jnp.asarray([[0.0, 0.0, -1.0]]))
    assert bool(hit2[0])
    r_mid = 0.2 + (0.6 - 0.2) * float(s2[0])
    assert abs((3.0 - float(t2[0])) - r_mid) < 0.02
    # cone normal from the gradient of F = |x_perp|^2 - (r0 + dr*xa)^2: a
    # widening cone tilts the normal BACKWARD along the axis (-x here)
    dr = (0.6 - 0.2) / 2.0
    x_hit = np.array([1.0, 0.0, 3.0]) + float(t2[0]) * np.array([0, 0, -1.0])
    xa = x_hit[0]
    expect = x_hit - np.array([xa + dr * (0.2 + dr * xa), 0.0, 0.0])
    expect /= np.linalg.norm(expect)
    assert expect[0] < -0.1  # backward tilt
    assert np.allclose(np.asarray(n2[0]), expect, atol=1e-4)
    # finite-difference check of the implicit surface gradient
    def F(x):
        xa = x[0]
        return x[1] ** 2 + x[2] ** 2 - (0.2 + dr * xa) ** 2
    eps = 1e-4
    g = np.array([(F(x_hit + eps * e) - F(x_hit - eps * e)) / (2 * eps)
                  for e in np.eye(3)])
    g /= np.linalg.norm(g)
    assert np.allclose(np.asarray(n2[0]), g, atol=1e-3)


def test_curve_segments_pipeline_analytic():
    """CurveSegments streaming intersection (scene-level driver) against
    the analytic distance for perpendicular rays at a constant-radius
    segment, plus nearest-segment selection across a polyline."""
    from gfxexp_tpu.core.curves import (
        build_curve_segments,
        intersect_curve_segments,
    )

    # zig-zag polyline along x at y=0, constant radius
    cp = np.array([[0, 0, 0], [1, 0, 0], [2, 0.4, 0], [3, 0.0, 0]],
                  np.float32)
    r = np.full(4, 0.1, np.float32)
    geom = build_curve_segments(cp, r, material=7, curve_type="linear")
    assert geom.p0.shape[0] == 3

    # perpendicular rays from +z at x = 0.5 (segment 0 interior)
    o = jnp.asarray([[0.5, 0.0, 2.0], [2.5, 0.2, 2.0], [0.5, 5.0, 2.0]])
    d = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0], [0, 0, -1.0]])
    h = intersect_curve_segments(geom, o, d)
    assert bool(h.hit[0]) and bool(h.hit[1]) and not bool(h.hit[2])
    assert abs(float(h.t[0]) - (2.0 - 0.1)) < 1e-4
    assert int(h.prim[0]) == 0 and int(h.prim[1]) == 2
    # normal points back toward the ray origin (+z)
    assert float(h.normal[0, 2]) > 0.99


def test_curve_polyline_flattening_cubic():
    """Higher-order bases flatten to a round-linear polyline of the exact
    curve: hits land within the polyline chord error of the true curve."""
    from gfxexp_tpu.core.curves import (
        build_curve_segments,
        evaluate,
        intersect_curve_segments,
    )

    cp = np.array([[0, 0, 0], [1, 1, 0], [2, -1, 0], [3, 0, 0]], np.float32)
    r = np.full(4, 0.15, np.float32)
    geom = build_curve_segments(cp, r, curve_type="cubic_bspline",
                                n_subdiv=16)
    # ray at the span midpoint, from +z
    pos_mid, rad_mid = evaluate("cubic_bspline", jnp.asarray(cp)[None],
                                jnp.asarray([0.5]), radii=jnp.asarray(r)[None])
    pm = np.asarray(pos_mid)[0]
    o = jnp.asarray([[pm[0], pm[1], 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = intersect_curve_segments(geom, o, d)
    assert bool(h.hit[0])
    assert abs(float(h.t[0]) - (3.0 - float(rad_mid[0]))) < 5e-3


def test_curve_direct_render_vs_tube():
    """App-level: a direct round-linear curve renders through
    render_sample and matches the tube-tessellated version of the same
    curve (same silhouette up to tessellation error, shadows cast)."""
    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene

    cp = np.array([[-0.5, 0.25, 0], [0.5, 0.25, 0]], np.float32)
    rr = np.full(2, 0.18, np.float32)

    def build(direct):
        b = SceneBuilder()
        floor = b.add_lambert_material((0.8, 0.8, 0.8))
        red = b.add_lambert_material((0.8, 0.2, 0.2))
        light = b.add_lambert_material((0, 0, 0), emittance=(80.0,) * 3)
        fg = b.add_rectangle(2.0, 2.0, floor)
        b.add_instance(fg)
        lg = b.add_rectangle(0.5, 0.5, light)
        flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
        b.add_instance(lg, affine(rotation=flip, translation=[0, 1.5, 0]))
        b.add_curve(cp, rr, red, curve_type="linear", direct=direct,
                    n_radial=24, n_axial=4)
        if not direct:
            # tube geometry id is a triangle geometry: instance it
            b.add_instance(len(b.geometries) - 1)
        return compile_scene(b)

    cam = make_camera([0, 0.8, 1.6], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0, 0.2, 0])
    imgs = []
    for direct in (True, False):
        scene, bvh = build(direct)
        acc = np.zeros((48 * 48, 3), np.float64)
        for s in range(8):
            acc += np.asarray(render_sample(
                scene, bvh, cam, 48, 48, jnp.uint32(s),
                PTConfig(max_path_length=3)))
        imgs.append((acc / 8).reshape(48, 48, 3))
    im_direct, im_tube = imgs
    # both show the curve: red dominance in the image center rows
    def redness(im):
        c = im[18:30, 12:36]
        return (c[..., 0] / np.maximum(c.sum(-1), 1e-6)).mean()
    assert redness(im_direct) > 0.4, redness(im_direct)
    assert redness(im_tube) > 0.4
    # images agree to tessellation + MC error
    diff = np.abs(im_direct - im_tube).mean()
    scale = np.abs(im_tube).mean() + 1e-6
    assert diff / scale < 0.25, diff / scale


def test_exact_span_intersection_vs_dense_polyline():
    """The exact canal-surface span intersector (multi-seeded Newton,
    intersect_swept_sphere_span) must agree with a DENSE round-linear
    polyline of the same curve to well under the polyline's own chord
    error, across all higher-order bases and a fan of ray directions."""
    from gfxexp_tpu.core.curves import (
        build_curve_segments,
        build_curve_spans,
        intersect_curve_segments,
        intersect_curve_spans,
    )

    rng = np.random.default_rng(7)
    cp = np.array([[0, 0, 0], [1, 1.2, 0.3], [2, -0.8, -0.4], [3, 0.2, 0.5],
                   [4, 1.0, 0.0], [5, -0.3, 0.2], [6, 0.6, -0.1]], np.float32)
    r = np.array([0.22, 0.15, 0.3, 0.18, 0.25, 0.2, 0.17], np.float32)

    for ct in (CURVE_CUBIC_BSPLINE, CURVE_CATMULL_ROM, CURVE_BEZIER,
               CURVE_QUADRATIC_BSPLINE):
        k = 3 if ct == CURVE_QUADRATIC_BSPLINE else 4
        # 2 spans each: stride-1 bases need k+1 points; Bezier (stride 3)
        # needs k + 3 = 7 — a 5-point Bezier chain is malformed and now
        # asserts instead of silently dropping the trailing point
        n_cp = 7 if ct == CURVE_BEZIER else k + 1
        cpk, rk = cp[:n_cp], r[:n_cp]
        spans = build_curve_spans(cpk, rk, curve_type=ct)
        poly = build_curve_segments(cpk, rk, curve_type=ct, n_subdiv=256)

        n = 200
        o = rng.uniform(-1, 5, size=(n, 3)).astype(np.float32)
        o[:, 2] = rng.uniform(2.0, 4.0, size=n)
        # aim at jittered points ON the curve (B-splines do not interpolate
        # their control points, so a box-uniform target fan mostly misses
        # the tube entirely and the comparison has no statistical power)
        verts = np.asarray(poly.p0)
        tgt = verts[rng.integers(0, len(verts), size=n)].astype(np.float32)
        tgt += rng.normal(0.0, 0.25, size=(n, 3)).astype(np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        oj, dj = jnp.asarray(o), jnp.asarray(d)

        he = intersect_curve_spans(spans, oj, dj)
        hp = intersect_curve_segments(poly, oj, dj)

        hit_e = np.asarray(he.hit)
        hit_p = np.asarray(hp.hit)
        # the dense polyline inscribes the curve: every polyline hit must
        # be found by the exact intersector (tolerate <2% silhouette-edge
        # disagreements where the polyline chord pokes out)
        miss = hit_p & ~hit_e
        assert miss.mean() < 0.02, (ct, int(miss.sum()), int(hit_p.sum()))
        both = hit_e & hit_p
        assert both.sum() > 20, (ct, int(both.sum()))
        dt = np.abs(np.asarray(he.t) - np.asarray(hp.t))[both]
        assert np.percentile(dt, 90) < 5e-3, (ct, float(np.percentile(dt, 90)))
        # normals agree where both hit squarely
        ne = np.asarray(he.normal)[both]
        npl = np.asarray(hp.normal)[both]
        cos = np.sum(ne * npl, axis=-1)
        assert np.percentile(cos, 10) > 0.95, (ct, float(np.percentile(cos, 10)))


def test_exact_span_analytic_cylinder():
    """A 'cubic' span with collinear control points and constant radius is
    a cylinder: the exact intersector must match the analytic hit to
    float precision (not just polyline tolerance)."""
    from gfxexp_tpu.core.curves import (
        build_curve_spans,
        intersect_curve_spans,
    )

    # cubic B-spline with uniform collinear CPs traces the straight line
    cp = np.array([[i, 0, 0] for i in range(4)], np.float32)
    r = np.full(4, 0.3, np.float32)
    spans = build_curve_spans(cp, r, curve_type=CURVE_CUBIC_BSPLINE)
    # span covers x in [1, 2]; fire perpendicular rays at x = 1.5
    o = jnp.asarray([[1.5, 0.0, 2.0], [1.5, 0.2, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    h = intersect_curve_spans(spans, o, d)
    assert bool(h.hit[0]) and bool(h.hit[1])
    assert abs(float(h.t[0]) - (2.0 - 0.3)) < 1e-4
    # chord at y=0.2: z = sqrt(r^2 - y^2)
    zc = np.sqrt(0.3**2 - 0.2**2)
    assert abs(float(h.t[1]) - (2.0 - zc)) < 1e-4
    n = np.asarray(h.normal)
    assert np.allclose(n[0], [0, 0, 1], atol=1e-3)
