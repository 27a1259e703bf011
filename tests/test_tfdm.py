"""TFDM tests: displaced-surface intersection against analytic expectations
(SURVEY.md §4 — replaces tfdm_sandbox.cpp's visual checks with assertions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.techniques.tfdm import (
    DisplacementParameters,
    LOCAL_INTERSECTION_BILINEAR,
    LOCAL_INTERSECTION_TWO_TRIANGLE,
    build_minmax_mipmap,
    build_tfdm_geometry,
    intersect_tfdm,
)


def _plane_geom(height, params=None):
    """Unit XZ plane at y=0 (+Y normal), uv = (x, z) in [0,1]."""
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    return build_tfdm_geometry(positions, indices, uvs, height,
                               params=params, normals=normals)


def test_minmax_mipmap():
    h = np.zeros((8, 8), np.float32)
    h[2, 3] = 1.0
    mm = build_minmax_mipmap(h)
    assert mm.n_levels == 4
    top = np.asarray(mm.levels[3, 0, 0])
    assert top[0] == 0.0 and top[1] == 1.0
    l1 = np.asarray(mm.levels[1, :4, :4])
    assert l1[1, 1, 1] == 1.0  # the texel's 2x2 block carries the max


def test_flat_displacement_hit():
    """Constant height c: the displaced plane sits at y = c exactly."""
    c = 0.25
    geom = _plane_geom(np.full((16, 16), c, np.float32))
    o = jnp.asarray([[0.3, 1.0, 0.4], [0.7, 1.0, 0.6]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    hit = intersect_tfdm(geom, o, d)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    assert np.allclose(np.asarray(hit.t), 1.0 - c, atol=2e-3)
    assert np.allclose(np.asarray(hit.normal), [[0, 1, 0], [0, 1, 0]], atol=1e-2)
    assert np.all(np.asarray(hit.steps) > 0)


def test_height_scale_offset_bias():
    """height = hOffset + hScale*(h - hBias) (reference:
    tfdm_intersection_kernels.h:58-59)."""
    geom = _plane_geom(
        np.full((16, 16), 0.5, np.float32),
        params=DisplacementParameters(h_offset=0.1, h_scale=0.4, h_bias=0.25))
    expected = 0.1 + 0.4 * (0.5 - 0.25)  # = 0.2
    o = jnp.asarray([[0.5, 1.0, 0.5]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    hit = intersect_tfdm(geom, o, d)
    assert bool(hit.hit[0])
    assert np.allclose(float(hit.t[0]), 1.0 - expected, atol=2e-3)


@pytest.mark.parametrize("lit", [LOCAL_INTERSECTION_TWO_TRIANGLE,
                                 LOCAL_INTERSECTION_BILINEAR])
def test_bump_profile(lit):
    """A centered plateau bump: rays over the bump hit higher than rays off
    it, and the shading normal tilts on the slope."""
    h = np.zeros((32, 32), np.float32)
    h[12:20, 12:20] = 0.5
    geom = _plane_geom(
        h, params=DisplacementParameters(
            h_scale=0.4, local_intersection_type=lit))
    o = jnp.asarray([[0.5, 1.0, 0.5], [0.05, 1.0, 0.05]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    hit = intersect_tfdm(geom, o, d)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    y_on = 1.0 - float(hit.t[0])
    y_off = 1.0 - float(hit.t[1])
    assert abs(y_on - 0.2) < 0.02, y_on
    assert abs(y_off - 0.0) < 0.02, y_off


def test_oblique_ray_and_miss():
    geom = _plane_geom(np.full((8, 8), 0.0, np.float32))
    # oblique hit
    o = jnp.asarray([[0.2, 0.5, 0.2], [5.0, 1.0, 5.0]])
    d = jnp.asarray([[0.3, -1.0, 0.25], [0.0, -1.0, 0.0]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_tfdm(geom, o, d)
    assert bool(hit.hit[0])
    p = np.asarray(hit.position[0])
    assert abs(p[1]) < 2e-3  # on the base plane
    assert not bool(hit.hit[1])  # ray outside the patch misses


def _subdivided_plane(n: int):
    """n x n grid plane on XZ (uv = (x, z)), tilted vertex normals off."""
    xs = np.linspace(0.0, 1.0, n + 1, dtype=np.float32)
    vx, vz = np.meshgrid(xs, xs, indexing="ij")
    positions = np.stack([vx, np.zeros_like(vx), vz], -1).reshape(-1, 3)
    normals = np.tile(np.array([[0, 1, 0]], np.float32),
                      (positions.shape[0], 1))
    idx = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            idx.append([a, b, d])
            idx.append([a, d, c])
    indices = np.asarray(idx, np.int32)
    uvs = positions[:, [0, 2]]
    return positions, indices, uvs, normals


def test_tfdm_v2_matches_v1():
    """Mip-guided v2 intersector must agree with the fixed-step marcher on
    a smooth height field, on a SUBDIVIDED base mesh (the vectorized broad
    phase handles many prisms; v1's Python loop is the oracle)."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 32
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    height = (0.5 + 0.45 * np.sin(2 * np.pi * xx / s)
              * np.cos(2 * np.pi * yy / s)).astype(np.float32)
    positions, indices, uvs, normals = _subdivided_plane(4)  # 32 prisms
    from gfxexp_tpu.techniques.tfdm import build_tfdm_geometry

    geom = build_tfdm_geometry(positions, indices, uvs, height,
                               params=DisplacementParameters(h_scale=0.3),
                               normals=normals)
    rng = np.random.default_rng(5)
    n = 128
    o = np.stack([rng.uniform(0, 1, n), np.full(n, 1.2),
                  rng.uniform(0, 1, n)], -1).astype(np.float32)
    to = np.stack([rng.uniform(0.05, 0.95, n), np.zeros(n),
                   rng.uniform(0.05, 0.95, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    h1 = intersect_tfdm(geom, jnp.asarray(o), jnp.asarray(d), n_steps=96)
    h2 = intersect_tfdm_v2(geom, jnp.asarray(o), jnp.asarray(d),
                           k_candidates=8)
    m1 = np.asarray(h1.hit)
    m2 = np.asarray(h2.hit)
    agree = m1 == m2
    assert agree.mean() >= 0.96, agree.mean()  # grazing-edge lanes may differ
    # v2 may legitimately find grazing hits v1's fixed-step march steps
    # over, but any v2-only hit must lie ON the displaced surface: check
    # the residual of y - h_scale * bilinear(height, uv) at the hit point
    for i in np.where(m2 & ~m1)[0]:
        p = o[i] + float(np.asarray(h2.t)[i]) * d[i]
        x = (p[0] % 1.0) * s - 0.5
        y_ = (p[2] % 1.0) * s - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y_))
        fx, fy = x - x0, y_ - y0
        hb = (height[y0 % s, x0 % s] * (1 - fx) * (1 - fy)
              + height[y0 % s, (x0 + 1) % s] * fx * (1 - fy)
              + height[(y0 + 1) % s, x0 % s] * (1 - fx) * fy
              + height[(y0 + 1) % s, (x0 + 1) % s] * fx * fy)
        assert abs(p[1] - 0.3 * hb) < 2e-3, (i, p, 0.3 * hb)
    both = m1 & m2
    assert np.allclose(np.asarray(h2.t)[both], np.asarray(h1.t)[both],
                       rtol=5e-3, atol=2e-3)


def test_tfdm_v2_no_missed_thin_features():
    """A single thin spike thinner than v1's step must still be found by
    the conservative coarse-interval walk (the VERDICT r1 criterion for
    mip-guided traversal)."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 64
    height = np.zeros((s, s), np.float32)
    height[31:33, 31:33] = 1.0  # one thin tall spike
    geom = _plane_geom(height, DisplacementParameters(h_scale=0.4))
    # grazing ray passing straight over the spike
    o = jnp.asarray([[0.0, 0.15, 0.502]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    h2 = intersect_tfdm_v2(geom, o, d)
    assert bool(h2.hit[0])
    # hits the spike's side near x=0.484 (texel 31 edge)
    assert 0.4 < float(h2.t[0]) < 0.52, float(h2.t[0])


def test_tfdm_v2_conservative_catches_subsample_dips():
    """VERDICT r4 item #6: the fixed-step march point-samples the gap at
    dt_fine (half a base texel of uv travel) and provably misses a ray
    that dips under the surface and back out BETWEEN samples. The
    conservative per-texel walk (quadratic solve per crossed texel) must
    catch it. Scene: a single raised sample on a 64^2 map — a bilinear
    tent one patch wide (reference criterion: the texel enumeration of
    tfdm_intersection_kernels.h:40-560 visits every crossed texel)."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 64
    height = np.zeros((s, s), np.float32)
    height[32, 32] = 1.0  # apex at uv = (32.5/64, 32.5/64)
    geom = _plane_geom(height, DisplacementParameters(h_scale=0.4))

    # ray A (endpoint case): grazes 0.004 below the 0.4 apex along the
    # apex's sample row; the sub-surface interval is ~1.5e-4 in t, 50x
    # smaller than dt_fine — the quadratic's ENDPOINT sign change at the
    # texel exit (the apex is a patch corner) brackets it.
    # ray B (vertex case): crosses the tent anti-diagonally through the
    # patch center, where the bilinear term makes the gap quadratic with
    # an INTERIOR minimum (surface max 0.4*f(1-f) = 0.1 at f=0.5); at
    # y=0.099 the dip lasts ~0.0016 world units, 5x below dt_fine.
    apex = 32.5 / s
    o = jnp.asarray([[0.0, 0.396, apex],
                     [0.2, 0.099, 0.8]])
    d = jnp.asarray([[1.0, 0.0, 0.0],
                     [1.0, 0.0, -1.0]]) / jnp.asarray([[1.0], [np.sqrt(2)]])

    h_old = intersect_tfdm_v2(geom, o, d, conservative=False)
    h_new = intersect_tfdm_v2(geom, o, d)
    # the r4 march misses the interior dip (ray B) — its samples straddle
    # the 0.0016-wide sub-surface interval with no sign change (ray A's
    # dip happens to catch a sample on this exact geometry, so only the
    # structural miss is pinned; the new walk must find BOTH)
    assert not bool(h_old.hit[1]), float(h_old.t[1])
    assert bool(h_new.hit[0]) and bool(h_new.hit[1]), np.asarray(h_new.hit)
    # ray A crosses within half a texel of the apex x=0.5078125
    assert abs(float(h_new.t[0]) - apex) < 1.0 / s, float(h_new.t[0])
    # ray B's dip straddles the patch-center crossing at t = 0.3*sqrt(2)
    assert abs(float(h_new.t[1]) - 0.3 * np.sqrt(2)) < 2.0 / s, (
        float(h_new.t[1]))


def test_tfdm_v2_step_reduction():
    """Empty-space skipping: a ray crossing mostly-empty texels must use
    far fewer steps than the blind marcher's fixed 48/prism."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 64
    height = np.zeros((s, s), np.float32)
    height[30:34, 30:34] = 1.0
    geom = _plane_geom(height, DisplacementParameters(h_scale=0.4))
    o = jnp.asarray([[0.1, 1.0, 0.1], [0.9, 1.0, 0.9]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    h2 = intersect_tfdm_v2(geom, o, d)
    # vertical rays through empty texels: a handful of skips, not a march
    assert int(np.asarray(h2.steps).max()) < 24, np.asarray(h2.steps)


def test_tfdm_v2_full_pyramid_1k():
    """Full-chain pyramid descent on a 1024^2 height map (reference walks
    EVERY level, tfdm_intersection_kernels.h:171-560): same hits as the
    3-level probe, with FEWER march steps — the 3-level probe never
    consults granularity below fine_size=256, so it half-texel-steps
    through base texels that are locally empty (VERDICT r3 missing #3)."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 1024
    height = np.zeros((s, s), np.float32)
    # sparse thin ridges: 2-texel-wide walls every 256 texels (thin
    # features at base-texel scale on a mostly-empty map)
    height[:, 254:256] = 1.0
    height[:, 510:512] = 1.0
    height[:, 766:768] = 1.0
    height[382:384, :] = 1.0
    geom = _plane_geom(height, DisplacementParameters(h_scale=0.25))
    rng = np.random.default_rng(11)
    n = 64
    o = np.stack([rng.uniform(0, 1, n), np.full(n, 0.9),
                  rng.uniform(0, 1, n)], -1).astype(np.float32)
    to = np.stack([rng.uniform(0.05, 0.95, n), np.zeros(n),
                   rng.uniform(0.05, 0.95, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    # conservative=False: this test pins the OLD march's step economics
    # (full chain skips at base-texel granularity where the 3-level probe
    # half-texel-steps); the conservative walk advances per-texel in both
    # configs, erasing the contrast it measures
    h_full = intersect_tfdm_v2(geom, oj, dj, full_pyramid=True,
                               max_steps=256, conservative=False)
    h_3lv = intersect_tfdm_v2(geom, oj, dj, full_pyramid=False,
                              max_steps=256, conservative=False)
    m_f = np.asarray(h_full.hit)
    m_3 = np.asarray(h_3lv.hit)
    # identical hit sets (full chain only refines WHERE space is skipped,
    # never what is hit)
    assert (m_f == m_3).mean() >= 0.97, (m_f.sum(), m_3.sum())
    both = m_f & m_3
    assert both.sum() >= 16, both.sum()
    assert np.allclose(np.asarray(h_full.t)[both], np.asarray(h_3lv.t)[both],
                       rtol=5e-3, atol=2e-3)
    # and the full chain does strictly less marching on this sparse map
    steps_f = int(np.asarray(h_full.steps).sum())
    steps_3 = int(np.asarray(h_3lv.steps).sum())
    assert steps_f < steps_3, (steps_f, steps_3)


def test_tfdm_v2_dense_overlap_uncapped():
    """A grazing ray entering MANY prism AABBs before the true hit: the old
    top-k=4 candidate cap silently dropped the hit (ADVICE r2); the
    candidate stream must keep going until the next AABB is farther than
    the best hit. Oracle: pure-numpy fine march + bisection of the bilinear
    displaced surface (the base mesh is a flat plane, so world y maps to
    the height field directly)."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 64
    height = np.full((s, s), 0.1, np.float32)
    height[:, 56:60] = 0.9  # tall wall near the far (x) end
    positions, indices, uvs, normals = _subdivided_plane(16)  # 512 prisms
    h_scale = 0.5
    geom = build_tfdm_geometry(positions, indices, uvs, height,
                               params=DisplacementParameters(h_scale=h_scale),
                               normals=normals)
    # every prism AABB spans the GLOBAL height interval [0.05, 0.45], so a
    # near-horizontal ray at y ~ 0.3 enters ~2 prisms per subdivision cell
    # it passes over (~28 AABBs) before reaching the wall at x ~ 0.875
    o_np = np.asarray([0.0, 0.30, 0.53])
    d_np = np.asarray([1.0, -0.02, 0.0])
    d_np = d_np / np.linalg.norm(d_np)

    def bilinear_np(u, v):
        x = (u % 1.0) * s - 0.5
        y = (v % 1.0) * s - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        h00 = height[y0 % s, x0 % s]
        h10 = height[y0 % s, (x0 + 1) % s]
        h01 = height[(y0 + 1) % s, x0 % s]
        h11 = height[(y0 + 1) % s, (x0 + 1) % s]
        return (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
                + h01 * (1 - fx) * fy + h11 * fx * fy)

    def gap(t):
        p = o_np + t * d_np
        return p[1] - h_scale * bilinear_np(p[0], p[2])

    t_oracle = None
    ts = np.linspace(1e-4, 1.2, 6000)
    for a, b in zip(ts[:-1], ts[1:]):
        if gap(a) > 0 >= gap(b):
            for _ in range(40):  # bisect
                m = 0.5 * (a + b)
                a, b = (m, b) if gap(m) > 0 else (a, m)
            t_oracle = 0.5 * (a + b)
            break
    assert t_oracle is not None and t_oracle > 0.8, t_oracle

    o = jnp.asarray([o_np], jnp.float32)
    d = jnp.asarray([d_np], jnp.float32)
    h2 = intersect_tfdm_v2(geom, o, d, k_candidates=4)
    assert bool(h2.hit[0]), "uncapped candidate stream must find the wall"
    assert abs(float(h2.t[0]) - t_oracle) < 0.02, (float(h2.t[0]), t_oracle)


def test_tfdm_v2_10k_prism_scale():
    """A 10k-base-triangle displaced mesh stays tractable: the broad phase
    is chunked (bounded intermediates) and candidates stream per ray
    (VERDICT r2 item 4 scale criterion)."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 64
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    height = (0.5 + 0.4 * np.sin(2 * np.pi * xx / s)).astype(np.float32)
    positions, indices, uvs, normals = _subdivided_plane(72)  # 10368 prisms
    geom = build_tfdm_geometry(positions, indices, uvs, height,
                               params=DisplacementParameters(h_scale=0.25),
                               normals=normals)
    assert geom.p0.shape[0] == 10368
    rng = np.random.default_rng(11)
    n = 64
    o = np.stack([rng.uniform(0.1, 0.9, n), np.full(n, 1.0),
                  rng.uniform(0.1, 0.9, n)], -1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    h2 = intersect_tfdm_v2(geom, jnp.asarray(o), jnp.asarray(d))
    hits = np.asarray(h2.hit)
    assert hits.all(), hits.mean()
    t = np.asarray(h2.t)
    # surface lies at y = 0.25*(0.5 + 0.4 sin(2 pi u)); t = 1 - y
    u = o[:, 0]
    expect = 1.0 - 0.25 * (0.5 + 0.4 * np.sin(2 * np.pi * u))
    assert np.allclose(t, expect, atol=0.02), np.abs(t - expect).max()


def test_bspline_local_intersection():
    """LOCAL_INTERSECTION_BSPLINE evaluates the bicubic uniform B-spline
    surface (16-tap), validated against an independent numpy evaluation at
    the hit uv (VERDICT r2 item 6 — was silently aliased to bilinear)."""
    from gfxexp_tpu.techniques.tfdm import (
        LOCAL_INTERSECTION_BSPLINE, intersect_tfdm, sample_height)

    s = 32
    rng = np.random.default_rng(7)
    height = rng.uniform(0.2, 0.8, (s, s)).astype(np.float32)
    params = DisplacementParameters(
        h_scale=0.3, local_intersection_type=LOCAL_INTERSECTION_BSPLINE)
    geom = _plane_geom(height, params)

    def bspline_np(u, v):
        # independent numpy evaluation of the same uniform cubic B-spline
        x = (u % 1.0) * s - 0.5
        y = (v % 1.0) * s - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0

        def w(f):
            return np.array([
                (1 - 3 * f + 3 * f * f - f**3) / 6,
                (4 - 6 * f * f + 3 * f**3) / 6,
                (1 + 3 * f + 3 * f * f - 3 * f**3) / 6,
                f**3 / 6,
            ])

        wx, wy = w(fx), w(fy)
        acc = 0.0
        for j in range(4):
            for i in range(4):
                acc += (wy[j] * wx[i]
                        * height[(y0 + j - 1) % s, (x0 + i - 1) % s])
        return acc

    # direct sample agreement
    uv = jnp.asarray([[0.37, 0.61], [0.05, 0.93], [0.5, 0.5]], jnp.float32)
    got = np.asarray(sample_height(geom, uv))
    want = np.array([bspline_np(0.37, 0.61), bspline_np(0.05, 0.93),
                     bspline_np(0.5, 0.5)])
    assert np.allclose(got, want, atol=1e-5), (got, want)

    # B-splines reproduce constants exactly (partition of unity)
    geom_c = _plane_geom(np.full((16, 16), 0.5, np.float32), params)
    uvc = jnp.asarray(rng.uniform(0, 1, (8, 2)), jnp.float32)
    assert np.allclose(np.asarray(sample_height(geom_c, uvc)), 0.5, atol=1e-6)

    # intersection: vertical rays hit at t = 1 - 0.3 * bspline(u, v)
    o_np = np.stack([rng.uniform(0.2, 0.8, 6), np.full(6, 1.0),
                     rng.uniform(0.2, 0.8, 6)], -1).astype(np.float32)
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (6, 1))
    hit = intersect_tfdm(geom, jnp.asarray(o_np), d, n_steps=96)
    assert np.asarray(hit.hit).all()
    expect = np.array([1.0 - 0.3 * bspline_np(o_np[i, 0], o_np[i, 2])
                       for i in range(6)])
    assert np.allclose(np.asarray(hit.t), expect, atol=5e-3), (
        np.asarray(hit.t), expect)


def test_tfdm_v2_three_level_descent():
    """The third (fine) pyramid level tightens empty-space classification
    on a large sparse map: grazing rays passing NEAR a feature take fewer
    steps with the 256^2 level than with the 64^2-capped walk, and hits
    are identical."""
    from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2

    s = 512
    height = np.zeros((s, s), np.float32)
    height[248:264, 248:264] = 1.0  # one small central bump
    geom = _plane_geom(height, DisplacementParameters(h_scale=0.4))
    rng = np.random.default_rng(3)
    n = 64
    # grazing rays sweeping low over the plane toward the bump's
    # neighborhood: mid-level (64^2) texels near the bump read occupied,
    # fine-level (256^2) texels mostly do not
    o = np.stack([np.zeros(n), np.full(n, 0.12),
                  rng.uniform(0.40, 0.60, n)], -1).astype(np.float32)
    to = np.stack([np.full(n, 1.0), np.full(n, 0.05),
                   rng.uniform(0.40, 0.60, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    # legacy capped-chain mode: fine_size only matters there (the default
    # full_pyramid=True walks every level regardless)
    # conservative=False: pins the OLD march's step economics (the
    # conservative walk advances per-texel in both configs, erasing the
    # fine_size contrast this test measures)
    h3 = intersect_tfdm_v2(geom, oj, dj, fine_size=256, max_steps=512,
                           full_pyramid=False, conservative=False)
    h2 = intersect_tfdm_v2(geom, oj, dj, fine_size=64, max_steps=512,
                           full_pyramid=False, conservative=False)
    assert np.array_equal(np.asarray(h3.hit), np.asarray(h2.hit))
    m = np.asarray(h2.hit)
    if m.any():
        assert np.allclose(np.asarray(h3.t)[m], np.asarray(h2.t)[m],
                           atol=2e-3)
    s3 = float(np.asarray(h3.steps).mean())
    s2 = float(np.asarray(h2.steps).mean())
    assert s3 < 0.9 * s2, (s3, s2)


def test_tfdm_per_triangle_aabb_tightening():
    """Per-triangle footprint height intervals (reference: computeAABBs)
    make flat-region prisms THIN: the grazing ray of the dense-overlap
    scene at y=0.3 no longer enters them (their displaced interval tops
    out at 0.05+eps), while the wall prisms still span high."""
    s = 64
    height = np.full((s, s), 0.1, np.float32)
    height[:, 56:60] = 0.9
    positions, indices, uvs, normals = _subdivided_plane(16)
    geom = build_tfdm_geometry(positions, indices, uvs, height,
                               params=DisplacementParameters(h_scale=0.5),
                               normals=normals)
    lo = np.asarray(geom.aabb_min)
    hi = np.asarray(geom.aabb_max)
    # flat-region prisms: uv x-footprint clear of the wall columns
    uv0 = np.asarray(geom.uv0)
    uv1 = np.asarray(geom.uv1)
    uv2 = np.asarray(geom.uv2)
    ux = np.stack([uv0[:, 0], uv1[:, 0], uv2[:, 0]], 1)
    flat_sel = ux.max(1) < 0.8  # wall lives at u in [0.875, 0.94]
    wall_sel = (ux.min(1) > 0.85) & (ux.max(1) < 0.95)
    assert flat_sel.sum() > 50 and wall_sel.sum() > 2
    # flat prisms top out near 0.05 (0.1 * h_scale), far below 0.45
    assert hi[flat_sel, 1].max() < 0.15, hi[flat_sel, 1].max()
    assert hi[wall_sel, 1].max() > 0.4
    # the LOWER bound tightens as well: flat prisms bottom out at the
    # 0.05 displaced floor (minus pad), not at 0
    assert np.all(lo[flat_sel, 1] > 0.03)


def test_tfdm_10k_base_triangles_pipeline():
    """Reference-scale base mesh: a 72x72 grid (10368 prisms) displaced
    mesh renders through the COMMON path-traced pipeline (the broad phase
    streams ray chunks, so the [rays, prisms] intermediates stay bounded)
    and primary hits land on the displaced surface."""
    import jax.numpy as jnp

    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene

    s = 128
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    height = (0.5 + 0.5 * np.sin(xx * 0.4) * np.cos(yy * 0.3)) \
        .astype(np.float32)
    positions, indices, uvs, normals = _subdivided_plane(72)
    assert len(indices) == 2 * 72 * 72  # 10368 base triangles

    b = SceneBuilder()
    lamp = b.add_lambert_material((0, 0, 0), emittance=(100.0,) * 3)
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(b.add_rectangle(0.8, 0.8, lamp),
                   affine(rotation=flip, translation=[0.5, 2.0, 0.5]))
    disp = b.add_lambert_material((0.6, 0.55, 0.5))
    b.add_displaced(positions, indices, uvs, height,
                    params=DisplacementParameters(h_scale=0.2),
                    material=disp, kind="tfdm", normals=normals)
    scene, bvh = compile_scene(b, traversal="widerow")
    cam = make_camera([0.5, 1.2, 1.9], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0.5, 0.1, 0.5])
    img = np.asarray(render_sample(scene, bvh, cam, 20, 20, jnp.uint32(1),
                                   PTConfig(max_path_length=2)))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3, img.mean()  # lit displaced surface visible


def test_tfdm_bvh_broad_phase_matches_scan():
    """The skip-walk box-BVH broad phase must stream candidates in the
    SAME lexicographic (near, id) order as the O(B) sweep — identical
    hits on the dense-overlap scene whose grazing rays enter dozens of
    prisms (ties included: rays starting inside several AABBs share
    near == t_min)."""
    from gfxexp_tpu.techniques.tfdm import (
        build_prism_bvh,
        build_tfdm_geometry,
        intersect_tfdm_v2,
    )

    s = 64
    height = np.full((s, s), 0.1, np.float32)
    height[:, 56:60] = 0.9
    positions, indices, uvs, normals = _subdivided_plane(16)
    geom = build_tfdm_geometry(positions, indices, uvs, height,
                               params=DisplacementParameters(h_scale=0.5),
                               normals=normals)
    assert geom.prism_bvh is None  # 512 prisms: below the auto threshold
    geom_b = geom.replace(prism_bvh=build_prism_bvh(
        np.asarray(geom.aabb_min), np.asarray(geom.aabb_max)))

    rng = np.random.default_rng(9)
    n = 160
    o = np.empty((n, 3), np.float32)
    d = np.empty((n, 3), np.float32)
    h = n // 2
    # grazing rays skimming the flat region toward the wall
    o[:h] = np.stack([np.zeros(h), rng.uniform(0.28, 0.34, h),
                      rng.uniform(0.1, 0.9, h)], -1)
    d[:h] = np.stack([np.ones(h), rng.uniform(-0.05, 0.0, h),
                      rng.normal(0, 0.02, h)], -1)
    # plus rays from above and from INSIDE the prism slab (t_min ties)
    o[h:] = np.stack([rng.uniform(0, 1, n - h),
                      rng.uniform(0.02, 1.0, n - h),
                      rng.uniform(0, 1, n - h)], -1)
    d[h:] = rng.normal(size=(n - h, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    h_s = intersect_tfdm_v2(geom, oj, dj)
    h_b = intersect_tfdm_v2(geom_b, oj, dj)
    assert np.array_equal(np.asarray(h_s.hit), np.asarray(h_b.hit))
    m = np.asarray(h_s.hit)
    assert np.array_equal(np.asarray(h_s.prim)[m], np.asarray(h_b.prim)[m])
    assert np.allclose(np.asarray(h_s.t)[m], np.asarray(h_b.t)[m],
                       rtol=1e-6, atol=1e-7)
