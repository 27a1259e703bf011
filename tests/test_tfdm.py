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
    assert not np.any(m2 & ~m1)  # v2 must not hallucinate hits
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
