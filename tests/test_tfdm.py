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
