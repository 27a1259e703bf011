"""Shell mapping tests (reference: nrtdsm forShellMapping,
nrtdsm_intersection_kernels.h:1632; CPU shell BVH build
nrtdsm_main.cpp:772-875). For STRAIGHT shells (untilted normals) the shell
map is affine, so the world-space-mapped contents traced by the regular
tracer are an exact oracle."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.techniques.shell import build_shell_geometry, intersect_shell
from gfxexp_tpu.techniques.tfdm import DisplacementParameters


def _box_mesh(lo, hi):
    l, h = np.asarray(lo, np.float32), np.asarray(hi, np.float32)
    corners = np.array([[l[0], l[1], l[2]], [h[0], l[1], l[2]],
                        [h[0], h[1], l[2]], [l[0], h[1], l[2]],
                        [l[0], l[1], h[2]], [h[0], l[1], h[2]],
                        [h[0], h[1], h[2]], [l[0], h[1], h[2]]], np.float32)
    faces = np.array([
        [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
        [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
        [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]], np.int32)
    return corners, faces


def _flat_shell(h_scale=0.5):
    """Unit XZ plane base, uv = (x, z), straight +Y normals; shell box
    strictly inside the lower uv triangle (u + v < 1)."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    # strictly inside base triangle 1 (uv region v < u)
    sv, sf = _box_mesh([0.55, 0.2, 0.1], [0.85, 0.8, 0.35])
    # shell verts are (u, v, hn): reorder box (x=u, y=hn, z=v)
    shell_pos = sv[:, [0, 2, 1]]  # -> (u, v, hn)
    geom = build_shell_geometry(
        positions, indices, uvs, shell_pos, sf,
        params=DisplacementParameters(h_scale=h_scale), normals=normals)
    return geom, sv, sf, h_scale


def test_shell_flat_matches_world_mesh():
    from gfxexp_tpu.accel.traverse import intersect_closest_brute
    from gfxexp_tpu.scene.types import TriangleSoA

    geom, sv, sf, h_scale = _flat_shell()
    # world mesh for the straight shell: (u, v, hn) -> (u, hn*h_scale, v);
    # the box was given as (x=u, y=hn, z=v), so world = scale y by h_scale
    wv = sv * np.asarray([[1.0, h_scale, 1.0]], np.float32)
    w0, w1, w2 = wv[sf[:, 0]], wv[sf[:, 1]], wv[sf[:, 2]]
    zeros3 = jnp.zeros((len(sf), 3), jnp.float32)
    zeros2 = jnp.zeros((len(sf), 2), jnp.float32)
    soa = TriangleSoA(
        p0=jnp.asarray(w0), e1=jnp.asarray(w1 - w0), e2=jnp.asarray(w2 - w0),
        n0=zeros3, n1=zeros3, n2=zeros3, uv0=zeros2, uv1=zeros2, uv2=zeros2,
        unit_id=jnp.zeros((len(sf),), jnp.int32))

    rng = np.random.default_rng(11)
    n = 160
    o = np.stack([rng.uniform(0, 1, n), np.full(n, 1.2),
                  rng.uniform(0, 1, n)], -1).astype(np.float32)
    to = np.stack([rng.uniform(0.5, 0.9, n), rng.uniform(0.0, 0.3, n),
                   rng.uniform(0.05, 0.4, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hs = intersect_shell(geom, jnp.asarray(o), jnp.asarray(d),
                         n_segments=12)
    hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
    m_s = np.asarray(hs.hit)
    m_r = np.asarray(hr.hit)
    agree = (m_s == m_r).mean()
    assert agree > 0.97, agree
    both = m_s & m_r
    assert both.sum() > 20  # the rays do see the box
    assert np.allclose(np.asarray(hs.t)[both], np.asarray(hr.t)[both],
                       rtol=1e-3, atol=1e-3), np.abs(
        np.asarray(hs.t)[both] - np.asarray(hr.t)[both]).max()
    # normals: world box faces are axis-aligned; shell normals must match
    nrm = np.asarray(hs.normal)[both]
    axis_aligned = (np.abs(nrm).max(axis=-1) > 0.99).mean()
    assert axis_aligned > 0.95, axis_aligned


def test_shell_multi_material():
    geom, sv, sf, _ = _flat_shell()
    # rebuild with alternating per-triangle materials
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    mats = (np.arange(len(sf)) % 2 + 3).astype(np.int32)
    geom = build_shell_geometry(
        positions, indices, uvs, sv[:, [0, 2, 1]], sf,
        params=DisplacementParameters(h_scale=0.5), normals=normals,
        shell_materials=mats)
    o = jnp.asarray([[0.7, 1.0, 0.22]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    hs = intersect_shell(geom, o, d)
    assert bool(hs.hit[0])
    assert int(hs.mat[0]) in (3, 4)


def test_shell_tilted_sanity():
    """Tilted normals (curved shells): hits stay finite/plausible and the
    segment count bounds the work."""
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    normals = np.array([[0.25, 1, 0], [0, 1, 0.25], [-0.25, 1, 0],
                        [0, 1, -0.25]], np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    sv, sf = _box_mesh([0.55, 0.2, 0.1], [0.85, 0.8, 0.35])
    geom = build_shell_geometry(
        positions, indices, uvs, sv[:, [0, 2, 1]], sf,
        params=DisplacementParameters(h_scale=0.5), normals=normals)
    o = jnp.asarray([[0.7, 1.0, 0.2], [0.1, 1.0, 0.9]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    hs = intersect_shell(geom, o, d)
    assert bool(hs.hit[0])  # over the box
    assert not bool(hs.hit[1])  # empty corner
    assert np.isfinite(np.asarray(hs.t)[0])
    assert 0.0 < float(hs.t[0]) < 1.2


def test_shell_adaptive_segments():
    """The build-time curvature estimate picks 1 segment for straight
    shells (where the linear trace is exact) and more for tilted normals;
    the adaptive count must agree with a heavily-refined reference trace
    on hit t within the estimator's chord-error tolerance."""
    geom_straight, _, _, _ = _flat_shell()
    assert geom_straight.auto_segments == 1

    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    normals = np.array([[0.35, 1, 0], [0, 1, 0.35], [-0.35, 1, 0],
                        [0, 1, -0.35]], np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    sv, sf = _box_mesh([0.5, 0.15, 0.1], [0.9, 0.85, 0.4])
    geom = build_shell_geometry(
        positions, indices, uvs, sv[:, [0, 2, 1]], sf,
        params=DisplacementParameters(h_scale=0.5), normals=normals)
    assert geom.auto_segments > 1, geom.auto_segments
    assert geom.auto_segments <= 48

    rng = np.random.default_rng(5)
    n = 200
    o = np.stack([rng.uniform(0.2, 1.0, n), np.full(n, 1.1),
                  rng.uniform(0.0, 0.6, n)], -1).astype(np.float32)
    to = np.stack([rng.uniform(0.5, 0.9, n), rng.uniform(0.0, 0.35, n),
                   rng.uniform(0.05, 0.45, n)], -1)
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    ha = intersect_shell(geom, oj, dj)  # adaptive (n_segments=None)
    href = intersect_shell(geom, oj, dj, n_segments=64)
    m_a = np.asarray(ha.hit)
    m_r = np.asarray(href.hit)
    assert m_r.sum() > 30
    # hit/miss agreement within a small silhouette band
    assert (m_a == m_r).mean() > 0.95, (m_a == m_r).mean()
    both = m_a & m_r
    # t agreement within the chord tolerance (texture-space eps=2e-3
    # maps to world error of the same order for this unit-scale shell)
    dt = np.abs(np.asarray(ha.t)[both] - np.asarray(href.t)[both])
    assert np.quantile(dt, 0.95) < 5e-3, np.quantile(dt, 0.95)
