"""BVH build + traversal tests against the brute-force oracle
(SURVEY.md §4: replaces the reference's sandbox/VDB eyeball validation of
bvh::buildGeometryBVH / traverse, nrtdsm_sandbox.cpp:2981)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.accel.bvh_build import build_bvh, build_bvh_arrays
from gfxexp_tpu.accel.traverse import (
    intersect_any,
    intersect_closest,
    intersect_closest_brute,
)
from gfxexp_tpu.scene.types import TriangleSoA


def _random_tri_soup(rng_np, n_tris=200, spread=4.0):
    centers = rng_np.uniform(-spread, spread, size=(n_tris, 3))
    p0 = centers + rng_np.normal(scale=0.4, size=(n_tris, 3))
    p1 = centers + rng_np.normal(scale=0.4, size=(n_tris, 3))
    p2 = centers + rng_np.normal(scale=0.4, size=(n_tris, 3))
    return p0.astype(np.float32), p1.astype(np.float32), p2.astype(np.float32)


def _make_soa(p0, p1, p2):
    zeros3 = jnp.zeros_like(jnp.asarray(p0))
    zeros2 = jnp.zeros((p0.shape[0], 2), jnp.float32)
    return TriangleSoA(
        p0=jnp.asarray(p0), e1=jnp.asarray(p1 - p0), e2=jnp.asarray(p2 - p0),
        n0=zeros3, n1=zeros3, n2=zeros3,
        uv0=zeros2, uv1=zeros2, uv2=zeros2,
        unit_id=jnp.zeros((p0.shape[0],), jnp.int32),
    )


def test_bvh_invariants(rng_np):
    p0, p1, p2 = _random_tri_soup(rng_np, 500)
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    cmin, cmax, cidx, ccount, perm, max_depth = build_bvh_arrays(tri_min, tri_max, arity=4)
    # every triangle appears exactly once across leaves
    seen = np.zeros(500, bool)
    for n in range(cidx.shape[0]):
        for k in range(4):
            if ccount[n, k] > 0:
                rng_slice = slice(cidx[n, k], cidx[n, k] + ccount[n, k])
                assert not seen[rng_slice].any()
                seen[rng_slice] = True
                # leaf AABB contains its (permuted) triangles
                ids = perm[rng_slice]
                assert np.all(tri_min[ids] >= cmin[n, k] - 1e-4)
                assert np.all(tri_max[ids] <= cmax[n, k] + 1e-4)
    assert seen.all()
    assert 1 <= max_depth < 64


@pytest.mark.parametrize("arity", [2, 4, 8])
def test_traversal_matches_bruteforce(rng_np, arity):
    p0, p1, p2 = _random_tri_soup(rng_np, 300)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=arity)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])

    n_rays = 256
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit_bvh = intersect_closest(bvh, soa, jnp.asarray(o), jnp.asarray(d))
    hit_ref = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))

    assert np.array_equal(np.asarray(hit_bvh.hit), np.asarray(hit_ref.hit))
    m = np.asarray(hit_ref.hit)
    assert np.allclose(np.asarray(hit_bvh.t)[m], np.asarray(hit_ref.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hit_bvh.tri)[m], np.asarray(hit_ref.tri)[m])


def test_any_hit_matches_closest(rng_np):
    p0, p1, p2 = _random_tri_soup(rng_np, 300)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=4)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    n_rays = 256
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    occluded = intersect_any(bvh, soa, jnp.asarray(o), jnp.asarray(d))
    closest = intersect_closest(bvh, soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(occluded), np.asarray(closest.hit))


def test_tmax_respected(rng_np):
    p0 = np.array([[0.0, -1.0, 5.0]], np.float32)
    p1 = np.array([[1.0, 1.0, 5.0]], np.float32)
    p2 = np.array([[-1.0, 1.0, 5.0]], np.float32)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0)
    soa = _make_soa(p0, p1, p2)
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    assert bool(intersect_closest(bvh, soa, o, d).hit[0])
    assert not bool(intersect_closest(bvh, soa, o, d, t_max=4.0).hit[0])
    assert not bool(intersect_any(bvh, soa, o, d, t_max=4.0)[0])


def test_native_builder_matches_numpy(rng_np):
    """Native C++ builder must produce traversal-equivalent BVHs to the
    numpy oracle (same closest hits for a random ray batch)."""
    from gfxexp_tpu.accel.native import native_available

    if not native_available():
        pytest.skip("native builder not built")
    p0, p1, p2 = _random_tri_soup(rng_np, 400)
    bvh_n, perm_n = build_bvh(p0, p1 - p0, p2 - p0, arity=4, use_native=True)
    bvh_p, perm_p = build_bvh(p0, p1 - p0, p2 - p0, arity=4, use_native=False)
    soa_n = _make_soa(p0[perm_n], p1[perm_n], p2[perm_n])
    soa_p = _make_soa(p0[perm_p], p1[perm_p], p2[perm_p])
    n_rays = 128
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hn = intersect_closest(bvh_n, soa_n, jnp.asarray(o), jnp.asarray(d))
    hp = intersect_closest(bvh_p, soa_p, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(hn.hit), np.asarray(hp.hit))
    m = np.asarray(hn.hit)
    assert np.allclose(np.asarray(hn.t)[m], np.asarray(hp.t)[m], rtol=1e-4)
    # same original triangle (via inverse perms)
    tri_n = np.asarray(perm_n)[np.asarray(hn.tri)[m]]
    tri_p = np.asarray(perm_p)[np.asarray(hp.tri)[m]]
    assert np.array_equal(tri_n, tri_p)


def test_skiplink_matches_bruteforce(rng_np):
    """Stackless skip-link traversal (the TPU render path) must agree with
    the brute-force oracle."""
    from gfxexp_tpu.accel.skiplink import build_skip_links, intersect_closest_skip

    p0, p1, p2 = _random_tri_soup(rng_np, 300)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=4)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    skip = build_skip_links(
        np.asarray(bvh.child_min), np.asarray(bvh.child_max),
        np.asarray(bvh.child_idx), np.asarray(bvh.child_count))
    n_rays = 256
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hs = intersect_closest_skip(skip, soa, jnp.asarray(o), jnp.asarray(d))
    hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(hs.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(hs.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hs.tri)[m], np.asarray(hr.tri)[m])


def test_tiled_matches_bruteforce(rng_np):
    """Tile-shared traversal (the TPU execution scheme) must agree with the
    brute-force oracle, including non-multiple-of-tile ray counts."""
    from gfxexp_tpu.accel.skiplink import build_skip_links
    from gfxexp_tpu.accel.tiled import intersect_any_tiled, intersect_closest_tiled

    p0, p1, p2 = _random_tri_soup(rng_np, 300)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=4)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    skip = build_skip_links(
        np.asarray(bvh.child_min), np.asarray(bvh.child_max),
        np.asarray(bvh.child_idx), np.asarray(bvh.child_count))
    n_rays = 301  # deliberately not a tile multiple
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ht = intersect_closest_tiled(skip, soa, jnp.asarray(o), jnp.asarray(d), tile=64)
    hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(ht.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(ht.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(ht.tri)[m], np.asarray(hr.tri)[m])
    occ = intersect_any_tiled(skip, soa, jnp.asarray(o), jnp.asarray(d), tile=64)
    assert np.array_equal(np.asarray(occ), np.asarray(hr.hit))


def test_rowcursor_matches_bruteforce(rng_np):
    """Row-cursor Pallas kernel (interpret mode on CPU) vs brute force."""
    from gfxexp_tpu.accel.pallas_rowcursor import intersect_closest_rowcursor
    from gfxexp_tpu.accel.skiplink import build_skip_links

    p0, p1, p2 = _random_tri_soup(rng_np, 120)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=4)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    skip = build_skip_links(
        np.asarray(bvh.child_min), np.asarray(bvh.child_max),
        np.asarray(bvh.child_idx), np.asarray(bvh.child_count))
    n_rays = 300  # not a tile multiple
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hw = intersect_closest_rowcursor(skip, soa, jnp.asarray(o), jnp.asarray(d))
    hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(hw.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(hw.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hw.tri)[m], np.asarray(hr.tri)[m])


@pytest.mark.parametrize("arity", [4, 8])
def test_widestack_matches_bruteforce(rng_np, arity):
    """Wide-node ordered-stack Pallas kernel (interpret mode on CPU) vs
    brute force, plus any-hit consistency."""
    from gfxexp_tpu.accel.pallas_widestack import (
        intersect_any_widestack,
        intersect_closest_widestack,
        pack_widerows,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 120)
    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=arity)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    wrow = pack_widerows(bvh, soa)
    n_rays = 300  # not a tile multiple
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hw = intersect_closest_widestack(wrow, soa, jnp.asarray(o), jnp.asarray(d))
    hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(hw.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(hw.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hw.tri)[m], np.asarray(hr.tri)[m])
    occ = intersect_any_widestack(wrow, soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(occ), np.asarray(hr.hit))


def test_widestack_chunked_matches_bruteforce(rng_np):
    """Chunked (multi-table) wide-row traversal — the HBM-streaming path for
    scenes over the VMEM row budget — must agree with brute force."""
    from gfxexp_tpu.accel.pallas_widestack import (
        build_widerow,
        intersect_closest_widestack,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 600, spread=6.0)
    wrow, perm = build_widerow(p0, p1 - p0, p2 - p0, arity=4, max_leaf=4,
                               max_rows=80)  # force many chunks
    assert wrow.num_chunks >= 4, wrow.num_chunks
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    n_rays = 300
    o = rng_np.uniform(-10, 10, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hw = intersect_closest_widestack(wrow, soa, jnp.asarray(o), jnp.asarray(d))
    hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(hw.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(hw.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hw.tri)[m], np.asarray(hr.tri)[m])


def test_instanced_matches_flattened_bruteforce(rng_np):
    """Two-level (BLAS x instances) traversal must agree with brute force
    over the world-space flattened copies: same hits, same t, and the
    (instance, local tri) pair must identify the same world triangle."""
    from gfxexp_tpu.accel.pallas_widestack import (
        build_instanced,
        intersect_any_instanced,
        intersect_closest_instanced,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 80, spread=1.5)
    q0, q1, q2 = _random_tri_soup(rng_np, 50, spread=1.0)

    def xform(scale, rot_axis, angle, t):
        c, s = np.cos(angle), np.sin(angle)
        if rot_axis == 1:
            r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        else:
            r = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        m = np.zeros((3, 4))
        m[:, :3] = r * scale
        m[:, 3] = t
        return m.astype(np.float32)

    instances = [
        (0, xform(1.0, 1, 0.0, [0, 0, 0])),
        (1, xform(0.7, 2, 0.8, [4, 1, -2])),
        (0, xform(1.3, 1, 2.1, [-4, -1, 3])),
        (1, xform(1.0, 2, -0.5, [1, 5, 2])),
    ]
    acc, perms = build_instanced(
        [(p0, p1 - p0, p2 - p0), (q0, q1 - q0, q2 - q0)], instances)

    # flattened world-space ground truth in the SAME global tri order
    blas_tris = [(p0[perms[0]], p1[perms[0]], p2[perms[0]]),
                 (q0[perms[1]], q1[perms[1]], q2[perms[1]])]
    n_rays = 300
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit, inst = intersect_closest_instanced(acc, jnp.asarray(o), jnp.asarray(d))

    # oracle: per instance, transform tris to world, brute-force, merge
    best_t = np.full(n_rays, 1e30, np.float32)
    best_key = np.full((n_rays, 2), -1, np.int32)  # (inst, global tri)
    tri_base = [0, len(p0)]
    for ii, (b, m) in enumerate(instances):
        w0, w1, w2 = (blas_tris[b][k] @ m[:, :3].T + m[:, 3] for k in range(3))
        soa = _make_soa(w0.astype(np.float32), w1.astype(np.float32),
                        w2.astype(np.float32))
        hr = intersect_closest_brute(soa, jnp.asarray(o), jnp.asarray(d))
        t = np.asarray(hr.t)
        tr = np.asarray(hr.tri)
        take = np.asarray(hr.hit) & (t < best_t)
        best_t = np.where(take, t, best_t)
        best_key[take, 0] = ii
        best_key[take, 1] = tri_base[b] + tr[take]

    m_hit = best_key[:, 0] >= 0
    assert np.array_equal(np.asarray(hit.hit), m_hit)
    assert np.allclose(np.asarray(hit.t)[m_hit], best_t[m_hit], rtol=2e-3)
    assert np.array_equal(np.asarray(inst)[m_hit], best_key[m_hit, 0])
    assert np.array_equal(np.asarray(hit.tri)[m_hit], best_key[m_hit, 1])
    occ = intersect_any_instanced(acc, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(occ), m_hit)


def test_tlas_wavefront_matches_dense_grid(rng_np):
    """The sorted single-pass TLAS driver must agree with the dense
    (tiles x instances) grid on a scene with many instances and long
    grazing rays that enter a whole row of instance AABBs before
    hitting — the case where nearest-first worklist ordering and the
    per-tile candidate union have to be exactly complete."""
    from gfxexp_tpu.accel.pallas_widestack import (
        _traverse_instanced,
        _traverse_instanced_tlas,
        build_instanced,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 40, spread=0.5)

    # a 4x4 grid of instances of one BLAS: grazing rays along +x cross
    # up to 4 AABBs in near order
    instances = []
    for gx in range(4):
        for gz in range(4):
            m = np.zeros((3, 4), np.float32)
            m[0, 0] = m[1, 1] = m[2, 2] = 1.0
            m[:, 3] = [gx * 2.5, 0.0, gz * 2.5]
            instances.append((0, m))
    acc, perms = build_instanced([(p0, p1 - p0, p2 - p0)], instances)

    n_rays = 500
    o = np.empty((n_rays, 3), np.float32)
    d = np.empty((n_rays, 3), np.float32)
    # half: grazing rays marching down the instance rows (+x)
    h = n_rays // 2
    o[:h] = rng_np.uniform(-4, 0, size=(h, 3)).astype(np.float32)
    o[:h, 1] *= 0.2
    d[:h] = np.array([1.0, 0.0, 0.0]) + rng_np.normal(
        scale=0.05, size=(h, 3))
    # half: random
    o[h:] = rng_np.uniform(-4, 12, size=(n_rays - h, 3)).astype(np.float32)
    d[h:] = rng_np.normal(size=(n_rays - h, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    hd, id_d = _traverse_instanced(acc, oj, dj, 1e-4, 1e30, any_hit=False)
    ht, id_t = _traverse_instanced_tlas(acc, oj, dj, 1e-4, 1e30,
                                        any_hit=False)
    assert np.array_equal(np.asarray(hd.hit), np.asarray(ht.hit))
    m = np.asarray(hd.hit)
    assert np.allclose(np.asarray(hd.t)[m], np.asarray(ht.t)[m],
                       rtol=1e-5)
    assert np.array_equal(np.asarray(hd.tri)[m], np.asarray(ht.tri)[m])
    assert np.array_equal(np.asarray(id_d)[m], np.asarray(id_t)[m])

    ha, _ = _traverse_instanced(acc, oj, dj, 1e-4, 1e30, any_hit=True)
    hat, _ = _traverse_instanced_tlas(acc, oj, dj, 1e-4, 1e30, any_hit=True)
    assert np.array_equal(np.asarray(ha.hit), np.asarray(hat.hit))


def test_rebraided_instanced_matches_unrebraided(rng_np):
    """Rebraiding (several TLAS entries per instance, each starting its
    BLAS walk at a subtree row with the subtree's tighter AABB —
    reference: InstanceBVH rebraiding budget, common/bvh_builder.h:68-75)
    must not change results: same hits/t/tri/instance as whole-BLAS
    entries, on the dense-grid, sorted-TLAS, and any-hit drivers, and
    rigid animation must keep working on the rebraided structure."""
    from gfxexp_tpu.accel.pallas_widestack import (
        _traverse_instanced_tlas,
        build_instanced,
        intersect_any_instanced,
        intersect_closest_instanced,
    )
    from gfxexp_tpu.scene.animation import update_instanced_accel

    p0, p1, p2 = _random_tri_soup(rng_np, 120, spread=2.0)
    q0, q1, q2 = _random_tri_soup(rng_np, 60, spread=1.0)

    def xlate(scale, t):
        m = np.zeros((3, 4), np.float32)
        m[0, 0] = m[1, 1] = m[2, 2] = scale
        m[:, 3] = t
        return m

    # one BIG instance spanning the scene (the rebraid target) + smaller
    # ones — greedy opening must split instance 0 into subtree entries
    instances = [
        (0, xlate(3.0, [0, 0, 0])),
        (1, xlate(0.8, [5, 1, -2])),
        (0, xlate(0.6, [-5, -1, 3])),
        (1, xlate(0.9, [2, 6, 2])),
    ]
    blas = [(p0, p1 - p0, p2 - p0), (q0, q1 - q0, q2 - q0)]
    acc0, perms0 = build_instanced(blas, instances)
    accr, permsr = build_instanced(blas, instances, rebraid=4.0)

    # same BLAS tables -> same permutations; more entries than instances,
    # at least one starting below the root
    for a, b in zip(perms0, permsr):
        assert np.array_equal(a, b)
    assert accr.num_instances > len(instances)
    assert int(np.asarray(accr.start_rows).max()) > 0

    n_rays = 400
    o = rng_np.uniform(-10, 10, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    h0, i0 = intersect_closest_instanced(acc0, oj, dj)
    hr, ir = intersect_closest_instanced(accr, oj, dj)
    assert np.array_equal(np.asarray(h0.hit), np.asarray(hr.hit))
    m = np.asarray(h0.hit)
    assert np.allclose(np.asarray(h0.t)[m], np.asarray(hr.t)[m], rtol=1e-5)
    assert np.array_equal(np.asarray(h0.tri)[m], np.asarray(hr.tri)[m])
    assert np.array_equal(np.asarray(i0)[m], np.asarray(ir)[m])

    ht, it = _traverse_instanced_tlas(accr, oj, dj, 1e-4, 1e30,
                                      any_hit=False)
    assert np.array_equal(np.asarray(h0.hit), np.asarray(ht.hit))
    assert np.array_equal(np.asarray(h0.tri)[m], np.asarray(ht.tri)[m])
    assert np.array_equal(np.asarray(i0)[m], np.asarray(it)[m])

    occ0 = intersect_any_instanced(acc0, oj, dj)
    occr = intersect_any_instanced(accr, oj, dj)
    assert np.array_equal(np.asarray(occ0), np.asarray(occr))

    # rigid animation: move instances, refresh BOTH structures on device,
    # results must still agree (per-entry subtree AABBs recomputed)
    new_tf = np.stack([xlate(3.0, [1, 0.5, 0]), xlate(0.8, [6, 1, -1]),
                       xlate(0.6, [-6, -2, 3]), xlate(0.9, [2, 5, 3])])
    acc0a = update_instanced_accel(acc0, jnp.asarray(new_tf))
    accra = update_instanced_accel(accr, jnp.asarray(new_tf))
    h0a, i0a = intersect_closest_instanced(acc0a, oj, dj)
    hra, ira = intersect_closest_instanced(accra, oj, dj)
    assert np.array_equal(np.asarray(h0a.hit), np.asarray(hra.hit))
    ma = np.asarray(h0a.hit)
    assert np.allclose(np.asarray(h0a.t)[ma], np.asarray(hra.t)[ma],
                       rtol=1e-5)
    assert np.array_equal(np.asarray(h0a.tri)[ma], np.asarray(hra.tri)[ma])
    assert np.array_equal(np.asarray(i0a)[ma], np.asarray(ira)[ma])


def test_sbvh_spatial_splits_match_bruteforce(rng_np):
    """SBVH build (spatial splits + reference duplication, reference:
    bvh_builder.cpp:313,506) must agree with brute force on hit t (tri ids
    may name either duplicate of a split reference, so compare geometry,
    not ids), and must actually split on a scene of long diagonal
    triangles (the case object-only SAH handles badly)."""
    # long thin diagonal triangles spanning much of the scene + local soup
    n_long, n_soup = 60, 140
    a = rng_np.uniform(-4, 4, size=(n_long, 3))
    d = rng_np.normal(size=(n_long, 3))
    d = 6.0 * d / np.linalg.norm(d, axis=-1, keepdims=True)
    w = rng_np.normal(scale=0.05, size=(n_long, 3))
    p0l, p1l, p2l = a, a + d, a + d * 0.5 + w
    s0, s1, s2 = _random_tri_soup(rng_np, n_soup)
    p0 = np.concatenate([p0l, s0]).astype(np.float32)
    p1 = np.concatenate([p1l, s1]).astype(np.float32)
    p2 = np.concatenate([p2l, s2]).astype(np.float32)

    bvh, perm = build_bvh(p0, p1 - p0, p2 - p0, arity=4,
                          spatial_splits=True)
    assert perm.shape[0] > p0.shape[0], "no spatial split fired"
    soa = _make_soa(p0[perm], p1[perm], p2[perm])

    n_rays = 400
    o = rng_np.uniform(-6, 6, size=(n_rays, 3)).astype(np.float32)
    dr = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(dr)

    hit = intersect_closest(bvh, soa, oj, dj)
    brute = intersect_closest_brute(soa, oj, dj)
    assert np.array_equal(np.asarray(hit.hit), np.asarray(brute.hit))
    m = np.asarray(brute.hit)
    assert np.allclose(np.asarray(hit.t)[m], np.asarray(brute.t)[m],
                       rtol=1e-5, atol=1e-6)
    # duplicates reference the same source triangle
    tri_src = perm[np.asarray(hit.tri)[m]]
    tri_src_b = perm[np.asarray(brute.tri)[m]]
    tmatch = np.isclose(np.asarray(hit.t)[m], np.asarray(brute.t)[m],
                        rtol=1e-5, atol=1e-6)
    assert np.all((tri_src == tri_src_b) | tmatch)

    occ = intersect_any(bvh, soa, oj, dj)
    assert np.array_equal(np.asarray(occ), m)


def test_sbvh_widerow_matches_bruteforce(rng_np):
    """The packed wide-row kernel over an SBVH table agrees with brute
    force (duplicated leaf references flow through _pack_one unchanged)."""
    from gfxexp_tpu.accel.pallas_widestack import (
        build_widerow,
        intersect_closest_widestack,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 300, spread=2.0)
    wrow, perm = build_widerow(p0, p1 - p0, p2 - p0, arity=4,
                               spatial_splits=True)
    soa = _make_soa(p0[perm], p1[perm], p2[perm])
    n_rays = 300
    o = rng_np.uniform(-4, 4, size=(n_rays, 3)).astype(np.float32)
    dr = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    dr /= np.linalg.norm(dr, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(dr)
    hit = intersect_closest_widestack(wrow, soa, oj, dj)
    brute = intersect_closest_brute(soa, oj, dj)
    assert np.array_equal(np.asarray(hit.hit), np.asarray(brute.hit))
    m = np.asarray(brute.hit)
    assert np.allclose(np.asarray(hit.t)[m], np.asarray(brute.t)[m],
                       rtol=1e-4, atol=1e-5)


def test_qrow_matches_bruteforce(rng_np):
    """Quantized-row kernel (arity-8 compressed nodes + 16-bit leaf verts,
    reference: CompressedInternalNode_T common_shared.h:757) against brute
    force over the DEQUANTIZED triangle soup — the kernel's exact ground
    truth; quantization error vs the source verts is bounded separately."""
    from gfxexp_tpu.accel.pallas_qrow import (
        build_qrow,
        intersect_any_qrow,
        intersect_closest_qrow,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 300)
    qb, perm, (dq0, dqe1, dqe2) = build_qrow(p0, p1 - p0, p2 - p0)
    # vertex quantization error bound: 16-bit vs the leaf box extent
    assert np.abs(dq0 - p0[perm]).max() < 1e-3
    soa = _make_soa(dq0, dq0 + dqe1, dq0 + dqe2)

    n_rays = 400
    o = rng_np.uniform(-8, 8, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    hq = intersect_closest_qrow(qb, soa, oj, dj)
    hr = intersect_closest_brute(soa, oj, dj)
    assert np.array_equal(np.asarray(hq.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(hq.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hq.tri)[m], np.asarray(hr.tri)[m])
    occ = intersect_any_qrow(qb, soa, oj, dj)
    assert np.array_equal(np.asarray(occ), m)


def test_qrow_chunked_matches_bruteforce(rng_np):
    """Chunked quantized tables (tiny max_rows forces several chunks +
    per-tile culled worklists) agree with brute force."""
    from gfxexp_tpu.accel.pallas_qrow import (
        build_qrow,
        intersect_closest_qrow,
    )

    p0, p1, p2 = _random_tri_soup(rng_np, 600, spread=6.0)
    qb, perm, (dq0, dqe1, dqe2) = build_qrow(p0, p1 - p0, p2 - p0,
                                             max_rows=64)
    assert qb.num_chunks > 2, qb.num_chunks
    soa = _make_soa(dq0, dq0 + dqe1, dq0 + dqe2)
    n_rays = 300
    o = rng_np.uniform(-9, 9, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    hq = intersect_closest_qrow(qb, soa, oj, dj)
    hr = intersect_closest_brute(soa, oj, dj)
    assert np.array_equal(np.asarray(hq.hit), np.asarray(hr.hit))
    m = np.asarray(hr.hit)
    assert np.allclose(np.asarray(hq.t)[m], np.asarray(hr.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hq.tri)[m], np.asarray(hr.tri)[m])


def test_qrow_render_matches_widerow():
    """Full pipeline through the quantized structure: the qrow render of
    the box scene matches the widerow render to quantization + MC noise."""
    import sys

    sys.path.insert(0, "tests")
    from scenes import box_scene

    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.compile import compile_scene

    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    imgs = []
    for traversal in ("widerow", "qrow"):
        scene, bvh = compile_scene(box_scene(), traversal=traversal)
        acc = np.zeros((48 * 48, 3), np.float64)
        for s in range(4):
            acc += np.asarray(render_sample(scene, bvh, cam, 48, 48,
                                            jnp.uint32(s), PTConfig()))
        imgs.append(acc / 4)
    a, b = imgs
    assert np.isfinite(b).all()
    # same RNG + same (epsilon-shifted) geometry: near-identical images
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(a - b).mean() / denom < 0.02, \
        np.abs(a - b).mean() / denom


def test_instanced_qrow_removed():
    """The quantized instanced variant was removed in r5 (TPU-worker Mosaic
    crash, perf/RESULTS_r4.md:101-104): requesting it must raise, not
    silently fall back."""
    import pytest

    from gfxexp_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    m = b.add_lambert_material((0.5, 0.5, 0.5))
    b.add_instance(b.add_rectangle(1.0, 1.0, m))
    with pytest.raises(ValueError, match="qrow"):
        b.compile_instanced(node_format="qrow")


def test_instanced_render_full_pipeline():
    """Full pipeline through instanced BLAS tables renders finite,
    non-trivial images (formerly the qrow-vs-widerow A/B)."""
    import sys

    sys.path.insert(0, "tests")
    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene

    def build():
        b = SceneBuilder()
        floor = b.add_lambert_material((0.75, 0.75, 0.75))
        red = b.add_lambert_material((0.8, 0.25, 0.2))
        lamp = b.add_lambert_material((0, 0, 0), emittance=(90.0,) * 3)
        b.add_instance(b.add_rectangle(3.0, 3.0, floor))
        flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
        b.add_instance(b.add_rectangle(0.5, 0.5, lamp),
                       affine(rotation=flip, translation=[0, 1.6, 0]))
        sg = b.add_sphere(0.2, red, n_theta=8, n_phi=16)
        for gx in range(2):
            for gz in range(2):
                b.add_instance(sg, affine(
                    translation=[(gx - 0.5) * 0.8, 0.2, (gz - 0.5) * 0.8]))
        return b

    cam = make_camera([0.0, 1.4, 2.2], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0, 0.1, 0])
    scene, acc = compile_scene(build(), traversal="instanced")
    out = np.zeros((40 * 40, 3), np.float64)
    for s in range(4):
        out += np.asarray(render_sample(
            scene, acc, cam, 40, 40, jnp.uint32(s),
            PTConfig(max_path_length=3)))
    out /= 4
    assert np.isfinite(out).all()
    assert out.mean() > 1e-3  # lit scene, not black


def test_native_sbvh_matches_numpy(rng_np):
    """Native SBVH must be traversal-equivalent to the numpy SBVH oracle
    (same closest hits on the same ORIGINAL triangles; duplicate
    references may differ in layout, so compare via each build's own
    permuted soup)."""
    from gfxexp_tpu.accel.native import native_available

    if not native_available():
        pytest.skip("native builder not built")
    # long diagonals + soup: the spatial-split-heavy case
    n_long, n_soup = 50, 150
    a = rng_np.uniform(-4, 4, size=(n_long, 3))
    dv = rng_np.normal(size=(n_long, 3))
    dv = 6.0 * dv / np.linalg.norm(dv, axis=-1, keepdims=True)
    w = rng_np.normal(scale=0.05, size=(n_long, 3))
    s0, s1, s2 = _random_tri_soup(rng_np, n_soup)
    p0 = np.concatenate([a, s0]).astype(np.float32)
    p1 = np.concatenate([a + dv, s1]).astype(np.float32)
    p2 = np.concatenate([a + dv * 0.5 + w, s2]).astype(np.float32)

    bvh_n, perm_n = build_bvh(p0, p1 - p0, p2 - p0, arity=4,
                              spatial_splits=True, use_native=True)
    bvh_p, perm_p = build_bvh(p0, p1 - p0, p2 - p0, arity=4,
                              spatial_splits=True, use_native=False)
    assert perm_n.shape[0] > p0.shape[0]  # native splits fired too
    soa_n = _make_soa(p0[perm_n], p1[perm_n], p2[perm_n])
    soa_p = _make_soa(p0[perm_p], p1[perm_p], p2[perm_p])
    n_rays = 300
    o = rng_np.uniform(-6, 6, size=(n_rays, 3)).astype(np.float32)
    d = rng_np.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hn = intersect_closest(bvh_n, soa_n, jnp.asarray(o), jnp.asarray(d))
    hp = intersect_closest(bvh_p, soa_p, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(hn.hit), np.asarray(hp.hit))
    m = np.asarray(hn.hit)
    assert np.allclose(np.asarray(hn.t)[m], np.asarray(hp.t)[m], rtol=1e-4)
    # same ORIGINAL triangle where ts are distinct (duplicates tie on t)
    tri_n = np.asarray(perm_n)[np.asarray(hn.tri)[m]]
    tri_p = np.asarray(perm_p)[np.asarray(hp.tri)[m]]
    tmatch = np.isclose(np.asarray(hn.t)[m], np.asarray(hp.t)[m],
                        rtol=1e-5, atol=1e-6)
    assert np.all((tri_n == tri_p) | tmatch)
