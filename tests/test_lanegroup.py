"""Lane-group traversal prototype (accel/pallas_lanegroup.py) against the
brute-force oracle and the widestack kernel — the per-iteration math is
shared; the sub-row cursor scheduling is new (VERDICT r5 item #5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.accel.pallas_lanegroup import intersect_closest_lanegroup
from gfxexp_tpu.accel.pallas_widestack import (
    build_widerow,
    intersect_closest_widestack,
)
from gfxexp_tpu.accel.traverse import intersect_closest_brute
from gfxexp_tpu.scene.types import TriangleSoA


def _make_soa(p0, e1, e2):
    z3 = jnp.zeros_like(jnp.asarray(p0))
    z2 = jnp.zeros((p0.shape[0], 2), jnp.float32)
    return TriangleSoA(
        p0=jnp.asarray(p0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
        unit_id=jnp.zeros((p0.shape[0],), jnp.int32))


def _scene(rng, n=400):
    p0 = rng.normal(size=(n, 3)).astype(np.float32)
    e1 = (rng.normal(size=(n, 3)) * 0.3).astype(np.float32)
    e2 = (rng.normal(size=(n, 3)) * 0.3).astype(np.float32)
    bvh, perm = build_widerow(p0, e1, e2)
    return bvh, _make_soa(p0[perm], e1[perm], e2[perm])


def _rays(rng, nr):
    o = (rng.normal(size=(nr, 3)) * 3).astype(np.float32)
    d = rng.normal(size=(nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_lanegroup_matches_brute(rng_np, groups):
    bvh, tris = _scene(rng_np)
    o, d = _rays(rng_np, 2048)
    ref = intersect_closest_brute(tris, o, d)
    h = intersect_closest_lanegroup(bvh, tris, o, d, rows=4, groups=groups)
    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(h.tri), np.asarray(ref.tri))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-5)


def test_lanegroup_footprint_not_larger(rng_np):
    """The point of the prototype: a 64-lane group's union walk must not
    exceed its 128-lane row's union walk (and on incoherent rays should be
    strictly smaller in aggregate)."""
    bvh, tris = _scene(rng_np, n=800)
    o, d = _rays(rng_np, 1024)
    _, it_row = intersect_closest_widestack(bvh, tris, o, d, rows=8,
                                            with_stats=True)
    _, it_grp = intersect_closest_lanegroup(bvh, tris, o, d, rows=8,
                                            groups=2, with_stats=True)
    it_row = np.asarray(it_row)
    it_grp = np.asarray(it_grp)
    # not provably <= per lane (nearest-first ordering differs between the
    # row-min and group-min walks), but the aggregate must shrink: a
    # 64-lane union is a subset of its 128-lane union
    assert it_grp.sum() < it_row.sum()
    assert it_grp.mean() <= it_row.mean()


def test_lanegroup_ragged_batches(rng_np):
    bvh, tris = _scene(rng_np, n=120)
    for nr in (37, 700):
        o, d = _rays(rng_np, nr)
        ref = intersect_closest_widestack(bvh, tris, o, d)
        h = intersect_closest_lanegroup(bvh, tris, o, d, rows=4, groups=2)
        np.testing.assert_array_equal(np.asarray(h.tri), np.asarray(ref.tri))
