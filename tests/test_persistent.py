"""Persistent row-slot traversal kernel (accel/pallas_persistent.py)
against the brute-force oracle and the wide-stack kernel it replaces on
single-chunk scenes (SURVEY.md §4 oracle strategy; the scheduling is new,
the per-iteration math is shared with pallas_widestack)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.accel.pallas_persistent import (
    intersect_any_persistent,
    intersect_closest_persistent,
    persistent_supported,
)
from gfxexp_tpu.accel.pallas_widestack import (
    build_widerow,
    intersect_any_widestack,
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


def test_persistent_matches_brute(rng_np):
    bvh, tris = _scene(rng_np)
    assert persistent_supported(bvh)
    o, d = _rays(rng_np, 3000)
    ref = intersect_closest_brute(tris, o, d)
    h = intersect_closest_persistent(bvh, tris, o, d, rows=8, pool=16)
    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(np.asarray(h.tri), np.asarray(ref.tri))
    m = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.u)[m], np.asarray(ref.u)[m],
                               atol=2e-3)


def test_persistent_anyhit_matches_widestack(rng_np):
    bvh, tris = _scene(rng_np)
    o, d = _rays(rng_np, 2000)
    # per-ray t_max including dead lanes (t_max < 0 => no traversal work)
    t_max = jnp.where(jnp.arange(2000) % 5 == 0, -1.0,
                      2.0 + (jnp.arange(2000) % 7).astype(jnp.float32))
    aw = np.asarray(intersect_any_widestack(bvh, tris, o, d, t_max=t_max))
    ap = np.asarray(intersect_any_persistent(bvh, tris, o, d, t_max=t_max,
                                             rows=8, pool=16))
    np.testing.assert_array_equal(ap, aw)
    assert not ap[::5].any()  # dead lanes never hit


def test_persistent_ragged_and_small_batches(rng_np):
    """Ray counts that don't fill a pool tile (padding rows drain in one
    iteration) and pools larger than the ray population."""
    bvh, tris = _scene(rng_np, n=120)
    for nr in (37, 1024, 2000):
        o, d = _rays(rng_np, nr)
        ref = intersect_closest_widestack(bvh, tris, o, d)
        h = intersect_closest_persistent(bvh, tris, o, d, rows=8, pool=32)
        np.testing.assert_array_equal(np.asarray(h.tri), np.asarray(ref.tri))


def test_persistent_with_stats(rng_np):
    bvh, tris = _scene(rng_np, n=200)
    o, d = _rays(rng_np, 1024)
    h, iters = intersect_closest_persistent(bvh, tris, o, d, rows=8,
                                            pool=16, with_stats=True)
    it = np.asarray(iters)
    assert it.shape == (1024,)
    assert (it >= 1).all()  # every live row visits at least the root
    # a row's lanes share one walk: all 128 lanes report the same count
    assert (it.reshape(8, 128) == it.reshape(8, 128)[:, :1]).all()
