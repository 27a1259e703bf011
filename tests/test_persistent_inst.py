"""Persistent-instanced traversal vs the static (tiles x entries) grid.

Oracle: _traverse_instanced (itself validated against world-space brute
force in test_accel.py). The persistent kernel must agree on hits, t,
triangle ids and instance attribution, across multi-instance scenes,
rebraided builds, and ragged ray counts."""

import numpy as np
import jax.numpy as jnp
import pytest

from gfxexp_tpu.accel.pallas_widestack import (
    _traverse_instanced,
    build_instanced,
)
from gfxexp_tpu.accel.pallas_persistent_inst import (
    _traverse_persistent_inst,
    intersect_any_persistent_inst,
)


@pytest.fixture
def rng_np():
    return np.random.default_rng(7)


def _soup(rng, n, spread):
    c = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    e1 = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    e2 = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    return c, c + e1, c + e2


def _grid_instances(nx, nz, spacing=2.5):
    instances = []
    for gx in range(nx):
        for gz in range(nz):
            m = np.zeros((3, 4), np.float32)
            m[0, 0] = m[1, 1] = m[2, 2] = 1.0
            m[:, 3] = [gx * spacing, 0.0, gz * spacing]
            instances.append((0, m))
    return instances


def _rays(rng, n, lo=-4, hi=12):
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _check(acc, o, d, **kw):
    hs, is_ = _traverse_instanced(acc, o, d, 1e-4, 1e30, any_hit=False)
    hp, ip = _traverse_persistent_inst(acc, o, d, 1e-4, 1e30,
                                       any_hit=False, **kw)
    assert np.array_equal(np.asarray(hs.hit), np.asarray(hp.hit))
    m = np.asarray(hs.hit)
    assert np.allclose(np.asarray(hs.t)[m], np.asarray(hp.t)[m], rtol=1e-4)
    assert np.array_equal(np.asarray(hs.tri)[m], np.asarray(hp.tri)[m])
    assert np.array_equal(np.asarray(is_)[m], np.asarray(ip)[m])


def test_persistent_inst_matches_static_grid(rng_np):
    p = _soup(rng_np, 60, 0.8)
    q = _soup(rng_np, 35, 0.6)
    instances = _grid_instances(3, 3)
    # second BLAS on a few of the grid slots
    for j in (1, 4, 7):
        b, m = instances[j]
        instances[j] = (1, m)
    acc, _ = build_instanced(
        [(p[0], p[1] - p[0], p[2] - p[0]),
         (q[0], q[1] - q[0], q[2] - q[0])], instances)
    o, d = _rays(rng_np, 500)
    _check(acc, o, d)


def test_persistent_inst_grazing_rows(rng_np):
    """Grazing rays marching down an instance row exercise nearest-first
    ordering + the distance termination (no later entry may be skipped
    while it could still beat some lane's best t)."""
    p = _soup(rng_np, 40, 0.5)
    acc, _ = build_instanced([(p[0], p[1] - p[0], p[2] - p[0])],
                             _grid_instances(4, 4))
    n = 512
    o = np.empty((n, 3), np.float32)
    d = np.empty((n, 3), np.float32)
    o[:] = np.random.default_rng(3).uniform(-4, 0, size=(n, 3))
    o[:, 1] *= 0.2
    d[:] = np.array([1.0, 0.0, 0.0]) + np.random.default_rng(4).normal(
        scale=0.05, size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    _check(acc, jnp.asarray(o), jnp.asarray(d))


def test_persistent_inst_anyhit_and_ragged(rng_np):
    p = _soup(rng_np, 50, 0.7)
    acc, _ = build_instanced([(p[0], p[1] - p[0], p[2] - p[0])],
                             _grid_instances(2, 3))
    o, d = _rays(rng_np, 333)  # not a multiple of 128
    hs, _ = _traverse_instanced(acc, o, d, 1e-4, 1e30, any_hit=True)
    occ = intersect_any_persistent_inst(acc, o, d)
    assert np.array_equal(np.asarray(hs.hit), np.asarray(occ))
    _check(acc, o, d)


def test_persistent_inst_rebraid_and_small_pool(rng_np):
    p = _soup(rng_np, 80, 1.2)
    acc, _ = build_instanced([(p[0], p[1] - p[0], p[2] - p[0])],
                             _grid_instances(3, 2), rebraid=3.0)
    assert acc.num_entries > 6  # rebraiding actually opened subtrees
    o, d = _rays(rng_np, 400)
    _check(acc, o, d, pool=128, sched_k=4)  # force multi-grid-step + tail
