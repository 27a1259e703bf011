"""Perlin noise + multi-octave fBm (reference: common_shared.h:562-748 —
PerlinNoise3D / MultiOctavePerlinNoise3D, used by the displacement demos).

Classic Perlin with the reference's permutation-table construction, batched
over [..., 3] points."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PERM = None


def _perm_table():
    global _PERM
    if _PERM is None:
        rng = np.random.default_rng(1)  # fixed table, like Perlin's classic
        p = rng.permutation(256)
        _PERM = jnp.asarray(np.concatenate([p, p]).astype(np.int32))
    return _PERM


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def _grad(h, x, y, z):
    """Classic 12-gradient scheme."""
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return (jnp.where(h & 1 == 0, u, -u)
            + jnp.where(h & 2 == 0, v, -v))


def perlin3d(p):
    """Perlin noise at points [..., 3]; values roughly in [-1, 1]."""
    perm = _perm_table()
    pf = jnp.floor(p)
    pi = pf.astype(jnp.int32) & 255
    d = p - pf
    u = _fade(d[..., 0])
    v = _fade(d[..., 1])
    w = _fade(d[..., 2])
    x, y, z = pi[..., 0], pi[..., 1], pi[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]

    def hash3(xi, yi, zi):
        return perm[perm[perm[xi] + yi] + zi] & 15

    def corner(ox, oy, oz):
        h = hash3(x + ox, y + oy, z + oz)
        return _grad(h, dx - ox, dy - oy, dz - oz)

    def lerp(a, b, t):
        return a + t * (b - a)

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    return lerp(
        lerp(lerp(c000, c100, u), lerp(c010, c110, u), v),
        lerp(lerp(c001, c101, u), lerp(c011, c111, u), v),
        w,
    )


def multi_octave_perlin3d(p, num_octaves: int = 4, persistence: float = 0.5,
                          frequency: float = 1.0):
    """fBm sum of octaves (reference: MultiOctavePerlinNoise3D)."""
    total = 0.0
    amplitude = 1.0
    freq = frequency
    norm = 0.0
    for _ in range(num_octaves):
        total = total + amplitude * perlin3d(p * freq)
        norm += amplitude
        amplitude *= persistence
        freq *= 2.0
    return total / norm
