"""NRC input encodings: TriangleWave, OneBlob, HashGrid.

Reproduces the reference's tiny-cuda-nn encoding configuration
(reference: neural_radiance_caching/network_interface.cu:72-120 —
TriangleWave(n_frequencies=12) or HashGrid(n_levels=16, F=2,
log2_hashmap_size=15, base_resolution=16, per_level_scale=2.0) on position,
OneBlob(n_bins=4) on the 4 polar direction/normal dims + roughness, Identity
on the 6 reflectance dims).

All functions take [..., D] arrays in [0, 1] and are differentiable (the hash
table is a learned parameter)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

N_FREQUENCIES = 12
ONE_BLOB_BINS = 4
HASH_LEVELS = 16
HASH_FEATURES = 2
LOG2_HASH_SIZE = 15
HASH_BASE_RES = 16
HASH_PER_LEVEL_SCALE = 2.0

_PRIMES = (1, 2654435761, 805459861)


def triangle_wave_encoding(x, n_frequencies: int = N_FREQUENCIES):
    """tiny-cuda-nn TriangleWave: tri(2^l * x) per level, tri with period 2
    mapped to [0, 1] (matches tcnn's encoding.h triangle wave)."""
    freqs = jnp.asarray([float(1 << l) for l in range(n_frequencies)])
    v = x[..., :, None] * freqs  # [..., D, L]
    tri = jnp.abs(2.0 * (v - jnp.floor(v + 0.5)))
    return tri.reshape(x.shape[:-1] + (x.shape[-1] * n_frequencies,))


def one_blob_encoding(x, n_bins: int = ONE_BLOB_BINS):
    """OneBlob (NRC paper / tcnn): Gaussian kernel of sigma = 1/n_bins
    integrated per bin, evaluated at bin centers."""
    centers = (jnp.arange(n_bins) + 0.5) / n_bins
    sigma = 1.0 / n_bins
    d = x[..., :, None] - centers  # [..., D, B]
    blob = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * jnp.sqrt(2.0 * jnp.pi))
    blob = blob / n_bins  # integrate over the bin width
    return blob.reshape(x.shape[:-1] + (x.shape[-1] * n_bins,))


def init_hash_table(key, n_levels: int = HASH_LEVELS,
                    features: int = HASH_FEATURES,
                    log2_size: int = LOG2_HASH_SIZE):
    """[L, T, F] learned feature table, U(-1e-4, 1e-4) like tcnn."""
    return jax.random.uniform(
        key, (n_levels, 1 << log2_size, features), jnp.float32,
        minval=-1e-4, maxval=1e-4,
    )


def hash_grid_encoding(table, p):
    """Multiresolution hash encoding (Muller et al. 2022) of positions
    p [..., 3] in [0,1]. Returns [..., L*F]."""
    n_levels, t_size, n_feat = table.shape
    outs = []
    for level in range(n_levels):
        res = int(np.floor(HASH_BASE_RES * HASH_PER_LEVEL_SCALE**level))
        pf = p * res
        p0 = jnp.floor(pf).astype(jnp.int32)
        fw = pf - p0
        feat = 0.0
        for corner in range(8):
            off = jnp.asarray(
                [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
                jnp.int32,
            )
            c = (p0 + off).astype(jnp.uint32)
            # spatial hash (dense indexing would also fit for small res, but
            # hashing everywhere matches tcnn behavior closely enough)
            h = (
                c[..., 0] * jnp.uint32(_PRIMES[0])
                ^ c[..., 1] * jnp.uint32(_PRIMES[1] & 0xFFFFFFFF)
                ^ c[..., 2] * jnp.uint32(_PRIMES[2])
            ) & jnp.uint32(t_size - 1)
            h = h.astype(jnp.int32)
            w = jnp.prod(
                jnp.where(off[None, :] == 1, fw, 1.0 - fw), axis=-1
            )
            feat = feat + w[..., None] * table[level, h]
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)
