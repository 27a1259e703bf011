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
    p [..., 3] in [0,1]. Returns [..., L*F].

    Vectorized over levels AND corners into ONE gather from the flattened
    [L*T, F] table (r5): the original per-level/per-corner loop emitted
    16 x 8 = 128 separate gathers forward and 128 scatter-adds backward —
    the measured NRC train_step bottleneck on TPU (perf/RESULTS_r5.md).
    One gather / one fused scatter-add over [B, L*8] indices is the
    XLA-friendly shape; the math (hash, weights, level output order) is
    bit-identical (tests/test_nrc.py parity vs the naive loop)."""
    n_levels, t_size, n_feat = table.shape
    batch = p.shape[:-1]
    res = jnp.asarray(
        [float(int(np.floor(HASH_BASE_RES * HASH_PER_LEVEL_SCALE**level)))
         for level in range(n_levels)], p.dtype)
    pf = p[..., None, :] * res[:, None]            # [..., L, 3]
    p0 = jnp.floor(pf).astype(jnp.int32)
    fw = pf - p0
    offs = jnp.asarray(
        [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
        jnp.int32)                                 # [8, 3]
    c = (p0[..., None, :] + offs).astype(jnp.uint32)  # [..., L, 8, 3]
    # spatial hash (dense indexing would also fit for small res, but
    # hashing everywhere matches tcnn behavior closely enough)
    h = (
        c[..., 0] * jnp.uint32(_PRIMES[0])
        ^ c[..., 1] * jnp.uint32(_PRIMES[1] & 0xFFFFFFFF)
        ^ c[..., 2] * jnp.uint32(_PRIMES[2])
    ) & jnp.uint32(t_size - 1)                     # [..., L, 8]
    idx = h.astype(jnp.int32) + (
        jnp.arange(n_levels, dtype=jnp.int32)[:, None] * t_size)
    w = jnp.prod(
        jnp.where(offs == 1, fw[..., None, :], 1.0 - fw[..., None, :]),
        axis=-1)                                   # [..., L, 8]
    feat = table.reshape(n_levels * t_size, n_feat)[idx]  # ONE gather
    out = jnp.sum(w[..., None] * feat, axis=-2)    # [..., L, F]
    return out.reshape(batch + (n_levels * n_feat,))
