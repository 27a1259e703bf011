"""Importance-sampling distributions.

TPU-native counterpart of the reference's sampling distributions
(reference: common_shared.h:176 `DiscreteDistribution1DTemplate` — CDF binary
search or Walker alias method; :283 `RegularConstantContinuousDistribution1D`;
:359 `...2D` used for environment-map importance sampling; CDF built on GPU via
CUBd exclusive scan + kernels in common/gpu_kernels/compute_light_probs.cu).

Here CDFs are built with `jnp.cumsum` and sampled with vectorized
`searchsorted`; the alias table is built host-side (numpy, O(n)) and sampled
with one gather — both are natural TPU access patterns.

A distribution over n weights is represented by a small pytree of arrays so it
can live inside jitted scene state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from flax import struct as _fstruct


class DiscreteDistribution1D(NamedTuple):
    """Discrete PMF over n items. `cdf` has length n+1 with cdf[0]=0, cdf[n]=1
    (normalized); `integral` is the sum of the raw weights; `pmf` is the
    normalized probability per item."""

    pmf: jnp.ndarray  # [n]
    cdf: jnp.ndarray  # [n + 1]
    integral: jnp.ndarray  # []

    @property
    def size(self):
        return self.pmf.shape[-1]


def build_discrete_1d(weights) -> DiscreteDistribution1D:
    """Build from non-negative weights [..., n] (device-side, jit-safe)."""
    w = jnp.maximum(jnp.asarray(weights, jnp.float32), 0.0)
    integral = jnp.sum(w, axis=-1)
    safe = jnp.where(integral > 0.0, integral, 1.0)
    pmf = w / safe[..., None]
    cdf = jnp.concatenate(
        [jnp.zeros_like(pmf[..., :1]), jnp.cumsum(pmf, axis=-1)], axis=-1
    )
    # force exact 1.0 at the end to make searchsorted robust
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-20)
    return DiscreteDistribution1D(pmf=pmf, cdf=cdf, integral=integral)


def sample_discrete_1d(dist: DiscreteDistribution1D, u):
    """Sample item indices. u: [...] in [0,1). Returns (index, pmf)."""
    idx = jnp.searchsorted(dist.cdf, u, side="right") - 1
    idx = jnp.clip(idx, 0, dist.size - 1)
    return idx, dist.pmf[idx]


def sample_discrete_1d_remapped(dist: DiscreteDistribution1D, u):
    """Sample and also return the remapped uniform within the chosen bin
    (reference samples reuse the uniform this way in RIS streaming)."""
    idx, pmf = sample_discrete_1d(dist, u)
    lo = dist.cdf[idx]
    width = dist.cdf[idx + 1] - lo
    u_re = jnp.where(width > 0.0, (u - lo) / jnp.where(width > 0.0, width, 1.0), 0.0)
    return idx, pmf, jnp.clip(u_re, 0.0, 1.0 - 1e-7)


# ---------------------------------------------------------------------------
# Walker alias method (reference: USE_WALKER_ALIAS_METHOD, common_shared.h:22)
# ---------------------------------------------------------------------------


class AliasTable(NamedTuple):
    pmf: jnp.ndarray  # [n]
    prob: jnp.ndarray  # [n] probability of keeping the bucket's own item
    alias: jnp.ndarray  # [n] alternative item index
    integral: jnp.ndarray  # []


def vose_alias_arrays(weights: np.ndarray):
    """Host-side O(n) Vose construction; returns numpy (pmf, prob, alias,
    integral). Shared by build_alias_table and the scene builder's
    segmented per-unit light tables."""
    w = np.maximum(np.asarray(weights, np.float64), 0.0)
    n = w.shape[0]
    integral = w.sum()
    if integral <= 0.0:
        p = np.full(n, 1.0 / n)
    else:
        p = w / integral
    scaled = p * n
    prob = np.ones(n)
    alias = np.arange(n)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    for i in large + small:
        prob[i] = 1.0
    return p, prob, alias, integral


def build_alias_table(weights: np.ndarray) -> AliasTable:
    """Host-side O(n) Vose construction from non-negative weights [n]."""
    p, prob, alias, integral = vose_alias_arrays(weights)
    return AliasTable(
        pmf=jnp.asarray(p, jnp.float32),
        prob=jnp.asarray(prob, jnp.float32),
        alias=jnp.asarray(alias, jnp.int32),
        integral=jnp.asarray(integral, jnp.float32),
    )


def sample_alias(table: AliasTable, u):
    """O(1) sampling: u in [0,1) -> (index, pmf)."""
    n = table.pmf.shape[0]
    scaled = u * n
    bucket = jnp.clip(scaled.astype(jnp.int32), 0, n - 1)
    frac = scaled - bucket.astype(jnp.float32)
    keep = frac < table.prob[bucket]
    idx = jnp.where(keep, bucket, table.alias[bucket])
    return idx, table.pmf[idx]


# ---------------------------------------------------------------------------
# regular continuous 1D / 2D — environment map importance sampling
# (reference: RegularConstantContinuousDistribution1D/2D, common_shared.h:283,359;
#  built by loadEnvironmentalTexture, common_host.cpp:2658)
# ---------------------------------------------------------------------------


class Continuous2D(NamedTuple):
    """Piecewise-constant 2D pdf over [0,1]^2 from an importance image [H, W].

    conditional_cdf: [H, W+1] per-row CDF; marginal_cdf: [H+1] over rows;
    pdf: [H, W] joint density (integrates to 1 over the unit square)."""

    conditional_cdf: jnp.ndarray
    marginal_cdf: jnp.ndarray
    pdf: jnp.ndarray
    integral: jnp.ndarray


def build_continuous_2d(importance) -> Continuous2D:
    imp = jnp.maximum(jnp.asarray(importance, jnp.float32), 0.0)
    h, w = imp.shape
    row_sum = jnp.sum(imp, axis=1)  # [H]
    total = jnp.sum(row_sum)
    safe_rows = jnp.where(row_sum > 0.0, row_sum, 1.0)
    cond_pmf = imp / safe_rows[:, None]
    cond_cdf = jnp.concatenate(
        [jnp.zeros((h, 1), jnp.float32), jnp.cumsum(cond_pmf, axis=1)], axis=1
    )
    cond_cdf = cond_cdf / jnp.maximum(cond_cdf[:, -1:], 1e-20)
    safe_total = jnp.where(total > 0.0, total, 1.0)
    marg_pmf = row_sum / safe_total
    marg_cdf = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(marg_pmf)])
    marg_cdf = marg_cdf / jnp.maximum(marg_cdf[-1:], 1e-20)
    # joint density in the unit square: p(u,v) = pmf_ij * H * W
    pdf = (marg_pmf[:, None] * cond_pmf) * (h * w)
    return Continuous2D(
        conditional_cdf=cond_cdf,
        marginal_cdf=marg_cdf,
        pdf=pdf,
        integral=total / (h * w),
    )


def sample_continuous_2d(dist: Continuous2D, u0, u1):
    """Sample (u, v) in [0,1)^2 plus density. u0 picks the row (v-axis),
    u1 the column (u-axis). Returns (u, v, pdf)."""
    h, w = dist.pdf.shape
    row = jnp.clip(jnp.searchsorted(dist.marginal_cdf, u0, side="right") - 1, 0, h - 1)
    row_lo = dist.marginal_cdf[row]
    row_w = dist.marginal_cdf[row + 1] - row_lo
    dv = jnp.where(row_w > 0.0, (u0 - row_lo) / jnp.where(row_w > 0.0, row_w, 1.0), 0.5)
    cond = dist.conditional_cdf[row]  # [..., W+1], per-lane row
    col = _rowwise_searchsorted(cond, u1)
    col = jnp.clip(col, 0, w - 1)
    col_lo = jnp.take_along_axis(cond, col[..., None], axis=-1)[..., 0]
    col_hi = jnp.take_along_axis(cond, col[..., None] + 1, axis=-1)[..., 0]
    col_w = col_hi - col_lo
    du = jnp.where(col_w > 0.0, (u1 - col_lo) / jnp.where(col_w > 0.0, col_w, 1.0), 0.5)
    u = (col.astype(jnp.float32) + du) / w
    v = (row.astype(jnp.float32) + dv) / h
    return u, v, dist.pdf[row, col]


def _rowwise_searchsorted(cdf_rows, u):
    """Vectorized binary search where each lane has its own row. cdf_rows:
    [..., W+1], u: [...]."""
    wp1 = cdf_rows.shape[-1]
    lo = jnp.zeros(u.shape, jnp.int32)
    hi = jnp.full(u.shape, wp1 - 1, jnp.int32)
    n_steps = int(np.ceil(np.log2(max(wp1, 2))))
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        mid_val = jnp.take_along_axis(cdf_rows, mid[..., None], axis=-1)[..., 0]
        go_right = mid_val <= u
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def continuous_2d_pdf(dist: Continuous2D, u, v):
    """Density at (u, v) in [0,1)^2."""
    h, w = dist.pdf.shape
    col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    return dist.pdf[row, col]


# ---------------------------------------------------------------------------
# hierarchical probability texture (reference: ProbabilityTexture,
# common_shared.h:406 — mip-descent sampling, the USE_PROBABILITY_TEXTURE
# alternative to CDF binary search; O(num mips) per sample)
# ---------------------------------------------------------------------------


class ProbabilityTexture(_fstruct.PyTreeNode):
    """Power-of-two 2D weight image + its sum-mip pyramid, sampled by quad
    descent. levels[l] is [S>>l, S>>l] stored padded in one [L, S, S] array.
    size/n_levels are STATIC (they steer Python loops under jit)."""

    levels: jnp.ndarray  # [L, S, S]
    integral: jnp.ndarray  # []
    size: int = _fstruct.field(pytree_node=False)
    n_levels: int = _fstruct.field(pytree_node=False)


def build_probability_texture(weights) -> ProbabilityTexture:
    import numpy as _np

    w = _np.maximum(_np.asarray(weights, _np.float64), 0.0)
    s = w.shape[0]
    assert w.shape == (s, s) and (s & (s - 1)) == 0, "square pow2"
    levels = [w]
    while levels[-1].shape[0] > 1:
        m = levels[-1]
        levels.append(m[0::2, 0::2] + m[1::2, 0::2] + m[0::2, 1::2] + m[1::2, 1::2])
    n = len(levels)
    padded = _np.zeros((n, s, s), _np.float64)
    for l, lv in enumerate(levels):
        padded[l, : lv.shape[0], : lv.shape[1]] = lv
    return ProbabilityTexture(
        levels=jnp.asarray(padded, jnp.float32),
        integral=jnp.float32(levels[-1][0, 0]),
        size=s,
        n_levels=n,
    )


def sample_probability_texture(pt: ProbabilityTexture, u0, u1):
    """Mip descent: at each level pick one of the 4 children proportionally,
    re-using the remapped uniforms. Returns (ix, iy, pmf, u0, u1) — texel
    indices in the finest level, its normalized probability, and the
    conditionally-remapped uniforms (reusable downstream like the
    reference's remapped CDF draws)."""
    ix = jnp.zeros(jnp.shape(u0), jnp.int32)
    iy = jnp.zeros(jnp.shape(u0), jnp.int32)
    for level in range(pt.n_levels - 2, -1, -1):
        x0 = 2 * ix
        y0 = 2 * iy
        w00 = pt.levels[level, y0, x0]
        w10 = pt.levels[level, y0, x0 + 1]
        w01 = pt.levels[level, y0 + 1, x0]
        w11 = pt.levels[level, y0 + 1, x0 + 1]
        total = jnp.maximum(w00 + w10 + w01 + w11, 1e-30)
        # descend on x first (left column prob), then y within the column
        p_left = (w00 + w01) / total
        go_right = u0 >= p_left
        u0 = jnp.where(go_right,
                       (u0 - p_left) / jnp.maximum(1.0 - p_left, 1e-20),
                       u0 / jnp.maximum(p_left, 1e-20))
        u0 = jnp.clip(u0, 0.0, 1.0 - 1e-7)
        top = jnp.where(go_right, w10, w00)
        bot = jnp.where(go_right, w11, w01)
        col = jnp.maximum(top + bot, 1e-30)
        p_top = top / col
        go_down = u1 >= p_top
        u1 = jnp.where(go_down,
                       (u1 - p_top) / jnp.maximum(1.0 - p_top, 1e-20),
                       u1 / jnp.maximum(p_top, 1e-20))
        u1 = jnp.clip(u1, 0.0, 1.0 - 1e-7)
        ix = x0 + go_right.astype(jnp.int32)
        iy = y0 + go_down.astype(jnp.int32)
    pmf = pt.levels[0, iy, ix] / jnp.maximum(pt.integral, 1e-30)
    return ix, iy, pmf, u0, u1


def probability_texture_pmf(pt: ProbabilityTexture, ix, iy):
    return pt.levels[0, iy, ix] / jnp.maximum(pt.integral, 1e-30)
