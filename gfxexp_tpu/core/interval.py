"""Interval and affine arithmetic (vectorized, jnp).

Counterpart of the reference's directed-rounding interval/affine library
(reference: tfdm/affine_arithmetic.h — IAFloat:271, AAFloatOn2D:631, vector
forms :910-1171). TPUs expose no per-op rounding-mode control, so directed
rounding is replaced by epsilon OUTWARD WIDENING after every operation
(SURVEY.md §7 phase 5): results are conservative supersets at ~1 ulp of
slack per op instead of exactly-rounded bounds.

Two layers:
- **Intervals** are (lo, hi) array pairs; ops return widened pairs.
- **Affine forms** are (c0, cs, r): value = c0 + sum_k cs[..., k] * e_k + r*e,
  with independent noise symbols e_k in [-1, 1] and a condensed extra term
  r >= 0. Affine forms track FIRST-ORDER correlation between quantities
  sharing noise symbols — the reason the reference uses them for
  displaced-patch bounds: (h - h) = 0 exactly, where plain intervals give
  [-w, w].

Used by the NRTDSM exact curved-ray machinery
(techniques/nrtdsm.py nonlinear_ray_vs_aabb / _vs_micro_triangle) and
available to any bounding code; validated by inclusion-property tests
against dense sampling (tests/test_core.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# one-op widening factor: a couple of f32 ulps, applied outward
_EPS_REL = 3e-7
_EPS_ABS = 1e-37


def _widen(lo, hi):
    w = _EPS_REL * jnp.maximum(jnp.abs(lo), jnp.abs(hi)) + _EPS_ABS
    return lo - w, hi + w


# ---------------------------------------------------------------------------
# intervals
# ---------------------------------------------------------------------------


def iv(lo, hi=None):
    lo = jnp.asarray(lo, jnp.float32)
    hi = lo if hi is None else jnp.asarray(hi, jnp.float32)
    return lo, hi


def iv_add(a, b):
    return _widen(a[0] + b[0], a[1] + b[1])


def iv_sub(a, b):
    return _widen(a[0] - b[1], a[1] - b[0])


def iv_neg(a):
    return -a[1], -a[0]


def iv_mul(a, b):
    p = jnp.stack([a[0] * b[0], a[0] * b[1], a[1] * b[0], a[1] * b[1]])
    return _widen(jnp.min(p, 0), jnp.max(p, 0))


def iv_scale(a, s):
    lo, hi = a[0] * s, a[1] * s
    return _widen(jnp.minimum(lo, hi), jnp.maximum(lo, hi))


def iv_sqr(a):
    lo = jnp.where((a[0] <= 0.0) & (a[1] >= 0.0), 0.0,
                   jnp.minimum(a[0] * a[0], a[1] * a[1]))
    hi = jnp.maximum(a[0] * a[0], a[1] * a[1])
    return _widen(lo, hi)


def iv_recip(a):
    """1/[a]; caller must ensure 0 is not in [a] (returns +-inf bounds
    where it is, which stays conservative for overlap tests)."""
    straddles = (a[0] <= 0.0) & (a[1] >= 0.0)
    lo = jnp.where(straddles, -jnp.inf, 1.0 / a[1])
    hi = jnp.where(straddles, jnp.inf, 1.0 / a[0])
    return _widen(lo, hi)


def iv_sqrt(a):
    return _widen(jnp.sqrt(jnp.maximum(a[0], 0.0)),
                  jnp.sqrt(jnp.maximum(a[1], 0.0)))


def iv_overlaps(a, b):
    return (a[0] <= b[1]) & (a[1] >= b[0])


# ---------------------------------------------------------------------------
# affine forms: (c0, cs [..., K], r)
# ---------------------------------------------------------------------------


def aa_const(v, n_syms: int):
    v = jnp.asarray(v, jnp.float32)
    return v, jnp.zeros(v.shape + (n_syms,), jnp.float32), jnp.zeros_like(v)


def aa_var(lo, hi, sym: int, n_syms: int):
    """Affine form of [lo, hi] attached to noise symbol `sym`."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    c0 = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    cs = jnp.zeros(c0.shape + (n_syms,), jnp.float32)
    cs = cs.at[..., sym].set(half)
    return c0, cs, jnp.zeros_like(c0)


def aa_add(a, b):
    return a[0] + b[0], a[1] + b[1], a[2] + b[2] + _EPS_REL * (
        jnp.abs(a[0]) + jnp.abs(b[0]))


def aa_sub(a, b):
    return a[0] - b[0], a[1] - b[1], a[2] + b[2] + _EPS_REL * (
        jnp.abs(a[0]) + jnp.abs(b[0]))


def aa_scale(a, s):
    s = jnp.asarray(s, jnp.float32)
    return (a[0] * s, a[1] * s[..., None],
            a[2] * jnp.abs(s) + _EPS_REL * jnp.abs(a[0] * s))


def aa_rad(a):
    """Total deviation radius."""
    return jnp.sum(jnp.abs(a[1]), -1) + a[2]


def aa_mul(a, b):
    """First-order affine product: cross deviation terms condense into r
    (reference: AAFloat operator*, affine_arithmetic.h)."""
    c0 = a[0] * b[0]
    cs = a[0][..., None] * b[1] + b[0][..., None] * a[1]
    r = (jnp.abs(a[0]) * b[2] + jnp.abs(b[0]) * a[2]
         + aa_rad(a) * aa_rad(b))
    return c0, cs, r + _EPS_REL * jnp.abs(c0)


def aa_sqr(a):
    """Tighter square: the e_k^2 self-terms lie in [0, 1], halving the
    quadratic radius vs aa_mul(a, a)."""
    c0 = a[0] * a[0]
    cs = 2.0 * a[0][..., None] * a[1]
    rad = aa_rad(a)
    r = rad * rad * 0.5
    return c0 + r, cs, r + a[2] * (2.0 * jnp.abs(a[0])) \
        + _EPS_REL * jnp.abs(c0)


def aa_to_iv(a):
    rad = aa_rad(a)
    return _widen(a[0] - rad, a[0] + rad)


def aa_poly2(c2, c1, c0v, x):
    """c2 x^2 + c1 x + c0 of an affine x with plain-array coefficients."""
    n = x[1].shape[-1]
    x2 = aa_sqr(x)
    return aa_add(aa_add(aa_scale(x2, c2), aa_scale(x, c1)),
                  aa_const(jnp.broadcast_to(c0v, x[0].shape), n))
