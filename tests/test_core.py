"""Unit tests: math, RNG, distributions (SURVEY.md §4 — numpy oracles replace
the reference's sandbox+eyeball verification)."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.core import distributions as dist
from gfxexp_tpu.core import math as gm
from gfxexp_tpu.core import rng


def test_normalize_and_frame(rng_np):
    v = rng_np.normal(size=(128, 3)).astype(np.float32)
    n = np.asarray(gm.normalize(jnp.asarray(v)))
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    t, b = gm.make_frame(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    assert np.allclose(np.einsum("ij,ij->i", t, n), 0.0, atol=1e-5)
    assert np.allclose(np.einsum("ij,ij->i", b, n), 0.0, atol=1e-5)
    assert np.allclose(np.einsum("ij,ij->i", t, b), 0.0, atol=1e-5)
    # right-handed: t x b = n
    assert np.allclose(np.cross(t, b), n, atol=1e-5)


def test_frame_roundtrip(rng_np):
    n = np.asarray(gm.normalize(jnp.asarray(rng_np.normal(size=(64, 3)), jnp.float32)))
    t, b = gm.make_frame(jnp.asarray(n))
    v = np.asarray(gm.normalize(jnp.asarray(rng_np.normal(size=(64, 3)), jnp.float32)))
    local = gm.to_local(t, b, jnp.asarray(n), jnp.asarray(v))
    back = gm.to_world(t, b, jnp.asarray(n), local)
    assert np.allclose(np.asarray(back), v, atol=1e-5)


def test_octahedral_roundtrip(rng_np):
    n = np.asarray(gm.normalize(jnp.asarray(rng_np.normal(size=(256, 3)), jnp.float32)))
    e = gm.octahedral_encode(jnp.asarray(n))
    back = np.asarray(gm.octahedral_decode(e))
    assert np.allclose(back, n, atol=1e-5)


def test_transforms(rng_np):
    q = gm.axis_angle_quaternion(jnp.asarray([0.3, 1.0, -0.2]), 0.7)
    r = gm.quaternion_to_matrix(q)
    # rotation matrix orthonormality
    rtr = np.asarray(r) @ np.asarray(r).T
    assert np.allclose(rtr, np.eye(3), atol=1e-5)
    m = gm.make_transform(rotation=r, translation=[1.0, 2.0, 3.0], scale=2.0)
    mi = gm.invert_transform(m)
    p = jnp.asarray(rng_np.normal(size=(16, 3)), jnp.float32)
    back = gm.transform_point(mi, gm.transform_point(m, p))
    assert np.allclose(np.asarray(back), np.asarray(p), atol=1e-4)
    comp = gm.compose_transforms(mi, m)
    assert np.allclose(np.asarray(comp), np.asarray(gm.identity_transform()), atol=1e-5)


def test_cosine_hemisphere_distribution():
    # mean of z under pdf z/pi should be 2/3
    i = jnp.arange(200000, dtype=jnp.uint32)
    u0, u1, _, _ = rng.uniform4(i, 0, 0, 0)
    d = gm.cosine_sample_hemisphere(u0, u1)
    z = np.asarray(d[..., 2])
    assert abs(z.mean() - 2.0 / 3.0) < 5e-3
    assert np.all(z >= 0)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


def test_rng_uniformity_and_decorrelation():
    i = jnp.arange(100000, dtype=jnp.uint32)
    a, b, c, d = rng.uniform4(i, 7, 13, 1)
    for x in (a, b, c, d):
        x = np.asarray(x)
        assert 0.0 <= x.min() and x.max() < 1.0
        assert abs(x.mean() - 0.5) < 5e-3
    corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    assert abs(corr) < 0.02


def test_discrete_distribution_sampling():
    w = jnp.asarray([1.0, 0.0, 3.0, 6.0])
    d = dist.build_discrete_1d(w)
    assert np.allclose(np.asarray(d.pmf), [0.1, 0.0, 0.3, 0.6], atol=1e-6)
    i = jnp.arange(100000, dtype=jnp.uint32)
    u = rng.bits_to_unit_float(rng.pcg3d(i, 0, 0)[0])
    idx, pmf = dist.sample_discrete_1d(d, u)
    counts = np.bincount(np.asarray(idx), minlength=4) / 100000.0
    assert np.allclose(counts, [0.1, 0.0, 0.3, 0.6], atol=0.01)


def test_alias_table_matches_cdf():
    w = np.asarray([0.5, 2.0, 0.0, 1.5, 4.0])
    table = dist.build_alias_table(w)
    i = jnp.arange(200000, dtype=jnp.uint32)
    u = rng.bits_to_unit_float(rng.pcg3d(i, 3, 0)[0])
    idx, pmf = dist.sample_alias(table, u)
    counts = np.bincount(np.asarray(idx), minlength=5) / 200000.0
    assert np.allclose(counts, w / w.sum(), atol=0.01)
    # pmf gather must match the analytic pmf
    assert np.allclose(np.asarray(pmf), (w / w.sum())[np.asarray(idx)], atol=1e-6)


def test_continuous_2d_env_sampling():
    h, w = 16, 32
    imp = np.zeros((h, w), np.float32)
    imp[4, 10] = 3.0
    imp[12, 20] = 1.0
    d2 = dist.build_continuous_2d(jnp.asarray(imp))
    i = jnp.arange(50000, dtype=jnp.uint32)
    u0 = rng.bits_to_unit_float(rng.pcg3d(i, 0, 0)[0])
    u1 = rng.bits_to_unit_float(rng.pcg3d(i, 1, 0)[0])
    u, v, pdf = dist.sample_continuous_2d(d2, u0, u1)
    u, v = np.asarray(u), np.asarray(v)
    col = (u * w).astype(int)
    row = (v * h).astype(int)
    frac_a = ((row == 4) & (col == 10)).mean()
    frac_b = ((row == 12) & (col == 20)).mean()
    assert abs(frac_a - 0.75) < 0.01
    assert abs(frac_b - 0.25) < 0.01
    # density: pdf integrates to 1 -> pdf at hot texel = frac / (1/(HW))
    expect_a = 0.75 * h * w
    assert np.allclose(np.asarray(pdf)[(row == 4) & (col == 10)], expect_a, rtol=1e-4)
    # eval path agrees with sample path
    pdf_eval = dist.continuous_2d_pdf(d2, jnp.asarray(u), jnp.asarray(v))
    assert np.allclose(np.asarray(pdf_eval), np.asarray(pdf), rtol=1e-4)


def test_power_heuristic():
    a = gm.power_heuristic(jnp.asarray(1.0), jnp.asarray(1.0))
    assert np.allclose(float(a), 0.5)
    b = gm.power_heuristic(jnp.asarray(0.0), jnp.asarray(0.0))
    assert np.isfinite(float(b))


def test_probability_texture_sampling():
    """Mip-descent sampling must reproduce texel probabilities
    (reference: ProbabilityTexture, common_shared.h:406)."""
    w = np.zeros((8, 8), np.float32)
    w[1, 2] = 4.0
    w[6, 5] = 1.0
    w[3, 3] = 3.0
    ptex = dist.build_probability_texture(w)
    assert abs(float(ptex.integral) - 8.0) < 1e-5
    i = jnp.arange(80000, dtype=jnp.uint32)
    u0 = rng.bits_to_unit_float(rng.pcg3d(i, 0, 0)[0])
    u1 = rng.bits_to_unit_float(rng.pcg3d(i, 1, 0)[0])
    ix, iy, pmf, _, _ = dist.sample_probability_texture(ptex, u0, u1)
    ix, iy = np.asarray(ix), np.asarray(iy)
    for (y, x, expect) in ((1, 2, 0.5), (6, 5, 0.125), (3, 3, 0.375)):
        frac = ((iy == y) & (ix == x)).mean()
        assert abs(frac - expect) < 0.01, (y, x, frac, expect)
    assert np.allclose(np.asarray(pmf),
                       w[iy, ix] / 8.0, atol=1e-6)
    # pdf eval path agrees
    pmf2 = dist.probability_texture_pmf(ptex, jnp.asarray(ix), jnp.asarray(iy))
    assert np.allclose(np.asarray(pmf2), np.asarray(pmf))
