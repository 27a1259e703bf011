"""NRTDSM math tests — assertion versions of the reference's sandbox checks
(nrtdsm_sandbox.cpp: testSolveCubicEquation:473, testFindHeight:572,
testComputeCanonicalSpaceRayCoeffs:745, testRayVsPrism:1721)."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.techniques.nrtdsm import \
    test_ray_vs_prism as ray_vs_prism  # noqa: alias (pytest collection)
from gfxexp_tpu.techniques.nrtdsm import (
    build_nrtdsm_geometry,
    compute_canonical_space_ray_coeffs,
    eval_cubic,
    find_height,
    intersect_nrtdsm,
    shell_point,
    solve_cubic_in_interval,
)
from gfxexp_tpu.techniques.tfdm import DisplacementParameters


def test_solve_cubic(rng_np):
    """Random cubics with a known root inside the interval."""
    n = 256
    root = rng_np.uniform(0.1, 0.9, n).astype(np.float32)
    k3 = rng_np.uniform(-2, 2, n).astype(np.float32)
    k2 = rng_np.uniform(-2, 2, n).astype(np.float32)
    k1 = rng_np.uniform(0.5, 2, n).astype(np.float32)  # keep slope nonzero
    # construct k0 so that f(root) = 0
    k0 = -(k1 * root + k2 * root**2 + k3 * root**3)
    coeffs = jnp.stack([k0, k1, k2, k3], axis=-1)
    x, found = solve_cubic_in_interval(
        coeffs, jnp.zeros(n), jnp.ones(n))
    found = np.asarray(found)
    assert found.mean() > 0.95  # a few multi-root cubics may bracket oddly
    residual = np.abs(np.asarray(eval_cubic(coeffs, x)))[found]
    assert residual.max() < 1e-3


def test_find_height_roundtrip(rng_np):
    """Points constructed as S(b1, b2, h) must recover (h, b1, b2)."""
    n = 128
    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.1])
    p_c = jnp.asarray([0.2, 0.0, 1.0])
    n_a = jnp.asarray([0.2, 1.0, 0.0]) / np.linalg.norm([0.2, 1.0, 0.0])
    n_b = jnp.asarray([0.0, 1.0, 0.2]) / np.linalg.norm([0.0, 1.0, 0.2])
    n_c = jnp.asarray([-0.1, 1.0, 0.0]) / np.linalg.norm([-0.1, 1.0, 0.0])
    b1 = jnp.asarray(rng_np.uniform(0.05, 0.6, n), jnp.float32)
    b2 = jnp.asarray(rng_np.uniform(0.05, 0.35, n), jnp.float32)
    h = jnp.asarray(rng_np.uniform(0.05, 0.45, n), jnp.float32)
    x = shell_point(p_a, p_b, p_c, n_a, n_b, n_c, b1, b2, h)
    h2, b1r, b2r, found = find_height(
        p_a, p_b, p_c, n_a, n_b, n_c, x,
        jnp.zeros(n), jnp.full((n,), 0.5))
    assert np.asarray(found).all()
    assert np.allclose(np.asarray(h2), np.asarray(h), atol=2e-3)
    assert np.allclose(np.asarray(b1r), np.asarray(b1), atol=5e-3)
    assert np.allclose(np.asarray(b2r), np.asarray(b2), atol=5e-3)


def test_canonical_ray_coeffs_consistency(rng_np):
    """alpha(h), beta(h) from the rational quadratics must match the
    barycentrics of the point where the ray crosses the height-h plane."""
    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.0])
    p_c = jnp.asarray([0.0, 0.0, 1.0])
    n_a = jnp.asarray([0.1, 1.0, 0.0]) / np.linalg.norm([0.1, 1.0, 0.0])
    n_b = jnp.asarray([0.0, 1.0, 0.1]) / np.linalg.norm([0.0, 1.0, 0.1])
    n_c = jnp.asarray([-0.1, 1.0, -0.1]) / np.linalg.norm([-0.1, 1.0, -0.1])
    o = jnp.asarray([[0.3, 1.0, 0.3]])
    d = jnp.asarray([[0.1, -1.0, 0.05]])
    d = d / jnp.linalg.norm(d)
    # e0, e1 orthogonal to d
    e0 = jnp.cross(d[0], jnp.asarray([0.0, 0.0, 1.0]))
    e0 = e0 / jnp.linalg.norm(e0)
    e1 = jnp.cross(d[0], e0)
    bc2, bc1, bc0, dn2, dn1, dn0 = compute_canonical_space_ray_coeffs(
        o, e0, e1, p_a[None], p_b[None], p_c[None],
        n_a[None], n_b[None], n_c[None])
    for h in (0.1, 0.25, 0.4):
        denom = dn2 * h * h + dn1 * h + dn0
        alpha = (bc2[..., 0] * h * h + bc1[..., 0] * h + bc0[..., 0]) / denom
        beta = (bc2[..., 1] * h * h + bc1[..., 1] * h + bc0[..., 1]) / denom
        # ground truth: intersect the ray with the plane of the height-h
        # triangle and solve barycentrics
        a_h = np.asarray(p_a + h * n_a)
        b_h = np.asarray(p_b + h * n_b)
        c_h = np.asarray(p_c + h * n_c)
        nrm = np.cross(b_h - a_h, c_h - a_h)
        t = np.dot(a_h - np.asarray(o[0]), nrm) / np.dot(np.asarray(d[0]), nrm)
        x = np.asarray(o[0]) + t * np.asarray(d[0])
        m = np.stack([b_h - a_h, c_h - a_h], axis=1)
        coef, *_ = np.linalg.lstsq(m, x - a_h, rcond=None)
        assert abs(float(alpha[0]) - coef[0]) < 1e-3, (h, float(alpha[0]), coef)
        assert abs(float(beta[0]) - coef[1]) < 1e-3


def test_prism_interval():
    p_a = jnp.asarray([0.0, 0.0, 0.0])
    p_b = jnp.asarray([1.0, 0.0, 0.0])
    p_c = jnp.asarray([0.0, 0.0, 1.0])
    up = jnp.asarray([0.0, 1.0, 0.0])
    o = jnp.asarray([[0.2, 2.0, 0.2], [5.0, 2.0, 5.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    near, far, hit = ray_vs_prism(
        o, d, p_a, p_b, p_c, up, up, up, 0.0, 0.5, 1e-4, 1e30)
    assert bool(hit[0]) and not bool(hit[1])
    assert abs(float(near[0]) - 1.5) < 1e-3  # enters at y=0.5
    assert abs(float(far[0]) - 2.0) < 1e-3  # exits at y=0


def test_nonlinear_displacement_intersection():
    """Flat height c with TILTED vertex normals: the hit point must satisfy
    the exact shell equation x = S(b1, b2, c)."""
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]], np.float32)
    tilt = np.array([[0.3, 1.0, 0.0], [0.0, 1.0, 0.3],
                     [-0.3, 1.0, 0.0], [0.0, 1.0, -0.3]], np.float32)
    tilt /= np.linalg.norm(tilt, axis=-1, keepdims=True)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    c = 0.3
    geom = build_nrtdsm_geometry(
        positions, indices, uvs, np.full((16, 16), c, np.float32),
        params=DisplacementParameters(), normals=tilt)
    o = jnp.asarray([[0.4, 1.5, 0.45], [0.6, 1.5, 0.5]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.02, -1.0, 0.01]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_nrtdsm(geom, o, d)
    assert bool(hit.hit[0]) and bool(hit.hit[1])
    # verify the hit satisfies the shell equation: its recovered height == c
    x = np.asarray(hit.position)
    from gfxexp_tpu.techniques.nrtdsm import find_height

    for i in range(2):
        b = int(hit.prim[i])
        h, b1, b2, found = find_height(
            geom.p0[b], geom.p1[b], geom.p2[b],
            geom.n0[b], geom.n1[b], geom.n2[b],
            jnp.asarray(x[i : i + 1]),
            jnp.zeros(1), jnp.full((1,), 0.6))
        assert bool(found[0])
        assert abs(float(h[0]) - c) < 5e-3, float(h[0])
    assert np.all(np.asarray(hit.steps) > 0)
