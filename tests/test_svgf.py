"""SVGF unit tests: constant preservation, temporal convergence, edge
stopping (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.render.gbuffer import GBuffer
from gfxexp_tpu.techniques.svgf import (
    SVGFConfig,
    atrous_stage,
    demodulate_albedo,
    make_svgf_state,
    svgf_frame,
)

H = W = 32


def _flat_gbuffer(normal=(0.0, 0.0, 1.0), depth=2.0, albedo=0.5):
    n = jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (H, W, 3))
    return GBuffer(
        position=jnp.zeros((H, W, 3)),
        normal=n,
        geom_normal=n,
        albedo=jnp.full((H, W, 3), albedo, jnp.float32),
        emittance=jnp.zeros((H, W, 3)),
        texcoord=jnp.zeros((H, W, 2)),
        motion=jnp.zeros((H, W, 2)),
        depth=jnp.full((H, W), depth, jnp.float32),
        tri=jnp.zeros((H, W), jnp.int32),
        bary=jnp.zeros((H, W, 2)),
        unit=jnp.zeros((H, W), jnp.int32),
        material=jnp.zeros((H, W), jnp.int32),
        hit=jnp.ones((H, W), bool),
        view_dir=jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (H, W, 3)),
    )


def test_atrous_preserves_constant():
    gb = _flat_gbuffer()
    color = jnp.full((H, W, 3), 0.7, jnp.float32)
    var = jnp.full((H, W), 0.1, jnp.float32)
    out, var_out = atrous_stage(color, var, gb.depth, gb.normal, gb.hit, 2,
                                SVGFConfig())
    assert np.allclose(np.asarray(out), 0.7, atol=1e-5)
    # variance shrinks under averaging
    assert np.all(np.asarray(var_out) <= 0.1 + 1e-6)


def test_temporal_convergence_static_scene(rng_np):
    """Static scene + noisy 1-spp inputs: SVGF output variance across pixels
    must be far below the raw input's."""
    gb = _flat_gbuffer()
    state = make_svgf_state(W, H)
    cfg = SVGFConfig(enable_taa=True)
    base = 0.4
    last = None
    for f in range(12):
        noise = rng_np.gamma(2.0, base / 2.0, size=(H, W, 1)).astype(np.float32)
        lighting = jnp.asarray(np.repeat(noise, 3, axis=2))
        out, state = svgf_frame(state, gb, lighting, cfg)
        last = out
    out = np.asarray(last)
    inner = out[4:-4, 4:-4, 0]
    assert abs(inner.mean() - base) < 0.08, inner.mean()
    assert inner.std() < 0.03, inner.std()  # raw std would be ~0.28


def test_edge_stopping_across_normals(rng_np):
    """Two half-images with opposing normals and different lighting: the
    filter must not leak across the edge."""
    gb = _flat_gbuffer()
    nx = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (H, W // 2, 3))
    nz = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W // 2, 3))
    normal = jnp.concatenate([nx, nz], axis=1)
    gb = gb.replace(normal=normal)
    left = jnp.full((H, W // 2, 3), 0.2, jnp.float32)
    right = jnp.full((H, W // 2, 3), 0.9, jnp.float32)
    color = jnp.concatenate([left, right], axis=1)
    var = jnp.full((H, W), 0.05, jnp.float32)
    out = color
    for step in (1, 2, 4):
        out, var = atrous_stage(out, var, gb.depth, gb.normal, gb.hit, step,
                                SVGFConfig())
    out = np.asarray(out)
    assert np.allclose(out[:, : W // 2 - 1], 0.2, atol=1e-3)
    assert np.allclose(out[:, W // 2 + 1 :], 0.9, atol=1e-3)


def test_demodulation_roundtrip():
    lighting = jnp.asarray(np.random.default_rng(0).uniform(0.1, 1.0, (H, W, 3)),
                           jnp.float32)
    albedo = jnp.full((H, W, 3), 0.5, jnp.float32)
    dem = demodulate_albedo(lighting, albedo)
    assert np.allclose(np.asarray(dem * albedo), np.asarray(lighting), atol=1e-5)
    # tiny albedo clamps to zero, no inf/nan
    dem2 = demodulate_albedo(lighting, jnp.full((H, W, 3), 1e-4, jnp.float32))
    assert np.all(np.asarray(dem2) == 0.0)


def test_atrous_kernel_variants():
    """All three kernel types preserve constants and denoise."""
    from gfxexp_tpu.techniques.svgf import (
        ATROUS_BOX3,
        ATROUS_GAUSS3,
        ATROUS_GAUSS5,
    )

    gb = _flat_gbuffer()
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(
        0.5 + 0.2 * rng.standard_normal((H, W, 3)).astype(np.float32))
    var = jnp.full((H, W), 0.04, jnp.float32)
    for kernel in (ATROUS_BOX3, ATROUS_GAUSS3, ATROUS_GAUSS5):
        cfg = SVGFConfig(atrous_kernel=kernel)
        const = jnp.full((H, W, 3), 0.7, jnp.float32)
        out, _ = atrous_stage(const, var, gb.depth, gb.normal, gb.hit, 2, cfg)
        assert np.allclose(np.asarray(out), 0.7, atol=1e-5), kernel
        out, _ = atrous_stage(noisy, var, gb.depth, gb.normal, gb.hit, 1, cfg)
        assert np.asarray(out).std() < np.asarray(noisy).std(), kernel
