"""ReSTIR DI estimator tests: initial RIS must be unbiased vs the analytic
direct-lighting value; reuse modes must stay in calibration (SURVEY.md §4 —
replaces the reference's RIS_Test/ris_test.ipynb numeric validation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.gbuffer import render_gbuffer
from gfxexp_tpu.scene.compile import compile_scene
from gfxexp_tpu.techniques.restir_di import (
    ReSTIRConfig,
    empty_reservoir,
    pixel_ctx,
    restir_di_frame,
)

from scenes import quad_light_scene

E = 30.0
ALBEDO = 0.6
DIST = 2.0
DIM = 0.3
W = H = 16


@pytest.fixture(scope="module")
def restir_scene():
    scene, bvh = compile_scene(
        quad_light_scene(emittance=(E, E, E), albedo=ALBEDO, light_y=DIST,
                         light_dim=DIM)
    )
    cam = make_camera([0.4, 1.0, 0.4], fov_y=np.deg2rad(10), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    gb = render_gbuffer(scene, bvh, cam, cam, W, H, jnp.uint32(0),
                        enable_jitter=False)
    return scene, bvh, cam, gb


def _run(restir_scene, cfg, frames):
    scene, bvh, cam, gb = restir_scene
    n = W * H
    res = empty_reservoir(n)
    ctx = pixel_ctx(scene, gb, cam)
    from gfxexp_tpu.techniques.restir_di import empty_sample_visibility
    vis = empty_sample_visibility(n)
    prev_hit = gb.hit.reshape(n)
    prev_pos = gb.position.reshape(n, 3)
    prev_nrm = gb.normal.reshape(n, 3)
    acc = np.zeros((H, W, 3), np.float64)
    for f in range(frames):
        color, res, ctx, vis = restir_di_frame(
            scene, bvh, gb, cam, res, ctx, prev_hit, prev_pos, prev_nrm,
            jnp.uint32(f), cfg, vis,
        )
        acc += np.asarray(color)
    return acc / frames


def _expected():
    le = E / np.pi
    return ALBEDO / np.pi * le * DIM * DIM / DIST**2


def test_initial_ris_unbiased(restir_scene):
    cfg = ReSTIRConfig(enable_temporal_reuse=False, enable_spatial_reuse=False,
                       reuse_visibility=False)
    img = _run(restir_scene, cfg, 150)
    got = img.mean()
    expect = _expected()
    assert abs(got - expect) / expect < 0.05, (got, expect)


def test_initial_ris_visibility_kill(restir_scene):
    """With an unoccluded scene, visibility reuse must not change the mean."""
    cfg = ReSTIRConfig(enable_temporal_reuse=False, enable_spatial_reuse=False,
                       reuse_visibility=True)
    img = _run(restir_scene, cfg, 100)
    expect = _expected()
    assert abs(img.mean() - expect) / expect < 0.06


def test_spatiotemporal_unbiased(restir_scene):
    cfg = ReSTIRConfig(use_unbiased_estimator=True, num_spatial_passes=1,
                       num_spatial_neighbors=2)
    img = _run(restir_scene, cfg, 80)
    expect = _expected()
    assert np.isfinite(img).all()
    assert abs(img.mean() - expect) / expect < 0.08, (img.mean(), expect)


def test_spatiotemporal_biased_reasonable(restir_scene):
    """Biased mode trades a little energy for variance — stays within 15%."""
    cfg = ReSTIRConfig(use_unbiased_estimator=False)
    img = _run(restir_scene, cfg, 80)
    expect = _expected()
    assert np.isfinite(img).all()
    assert abs(img.mean() - expect) / expect < 0.15, (img.mean(), expect)


def test_variance_reduction_vs_no_reuse():
    """Spatiotemporal reuse must reduce per-frame variance vs initial RIS
    alone (the whole point of ReSTIR) — needs a many-light scene where 2^k
    candidates can't saturate the light set."""
    from scenes import many_light_scene

    scene, bvh = compile_scene(many_light_scene(n_lights=64))
    cam = make_camera([0.0, 3.0, 6.0], fov_y=np.deg2rad(50), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    gb = render_gbuffer(scene, bvh, cam, cam, W, H, jnp.uint32(0),
                        enable_jitter=False)
    n = W * H

    def frame_stddev(cfg, frames=40):
        res = empty_reservoir(n)
        ctx = pixel_ctx(scene, gb, cam)
        ph = gb.hit.reshape(n)
        pp = gb.position.reshape(n, 3)
        pn = gb.normal.reshape(n, 3)
        vals = []
        for f in range(frames):
            color, res, ctx, vis = restir_di_frame(
                scene, bvh, gb, cam, res, ctx, ph, pp, pn, jnp.uint32(f), cfg)
            if f >= 10:  # skip warm-up
                vals.append(np.asarray(color))
        stack = np.stack(vals)
        return stack.std(axis=0).mean()

    sd_none = frame_stddev(ReSTIRConfig(enable_temporal_reuse=False,
                                        enable_spatial_reuse=False))
    sd_full = frame_stddev(ReSTIRConfig())
    # threshold has slack for RNG-stream sensitivity (observed 0.66-0.72x
    # across SampleStream mapping changes at this tiny frame count); a real
    # reuse regression lands near 1.0x
    assert sd_full < 0.75 * sd_none, (sd_full, sd_none)


def test_rearchitected_pipeline_calibrated():
    """The presampled-pool pipeline must agree with the classic pipeline in
    expectation (reference: rearch kernels produce the same estimator)."""
    from scenes import many_light_scene

    scene, bvh = compile_scene(many_light_scene(n_lights=25))
    cam = make_camera([0.0, 3.0, 6.0], fov_y=np.deg2rad(50), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    gb = render_gbuffer(scene, bvh, cam, cam, W, H, jnp.uint32(0),
                        enable_jitter=False)
    n = W * H

    def run(cfg, frames=80):
        res = empty_reservoir(n)
        ctx = pixel_ctx(scene, gb, cam)
        ph = gb.hit.reshape(n)
        pp = gb.position.reshape(n, 3)
        pn = gb.normal.reshape(n, 3)
        acc = np.zeros((H, W, 3), np.float64)
        for f in range(frames):
            color, res, ctx, vis = restir_di_frame(
                scene, bvh, gb, cam, res, ctx, ph, pp, pn, jnp.uint32(f), cfg)
            acc += np.asarray(color)
        return acc / frames

    base = dict(enable_temporal_reuse=False, enable_spatial_reuse=False,
                reuse_visibility=False)
    classic = run(ReSTIRConfig(**base))
    rearch = run(ReSTIRConfig(**base, use_rearchitected_pipeline=True,
                              num_light_subsets=16, light_subset_size=128))
    rel = abs(rearch.mean() - classic.mean()) / classic.mean()
    assert rel < 0.06, (rearch.mean(), classic.mean())


def test_rearch_decoupled_visibility(restir_scene):
    """The decoupled trace_shadow_rays + shade_and_resample pipeline
    (reference: optix_restir_di_rearch_kernels.cu) must agree with the
    classic fused temporal pipeline in the mean, and visibility reuse must
    measurably cut traced shadow rays."""
    from gfxexp_tpu.techniques.restir_di import (
        empty_sample_visibility,
        trace_shadow_rays,
    )

    scene, bvh, cam, gb = restir_scene
    n = W * H
    frames = 24

    def run(cfg):
        res = empty_reservoir(n)
        ctx = pixel_ctx(scene, gb, cam)
        vis = empty_sample_visibility(n)
        ph = gb.hit.reshape(n)
        pp = gb.position.reshape(n, 3)
        pn = gb.normal.reshape(n, 3)
        acc = np.zeros((H, W, 3), np.float64)
        for f in range(frames):
            color, res, ctx, vis = restir_di_frame(
                scene, bvh, gb, cam, res, ctx, ph, pp, pn, jnp.uint32(f),
                cfg, vis)
            acc += np.asarray(color)
        return acc / frames

    base = dict(enable_spatial_reuse=False, light_subset_size=64,
                num_light_subsets=16)
    classic = run(ReSTIRConfig(enable_spatial_reuse=False))
    rearch = run(ReSTIRConfig(**base, use_rearchitected_pipeline=True))
    reuse = run(ReSTIRConfig(**base, use_rearchitected_pipeline=True,
                             reuse_visibility_for_temporal=True))
    for name, img in (("rearch", rearch), ("reuse", reuse)):
        rel = abs(img.mean() - classic.mean()) / classic.mean()
        assert rel < 0.05, (name, img.mean(), classic.mean())

    # shadow-ray count drop with visibility reuse: run the pass directly
    from gfxexp_tpu.techniques.restir_di import (
        initial_ris_presampled,
        presample_lights,
    )

    cfg_a = ReSTIRConfig(**base, use_rearchitected_pipeline=True)
    cfg_b = ReSTIRConfig(**base, use_rearchitected_pipeline=True,
                         reuse_visibility_for_temporal=True)
    ctx = pixel_ctx(scene, gb, cam)
    pixel = jnp.arange(n, dtype=jnp.uint32)
    pool = presample_lights(scene, jnp.uint32(1), cfg_a)
    res = initial_ris_presampled(scene, bvh, ctx, pool, gb, pixel,
                                 jnp.uint32(1), cfg_a)
    prev_vis = empty_sample_visibility(n)
    ph = gb.hit.reshape(n)
    pp = gb.position.reshape(n, 3)
    pn = gb.normal.reshape(n, 3)
    _, rays_a = trace_shadow_rays(scene, bvh, ctx, res, res, prev_vis,
                                  ctx, gb, ph, pp, pn, cam, pixel, cfg_a)
    _, rays_b = trace_shadow_rays(scene, bvh, ctx, res, res, prev_vis,
                                  ctx, gb, ph, pp, pn, cam, pixel, cfg_b)
    assert float(rays_b) <= 0.55 * float(rays_a), (float(rays_a),
                                                   float(rays_b))


def test_restir_on_instanced_scene():
    """ReSTIR DI over the two-level (instanced) structure: the frame runs
    end-to-end (instanced G-buffer, instanced shadow rays, instanced light
    pdfs) and converges to the same mean as plain RIS on the flattened
    compile of the identical scene."""
    from gfxexp_tpu.scene.builder import SceneBuilder, affine

    def build():
        b = SceneBuilder()
        floor = b.add_lambert_material((ALBEDO,) * 3)
        lamp = b.add_lambert_material((0, 0, 0), emittance=(E,) * 3)
        b.add_instance(b.add_rectangle(20.0, 20.0, floor))
        flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
        b.add_instance(b.add_rectangle(DIM, DIM, lamp),
                       affine(rotation=flip, translation=[0, DIST, 0]))
        return b

    cam = make_camera([0.4, 1.0, 0.4], fov_y=np.deg2rad(10), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    means = []
    for traversal in ("widerow", "instanced"):
        scene, bvh = compile_scene(build(), traversal=traversal)
        gb = render_gbuffer(scene, bvh, cam, cam, W, H, jnp.uint32(0),
                            enable_jitter=False)
        cfg = ReSTIRConfig(enable_temporal_reuse=False,
                           enable_spatial_reuse=False,
                           reuse_visibility=False)
        means.append(_run((scene, bvh, cam, gb), cfg, 100).mean())
    flat_mean, inst_mean = means
    assert np.isfinite(inst_mean) and inst_mean > 0
    assert abs(inst_mean - flat_mean) / flat_mean < 0.05, means
