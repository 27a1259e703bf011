"""Converged-image RMSE harness (BASELINE.md fidelity bar).

Renders a converged path-traced reference of a non-trivial many-light scene
and asserts that each resampling/denoising technique's converged output
matches it to within predicted Monte-Carlo noise — the image-level analogue
of the reference's visual A/B comparisons (SURVEY.md §4.5), made into an
automated regression.

All comparisons are per-pixel RMSE (not just image means): a technique that
redistributes energy across the image while preserving the mean fails here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.gbuffer import render_gbuffer
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.compile import compile_scene

from scenes import many_light_scene

W = H = 24
N = W * H


@pytest.fixture(scope="module")
def conv_scene():
    scene, bvh = compile_scene(many_light_scene(n_lights=64))
    # floor-only view: the light grid (y=2, facing down) stays out of frame,
    # so direct-lighting estimators compare cleanly (no emitter pixels)
    cam = make_camera([0.5, 1.1, 3.0], fov_y=np.deg2rad(35), aspect=1.0,
                      target=[0.0, 0.0, 0.5])
    return scene, bvh, cam


def _pt_converged(scene, bvh, cam, cfg, frames, seed0=0):
    """Accumulate `frames` PT samples; returns (mean [N,3], per-pixel
    standard error of the mean [N,3])."""
    acc = np.zeros((N, 3), np.float64)
    acc2 = np.zeros((N, 3), np.float64)
    for f in range(frames):
        img = np.asarray(
            render_sample(scene, bvh, cam, W, H, jnp.uint32(seed0 + f), cfg),
            np.float64)
        acc += img
        acc2 += img * img
    mean = acc / frames
    var = np.maximum(acc2 / frames - mean**2, 0.0)
    return mean, np.sqrt(var / frames)


def _rmse(a, b, mask=None):
    d = (a - b) ** 2
    if mask is not None:
        d = d[mask]
    return float(np.sqrt(d.mean()))


def test_restir_converges_to_pt(conv_scene):
    """Unbiased ReSTIR DI must converge to the PT direct-lighting image
    within MC noise (reference parity: restir_di vs path_tracing at
    equal convergence)."""
    from gfxexp_tpu.techniques.restir_di import (
        ReSTIRConfig, empty_reservoir, empty_sample_visibility, pixel_ctx,
        restir_di_frame)

    scene, bvh, cam = conv_scene
    frames = 150
    # PT direct lighting only (NEE at the primary vertex, no implicit)
    pt_cfg = PTConfig(max_path_length=2, use_implicit_light_sampling=False)
    ref, err_ref = _pt_converged(scene, bvh, cam, pt_cfg, frames)

    gb = render_gbuffer(scene, bvh, cam, cam, W, H, jnp.uint32(0),
                        enable_jitter=False)
    hit = np.asarray(gb.hit).reshape(N)
    assert hit.all(), "floor-only view must cover the frame"

    cfg = ReSTIRConfig(use_unbiased_estimator=True, num_spatial_passes=1,
                       num_spatial_neighbors=2)
    res = empty_reservoir(N)
    ctx = pixel_ctx(scene, gb, cam)
    vis = empty_sample_visibility(N)
    ph = gb.hit.reshape(N)
    pp = gb.position.reshape(N, 3)
    pn = gb.normal.reshape(N, 3)
    acc = np.zeros((N, 3), np.float64)
    acc2 = np.zeros((N, 3), np.float64)
    for f in range(frames):
        color, res, ctx, vis = restir_di_frame(
            scene, bvh, gb, cam, res, ctx, ph, pp, pn, jnp.uint32(f), cfg,
            vis)
        c = np.asarray(color, np.float64).reshape(N, 3)
        acc += c
        acc2 += c * c
    got = acc / frames
    var = np.maximum(acc2 / frames - got**2, 0.0)
    # temporal reuse correlates frames: inflate the independent-sample
    # error prediction by the 20x stream-length clamp's worst case sqrt
    err_got = np.sqrt(var / frames) * 3.0

    noise = np.sqrt((err_ref**2 + err_got**2).mean())
    rmse = _rmse(got, ref)
    bound = max(4.0 * noise, 0.04 * float(ref.mean()))
    assert rmse < bound, (rmse, bound, ref.mean(), got.mean())
    # and the means agree tightly
    assert abs(got.mean() - ref.mean()) / ref.mean() < 0.04


def test_regir_converges_to_pt(conv_scene):
    """ReGIR cell-reservoir NEE must converge to the standard-NEE PT image
    pixelwise (stronger than the existing mean-only calibration test)."""
    from gfxexp_tpu.techniques.regir import (
        ReGIRConfig, build_cell_reservoirs, finalize_frame, make_grid,
        make_regir_state, render_sample_regir)

    scene, bvh, cam = conv_scene
    frames = 100
    pt_cfg = PTConfig(max_path_length=2, use_implicit_light_sampling=False)
    ref, err_ref = _pt_converged(scene, bvh, cam, pt_cfg, frames)

    regir_cfg = ReGIRConfig(
        grid_dimension=(8, 4, 8), num_light_slots_per_cell=32,
        log2_num_candidates_per_slot=3, log2_num_candidates_per_cell=3,
    )
    grid = make_grid(scene, regir_cfg)
    state = make_regir_state(regir_cfg)
    acc = np.zeros((N, 3), np.float64)
    acc2 = np.zeros((N, 3), np.float64)
    for f in range(frames):
        state = build_cell_reservoirs(scene, state, grid, jnp.uint32(f),
                                      regir_cfg)
        img, state = render_sample_regir(
            scene, bvh, cam, state, grid, W, H, jnp.uint32(f), pt_cfg,
            regir_cfg)
        state = finalize_frame(state, f)
        c = np.asarray(img, np.float64)
        acc += c
        acc2 += c * c
    got = acc / frames
    var = np.maximum(acc2 / frames - got**2, 0.0)
    err_got = np.sqrt(var / frames) * 2.0  # temporal cell reuse correlation

    noise = np.sqrt((err_ref**2 + err_got**2).mean())
    rmse = _rmse(got, ref)
    bound = max(4.0 * noise, 0.05 * float(ref.mean()))
    assert rmse < bound, (rmse, bound, ref.mean(), got.mean())
    assert abs(got.mean() - ref.mean()) / ref.mean() < 0.05


def test_svgf_converges_to_pt(conv_scene):
    """SVGF temporal accumulation over a static scene must converge to the
    converged PT image; the a-trous filter may only smooth residual noise,
    not shift energy (reference parity: svgf app accumulating vs PT)."""
    from gfxexp_tpu.techniques.svgf import (SVGFConfig, make_svgf_state,
                                            svgf_frame)

    scene, bvh, cam = conv_scene
    frames = 80
    pt_cfg = PTConfig(max_path_length=2)
    ref, err_ref = _pt_converged(scene, bvh, cam, pt_cfg, frames)

    gb = render_gbuffer(scene, bvh, cam, cam, W, H, jnp.uint32(0),
                        enable_jitter=False)
    state = make_svgf_state(W, H)
    cfg = SVGFConfig(enable_taa=False)
    final = None
    for f in range(frames):
        lighting = render_sample(
            scene, bvh, cam, W, H, jnp.uint32(1000 + f), pt_cfg
        ).reshape(H, W, 3)
        final, state = svgf_frame(state, gb, lighting, cfg)
    got = np.asarray(final, np.float64).reshape(N, 3)

    # SVGF is biased (edge-aware smoothing); the flat-floor region should
    # still track the converged PT image closely
    rmse = _rmse(got, ref)
    assert rmse < 0.15 * float(ref.mean()) + 4.0 * np.sqrt(
        (err_ref**2).mean()), (rmse, ref.mean())
    assert abs(got.mean() - ref.mean()) / ref.mean() < 0.08


def test_nrc_converges_to_pt(conv_scene):
    """The cache-terminated NRC render must converge to the plain PT image
    as online training proceeds — the reference's whole premise (the NRC
    app accumulates cache-terminated frames while the cache trains,
    neural_radiance_caching_main.cpp:2262-2387). Image-level: per-pixel
    RMSE against converged PT, not just calibration of the cache field."""
    import jax

    from gfxexp_tpu.techniques.nrc import NRCConfig, init_nrc, train_step
    from gfxexp_tpu.techniques.nrc.cache import (
        NRCIntegratorConfig, render_sample_nrc, scene_aabb)

    scene, bvh, cam = conv_scene
    frames = 80
    warmup = 30  # train-only frames before accumulation starts
    pt_cfg = PTConfig(max_path_length=4)
    ref, err_ref = _pt_converged(scene, bvh, cam, pt_cfg, frames)

    nrc_cfg = NRCConfig()
    icfg = NRCIntegratorConfig(max_path_length=4, train_stride=4,
                               enable_jitter=True)
    state = init_nrc(jax.random.PRNGKey(0), nrc_cfg)
    lo, hi = scene_aabb(scene)

    acc = np.zeros((N, 3), np.float64)
    acc2 = np.zeros((N, 3), np.float64)
    kept = 0
    for f in range(frames):
        radiance, tq, tt, tm = render_sample_nrc(
            scene, bvh, cam, state["ema"], lo, hi, W, H, jnp.uint32(f),
            icfg, nrc_cfg)
        for _ in range(2):
            state, _loss = train_step(state, tq, tt, tm, nrc_cfg)
        if f >= warmup:
            c = np.asarray(radiance, np.float64).reshape(N, 3)
            acc += c
            acc2 += c * c
            kept += 1
    got = acc / kept
    var = np.maximum(acc2 / kept - got**2, 0.0)
    err_got = np.sqrt(var / kept)

    # the cache is biased early in training; the converged accumulation
    # must still track PT closely (loose image-level bound, as for SVGF)
    noise = np.sqrt((err_ref**2 + err_got**2).mean())
    rmse = _rmse(got, ref)
    bound = max(4.0 * noise, 0.15 * float(ref.mean()))
    assert rmse < bound, (rmse, bound, ref.mean(), got.mean())
    assert abs(got.mean() - ref.mean()) / ref.mean() < 0.10, (
        got.mean(), ref.mean())


def test_instanced_converges_to_flattened():
    """Two-level (BLAS/instance) rendering of a multi-instance scene must
    converge to the SAME image as the flattened single-level compile of
    identical geometry — the structural check that instanced traversal,
    world-space transforms, and instanced light tables agree end-to-end
    (the small-scale stand-in for the Bistro-class fidelity bar)."""
    from scenes import box_scene  # noqa: F401 (import keeps path set up)

    from gfxexp_tpu.scene.builder import SceneBuilder, affine

    def build():
        b = SceneBuilder()
        floor = b.add_lambert_material((0.75, 0.75, 0.75))
        red = b.add_lambert_material((0.8, 0.25, 0.2))
        lamp = b.add_lambert_material((0, 0, 0), emittance=(90.0,) * 3)
        fg = b.add_rectangle(4.0, 4.0, floor)
        b.add_instance(fg)
        lg = b.add_rectangle(0.6, 0.6, lamp)
        flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
        b.add_instance(lg, affine(rotation=flip, translation=[0, 1.8, 0]))
        sg = b.add_sphere(0.22, red, n_theta=8, n_phi=16)
        for gx in range(3):
            for gz in range(2):
                b.add_instance(sg, affine(
                    translation=[(gx - 1) * 0.8, 0.22, (gz - 0.5) * 0.8]))
        return b

    cam = make_camera([0.0, 1.5, 2.6], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0, 0.1, 0])
    cfg = PTConfig(max_path_length=4)
    frames = 48

    scene_f, bvh_f = compile_scene(build(), traversal="widerow")
    mean_f, sem_f = _pt_converged(scene_f, bvh_f, cam, cfg, frames)
    scene_i, bvh_i = compile_scene(build(), traversal="instanced")
    mean_i, sem_i = _pt_converged(scene_i, bvh_i, cam, cfg, frames,
                                  seed0=1000)
    rmse = _rmse(mean_f, mean_i)
    # within a few combined standard errors of the MC noise
    noise = float(np.sqrt((sem_f**2 + sem_i**2).mean()))
    assert rmse < 4.0 * noise + 1e-3, (rmse, noise)
    # and the images genuinely show the spheres (not both black)
    assert mean_f.mean() > 0.01
