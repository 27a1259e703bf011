"""ReGIR estimator tests: cell-reservoir NEE must agree with standard
light-hierarchy NEE in expectation (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.compile import compile_scene
from gfxexp_tpu.techniques.regir import (
    ReGIRConfig,
    build_cell_reservoirs,
    finalize_frame,
    make_grid,
    make_regir_state,
    render_sample_regir,
)

from scenes import many_light_scene

W = H = 16


@pytest.fixture(scope="module")
def regir_setup():
    scene, bvh = compile_scene(many_light_scene(n_lights=25))
    cam = make_camera([0.0, 3.0, 6.0], fov_y=np.deg2rad(50), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    return scene, bvh, cam


def test_regir_matches_standard_nee(regir_setup):
    scene, bvh, cam = regir_setup
    pt_cfg = PTConfig(max_path_length=2, use_implicit_light_sampling=False)
    frames = 60

    # reference estimator: standard NEE path tracing
    acc_ref = np.zeros((W * H, 3), np.float64)
    for f in range(frames):
        acc_ref += np.asarray(
            render_sample(scene, bvh, cam, W, H, jnp.uint32(f), pt_cfg))
    ref = acc_ref / frames

    # ReGIR estimator
    regir_cfg = ReGIRConfig(
        grid_dimension=(8, 4, 8), num_light_slots_per_cell=32,
        log2_num_candidates_per_slot=3, log2_num_candidates_per_cell=3,
    )
    grid = make_grid(scene, regir_cfg)
    state = make_regir_state(regir_cfg)
    acc = np.zeros((W * H, 3), np.float64)
    for f in range(frames):
        state = build_cell_reservoirs(scene, state, grid, jnp.uint32(f), regir_cfg)
        img, state = render_sample_regir(
            scene, bvh, cam, state, grid, W, H, jnp.uint32(f),
            pt_cfg, regir_cfg)
        state = finalize_frame(state, f)
        acc += np.asarray(img)
    got = acc / frames

    assert np.isfinite(got).all()
    rel = abs(got.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, (got.mean(), ref.mean())


def test_regir_reference_slot_count(regir_setup):
    """Calibration at the reference's kNumLightSlotsPerCell = 512
    (regir_shared.h:7) — the parity default; smaller grid + fewer frames to
    keep CI time bounded."""
    scene, bvh, cam = regir_setup
    pt_cfg = PTConfig(max_path_length=2, use_implicit_light_sampling=False)
    frames = 16

    acc_ref = np.zeros((W * H, 3), np.float64)
    for f in range(frames):
        acc_ref += np.asarray(
            render_sample(scene, bvh, cam, W, H, jnp.uint32(f), pt_cfg))
    ref = acc_ref / frames

    regir_cfg = ReGIRConfig(grid_dimension=(4, 2, 4))  # 512 slots (default)
    assert regir_cfg.num_light_slots_per_cell == 512
    grid = make_grid(scene, regir_cfg)
    state = make_regir_state(regir_cfg)
    acc = np.zeros((W * H, 3), np.float64)
    for f in range(frames):
        state = build_cell_reservoirs(scene, state, grid, jnp.uint32(f), regir_cfg)
        img, state = render_sample_regir(
            scene, bvh, cam, state, grid, W, H, jnp.uint32(f),
            pt_cfg, regir_cfg)
        state = finalize_frame(state, f)
        acc += np.asarray(img)
    got = acc / frames

    assert np.isfinite(got).all()
    rel = abs(got.mean() - ref.mean()) / ref.mean()
    assert rel < 0.08, (got.mean(), ref.mean())


def test_regir_lru_and_touch(regir_setup):
    scene, bvh, cam = regir_setup
    regir_cfg = ReGIRConfig(grid_dimension=(4, 2, 4),
                            num_light_slots_per_cell=16)
    grid = make_grid(scene, regir_cfg)
    state = make_regir_state(regir_cfg)
    state = build_cell_reservoirs(scene, state, grid, jnp.uint32(0), regir_cfg)
    img, state = render_sample_regir(
        scene, bvh, cam, state, grid, W, H, jnp.uint32(0),
        PTConfig(max_path_length=2), regir_cfg)
    assert int(np.asarray(state.num_accesses).sum()) > 0
    state = finalize_frame(state, 0)
    touched = np.asarray(state.last_access) == 0
    assert touched.any()
