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


def test_regir_lru_skips_idle_cells(regir_setup):
    """LRU gating (reference build_cell_reservoirs.cu:80-81): cells idle
    longer than lru_idle_frames keep their reservoirs verbatim across a
    rebuild; touched cells (via touch_cells + finalize_frame) rebuild."""
    scene, _, _ = regir_setup
    cfg = ReGIRConfig(grid_dimension=(4, 2, 4), num_light_slots_per_cell=16,
                      lru_idle_frames=8)
    grid = make_grid(scene, cfg)
    state0 = make_regir_state(cfg)
    a = build_cell_reservoirs(scene, state0, grid, jnp.uint32(0), cfg)

    # frame 20 with NO access since frame 0: every cell is idle -> the
    # rebuild must be a no-op on reservoir contents
    b = build_cell_reservoirs(scene, a, grid, jnp.uint32(20), cfg)
    assert np.array_equal(np.asarray(a.sum_w), np.asarray(b.sum_w))
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert np.array_equal(np.asarray(a.stream_len), np.asarray(b.stream_len))

    # same rebuild at a NON-idle frame does change reservoirs (fresh RNG)
    c = build_cell_reservoirs(scene, a, grid, jnp.uint32(5), cfg)
    assert not np.array_equal(np.asarray(a.sum_w), np.asarray(c.sum_w))

    # touch every cell, finalize at frame 20 -> rebuild at 21 is active again
    from gfxexp_tpu.techniques.regir import touch_cells

    n_cells = cfg.num_cells
    touched = touch_cells(a, jnp.arange(n_cells, dtype=jnp.int32),
                          jnp.ones((n_cells,), bool))
    touched = finalize_frame(touched, 20)
    assert (np.asarray(touched.last_access) == 20).all()
    d = build_cell_reservoirs(scene, touched, grid, jnp.uint32(21), cfg)
    assert not np.array_equal(np.asarray(a.sum_w), np.asarray(d.sum_w))
    # and the access counters reset after each build (per-frame counters)
    assert (np.asarray(d.num_accesses) == 0).all()


def test_regir_cell_randomization_toggle(regir_setup):
    """enable_cell_randomization jitters the cell lookup by ±half a cell
    (reference optix_pathtracing_kernels.cu cellRandomization /
    build_cell_reservoirs.cu:235 usage): the toggle must change the sampled
    estimate (it is wired), stay finite, and not bias the mean estimate."""
    scene, bvh, cam = regir_setup
    pt_cfg = PTConfig(max_path_length=2, use_implicit_light_sampling=False)
    frames = 24

    def run(randomize):
        cfg = ReGIRConfig(grid_dimension=(4, 2, 4),
                          num_light_slots_per_cell=32,
                          enable_cell_randomization=randomize)
        grid = make_grid(scene, cfg)
        state = make_regir_state(cfg)
        acc = np.zeros((W * H, 3), np.float64)
        for f in range(frames):
            state = build_cell_reservoirs(scene, state, grid, jnp.uint32(f),
                                          cfg)
            img, state = render_sample_regir(
                scene, bvh, cam, state, grid, W, H, jnp.uint32(f), pt_cfg,
                cfg)
            state = finalize_frame(state, f)
            acc += np.asarray(img)
        return acc / frames

    on = run(True)
    off = run(False)
    assert np.isfinite(on).all() and np.isfinite(off).all()
    assert not np.allclose(on, off), "randomization toggle is not wired"
    rel = abs(on.mean() - off.mean()) / max(off.mean(), 1e-9)
    assert rel < 0.15, (on.mean(), off.mean())
