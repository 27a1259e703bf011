"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4:
the reference has no multi-GPU analogue — this is a new capability)."""

import jax
import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.parallel.sharding import (
    make_mesh,
    nrc_train_step_dp,
    render_sample_sharded,
)
from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.compile import compile_scene

from scenes import box_scene


def test_sharded_render_matches_single_device():
    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    w = h = 16
    cfg = PTConfig(max_path_length=3)
    single = render_sample(scene, bvh, cam, w, h, jnp.uint32(0), cfg)
    mesh = make_mesh(jax.devices()[:8])
    sharded = render_sample_sharded(mesh, scene, bvh, cam, w, h,
                                    jnp.uint32(0), cfg)
    # sharded output is in block-major lane order; single is pixel order
    from gfxexp_tpu.render.camera import lane_from_pixel

    order = lane_from_pixel(jnp.arange(w * h, dtype=jnp.uint32), w, h)
    sharded_px = np.asarray(sharded)[np.asarray(order)]
    assert np.allclose(sharded_px, np.asarray(single), atol=1e-5)


def test_nrc_dp_training_runs():
    from gfxexp_tpu.techniques.nrc.network import NRCConfig, init_nrc

    mesh = make_mesh(jax.devices()[:8])
    cfg = NRCConfig()
    state = init_nrc(jax.random.PRNGKey(0), cfg)
    n = 512
    q = jax.random.uniform(jax.random.PRNGKey(1), (n, 14))
    t = jnp.ones((n, 3)) * 0.5
    m = jnp.ones((n,), bool)
    state, loss = nrc_train_step_dp(mesh, state, q, t, m, cfg)
    assert np.isfinite(float(loss))


def test_sharded_svgf_matches_single_device():
    """SVGF with the à-trous pyramid sharded over image rows + ppermute
    halo exchange must be bit-parity with the single-device svgf_frame
    (VERDICT r3 next #10). Uses a real rendered G-buffer + lighting so the
    edge-stopping weights exercise true depth/normal discontinuities, and
    TWO frames so reprojection/temporal state flows through."""
    from gfxexp_tpu.parallel.sharding import svgf_frame_sharded
    from gfxexp_tpu.render.gbuffer import render_gbuffer
    from gfxexp_tpu.techniques.svgf import (SVGFConfig, make_svgf_state,
                                            svgf_frame)

    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    w = h = 32  # 4 rows/device on the 8-device mesh; halo <= shard needs
    # small steps -> use 2 filter stages (halo 1*2+1=3 <= 4)
    cfg = SVGFConfig(num_filter_stages=2)
    mesh = make_mesh(jax.devices()[:8])

    gb = render_gbuffer(scene, bvh, cam, cam, w, h, jnp.uint32(0), False)
    state_a = make_svgf_state(w, h)
    state_b = make_svgf_state(w, h)
    for f in range(2):
        lighting = render_sample(
            scene, bvh, cam, w, h, jnp.uint32(f),
            PTConfig(max_path_length=3)).reshape(h, w, 3)
        out_a, state_a = svgf_frame(state_a, gb, lighting, cfg)
        out_b, state_b = svgf_frame_sharded(mesh, state_b, gb, lighting,
                                            cfg)
        assert np.allclose(np.asarray(out_a), np.asarray(out_b),
                           atol=1e-5), (
            f, np.abs(np.asarray(out_a) - np.asarray(out_b)).max())
    # temporal state also agrees after two frames
    assert np.allclose(np.asarray(state_a.prev_noisy),
                       np.asarray(state_b.prev_noisy), atol=1e-5)
    assert np.allclose(np.asarray(state_a.moments),
                       np.asarray(state_b.moments), atol=1e-5)


def test_sharded_render_qrow_matches_single_device():
    """Image-plane sharding over the quantized structure: the qrow render
    sharded across the 8-device mesh matches its single-device render."""
    scene, bvh = compile_scene(box_scene(), traversal="qrow")
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    w = h = 16
    cfg = PTConfig(max_path_length=3)
    single = render_sample(scene, bvh, cam, w, h, jnp.uint32(0), cfg)
    mesh = make_mesh(jax.devices()[:8])
    sharded = render_sample_sharded(mesh, scene, bvh, cam, w, h,
                                    jnp.uint32(0), cfg)
    from gfxexp_tpu.render.camera import lane_from_pixel

    order = lane_from_pixel(jnp.arange(w * h, dtype=jnp.uint32), w, h)
    sharded_px = np.asarray(sharded)[np.asarray(order)]
    assert np.allclose(sharded_px, np.asarray(single), atol=1e-5)
