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
