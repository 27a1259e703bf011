"""NRC tests: network training convergence + integrated cache calibration
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.compile import compile_scene
from gfxexp_tpu.techniques.nrc import (
    NRCConfig,
    init_nrc,
    infer,
    train_step,
)
from gfxexp_tpu.techniques.nrc.cache import (
    NRCIntegratorConfig,
    render_sample_nrc,
    scene_aabb,
)
from gfxexp_tpu.techniques.nrc.network import (
    POSITION_ENCODING_HASH_GRID,
    POSITION_ENCODING_TRIANGLE_WAVE,
)

from scenes import box_scene


def _toy_batch(key, n):
    q = jax.random.uniform(key, (n, 14))
    # a smooth positional radiance field modulated by reflectance
    target = jnp.stack(
        [
            jnp.sin(4.0 * q[:, 0]) * 0.5 + 0.5,
            q[:, 1] * q[:, 8],
            jnp.cos(6.0 * q[:, 2]) * 0.25 + 0.3,
        ],
        axis=-1,
    )
    return q, target


@pytest.mark.parametrize("pos_enc", [POSITION_ENCODING_TRIANGLE_WAVE,
                                     POSITION_ENCODING_HASH_GRID])
def test_network_learns_toy_field(pos_enc):
    cfg = NRCConfig(position_encoding=pos_enc, learning_rate=5e-3)
    state = init_nrc(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(350):
        key, k = jax.random.split(key)
        q, t = _toy_batch(k, 512)
        state, loss = train_step(state, q, t, jnp.ones((512,), bool), cfg)
        losses.append(float(loss))
    assert losses[-1] < 0.1 * max(losses[:10]), (losses[:3], losses[-3:])
    # EMA inference tracks the fit
    q, t = _toy_batch(jax.random.PRNGKey(2), 512)
    pred = infer(state, q, cfg)
    err = float(jnp.mean(jnp.abs(pred - t)))
    assert err < 0.2, err


def test_nrc_render_calibration():
    """NRC-rendered box scene must converge toward the plain PT estimate as
    the cache trains (the self-training loop closes)."""
    scene, bvh = compile_scene(box_scene())
    W = H = 32
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])

    # plain PT reference
    acc = np.zeros((W * H, 3), np.float64)
    for s in range(48):
        acc += np.asarray(render_sample(
            scene, bvh, cam, W, H, jnp.uint32(s), PTConfig(max_path_length=5)))
    ref = (acc / 48).mean()

    nrc_cfg = NRCConfig(learning_rate=4e-3)
    icfg = NRCIntegratorConfig(max_path_length=5, train_stride=8)
    state = init_nrc(jax.random.PRNGKey(0), nrc_cfg)
    lo, hi = scene_aabb(scene)

    imgs = []
    for f in range(110):
        radiance, tq, tt, tm = render_sample_nrc(
            scene, bvh, cam, state["ema"], lo, hi, W, H, jnp.uint32(f),
            icfg, nrc_cfg)
        # two optimizer steps per frame (the reference trains 4x per frame)
        state, loss = train_step(state, tq, tt, tm, nrc_cfg)
        state, loss = train_step(state, tq, tt, tm, nrc_cfg)
        if f >= 85:
            imgs.append(np.asarray(radiance))
        assert np.isfinite(np.asarray(tt)).all(), f
        if f == 0:
            assert float(jnp.sum(tm)) > 0, "no training records produced"
    got = np.stack(imgs).mean()
    assert np.isfinite(got)
    rel = abs(got - ref) / ref
    assert rel < 0.25, (got, ref)
