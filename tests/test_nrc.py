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


def test_propagate_targets_backward_chain():
    """Direct unit test of backward suffix propagation (reference
    nrc_setup_kernels.cu propagateRadianceValues:94): target[d] =
    direct[d] + thru[d] * target[d+1], seeded by the suffix-terminal cache
    prediction; rows without a suffix query seed with zero; invalid depths
    pass the carry through untouched."""
    from gfxexp_tpu.techniques.nrc.cache import propagate_targets

    L = 3
    direct = jnp.asarray([
        # row 0: full 3-vertex suffix
        [[1.0, 0, 0], [0.5, 0, 0], [0.25, 0, 0]],
        # row 1: only depth 0 valid
        [[2.0, 0, 0], [9.0, 0, 0], [9.0, 0, 0]],
        # row 2: depth 1 invalid (gap) — carry must skip it
        [[1.0, 0, 0], [9.0, 0, 0], [3.0, 0, 0]],
    ], jnp.float32)
    thru = jnp.full((3, L, 3), 0.5, jnp.float32)
    valid = jnp.asarray([
        [True, True, True],
        [True, False, False],
        [True, False, True],
    ])
    suffix_pred = jnp.asarray([[8.0, 0, 0], [8.0, 0, 0], [0.0, 0, 0]],
                              jnp.float32)
    has_query = jnp.asarray([True, False, False])

    out = np.asarray(propagate_targets(direct, thru, valid, suffix_pred,
                                       has_query))
    # row 0: d2 = 0.25 + 0.5*8 = 4.25; d1 = 0.5 + 0.5*4.25 = 2.625;
    #        d0 = 1 + 0.5*2.625 = 2.3125
    assert np.allclose(out[0, :, 0], [2.3125, 2.625, 4.25])
    # row 1: no suffix query -> seed 0; d0 = 2 + 0.5*0 = 2; invalid depths
    # keep their (garbage) inputs untouched
    assert out[1, 0, 0] == 2.0 and out[1, 1, 0] == 9.0
    # row 2: d2 = 3 + 0 = 3; depth 1 invalid (carry passes through);
    #        d0 = 1 + 0.5*3 = 2.5
    assert np.allclose([out[2, 0, 0], out[2, 2, 0]], [2.5, 3.0])
    assert out[2, 1, 0] == 9.0


def test_unbiased_tiles_ignore_cache(monkeypatch):
    """unbiased_fraction=1 makes EVERY training path unbiased (reference
    nrc_shared.h numTrainingDataPerFrame / unbiased tile selection,
    neural_radiance_caching_shared.h:110-130): no suffix ever terminates
    into the cache, so training TARGETS must be independent of the network
    parameters. With the default biased fraction they must depend on them.
    PATH_TERMINATION_FACTOR is forced to 0 so cache/suffix terminals fire
    deterministically on every bounce>1 (the configs below use otherwise
    untraced static shapes, so the patched constant is baked into fresh
    traces)."""
    import gfxexp_tpu.techniques.nrc.cache as cache_mod

    monkeypatch.setattr(cache_mod, "PATH_TERMINATION_FACTOR", 0.0)
    scene, bvh = compile_scene(box_scene())
    W = H = 32
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    nrc_cfg = NRCConfig()
    lo, hi = scene_aabb(scene)
    p_a = init_nrc(jax.random.PRNGKey(0), nrc_cfg)["ema"]
    p_b = jax.tree_util.tree_map(lambda x: x * 3.0 + 0.1,
                                 init_nrc(jax.random.PRNGKey(7), nrc_cfg)["ema"])

    def targets(params, uf):
        icfg = NRCIntegratorConfig(max_path_length=4, train_stride=8,
                                   unbiased_fraction=uf)
        _, tq, tt, tm = render_sample_nrc(
            scene, bvh, cam, params, lo, hi, W, H, jnp.uint32(3), icfg,
            nrc_cfg)
        return np.asarray(tt), np.asarray(tm)

    ta, ma = targets(p_a, 1)
    tb, mb = targets(p_b, 1)
    assert (ma == mb).all()
    assert np.allclose(ta[ma], tb[mb]), "unbiased targets leaked cache reads"

    ta16, ma16 = targets(p_a, 16)
    tb16, _ = targets(p_b, 16)
    assert ma16.any()
    assert not np.allclose(ta16[ma16], tb16[ma16]), (
        "biased tiles should read the cache at suffix terminals")


def test_training_lane_rotation():
    """The training lane inside each stride-tile rotates with sample_idx
    (reference nrc_setup_kernels.cu:6 + shared.h tile shuffling): queries
    recorded for the same train slot at consecutive samples come from
    different pixels."""
    scene, bvh = compile_scene(box_scene())
    W = H = 32
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    nrc_cfg = NRCConfig()
    icfg = NRCIntegratorConfig(max_path_length=2, train_stride=8,
                               enable_jitter=False)
    lo, hi = scene_aabb(scene)
    params = init_nrc(jax.random.PRNGKey(0), nrc_cfg)["ema"]

    def queries(f):
        _, tq, _, tm = render_sample_nrc(
            scene, bvh, cam, params, lo, hi, W, H, jnp.uint32(f), icfg,
            nrc_cfg)
        return np.asarray(tq), np.asarray(tm)

    q0, m0 = queries(0)
    q1, m1 = queries(1)
    both = m0 & m1
    assert both.any()
    # positions (first 3 query dims) must differ for rotated lanes
    assert not np.allclose(q0[both, :3], q1[both, :3]), (
        "training lane did not rotate with sample index")
    # and the full stride cycle returns to the same lane (same pixel ray)
    q8, m8 = queries(8)
    # off_b also moved, but the recorded QUERY positions (which depend only
    # on the pixel/lane rotation off_a) must match at f=0 vs f=8
    both08 = m0 & m8
    assert both08.any()
    assert np.allclose(q0[both08, :3], q8[both08, :3], atol=1e-6)


def test_hash_grid_encoding_parity_with_naive_loop():
    """The r5 single-gather hash-grid encoding must be bit-compatible with
    the naive per-level/per-corner loop (Muller et al. hash, tcnn layout):
    values AND gradients through the learned table (the backward is the
    one restructured into a single scatter-add)."""
    from gfxexp_tpu.techniques.nrc import encoding as enc

    rng = np.random.default_rng(11)
    L, T, F = 16, 1 << 15, 2
    table = jnp.asarray(rng.normal(0, 1e-2, (L, T, F)).astype(np.float32))
    p = jnp.asarray(rng.uniform(0, 1, (257, 3)).astype(np.float32))

    def naive(table_, p_):
        outs = []
        tnp = np.asarray(table_)
        pnp = np.asarray(p_)
        for level in range(L):
            res = int(np.floor(enc.HASH_BASE_RES
                               * enc.HASH_PER_LEVEL_SCALE**level))
            pf = pnp * np.float32(res)
            p0 = np.floor(pf).astype(np.int64)
            fw = pf - p0
            feat = np.zeros((pnp.shape[0], F), np.float32)
            for corner in range(8):
                off = np.array([(corner >> 0) & 1, (corner >> 1) & 1,
                                (corner >> 2) & 1], np.int64)
                c = ((p0 + off) & 0xFFFFFFFF).astype(np.uint64)
                h = ((c[:, 0] * enc._PRIMES[0])
                     ^ (c[:, 1] * (enc._PRIMES[1] & 0xFFFFFFFF))
                     ^ (c[:, 2] * enc._PRIMES[2])) & np.uint64(T - 1)
                w = np.prod(np.where(off[None] == 1, fw, 1.0 - fw), axis=-1)
                feat += w[:, None].astype(np.float32) * tnp[level,
                                                            h.astype(np.int64)]
            outs.append(feat)
        return np.concatenate(outs, axis=-1)

    got = np.asarray(enc.hash_grid_encoding(table, p))
    want = naive(table, p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    # gradient parity through the table: d/dtable sum(encoding * cot) is
    # the scatter-add path — compare against the naive accumulation
    cot = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))
    g = jax.grad(
        lambda t: jnp.sum(enc.hash_grid_encoding(t, p) * cot))(table)
    eps_dirs = [(0, 17, 0), (5, 999, 1), (15, 32000, 0)]
    for (l, t_, f) in eps_dirs:
        e = 1e-3
        tp = table.at[l, t_, f].add(e)
        tm = table.at[l, t_, f].add(-e)
        fd = (float(jnp.sum(enc.hash_grid_encoding(tp, p) * cot))
              - float(jnp.sum(enc.hash_grid_encoding(tm, p) * cot))) / (2 * e)
        assert abs(float(g[l, t_, f]) - fd) < 5e-2 * max(1.0, abs(fd)), (
            l, t_, f, float(g[l, t_, f]), fd)


def test_train_on_frame_disjoint_quarters():
    """train_on_frame trains `steps` Adam steps on DISJOINT shuffled
    slices of the frame's records (reference
    neural_radiance_caching_main.cpp:2350: batchSize = perFrame/4,
    dataStartIndex advances). steps=1 must equal train_step on the full
    batch (a permutation doesn't change one step's summed gradient);
    steps=4 must advance the step counter by 4 and differ from 4x
    full-batch training."""
    from gfxexp_tpu.techniques.nrc import (
        NRCConfig, init_nrc, train_on_frame, train_step)

    cfg = NRCConfig()
    n = 1024
    q = jax.random.uniform(jax.random.PRNGKey(1), (n, 14))
    t = jnp.full((n, 3), 0.4)
    m = jnp.arange(n) % 5 != 0  # some invalid records

    st0 = init_nrc(jax.random.PRNGKey(0), cfg)
    a, loss_a = train_on_frame(init_nrc(jax.random.PRNGKey(0), cfg), q, t,
                               m, jax.random.PRNGKey(2), cfg, 1)
    b, loss_b = train_step(init_nrc(jax.random.PRNGKey(0), cfg), q, t, m,
                           cfg)
    assert abs(float(loss_a) - float(loss_b)) < 1e-4
    fa = np.asarray(a["params"]["weights"][0])
    fb = np.asarray(b["params"]["weights"][0])
    np.testing.assert_allclose(fa, fb, rtol=1e-4, atol=1e-6)

    c, _ = train_on_frame(init_nrc(jax.random.PRNGKey(0), cfg), q, t, m,
                          jax.random.PRNGKey(2), cfg, 4)
    assert int(c["step"]) == 4
    d = init_nrc(jax.random.PRNGKey(0), cfg)
    for _ in range(4):
        d, _ = train_step(d, q, t, m, cfg)
    assert not np.allclose(np.asarray(c["params"]["weights"][0]),
                           np.asarray(d["params"]["weights"][0]))


def test_hash_grid_pipeline_smoke():
    """The default NRC encoding flipped to triangle_wave in r5 (hash-grid
    gathers are structurally slow on TPU — perf/RESULTS_r5.md); the
    hash-grid PIPELINE stays supported: full render + train frame."""
    from gfxexp_tpu.techniques.nrc import (
        NRCConfig, init_nrc, train_on_frame)
    from gfxexp_tpu.techniques.nrc.network import POSITION_ENCODING_HASH_GRID

    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    cfg = NRCConfig(position_encoding=POSITION_ENCODING_HASH_GRID)
    icfg = NRCIntegratorConfig(max_path_length=3)
    st = init_nrc(jax.random.PRNGKey(0), cfg)
    lo, hi = scene_aabb(scene)
    rad, tq, tt, tm = render_sample_nrc(
        scene, bvh, cam, st["ema"], lo, hi, 32, 32, jnp.uint32(0), icfg, cfg)
    st, loss = train_on_frame(st, tq, tt, tm, jax.random.PRNGKey(0), cfg, 2)
    assert np.isfinite(np.asarray(rad)).all()
    assert np.isfinite(float(loss))
    assert int(st["step"]) == 2
