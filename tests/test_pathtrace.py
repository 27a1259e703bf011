"""Integrator correctness: furnace test, analytic direct lighting, MIS
estimator consistency (SURVEY.md §4 golden/convergence strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.compile import compile_scene

from scenes import furnace_scene, quad_light_scene


def _mean_radiance(scene, bvh, camera, w, h, spp, cfg, mask_fn=None):
    acc = np.zeros((w * h, 3), np.float64)
    for s in range(spp):
        acc += np.asarray(render_sample(scene, bvh, camera, w, h, jnp.uint32(s), cfg))
    return acc / spp


@pytest.mark.slow
def test_furnace():
    """White furnace: a Lambert sphere with albedo 1 in a unit environment
    must render to exactly 1.0 everywhere (a convex body has no
    self-interreflection, so one bounce must already conserve energy) —
    the fundamental test for BSDF sampling + env MIS."""
    scene, bvh = compile_scene(furnace_scene(albedo=1.0))
    w = h = 24
    cam = make_camera([0, 0, 4.0], fov_y=np.deg2rad(40), aspect=1.0, target=[0, 0, 0])
    cfg = PTConfig(max_path_length=6, enable_jitter=True, russian_roulette=False)
    img = _mean_radiance(scene, bvh, cam, w, h, 64, cfg)
    mean = img.mean(axis=(0,))
    assert np.allclose(mean, 1.0, atol=0.02), f"furnace mean={mean}"
    assert np.abs(img - 1.0).mean() < 0.04


def test_gray_sphere_half_albedo():
    """Convex Lambert sphere with rho=0.5 in a unit furnace: sphere pixels
    must read 0.5 (single scattering only)."""
    scene, bvh = compile_scene(furnace_scene(albedo=0.5))
    cam = make_camera([0, 0, 4.0], fov_y=np.deg2rad(5), aspect=1.0, target=[0, 0, 0])
    cfg = PTConfig(max_path_length=4, enable_jitter=True, russian_roulette=False)
    img = _mean_radiance(scene, bvh, cam, 4, 4, 96, cfg)  # narrow FoV: all sphere
    assert np.allclose(img.mean(axis=0), 0.5, atol=0.02), img.mean(axis=0)


def test_direct_lighting_analytic():
    """Quad light far above a Lambert plane ~ point source: compare the
    rendered radiance at the plane point below the light with the analytic
    value  L_o = rho/pi * E_irr,  E_irr = Le * A * cos^2 / d^2."""
    e = 30.0
    albedo = 0.6
    d = 2.0
    dim = 0.3
    scene, bvh = compile_scene(
        quad_light_scene(emittance=(e, e, e), albedo=albedo, light_y=d, light_dim=dim)
    )
    w = h = 8
    # look straight down at the origin from slightly to the side
    cam = make_camera([0.4, 1.0, 0.4], fov_y=np.deg2rad(10), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    cfg = PTConfig(max_path_length=2, enable_jitter=True, russian_roulette=False)
    img = _mean_radiance(scene, bvh, cam, w, h, 256, cfg)
    # analytic: Le = emittance/pi; flux toward point ~ Le * A * cos_l * cos_s / d^2
    le = e / np.pi
    area = dim * dim
    # at the point under the light: both cosines ~1 (offset camera point ~0.0)
    irr = le * area / d**2
    expect = albedo / np.pi * irr
    got = img.mean()
    assert abs(got - expect) / expect < 0.08, f"direct {got} vs {expect}"


def test_mis_estimators_agree():
    """NEE-only, BSDF-only, and MIS must estimate the same radiance."""
    scene, bvh = compile_scene(
        quad_light_scene(emittance=(20.0, 20.0, 20.0), light_y=1.2, light_dim=0.8)
    )
    w = h = 8
    cam = make_camera([0.6, 0.8, 0.6], fov_y=np.deg2rad(25), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    spp = 512
    base = dict(max_path_length=2, enable_jitter=True, russian_roulette=False)
    img_mis = _mean_radiance(scene, bvh, cam, w, h, spp, PTConfig(**base))
    img_nee = _mean_radiance(
        scene, bvh, cam, w, h, spp, PTConfig(**base, use_implicit_light_sampling=False)
    )
    img_imp = _mean_radiance(
        scene, bvh, cam, w, h, spp, PTConfig(**base, use_explicit_light_sampling=False)
    )
    m_mis, m_nee, m_imp = img_mis.mean(), img_nee.mean(), img_imp.mean()
    assert abs(m_nee - m_mis) / m_mis < 0.05, (m_nee, m_mis)
    assert abs(m_imp - m_mis) / m_mis < 0.12, (m_imp, m_mis)


def test_deterministic():
    scene, bvh = compile_scene(quad_light_scene())
    cam = make_camera([0.5, 1.0, 0.5], fov_y=np.deg2rad(30), aspect=1.0,
                      target=[0, 0, 0])
    cfg = PTConfig(max_path_length=3)
    a = render_sample(scene, bvh, cam, 8, 8, jnp.uint32(7), cfg)
    b = render_sample(scene, bvh, cam, 8, 8, jnp.uint32(7), cfg)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c = render_sample(scene, bvh, cam, 8, 8, jnp.uint32(8), cfg)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_solid_angle_sampling_matches_area():
    """NEE with solid-angle triangle sampling must estimate the same direct
    lighting as area sampling (reference: useSolidAngleSampling variant)."""
    e = 30.0
    scene, bvh = compile_scene(
        quad_light_scene(emittance=(e, e, e), albedo=0.6, light_y=1.2,
                         light_dim=0.8))
    cam = make_camera([0.5, 0.9, 0.5], fov_y=np.deg2rad(20), aspect=1.0,
                      target=[0.0, 0.0, 0.0])
    base = dict(max_path_length=2, enable_jitter=True, russian_roulette=False,
                use_implicit_light_sampling=False)
    area = _mean_radiance(scene, bvh, cam, 8, 8, 200, PTConfig(**base))
    sa = _mean_radiance(scene, bvh, cam, 8, 8, 200,
                        PTConfig(**base, use_solid_angle_sampling=True))
    rel = abs(sa.mean() - area.mean()) / area.mean()
    assert rel < 0.05, (sa.mean(), area.mean())


def test_instanced_scene_matches_flattened():
    """Two-level (BLAS x instance) compile must produce the same image as
    the flattened compile — exercises instanced traversal, world-space
    surface points, NEE light sampling through instance transforms, and
    implicit-hit MIS pdfs (reference: GAS/IAS split, common_host.h:1027)."""
    import numpy as np

    from scenes import box_scene
    from gfxexp_tpu.scene.builder import affine
    from gfxexp_tpu.scene.compile import compile_scene

    def make_builder():
        b = box_scene()
        mat = b.add_lambert_material((0.6, 0.3, 0.3))
        sph = b.add_sphere(0.35, mat, n_theta=12, n_phi=24)
        for t in ([-0.8, -1.2, 0.0], [0.0, -1.4, -0.8], [0.9, -1.1, 0.4]):
            b.add_instance(sph, affine(translation=t))
        return b

    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.0, -1.0])
    cfg = PTConfig(max_path_length=4)
    scene_f, bvh_f = compile_scene(make_builder(), traversal="widerow")
    scene_i, acc_i = compile_scene(make_builder(), traversal="instanced")
    # instancing shares geometry: 3 spheres -> 1 BLAS triangle set
    assert scene_i.num_triangles < scene_f.num_triangles

    accf = np.zeros((32 * 32, 3), np.float64)
    acci = np.zeros((32 * 32, 3), np.float64)
    for s in range(4):
        accf += np.asarray(
            render_sample(scene_f, bvh_f, cam, 32, 32, jnp.uint32(s), cfg))
        acci += np.asarray(
            render_sample(scene_i, acc_i, cam, 32, 32, jnp.uint32(s), cfg))
    assert np.allclose(accf / 4, acci / 4, atol=1e-4), np.abs(
        accf / 4 - acci / 4).max()


def test_probability_texture_light_sampling():
    """USE_PROBABILITY_TEXTURE analogue: mip quad-descent unit selection
    must produce the same image mean as the alias-table default
    (reference: common_shared.h:19 + ProbabilityTexture:406)."""
    import numpy as np

    from scenes import quad_light_scene

    def render(use_pt):
        scene, bvh = compile_scene(quad_light_scene(),
                                   use_probability_texture=use_pt)
        cam = make_camera([0, 0.6, 2.2], fov_y=np.deg2rad(60), aspect=1.0,
                          target=[0, 0.2, 0.0])
        cfg = PTConfig(max_path_length=3)
        acc = np.zeros((32 * 32, 3), np.float64)
        for s in range(24):
            acc += np.asarray(
                render_sample(scene, bvh, cam, 32, 32, jnp.uint32(s), cfg))
        return acc / 24

    base = render(False)
    pt = render(True)
    rel = abs(pt.mean() - base.mean()) / base.mean()
    assert rel < 0.05, (pt.mean(), base.mean())


def test_fused_shadow_rays_identical():
    """fuse_shadow_rays batches NEE shadow rays with the next bounce's
    closest rays in one launch; the estimator is unchanged (same RNG
    stream, same visibility booleans) so the image must match the
    unfused render to float tolerance."""
    import sys

    sys.path.insert(0, "tests")
    from scenes import box_scene

    from gfxexp_tpu.scene.compile import compile_scene

    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    a = np.asarray(render_sample(scene, bvh, cam, 32, 32, jnp.uint32(5),
                                 PTConfig(max_path_length=4)))
    b = np.asarray(render_sample(
        scene, bvh, cam, 32, 32, jnp.uint32(5),
        PTConfig(max_path_length=4, fuse_shadow_rays=True)))
    assert np.allclose(a, b, rtol=1e-5, atol=1e-6), np.abs(a - b).max()

    # ray accounting matches too
    _, nr_a = render_sample(scene, bvh, cam, 32, 32, jnp.uint32(5),
                            PTConfig(max_path_length=4, count_rays=True))
    _, nr_b = render_sample(
        scene, bvh, cam, 32, 32, jnp.uint32(5),
        PTConfig(max_path_length=4, count_rays=True,
                 fuse_shadow_rays=True))
    assert float(nr_a) == float(nr_b)


def test_golden_box_image():
    """Golden-image regression (SURVEY.md §4: golden tests at low spp with
    fixed RNG): the box render must match the committed golden to small
    numeric tolerance — catches silent estimator/geometry drift that
    variant-vs-variant comparisons can miss. Regenerate the golden ONLY
    for intentional estimator changes (script in the test body docstring):
        python - <<'PY'
        # see tests/golden/box_8spp_48.npz generation in git history
        PY
    """
    import os
    import sys

    sys.path.insert(0, "tests")
    from scenes import box_scene

    from gfxexp_tpu.scene.compile import compile_scene

    path = os.path.join(os.path.dirname(__file__), "golden",
                        "box_8spp_48.npz")
    golden = np.load(path)["img"]
    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    acc = np.zeros((48 * 48, 3), np.float64)
    for s in range(8):
        acc += np.asarray(render_sample(
            scene, bvh, cam, 48, 48, jnp.uint32(s),
            PTConfig(max_path_length=4)))
    img = (acc / 8).astype(np.float32)
    # loose enough for backend (CPU/TPU) float differences, tight enough
    # to catch any estimator change
    rel = np.abs(img - golden).mean() / (np.abs(golden).mean() + 1e-6)
    assert rel < 5e-3, rel


def test_render_accumulate_matches_loop():
    """The single-program multi-sample accumulator must equal the mean of
    the equivalent render_sample loop (same RNG streams per sample)."""
    import sys

    sys.path.insert(0, "tests")
    from scenes import box_scene

    from gfxexp_tpu.render.pathtrace import render_accumulate
    from gfxexp_tpu.scene.compile import compile_scene

    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    cfg = PTConfig(max_path_length=3, count_rays=True)
    acc = np.zeros((24 * 24, 3), np.float64)
    nr_total = 0.0
    for s in range(4):
        img, nr = render_sample(scene, bvh, cam, 24, 24,
                                jnp.uint32(7 + s), cfg)
        acc += np.asarray(img)
        nr_total += float(nr)
    mean_loop = acc / 4
    mean_batch, nr_batch = render_accumulate(scene, bvh, cam, 24, 24,
                                             jnp.uint32(7), 4, cfg)
    assert np.allclose(np.asarray(mean_batch), mean_loop, atol=1e-5)
    assert abs(float(nr_batch) - nr_total) < 1.0


def test_render_tile_accumulate_matches_loop():
    """The tiled multi-sample accumulator (bench.py's 1080p path) must equal
    the sum of the equivalent per-sample render_tile calls, tile by tile."""
    import sys

    sys.path.insert(0, "tests")
    from scenes import box_scene

    from gfxexp_tpu.render.pathtrace import render_tile, render_tile_accumulate
    from gfxexp_tpu.scene.compile import compile_scene

    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    cfg = PTConfig(max_path_length=3, count_rays=True)
    W = H = 24
    lane_count = (W * H) // 2
    for tile in range(2):
        start = jnp.uint32(tile * lane_count)
        acc = np.zeros((lane_count, 3), np.float64)
        nr_total = 0.0
        for s in range(3):
            img, nr = render_tile(scene, bvh, cam, W, H, start, lane_count,
                                  jnp.uint32(5 + s), cfg)
            acc += np.asarray(img)
            nr_total += float(nr)
        img_b, nr_b = render_tile_accumulate(scene, bvh, cam, W, H, start,
                                             lane_count, jnp.uint32(5), 3,
                                             cfg)
        assert np.allclose(np.asarray(img_b), acc, atol=1e-5)
        assert abs(float(nr_b) - nr_total) < 1.0


def test_debug_switches_full_bitfield():
    """All 8 traced debug switches (reference debugSwitches parity,
    path_tracing_shared.h:173-180) change the image in the expected
    DIRECTION without recompiling — one jitted program, 8 toggles."""
    from scenes import furnace_scene

    from gfxexp_tpu.scene.compile import compile_scene

    scene, bvh = compile_scene(furnace_scene(albedo=0.5))
    cam = make_camera([0, 0, 3.0], fov_y=np.deg2rad(40), aspect=1.0,
                      target=[0, 0, 0])
    W = H = 24
    cfg = PTConfig(max_path_length=4)

    def img(bits):
        return np.asarray(render_sample(scene, bvh, cam, W, H,
                                        jnp.uint32(3), cfg,
                                        debug_switches=jnp.uint32(bits)))

    # the furnace is exactly 1.0 everywhere for ANY albedo/RR/jitter (that
    # is the point of the test) — it cleanly isolates the estimator bits:
    base = img(0)
    assert img(1).mean() < base.mean()          # bit 0: no NEE loses light
    assert img(2).mean() < base.mean()          # bit 1: no implicit hits
    assert img(8).max() < 1e-6                  # bit 3: env is the only light

    # the remaining bits change sampling/shading, invisible in a furnace —
    # use the inhomogeneous box scene (+ a coarse sphere so interpolated
    # and geometric normals actually differ for bit 7):
    from scenes import box_scene

    from gfxexp_tpu.scene.builder import affine

    b = box_scene(albedo=0.5)
    smat = b.add_lambert_material((0.5, 0.5, 0.5))
    sph = b.add_sphere(0.35, smat, n_theta=6, n_phi=12)
    b.add_instance(sph, affine(translation=[0.0, 0.35, -0.8]))
    scene, bvh = compile_scene(b)
    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    base = img(0)
    assert not np.allclose(img(4), base)        # bit 2: no RR changes noise
    assert not np.allclose(img(32), base)       # bit 5: jitter off moves rays
    assert img(64).mean() > base.mean()         # bit 6: 0.8 albedo override
    assert not np.allclose(img(128), base)      # bit 7: geometric normals


def test_debug_switch_no_bump_matches_untextured():
    """bit 4 (disable bump mapping) must reproduce the image rendered with
    cfg.enable_bump_mapping=False — same program, runtime toggle."""
    import sys

    sys.path.insert(0, "tests")
    from scenes import box_scene

    from gfxexp_tpu.scene.builder import SceneBuilder
    from gfxexp_tpu.scene.compile import compile_scene

    b = box_scene()
    # attach a noisy normal map to every material so bump mapping matters
    rng = np.random.default_rng(0)
    nm = (rng.uniform(0.3, 0.7, size=(8, 8, 3))).astype(np.float32)
    nm[..., 2] = 1.0
    tid = b.add_texture(nm * 0.5 + 0.25)
    for m in b.materials:
        m.normal_tex = tid
    scene, bvh = compile_scene(b)
    cam = make_camera([0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    W = H = 24
    cfg_on = PTConfig(max_path_length=3, enable_bump_mapping=True)
    cfg_off = PTConfig(max_path_length=3, enable_bump_mapping=False)
    bumped = np.asarray(render_sample(scene, bvh, cam, W, H, jnp.uint32(2),
                                      cfg_on))
    ref_off = np.asarray(render_sample(scene, bvh, cam, W, H, jnp.uint32(2),
                                       cfg_off))
    sw_off = np.asarray(render_sample(scene, bvh, cam, W, H, jnp.uint32(2),
                                      cfg_on,
                                      debug_switches=jnp.uint32(16)))
    assert not np.allclose(bumped, ref_off)   # the map does something
    assert np.allclose(sw_off, ref_off, atol=1e-6)  # bit 4 == compiled-off
