"""Animation tests: device refit must keep traversal exact vs a fresh build;
light rebuild must match the host-compiled CDFs; controllers move things."""

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.accel.traverse import intersect_closest, intersect_closest_brute
from gfxexp_tpu.render.camera import make_camera
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
from gfxexp_tpu.scene.animation import (
    InstanceController,
    advance_frame,
    rebuild_light_distributions,
    refit_skip_bvh,
    set_instance_transforms,
    update_world_geometry,
)
from gfxexp_tpu.scene.compile import compile_scene

from scenes import quad_light_scene


def _make():
    return compile_scene(quad_light_scene(emittance=(30.0,) * 3, light_y=2.0))


def test_refit_identity_preserves_hits(rng_np):
    scene, bvh = _make()
    bvh2 = refit_skip_bvh(bvh, scene.triangles)
    n = 256
    o = rng_np.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] = 3.0
    d = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    h1 = intersect_closest(bvh, scene.triangles, jnp.asarray(o), jnp.asarray(d))
    h2 = intersect_closest(bvh2, scene.triangles, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(h1.tri), np.asarray(h2.tri))
    assert np.allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-5)


def test_moved_instance_refit_correct(rng_np):
    """Move the light instance, refit, and verify hits against brute force
    on the updated geometry."""
    scene, bvh = _make()
    m = np.asarray(scene.instances.transform).copy()
    m[1, :, 3] += np.asarray([0.5, -0.25, 0.3])  # translate the light
    scene = set_instance_transforms(scene, jnp.asarray(m))
    scene = update_world_geometry(scene)
    bvh = refit_skip_bvh(bvh, scene.triangles)

    n = 256
    o = rng_np.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 1] = 4.0
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    h = intersect_closest(bvh, scene.triangles, jnp.asarray(o), jnp.asarray(d))
    hb = intersect_closest_brute(scene.triangles, jnp.asarray(o), jnp.asarray(d))
    assert np.array_equal(np.asarray(h.hit), np.asarray(hb.hit))
    mk = np.asarray(hb.hit)
    assert np.allclose(np.asarray(h.t)[mk], np.asarray(hb.t)[mk], rtol=1e-4)
    # prev transform kept for motion vectors
    assert not np.allclose(np.asarray(scene.instances.prev_transform[1]),
                           np.asarray(scene.instances.transform[1]))


def test_light_rebuild_matches_host():
    scene, _ = _make()
    rebuilt = rebuild_light_distributions(scene)
    assert np.allclose(np.asarray(rebuilt.light_unit_pmf),
                       np.asarray(scene.light_unit_pmf), atol=1e-5)
    assert np.allclose(np.asarray(rebuilt.units.light_tri_pmf),
                       np.asarray(scene.units.light_tri_pmf), atol=1e-5)
    assert np.allclose(np.asarray(rebuilt.units.light_tri_cdf),
                       np.asarray(scene.units.light_tri_cdf), atol=1e-5)
    assert np.allclose(float(rebuilt.total_emissive_importance),
                       float(scene.total_emissive_importance), rtol=1e-5)


def test_animated_render_changes(rng_np):
    """A full animated frame (controller -> refit -> light rebuild) must
    change the image consistently with the light moving closer."""
    scene, bvh = _make()
    cam = make_camera([0.4, 1.0, 0.4], fov_y=np.deg2rad(15), aspect=1.0,
                      target=[0, 0, 0])
    flip = (1.0, 0.0, 0.0, 0.0)  # pi about X: keep the light facing down
    ctrl = InstanceController(
        instance=1, begin_position=(0, 2.0, 0), end_position=(0, 1.0, 0),
        begin_orientation=flip, end_orientation=flip,
        frequency=0.5,
    )
    cfg = PTConfig(max_path_length=2, enable_jitter=False)

    def mean_at(t):
        s2, b2 = advance_frame(scene, bvh, [ctrl], t)
        img = render_sample(s2, b2, cam, 8, 8, jnp.uint32(0), cfg)
        return float(jnp.mean(img))

    far = mean_at(0.0)  # light at begin (y=2)
    near = mean_at(1.0)  # half cycle -> end (y=1)
    assert near > 2.0 * far, (near, far)  # inverse-square-ish brightening


def test_instanced_animation_matches_rebuild():
    """Rigid animation on the two-level structure (reference: per-frame
    IAS transform update): advancing transforms on device must give the
    SAME traversal results and light tables as compiling the scene fresh
    at those transforms."""
    import jax.numpy as jnp

    from gfxexp_tpu.accel.traverse import intersect_closest
    from gfxexp_tpu.scene.animation import (
        InstanceController,
        advance_frame_instanced,
    )
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene

    def build(sphere_pos):
        b = SceneBuilder()
        floor = b.add_lambert_material((0.7, 0.7, 0.7))
        lamp = b.add_lambert_material((0, 0, 0), emittance=(60.0,) * 3)
        red = b.add_lambert_material((0.8, 0.2, 0.2))
        b.add_instance(b.add_rectangle(4.0, 4.0, floor))
        flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
        b.add_instance(b.add_rectangle(0.5, 0.5, lamp),
                       affine(rotation=flip, translation=[0, 1.8, 0]))
        sg = b.add_sphere(0.25, red, n_theta=8, n_phi=16)
        b.add_instance(sg, affine(translation=list(sphere_pos)))
        b.add_instance(sg, affine(translation=[-0.9, 0.25, 0.0]))
        return b

    # controller moves instance 2 from A to B over one cycle; t=0.5 -> B
    ctrl = InstanceController(
        instance=2, begin_position=(0.6, 0.25, 0.0),
        end_position=(0.6, 0.25, 0.9), frequency=1.0)

    scene, acc = compile_scene(build((0.6, 0.25, 0.0)),
                               traversal="instanced")
    scene_t, acc_t = advance_frame_instanced(scene, acc, [ctrl], 0.5)

    scene_f, acc_f = compile_scene(build((0.6, 0.25, 0.9)),
                                   traversal="instanced")

    rng = np.random.default_rng(4)
    n = 300
    o = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 2.0, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    ha = intersect_closest(acc_t, scene_t.triangles, oj, dj)
    hf = intersect_closest(acc_f, scene_f.triangles, oj, dj)
    assert np.array_equal(np.asarray(ha.hit), np.asarray(hf.hit))
    m = np.asarray(hf.hit)
    assert np.allclose(np.asarray(ha.t)[m], np.asarray(hf.t)[m], rtol=2e-4,
                       atol=1e-5)
    assert np.array_equal(np.asarray(ha.tri)[m], np.asarray(hf.tri)[m])
    assert np.array_equal(np.asarray(ha.inst)[m], np.asarray(hf.inst)[m])

    # light tables agree (translation only: importances unchanged)
    assert np.allclose(np.asarray(scene_t.light_unit_pmf),
                       np.asarray(scene_f.light_unit_pmf), atol=1e-6)
    # instance transforms propagated for shading
    assert np.allclose(np.asarray(scene_t.instances.transform[2, :, 3]),
                       [0.6, 0.25, 0.9], atol=1e-6)
