"""Shared tiny test scenes."""

import numpy as np

from gfxexp_tpu.scene.builder import SceneBuilder, affine


def furnace_scene(albedo=0.5, env_radiance=1.0, env_res=(16, 32)):
    """Lambert sphere in a constant environment — the furnace test."""
    b = SceneBuilder()
    mat = b.add_lambert_material((albedo, albedo, albedo))
    geom = b.add_sphere(1.0, mat, n_theta=24, n_phi=48)
    b.add_instance(geom)
    h, w = env_res
    b.set_environment(np.full((h, w, 3), env_radiance, np.float32))
    return b


def quad_light_scene(
    emittance=(30.0, 30.0, 30.0), albedo=0.6, light_y=2.0, light_dim=0.5
):
    """Lambert ground plane + downward-facing rectangle light above it."""
    b = SceneBuilder()
    floor_mat = b.add_lambert_material((albedo, albedo, albedo))
    light_mat = b.add_lambert_material((0.0, 0.0, 0.0), emittance=emittance)
    floor = b.add_rectangle(10.0, 10.0, floor_mat)
    light = b.add_rectangle(light_dim, light_dim, light_mat)
    b.add_instance(floor)
    # flip the light to face downward (-Y): rotate pi about X
    rot = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(light, affine(rotation=rot, translation=[0.0, light_y, 0.0]))
    return b


def box_scene(albedo=0.7):
    """Closed box with a ceiling light — tests multi-bounce + NEE together."""
    b = SceneBuilder()
    wall = b.add_lambert_material((albedo, albedo, albedo))
    light_mat = b.add_lambert_material((0.0, 0.0, 0.0), emittance=(20.0, 20.0, 20.0))
    s = 2.0
    # floor (+Y normal), ceiling (-Y), 4 walls — all rectangles transformed
    floor = b.add_rectangle(2 * s, 2 * s, wall)
    b.add_instance(floor, affine(translation=[0, -s, 0]))
    flipx = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    ceil = b.add_rectangle(2 * s, 2 * s, wall)
    b.add_instance(ceil, affine(rotation=flipx, translation=[0, s, 0]))
    rot_zp = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)  # +Y -> +Z
    back = b.add_rectangle(2 * s, 2 * s, wall)
    b.add_instance(back, affine(rotation=rot_zp, translation=[0, 0, -s]))
    rot_zm = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64)
    front = b.add_rectangle(2 * s, 2 * s, wall)
    b.add_instance(front, affine(rotation=rot_zm, translation=[0, 0, s]))
    rot_xp = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float64)
    left = b.add_rectangle(2 * s, 2 * s, wall)
    b.add_instance(left, affine(rotation=rot_xp, translation=[-s, 0, 0]))
    rot_xm = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    right = b.add_rectangle(2 * s, 2 * s, wall)
    b.add_instance(right, affine(rotation=rot_xm, translation=[s, 0, 0]))
    lamp = b.add_rectangle(0.8, 0.8, light_mat)
    b.add_instance(lamp, affine(rotation=flipx, translation=[0, s - 0.01, 0]))
    return b


def many_light_scene(n_lights=64, seed=3, albedo=0.6):
    """Grid of small emitters with random intensities over a ground plane —
    the regime ReSTIR is built for."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    floor_mat = b.add_lambert_material((albedo, albedo, albedo))
    floor = b.add_rectangle(20.0, 20.0, floor_mat)
    b.add_instance(floor)
    side = int(np.sqrt(n_lights))
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    for i in range(side):
        for j in range(side):
            e = float(rng.uniform(1.0, 60.0))
            m = b.add_lambert_material((0, 0, 0), emittance=(e, e, e))
            g = b.add_rectangle(0.15, 0.15, m)
            x = (i - side / 2 + 0.5) * 1.2
            z = (j - side / 2 + 0.5) * 1.2
            b.add_instance(g, affine(rotation=flip, translation=[x, 2.0, z]))
    return b
