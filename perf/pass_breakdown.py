#!/usr/bin/env python
"""Per-pass timing breakdown of the headline bench configuration on TPU.

Times each component of the render loop in isolation (VERDICT r2 item 3):
- full render_sample at several max_path_length values (marginal bounce cost)
- NEE on/off delta (shadow-trace + light-sampling cost)
- raw closest-hit traversal on primary rays and on cached bounce rays
- raw any-hit traversal (shadow-ray profile)

Timing rules (CLAUDE.md): first ~4 executions of a fresh program run 2-6x
slow -> warm 6; block_until_ready can return early -> fence with a host copy;
queue >=REPS executions per measurement to pipeline the ~2 ms dispatch.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfxexp_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import WIDTH, HEIGHT, build_bench_scene  # noqa: E402
from gfxexp_tpu.render.camera import make_camera  # noqa: E402
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample  # noqa: E402

WARM = 6
REPS = 12


def timeit(label, fn, reps=REPS):
    for i in range(WARM):
        out = fn(i)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.time()
    outs = None
    for i in range(reps):
        outs = fn(WARM + i)
    jax.tree_util.tree_map(np.asarray, outs)  # host copy = honest fence
    ms = (time.time() - t0) / reps * 1e3
    print(f"{label:55s} {ms:9.2f} ms")
    return ms


def main():
    scene, bvh = build_bench_scene(big="big" in sys.argv[1:])
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    camera = make_camera([0.0, 0.8, 1.6], fov_y=np.deg2rad(45),
                         aspect=WIDTH / HEIGHT, target=[0.0, 0.2, 0.0])
    n = WIDTH * HEIGHT
    print(f"scene: {scene.num_triangles} tris, {n} pixels")

    # ---- full pipeline at varying path length ----
    base = {}
    for L in (1, 2, 3, 5):
        cfg = PTConfig(max_path_length=L)
        base[L] = timeit(
            f"render_sample L={L} (NEE on)",
            lambda s, cfg=cfg: render_sample(scene, bvh, camera, WIDTH,
                                             HEIGHT, jnp.uint32(s), cfg))
    for L in (1, 5):
        cfg = PTConfig(max_path_length=L, use_explicit_light_sampling=False)
        timeit(f"render_sample L={L} (NEE off)",
               lambda s, cfg=cfg: render_sample(scene, bvh, camera, WIDTH,
                                                HEIGHT, jnp.uint32(s), cfg))
    cfg = PTConfig(max_path_length=5, use_explicit_light_sampling=False,
                   use_implicit_light_sampling=True, enable_jitter=False)
    timeit("render_sample L=5 (NEE off, no jitter)",
           lambda s: render_sample(scene, bvh, camera, WIDTH, HEIGHT,
                                   jnp.uint32(s), cfg))

    # ---- raw traversal kernels ----
    from gfxexp_tpu.accel.pallas_widestack import (
        WideRowBVH, intersect_any_widestack, intersect_closest_widestack)
    from gfxexp_tpu.render.camera import generate_rays_for_lanes, pixel_from_lane

    if isinstance(bvh, WideRowBVH):
        lane = jnp.arange(n, dtype=jnp.uint32)
        pixel = pixel_from_lane(lane, WIDTH, HEIGHT)
        jx = jy = jnp.full((n,), 0.5, jnp.float32)
        ray_o, ray_d = generate_rays_for_lanes(camera, WIDTH, HEIGHT, pixel, jx, jy)
        ray_o, ray_d = jnp.asarray(ray_o), jnp.asarray(ray_d)

        closest = jax.jit(lambda o, d, tmax: intersect_closest_widestack(
            bvh, scene.triangles, o, d, t_min=0.0, t_max=tmax))
        anyh = jax.jit(lambda o, d, tmax: intersect_any_widestack(
            bvh, scene.triangles, o, d, t_min=0.0, t_max=tmax))
        ones = jnp.ones((n,), jnp.float32) * 1e30

        ms = timeit("closest: primary rays (coherent)",
                    lambda s: closest(ray_o + 1e-6 * s, ray_d, ones))
        print(f"    -> {n / ms / 1e3:.1f} Mrays/s")

        # bounce-profile rays: hit points + cosine directions (incoherent)
        hit = closest(ray_o, ray_d, ones)
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (n, 3))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        bo = np.asarray(ray_o + hit.t[:, None] * ray_d * 0.999)
        bd = np.asarray(v)
        alive_frac = float(np.asarray(hit.hit).mean())
        bo, bd = jnp.asarray(bo), jnp.asarray(bd)
        tmax_alive = jnp.where(hit.hit, 1e30, -1.0)
        ms = timeit("closest: bounce rays (incoherent, all alive)",
                    lambda s: closest(bo + 1e-6 * s, bd, ones))
        print(f"    -> {n / ms / 1e3:.1f} Mrays/s")
        ms = timeit(f"closest: bounce rays (alive={alive_frac:.2f} masked)",
                    lambda s: closest(bo + 1e-6 * s, bd, tmax_alive))
        ms = timeit("any-hit: shadow profile (alive-masked)",
                    lambda s: anyh(bo + 1e-6 * s, bd, tmax_alive))
        print(f"    -> {n / ms / 1e3:.1f} Mrays/s")

    # marginal costs
    print("\nderived:")
    print(f"  L=1 frame (primary+NEE+shade): {base[1]:.1f} ms")
    if 5 in base and 3 in base:
        print(f"  marginal bounce (L3->L5)/2:    {(base[5]-base[3])/2:.1f} ms")


if __name__ == "__main__":
    main()
