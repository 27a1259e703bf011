#!/usr/bin/env python
"""A/B the TLAS sorted-wavefront instanced traversal against the dense
(tiles x instances) grid on the big bench scene: per-call ms, Mrays/s and
wavefront round counts for primary / bounce / shadow ray populations."""

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

import bench  # noqa: E402
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    _traverse_instanced, _traverse_instanced_tlas)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)


def time_call(fn, reps=4):
    fn()  # warm
    fn()
    fn()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(out[0].t)
    return (time.time() - t0) / reps, out


def main():
    scene, acc = bench.build_bench_scene(big=True)
    print("instances:", acc.num_instances, "nodes", acc.nodes.shape,
          flush=True)
    W, H = bench.WIDTH, bench.HEIGHT
    camera = make_camera([0.0, 2.2, 3.4], fov_y=np.deg2rad(45),
                         aspect=W / H, target=[0.0, 0.1, 0.0])
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, W, H)
    jx = jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, W, H, pixel, jx, jy)

    hit, _ = _traverse_instanced(acc, ray_o, ray_d, 1e-4, 1e30, False)
    np.asarray(hit.t)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = ray_o + hit.t[:, None] * ray_d * 0.999
    # shadow rays: toward the area light at y=1.5
    lt = jnp.asarray([0.0, 1.5, 0.0]) - bo
    ldist = jnp.linalg.norm(lt, axis=-1)
    ld = lt / ldist[:, None]

    pops = {
        "primary": (ray_o, ray_d, 1e30, False),
        "bounce": (bo, v, 1e30, False),
        "shadow": (bo, ld, None, True),
    }
    for name, (o_, d_, tmx, anyh) in pops.items():
        tmax = (ldist * 0.999) if tmx is None else tmx
        dt_d, _ = time_call(lambda: _traverse_instanced(
            acc, o_, d_, 1e-4, tmax, anyh))
        dt_t, out = time_call(lambda: _traverse_instanced_tlas(
            acc, o_, d_, 1e-4, tmax, anyh))
        print(f"{name:8s} dense {dt_d * 1e3:7.1f} ms "
              f"({n / dt_d / 1e6:6.2f} Mrays/s) | "
              f"tlas {dt_t * 1e3:7.1f} ms ({n / dt_t / 1e6:6.2f} Mrays/s) "
              f"speedup {dt_d / dt_t:.2f}x", flush=True)
        # agreement check
        hd, _ = _traverse_instanced(acc, o_, d_, 1e-4, tmax, anyh)
        ht, _ = out
        agree = np.mean(np.asarray(hd.hit) == np.asarray(ht.hit))
        print(f"         hit agreement {agree * 100:.3f}%", flush=True)


if __name__ == "__main__":
    main()
