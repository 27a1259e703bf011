#!/usr/bin/env python
"""Lane-group prototype A/B (VERDICT r5 item #5): sub-row cursors vs the
widestack row walk and the persistent row-slot kernel, kernel-only,
device-resident rays, dispatch amortized by an in-graph chain.

The structural question: does shrinking the union footprint from 128 lanes
to 128/G pay for G x row fetches + (G-1) selects per node component + G x K
masked reductions per iteration? perf/RESULTS_r5.md records the verdict.
"""

from __future__ import annotations

import functools
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
from gfxexp_tpu.accel.pallas_lanegroup import (  # noqa: E402
    intersect_closest_lanegroup)
from gfxexp_tpu.accel.pallas_persistent import (  # noqa: E402
    intersect_closest_persistent)
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    intersect_closest_widestack)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)

CHAIN = 8
WARM = 6
REPS = 8


@functools.partial(jax.jit, static_argnames=("kind", "rows", "groups"))
def chained(bvh, tris, o, d, tmax, kind, rows, groups=2):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(CHAIN):
        o2 = o + (acc * 0.0)
        if kind == "lanegroup":
            hit = intersect_closest_lanegroup(bvh, tris, o2, d, 0.0, tmax,
                                              rows=rows, groups=groups)
        elif kind == "widestack":
            hit = intersect_closest_widestack(bvh, tris, o2, d, 0.0, tmax,
                                              rows=rows)
        else:
            hit = intersect_closest_persistent(bvh, tris, o2, d, 0.0, tmax)
        acc = acc + hit.t.sum()
    return acc


def timeit(label, fn, n_rays):
    for _ in range(WARM):
        out = fn()
    np.asarray(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(out)
    ms = (time.time() - t0) / (REPS * CHAIN) * 1e3
    print(f"{label:48s} {ms:8.2f} ms  {n_rays / ms / 1e3:7.1f} Mrays/s",
          flush=True)
    return ms


def main():
    os.environ.setdefault("GFXEXP_PERSIST", "0")
    scene, bvh = build_bench_scene()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    camera = make_camera([0.0, 0.8, 1.6], fov_y=np.deg2rad(45),
                         aspect=WIDTH / HEIGHT, target=[0.0, 0.2, 0.0])
    n = WIDTH * HEIGHT
    tris = scene.triangles
    print(f"scene: {scene.num_triangles} tris, table rows {bvh.nodes.shape}")

    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, WIDTH, HEIGHT)
    jx = jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, WIDTH, HEIGHT, pixel, jx, jy)
    ones = jnp.full((n,), 1e30, jnp.float32)

    hit = intersect_closest_widestack(bvh, tris, ray_o, ray_d, 0.0, ones)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = jnp.asarray(np.asarray(ray_o + hit.t[:, None] * ray_d * 0.999))
    bd = jnp.asarray(np.asarray(v))

    pops = {"primary": (ray_o, ray_d), "bounce": (bo, bd)}
    for name, (o_, d_) in pops.items():
        timeit(f"{name} widestack rows=64",
               lambda o_=o_, d_=d_: chained(bvh, tris, o_, d_, ones,
                                            "widestack", 64), n)
        timeit(f"{name} persistent (default)",
               lambda o_=o_, d_=d_: chained(bvh, tris, o_, d_, ones,
                                            "persistent", 0), n)
        for rows, groups in ((64, 2), (32, 2), (32, 4), (16, 4)):
            timeit(f"{name} lanegroup rows={rows} G={groups}",
                   lambda o_=o_, d_=d_, rows=rows, groups=groups: chained(
                       bvh, tris, o_, d_, ones, "lanegroup", rows, groups),
                   n)

    # footprint statistics: how much union walk does splitting save?
    for name, (o_, d_) in pops.items():
        _, it_row = intersect_closest_widestack(bvh, tris, o_, d_, 0.0,
                                                ones, with_stats=True)
        _, it_g2 = intersect_closest_lanegroup(bvh, tris, o_, d_, 0.0, ones,
                                               rows=64, groups=2,
                                               with_stats=True)
        _, it_g4 = intersect_closest_lanegroup(bvh, tris, o_, d_, 0.0, ones,
                                               rows=64, groups=4,
                                               with_stats=True)
        r, g2, g4 = (np.asarray(x).astype(np.float64)
                     for x in (it_row, it_g2, it_g4))
        print(f"{name}: union iters/lane row128 {r.mean():.1f} "
              f"g64 {g2.mean():.1f} (x{r.mean() / max(g2.mean(), 1e-9):.2f}) "
              f"g32 {g4.mean():.1f} (x{r.mean() / max(g4.mean(), 1e-9):.2f})",
              flush=True)


if __name__ == "__main__":
    main()
