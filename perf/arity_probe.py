#!/usr/bin/env python
"""A/B the widestack kernel at arity 4 vs 8 (and max_leaf variants).

Hypothesis (round-3 union-walk analysis): incoherent bounce rows walk ~the
union of their 128 lanes' node visits; an arity-8 tree has ~half the levels
and ~40% fewer union visits, trading more VPU work per iteration (8 slab
tests + NET8 sort) for fewer iterations.
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
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    build_widerow, intersect_any_widestack, intersect_closest_widestack)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)

CHAIN = 8
WARM = 6
REPS = 8


@functools.partial(jax.jit, static_argnames=("any_hit",))
def chained(nodes_bvh, tris, o, d, tmax, any_hit=False):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(CHAIN):
        o2 = o + (acc * 0.0)
        if any_hit:
            occ = intersect_any_widestack(nodes_bvh, tris, o2, d,
                                          t_min=0.0, t_max=tmax)
            acc = acc + occ.sum().astype(jnp.float32)
        else:
            hit = intersect_closest_widestack(nodes_bvh, tris, o2, d,
                                              t_min=0.0, t_max=tmax)
            acc = acc + hit.t.sum()
    return acc


def timeit(label, fn, n_rays, per_call=CHAIN):
    for _ in range(WARM):
        out = fn()
    np.asarray(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(out)
    ms = (time.time() - t0) / (REPS * per_call) * 1e3
    print(f"{label:48s} {ms:8.2f} ms  {n_rays / ms / 1e3:7.1f} Mrays/s",
          flush=True)
    return ms


def main():
    scene, bvh4 = build_bench_scene()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    tris = scene.triangles
    p0 = np.asarray(tris.p0)
    e1 = np.asarray(tris.e1)
    e2 = np.asarray(tris.e2)

    camera = make_camera([0.0, 0.8, 1.6], fov_y=np.deg2rad(45),
                         aspect=WIDTH / HEIGHT, target=[0.0, 0.2, 0.0])
    n = WIDTH * HEIGHT
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, WIDTH, HEIGHT)
    jx = jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, WIDTH, HEIGHT, pixel, jx, jy)
    ones = jnp.full((n,), 1e30, jnp.float32)

    hit = intersect_closest_widestack(bvh4, tris, ray_o, ray_d, 0.0, ones)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = jnp.asarray(np.asarray(ray_o + hit.t[:, None] * ray_d * 0.999))
    bd = jnp.asarray(np.asarray(v))

    for arity, max_leaf in [(4, 4), (8, 4)]:
        wb, perm = build_widerow(p0, e1, e2, arity=arity, max_leaf=max_leaf)
        # perm only affects which tri ids come back, not traversal cost
        print(f"\n== arity={arity} max_leaf={max_leaf}: rows "
              f"{wb.nodes.shape} depth {wb.max_depth} ==", flush=True)
        timeit("closest primary (coherent)",
               lambda: chained(wb, tris, ray_o, ray_d, ones), n)
        timeit("closest bounce (incoherent)",
               lambda: chained(wb, tris, bo, bd, ones), n)
        timeit("any-hit bounce",
               lambda: chained(wb, tris, bo, bd, ones, any_hit=True), n)
        for name, (o_, d_) in {"primary": (ray_o, ray_d),
                               "bounce": (bo, bd)}.items():
            _, iters = intersect_closest_widestack(
                wb, tris, o_, d_, 0.0, ones, with_stats=True)
            it = np.asarray(iters).reshape(-1, 64, 128)
            row_it = it[:, :, 0]
            print(f"{name}: per-row iters mean {row_it.mean():.1f} "
                  f"p50 {np.percentile(row_it, 50):.0f} "
                  f"p95 {np.percentile(row_it, 95):.0f} max {row_it.max()}; "
                  f"per-tile MAX mean {row_it.max(axis=1).mean():.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
