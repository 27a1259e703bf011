#!/usr/bin/env python
"""Kernel-only probe: chained widestack traversals inside ONE jit program.

Measures the pure traversal kernel (no eager glue, dispatch amortized by an
in-graph dependency chain) and the per-row iteration statistics that set its
cost: tile time scales with MAX per-row iterations in the tile, and every
iteration pays the full internal+leaf phase for all 64 rows.
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
    intersect_any_widestack, intersect_closest_widestack)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)

CHAIN = 8
WARM = 6
REPS = 8


@functools.partial(jax.jit, static_argnames=("any_hit",))
def chained(nodes_bvh, tris, o, d, tmax, any_hit=False):
    """CHAIN dependent traversals in one program (each consumes a zero
    derived from the previous output so XLA cannot parallelize them)."""
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
    print(f"{label:48s} {ms:8.2f} ms  {n_rays / ms / 1e3:7.1f} Mrays/s")
    return ms


def main():
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

    # bounce-profile rays
    hit = intersect_closest_widestack(bvh, tris, ray_o, ray_d, 0.0, ones)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = jnp.asarray(np.asarray(ray_o + hit.t[:, None] * ray_d * 0.999))
    bd = jnp.asarray(np.asarray(v))

    timeit("closest primary (coherent)",
           lambda: chained(bvh, tris, ray_o, ray_d, ones), n)
    timeit("closest bounce (incoherent)",
           lambda: chained(bvh, tris, bo, bd, ones), n)
    timeit("any-hit bounce",
           lambda: chained(bvh, tris, bo, bd, ones, any_hit=True), n)

    # rows sweep: tile time = MAX per-row union iters across `rows` rows —
    # fewer rows per tile shrinks the straggler max (and the per-iteration
    # row-load bill) at the cost of more grid steps
    @functools.partial(jax.jit, static_argnames=("rows",))
    def chained_rows(nodes_bvh, tris_, o, d, tmax, rows):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            o2 = o + (acc * 0.0)
            hit = intersect_closest_widestack(nodes_bvh, tris_, o2, d, 0.0,
                                              tmax, rows=rows)
            acc = acc + hit.t.sum()
        return acc
    for rows in (16, 32, 64):
        timeit(f"closest primary rows={rows}",
               lambda rows=rows: chained_rows(bvh, tris, ray_o, ray_d, ones,
                                              rows), n)
        timeit(f"closest bounce  rows={rows}",
               lambda rows=rows: chained_rows(bvh, tris, bo, bd, ones,
                                              rows), n)

    # iteration statistics: tile cost ~ max per-row iters in tile
    for name, (o_, d_) in {"primary": (ray_o, ray_d),
                           "bounce": (bo, bd)}.items():
        _, iters = intersect_closest_widestack(bvh, tris, o_, d_, 0.0, ones,
                                               with_stats=True)
        it = np.asarray(iters).reshape(-1, 64, 128)
        # per-row iteration count is constant across the row's 128 lanes
        row_it = it[:, :, 0]
        print(f"{name}: per-row iters mean {row_it.mean():.1f} "
              f"p50 {np.percentile(row_it, 50):.0f} "
              f"p95 {np.percentile(row_it, 95):.0f} max {row_it.max()}; "
              f"per-tile MAX mean {row_it.max(axis=1).mean():.1f} "
              f"(straggler waste x{row_it.max(axis=1).mean() / max(row_it.mean(), 1e-9):.2f})")


if __name__ == "__main__":
    main()
