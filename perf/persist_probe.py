#!/usr/bin/env python
"""A/B: persistent row-slot kernel vs static-tile widestack, kernel-only.

Same methodology as kernel_probe.py: device-resident rays, CHAIN dependent
traversals per jit program (dispatch amortized), WARM discarded executions,
host-copy fence. Sweeps the persistent pool size (rows the shared counter
feeds per grid step — bigger pools amortize the drain tail further but eat
VMEM against the node table)."""

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
from gfxexp_tpu.accel.pallas_persistent import (  # noqa: E402
    intersect_any_persistent, intersect_closest_persistent)
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    intersect_any_widestack, intersect_closest_widestack)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)

CHAIN = 8
WARM = 6
REPS = 8


@functools.partial(jax.jit, static_argnames=("any_hit", "persist", "pool"))
def chained(nodes_bvh, tris, o, d, tmax, any_hit=False, persist=False,
            pool=None):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(CHAIN):
        o2 = o + (acc * 0.0)
        if persist:
            if any_hit:
                occ = intersect_any_persistent(nodes_bvh, tris, o2, d,
                                               t_min=0.0, t_max=tmax,
                                               pool=pool)
                acc = acc + occ.sum().astype(jnp.float32)
            else:
                hit = intersect_closest_persistent(nodes_bvh, tris, o2, d,
                                                   t_min=0.0, t_max=tmax,
                                                   pool=pool)
                acc = acc + hit.t.sum()
        else:
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

    # correctness cross-check on real TPU before timing (Mosaic path, not
    # the CPU interpreter the unit tests use)
    hp = intersect_closest_persistent(bvh, tris, ray_o, ray_d, 0.0, ones)
    match = float(np.mean(np.asarray(hp.tri) == np.asarray(hit.tri)))
    tdiff = float(np.nanmax(np.abs(np.asarray(hp.t) - np.asarray(hit.t))))
    print(f"TPU parity primary: tri match {match:.6f}, max |dt| {tdiff:.3e}")
    assert match > 0.9999, "persistent kernel disagrees with widestack"

    timeit("widestack primary",
           lambda: chained(bvh, tris, ray_o, ray_d, ones), n)
    timeit("widestack bounce",
           lambda: chained(bvh, tris, bo, bd, ones), n)
    timeit("widestack any-hit bounce",
           lambda: chained(bvh, tris, bo, bd, ones, any_hit=True), n)

    for pool in (128, 256, 512, 620):
        timeit(f"persistent primary   pool={pool}",
               lambda pool=pool: chained(bvh, tris, ray_o, ray_d, ones,
                                         persist=True, pool=pool), n)
        timeit(f"persistent bounce    pool={pool}",
               lambda pool=pool: chained(bvh, tris, bo, bd, ones,
                                         persist=True, pool=pool), n)
        timeit(f"persistent any-hit   pool={pool}",
               lambda pool=pool: chained(bvh, tris, bo, bd, ones,
                                         any_hit=True, persist=True,
                                         pool=pool), n)


if __name__ == "__main__":
    main()
