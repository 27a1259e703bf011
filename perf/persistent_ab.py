#!/usr/bin/env python
"""Persistent row-slot kernel A/B vs static-tile widestack (round-5 item #1).

Kernel-only (chained, device-resident) on the three probe populations, plus
an end-to-end render_accumulate A/B with the routing flag flipped.

The persistent kernel attacks the measured x2.5-4.3 straggler tax
(perf/ROOFLINE.md): a tile's 64 row-SLOTS pull new rays off a shared pool
counter when their row finishes instead of idling until the tile's slowest
row ends.

Usage: python perf/persistent_ab.py [kernel|render|all]
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
from gfxexp_tpu.accel import pallas_widestack  # noqa: E402
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    _traverse_widestack)
from gfxexp_tpu.accel.pallas_persistent import (  # noqa: E402
    intersect_any_persistent, intersect_closest_persistent)
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
                occ = _traverse_widestack(nodes_bvh, tris, o2, d, 0.0, tmax,
                                          any_hit=True).hit
                acc = acc + occ.sum().astype(jnp.float32)
            else:
                hit = _traverse_widestack(nodes_bvh, tris, o2, d, 0.0, tmax,
                                          any_hit=False)
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
    print(f"{label:52s} {ms:8.2f} ms  {n_rays / ms / 1e3:7.1f} Mrays/s",
          flush=True)
    return ms


def kernel_ab():
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
    ray_o, ray_d = generate_rays_for_lanes(camera, WIDTH, HEIGHT, pixel,
                                           jx, jy)
    ones = jnp.full((n,), 1e30, jnp.float32)

    hit = _traverse_widestack(bvh, tris, ray_o, ray_d, 0.0, ones,
                              any_hit=False)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = jnp.asarray(np.asarray(ray_o + hit.t[:, None] * ray_d * 0.999))
    bd = jnp.asarray(np.asarray(v))

    # correctness spot-check on the real backend first
    hw = _traverse_widestack(bvh, tris, bo, bd, 0.0, ones, any_hit=False)
    hp = intersect_closest_persistent(bvh, tris, bo, bd, t_min=0.0,
                                      t_max=ones)
    same_hit = np.mean(np.asarray(hw.hit) == np.asarray(hp.hit))
    t_close = np.mean(np.isclose(np.asarray(hw.t), np.asarray(hp.t),
                                 rtol=1e-5, atol=1e-5)
                      | ~np.asarray(hw.hit))
    print(f"parity: hit match {same_hit:.6f}, t close {t_close:.6f}")

    for persist, tag in ((False, "widestack"), (True, "persist")):
        timeit(f"[{tag}] closest primary (coherent)",
               lambda p=persist: chained(bvh, tris, ray_o, ray_d, ones,
                                         persist=p), n)
        timeit(f"[{tag}] closest bounce (incoherent)",
               lambda p=persist: chained(bvh, tris, bo, bd, ones,
                                         persist=p), n)
        timeit(f"[{tag}] any-hit bounce",
               lambda p=persist: chained(bvh, tris, bo, bd, ones,
                                         any_hit=True, persist=p), n)

    # pool sweep on the bounce population (grid-step count vs refill tail)
    for pool in (512, 1024, 2048):
        try:
            timeit(f"[persist pool={pool}] closest bounce",
                   lambda p=pool: chained(bvh, tris, bo, bd, ones,
                                          persist=True, pool=p), n)
        except Exception as e:  # noqa: BLE001
            print(f"pool={pool}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # sched_k sweep: batch the writeback/refill block over K finishes
    from gfxexp_tpu.accel import pallas_persistent as pp

    @functools.partial(jax.jit, static_argnames=("sched_k", "pool",
                                                 "any_hit"))
    def chained_k(nodes_bvh, tris_, o, d, tmax, sched_k, pool=None,
                  any_hit=False):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            o2 = o + (acc * 0.0)
            if any_hit:
                occ = pp.intersect_any_persistent(
                    nodes_bvh, tris_, o2, d, t_min=0.0, t_max=tmax,
                    pool=pool, sched_k=sched_k)
                acc = acc + occ.sum().astype(jnp.float32)
            else:
                hit = pp.intersect_closest_persistent(
                    nodes_bvh, tris_, o2, d, t_min=0.0, t_max=tmax,
                    pool=pool, sched_k=sched_k)
                acc = acc + hit.t.sum()
        return acc

    for k_ in (1, 4, 8, 16, 32, 64):
        timeit(f"[persist k={k_}] closest bounce",
               lambda k=k_: chained_k(bvh, tris, bo, bd, ones, k), n)
    for k_ in (8, 16, 32, 64):
        timeit(f"[persist k={k_}] closest primary",
               lambda k=k_: chained_k(bvh, tris, ray_o, ray_d, ones, k), n)
        timeit(f"[persist k={k_}] any-hit bounce",
               lambda k=k_: chained_k(bvh, tris, bo, bd, ones, k,
                                      any_hit=True), n)
    for k_ in (16, 32):
        timeit(f"[persist k={k_} pool=2048] closest bounce",
               lambda k=k_: chained_k(bvh, tris, bo, bd, ones, k,
                                      pool=2048), n)

    # iteration statistics: persistent should collapse the straggler gap
    _, it_w = _traverse_widestack(bvh, tris, bo, bd, 0.0, ones,
                                  any_hit=False, with_stats=True)
    _, it_p = intersect_closest_persistent(bvh, tris, bo, bd, t_min=0.0,
                                           t_max=ones, with_stats=True)
    it_w = np.asarray(it_w).reshape(-1, 64, 128)[:, :, 0]
    print(f"widestack bounce: per-row mean {it_w.mean():.1f} "
          f"tile-max mean {it_w.max(axis=1).mean():.1f} "
          f"waste x{it_w.max(axis=1).mean() / it_w.mean():.2f}")
    it_p = np.asarray(it_p).reshape(-1, 128)[:, 0]
    print(f"persistent bounce: per-row mean {it_p.mean():.1f} "
          f"(total row-iters {it_p.sum()}, ideal while-iters/tile "
          f"{it_p.sum() / 64:.0f})")


def render_ab():
    from bench import _measure
    for tag, on in (("widestack", False), ("persist", True)):
        pallas_widestack.set_persistent(on)
        m512 = _measure(["512"], emit=False)
        mhd = _measure(["1080p"], emit=False)
        print(f"render [{tag}]: 512^2 {m512:.2f}  1080p {mhd:.2f} Mrays/s",
              flush=True)
    pallas_widestack.set_persistent(None)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if mode in ("kernel", "all"):
        kernel_ab()
    if mode in ("render", "all"):
        render_ab()
