#!/usr/bin/env python
"""Persistent-instanced kernel A/B vs the static (tiles x entries) grid on
the city (514-entry) and big (74-entry) scenes. Round-5 items 1+3."""

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

from bench import build_bench_scene  # noqa: E402
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    _traverse_instanced, _traverse_instanced_tlas)
from gfxexp_tpu.accel import pallas_persistent_inst as ppi  # noqa: E402
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)

W = H = 512
CHAIN = 4
WARM = 5
REPS = 6


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


def run(city=True):
    scene, acc = build_bench_scene(city=city, big=not city)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    acc = jax.tree_util.tree_map(jnp.asarray, acc)
    print(f"scene: {scene.num_triangles} tris, {acc.num_entries} entries, "
          f"tables {acc.nodes.shape}", flush=True)
    cam_pos = [0.0, 4.5, 8.0] if city else [0.0, 2.2, 3.4]
    camera = make_camera(cam_pos, fov_y=np.deg2rad(45), aspect=1.0,
                         target=[0.0, 0.1, 0.0])
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, W, H)
    jx = jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, W, H, pixel, jx, jy)
    ones = jnp.full((n,), 1e30, jnp.float32)

    # parity check on the real backend
    hs, is_ = _traverse_instanced(acc, ray_o, ray_d, 0.0, ones,
                                  any_hit=False)
    hp, ip = ppi._traverse_persistent_inst(acc, ray_o, ray_d, 0.0, ones,
                                           any_hit=False)
    m = np.asarray(hs.hit)
    print(f"parity: hit {np.mean(m == np.asarray(hp.hit)):.6f} "
          f"t {np.mean(np.isclose(np.asarray(hs.t)[m], np.asarray(hp.t)[m], rtol=1e-4)):.6f} "
          f"inst {np.mean(np.asarray(is_)[m] == np.asarray(ip)[m]):.6f}",
          flush=True)

    t = np.asarray(hs.t)
    thit = np.where(m, t, 3.0)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = jnp.asarray(np.asarray(ray_o) + thit[:, None] * np.asarray(ray_d)
                     * 0.999)
    bd = jnp.asarray(np.asarray(v))

    @functools.partial(jax.jit, static_argnames=("mode", "any_hit",
                                                 "sched_k"))
    def chained(o, d, tmax, mode, any_hit=False, sched_k=None):
        accum = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            o2 = o + (accum * 0.0)
            if mode == "static":
                h, _ = _traverse_instanced(acc, o2, d, 0.0, tmax,
                                           any_hit=any_hit)
            elif mode == "tlas":
                h, _ = _traverse_instanced_tlas(acc, o2, d, 0.0, tmax,
                                                any_hit=any_hit)
            else:
                h, _ = ppi._traverse_persistent_inst(
                    acc, o2, d, 0.0, tmax, any_hit=any_hit,
                    sched_k=sched_k)
            accum = accum + (h.hit.sum().astype(jnp.float32)
                             if any_hit else h.t.sum())
        return accum

    for mode in ("static", "tlas", "persist"):
        timeit(f"[{mode}] closest primary",
               lambda m_=mode: chained(ray_o, ray_d, ones, m_), n)
        timeit(f"[{mode}] closest bounce",
               lambda m_=mode: chained(bo, bd, ones, m_), n)
        timeit(f"[{mode}] any-hit bounce",
               lambda m_=mode: chained(bo, bd, ones, m_, any_hit=True), n)
    for k_ in (4, 8, 16, 32):
        timeit(f"[persist k={k_}] closest bounce",
               lambda k2=k_: chained(bo, bd, ones, "persist", sched_k=k2),
               n)


if __name__ == "__main__":
    run(city="big" not in sys.argv[1:])
