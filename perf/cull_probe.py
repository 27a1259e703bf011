#!/usr/bin/env python
"""Measure per-tile cull worklist sizes on the big instanced scene, for
primary vs bounce rays, plus per-phase frame timing. Determines whether
bounce-tile incoherence defeats instance culling (worklist cnt ~ n_inst)."""

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
    _cull_worklists, intersect_closest_instanced)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes, make_camera, pixel_from_lane)

ROWS = 64
LANE = 128


def pack_rays(o, d, tmin, tmax):
    n = o.shape[0]
    tile = ROWS * LANE
    g = -(-n // tile)
    pad = g * tile - n

    def p(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    comps = jnp.stack([
        p(o[:, 0], 0.0), p(o[:, 1], 0.0), p(o[:, 2], 0.0),
        p(d[:, 0], 1.0), p(d[:, 1], 0.0), p(d[:, 2], 0.0),
        p(jnp.broadcast_to(tmin, (n,)), 0.0),
        p(jnp.broadcast_to(tmax, (n,)), -1.0),
    ], axis=0)
    return comps.reshape(8, g, tile).transpose(1, 0, 2)


def main():
    scene, acc = bench.build_bench_scene(big=True)
    print("instances:", acc.num_instances, "nodes", acc.nodes.shape, flush=True)
    W, H = bench.WIDTH, bench.HEIGHT
    camera = make_camera([0.0, 2.2, 3.4], fov_y=np.deg2rad(45),
                         aspect=W / H, target=[0.0, 0.1, 0.0])
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, W, H)
    jx = jy = jnp.full((n,), 0.5, jnp.float32)
    ray_o, ray_d = generate_rays_for_lanes(camera, W, H, pixel, jx, jy)

    rays = pack_rays(ray_o, ray_d, jnp.float32(0.0), jnp.float32(1e30))
    work, cnt = _cull_worklists(acc.chunk_lo, acc.chunk_hi, rays,
                                rays.shape[0], ROWS)
    c = np.asarray(cnt)
    print(f"primary tiles: cnt mean {c.mean():.1f} p50 {np.percentile(c, 50):.0f}"
          f" p95 {np.percentile(c, 95):.0f} max {c.max()} of {acc.num_instances}",
          flush=True)

    # bounce rays: diffuse hemisphere from primary hits
    t0 = time.time()
    hit, inst = intersect_closest_instanced(acc, ray_o, ray_d)
    np.asarray(hit.t)
    print(f"primary instanced trace: {time.time() - t0:.2f}s (cold-ish)",
          flush=True)
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    bo = ray_o + hit.t[:, None] * ray_d * 0.999
    bd = v
    rays_b = pack_rays(bo, bd, jnp.float32(0.0), jnp.float32(1e30))
    _, cntb = _cull_worklists(acc.chunk_lo, acc.chunk_hi, rays_b,
                              rays_b.shape[0], ROWS)
    cb = np.asarray(cntb)
    print(f"bounce tiles:  cnt mean {cb.mean():.1f} p50 {np.percentile(cb, 50):.0f}"
          f" p95 {np.percentile(cb, 95):.0f} max {cb.max()}", flush=True)

    # timed: instanced closest on primary vs bounce (warm)
    for name, (o_, d_) in {"primary": (ray_o, ray_d),
                           "bounce": (bo, bd)}.items():
        for _ in range(3):
            h, _i = intersect_closest_instanced(acc, o_, d_)
        np.asarray(h.t)
        t0 = time.time()
        for _ in range(4):
            h, _i = intersect_closest_instanced(acc, o_, d_)
        np.asarray(h.t)
        dt = (time.time() - t0) / 4
        print(f"{name} instanced closest: {dt * 1e3:.1f} ms "
              f"{n / dt / 1e6:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
