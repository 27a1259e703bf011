#!/usr/bin/env python
"""Per-pass breakdown of the headline render (VERDICT r2 item 3: find the
24 -> ~11 Mrays/s gap between kernel-only traversal and the full path).

Times, per sample on the bench scene (host-copy fenced, warmed):
  trace1   primary closest-hit only
  traceB   a bounce-like incoherent closest-hit population
  shadow   the NEE any-hit population
  surface  closest + compute_surface_point + BSDF param fetch
  render   full render_sample
  qrow     full render_sample through the quantized structure

Run on TPU (the only JAX process): python perf/pass_breakdown.py [big]
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

import bench  # noqa: E402
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes,
    make_camera,
    pixel_from_lane,
)
from gfxexp_tpu.render.pathtrace import (  # noqa: E402
    PTConfig,
    render_sample,
)


def fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def timeit(name, fn, *args, reps=8, warm=6):
    for _ in range(warm):
        out = fn(*args)
    fence(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:10s} {ms:8.2f} ms")
    return ms


def main():
    big = "big" in sys.argv[1:]
    scene, bvh = bench.build_bench_scene(big=big)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    W = H = bench.WIDTH
    cam = make_camera([0.0, 2.2, 3.4] if big else [0.0, 0.8, 1.6],
                      fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0.0, 0.1, 0.0] if big else [0.0, 0.2, 0.0])
    n = W * H
    lane = jnp.arange(n, dtype=jnp.uint32)
    pixel = pixel_from_lane(lane, W, H)
    half = jnp.full((n,), 0.5, jnp.float32)
    o, d = generate_rays_for_lanes(cam, W, H, pixel, half, half)
    o, d = np.asarray(o), np.asarray(d)

    from gfxexp_tpu.accel.traverse import intersect_any, intersect_closest

    @jax.jit
    def trace(o, d):
        return intersect_closest(bvh, scene.triangles, jnp.asarray(o),
                                 jnp.asarray(d))

    @jax.jit
    def occl(o, d):
        return intersect_any(bvh, scene.triangles, jnp.asarray(o),
                             jnp.asarray(d))

    # incoherent bounce-like population: primary hits + hemisphere dirs
    hit = trace(o, d)
    t_np = np.asarray(hit.t)
    hit_np = np.asarray(hit.hit)
    pos = o + np.minimum(t_np, 100.0)[:, None] * d
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    bo = np.where(hit_np[:, None], pos - 1e-3 * d, o).astype(np.float32)

    ms1 = timeit("trace1", trace, o, d)
    msB = timeit("traceB", trace, bo, bd)
    msS = timeit("shadow", occl, bo, bd)

    @jax.jit
    def surface(o, d):
        from gfxexp_tpu.render.bsdf import material_params_textured
        from gfxexp_tpu.render.pathtrace import (
            compute_surface_point,
            pack_tri_attrs,
        )

        h = intersect_closest(bvh, scene.triangles, jnp.asarray(o),
                              jnp.asarray(d))
        packed = pack_tri_attrs(scene.triangles, scene)
        sp = compute_surface_point(scene, h.tri, h.u, h.v, inst=h.inst,
                                   packed=packed)
        params = material_params_textured(scene.materials, scene.textures,
                                          sp.material, sp.texcoord)
        return params.diffuse.sum() + sp.position.sum()

    msSu = timeit("surface", surface, o, d)

    cfg = PTConfig(max_path_length=bench.MAX_PATH_LENGTH, count_rays=True)

    def full(s):
        img, nrays = render_sample(scene, bvh, cam, W, H, jnp.uint32(s), cfg)
        return img

    msR = timeit("render", full, jnp.uint32(3))

    # rays/sample for context
    _, nrays = render_sample(scene, bvh, cam, W, H, jnp.uint32(3), cfg)
    nrays = float(np.asarray(nrays))
    print(f"rays/sample {nrays/1e6:.2f} M -> full-path "
          f"{nrays/msR/1e3:.1f} Mrays/s")
    print(f"glue estimate: render {msR:.1f} vs "
          f"L*(trace+shadow) ~ {bench.MAX_PATH_LENGTH * (msB + msS):.1f} "
          f"(coherent first bounce overstates)")


if __name__ == "__main__":
    main()
