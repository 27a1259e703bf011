#!/usr/bin/env python
"""Per-pass breakdown of the headline render (VERDICT r3 weak #6: attribute
the gap between kernel-only traversal and the end-to-end Mrays/s).

Measurement rules learned the hard way (CLAUDE.md):
- ray buffers must live ON DEVICE before timing — passing host numpy pays a
  ~6 MB host->device copy through the remote tunnel per call (~120 ms),
  which dwarfs every kernel here (the r3 version of this probe did that,
  making trace1 'slower' than the full 5-bounce render);
- reps are CHAINED (each call consumes a value derived from the previous
  output) so the runtime cannot overlap them; the only trustworthy fence is
  a host copy.

Reports, per sample on the bench scene:
  trace1    primary closest-hit only
  traceB    bounce-like incoherent closest-hit
  shadow    NEE any-hit population
  surface   closest + compute_surface_point + BSDF param fetch
  render_L  full render_sample at max_path_length L in (1, 2, 3, 5)
            -> marginal cost of each added bounce
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


def timeit_chained(name, fn, o, d, reps=8, warm=6):
    """fn(o, d) -> pytree. Chain: each rep perturbs o by 0*prev_leaf so
    the runtime must execute them in order."""
    out = None
    for _ in range(warm):
        out = fn(o, d)
    fence(out)
    t0 = time.time()
    for _ in range(reps):
        leaf = jax.tree_util.tree_leaves(out)[0]
        dep = (leaf.astype(jnp.float32).ravel()[:1] * 0.0)[0]
        out = fn(o + dep, d)
    fence(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:10s} {ms:8.2f} ms", flush=True)
    return ms


def timeit_scalar(name, fn, reps=8, warm=6):
    """fn(s) -> pytree, chained through the sample index."""
    out = fn(jnp.uint32(3))
    for _ in range(warm - 1):
        out = fn(jnp.uint32(3))
    fence(out)
    t0 = time.time()
    for r in range(reps):
        leaf = jax.tree_util.tree_leaves(out)[0]
        dep = (leaf.astype(jnp.float32).ravel()[:1] * 0.0)[0].astype(jnp.uint32)
        out = fn(jnp.uint32(3) + dep)
    fence(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:10s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    big = "big" in sys.argv[1:]
    fmt = None
    for a in sys.argv[1:]:
        if a in ("widerow", "qrow", "instanced"):
            fmt = a
    scene, bvh = bench.build_bench_scene(big=big, fmt=fmt)
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
    o_dev, d_dev = generate_rays_for_lanes(cam, W, H, pixel, half, half)

    from gfxexp_tpu.accel.traverse import intersect_any, intersect_closest

    @jax.jit
    def trace(o, d):
        return intersect_closest(bvh, scene.triangles, o, d)

    @jax.jit
    def occl(o, d):
        return intersect_any(bvh, scene.triangles, o, d)

    # incoherent bounce-like population, built once and kept on device
    hit = trace(o_dev, d_dev)
    o_np, d_np = np.asarray(o_dev), np.asarray(d_dev)
    t_np = np.asarray(hit.t)
    hit_np = np.asarray(hit.hit)
    pos = o_np + np.minimum(t_np, 100.0)[:, None] * d_np
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    bo = np.where(hit_np[:, None], pos - 1e-3 * d_np, o_np).astype(np.float32)
    bo_dev = jnp.asarray(bo)
    bd_dev = jnp.asarray(bd)
    fence((bo_dev, bd_dev))

    ms1 = timeit_chained("trace1", trace, o_dev, d_dev)
    msB = timeit_chained("traceB", trace, bo_dev, bd_dev)
    msS = timeit_chained("shadow", occl, bo_dev, bd_dev)

    @jax.jit
    def surface(o, d):
        from gfxexp_tpu.render.bsdf import material_params_textured
        from gfxexp_tpu.render.pathtrace import (
            compute_surface_point,
            pack_tri_attrs,
        )

        h = intersect_closest(bvh, scene.triangles, o, d)
        packed = pack_tri_attrs(scene.triangles, scene)
        sp = compute_surface_point(scene, h.tri, h.u, h.v, inst=h.inst,
                                   packed=packed)
        params = material_params_textured(scene.materials, scene.textures,
                                          sp.material, sp.texcoord)
        return params.diffuse.sum() + sp.position.sum()

    msSu = timeit_chained("surface", surface, o_dev, d_dev)

    ray_counts = {}
    render_ms = {}
    for L in (1, 2, 3, 5):
        cfg = PTConfig(max_path_length=L, count_rays=True)

        def full(s, cfg=cfg):
            img, nrays = render_sample(scene, bvh, cam, W, H, s, cfg)
            return img

        render_ms[L] = timeit_scalar(f"render_{L}", full)
        _, nr = render_sample(scene, bvh, cam, W, H, jnp.uint32(3), cfg)
        ray_counts[L] = float(np.asarray(nr))

    print("\n-- marginal bounce cost --")
    prev = None
    for L in (1, 2, 3, 5):
        d_ms = render_ms[L] - (render_ms[prev] if prev else 0.0)
        d_ry = ray_counts[L] - (ray_counts[prev] if prev else 0.0)
        per = d_ms / max(L - (prev or 0), 1)
        print(f"L={L}: {render_ms[L]:7.2f} ms  rays {ray_counts[L]/1e6:.2f} M"
              f"  (+{per:.2f} ms/bounce, +{d_ry/1e6:.2f} M rays)")
        prev = L
    L = bench.MAX_PATH_LENGTH
    print(f"\nfull-path {ray_counts[5]/render_ms[5]/1e3:.1f} Mrays/s | "
          f"kernel-only equivalent "
          f"L*(traceB+shadow) = {L * (msB + msS):.1f} ms vs render_5 "
          f"{render_ms[5]:.1f} ms")


if __name__ == "__main__":
    main()
