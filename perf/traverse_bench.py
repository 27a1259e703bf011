#!/usr/bin/env python
"""Traversal micro-benchmark: compare kernel variants on the real chip.

Measures closest-hit throughput (Mrays/s) for primary (coherent camera) and
bounce (surface origins, random cosine directions) distributions on the
bench scene, with and without ray sorting. Honest timing: host copy
(np.asarray) is the only trustworthy fence on this runtime (CLAUDE.md).
Every variant is wrapped in jax.jit — eager jnp ops each pay a ~6 ms
dispatch round trip here, ~300 ms of fixed overhead per unjitted call.

Usage: python perf/traverse_bench.py [variant ...]
Variants: tile, row8, row16, row32; suffix "+sort" sorts rays by
(direction octant, origin morton) first.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPS = 24


def sort_key(o, d, lo, hi):
    """(octant, origin morton) — groups rays into coherent 128-blocks."""
    import jax.numpy as jnp

    oct_ = (
        (d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (d[:, 2] >= 0).astype(jnp.int32)
    )
    q = jnp.clip((o - lo) / (hi - lo), 0.0, 1.0)
    g = (q * 31).astype(jnp.int32)  # 5 bits/axis

    def spread(x):
        x = (x | (x << 8)) & 0x100F
        x = (x | (x << 4)) & 0x10C3
        x = (x | (x << 2)) & 0x1249
        return x

    morton = spread(g[:, 0]) | (spread(g[:, 1]) << 1) | (spread(g[:, 2]) << 2)
    return (oct_ << 15) | morton


def make_sorted(fn):
    import jax.numpy as jnp

    def wrapped(bvh, tris, o, d):
        lo = jnp.min(tris.p0, axis=0)
        hi = jnp.max(tris.p0, axis=0)
        perm = jnp.argsort(sort_key(o, d, lo, hi))
        inv = jnp.argsort(perm)
        hit = fn(bvh, tris, o[perm], d[perm])
        return type(hit)(t=hit.t[inv], tri=hit.tri[inv], u=hit.u[inv],
                         v=hit.v[inv], hit=hit.hit[inv])

    return wrapped


def make_rays(scene, bvh, n, kind, seed=0):
    import jax.numpy as jnp

    from gfxexp_tpu.render.camera import generate_rays, make_camera

    side = int(np.sqrt(n))
    assert side * side == n
    cam = make_camera([0.0, 0.8, 1.6], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0.0, 0.2, 0.0])
    jx = jnp.full((n,), 0.5, jnp.float32)
    o, d = generate_rays(cam, side, side, jx, jx)
    # block-major lane order (16x16 blocks), exactly like render_lanes: a
    # 128-ray row is then a 16x8 screen block, not a thin raster strip
    from gfxexp_tpu.render.camera import pixel_from_lane

    order = pixel_from_lane(jnp.arange(n, dtype=jnp.uint32), side, side)
    o, d = o[order], d[order]
    if kind == "primary":
        return o, d
    # bounce-like: origins at primary-hit surface points, cosine directions
    # about the surface normal — what the integrator actually traces
    from gfxexp_tpu.accel.traverse import intersect_closest
    from gfxexp_tpu.render.pathtrace import compute_surface_point

    hit = intersect_closest(bvh, scene.triangles, o, d)
    sp = compute_surface_point(scene, hit.tri, hit.u, hit.v)
    rng = np.random.default_rng(seed)
    u1 = rng.uniform(size=(n, 1))
    u2 = rng.uniform(size=(n, 1))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.concatenate(
        [r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - u1)], axis=1)
    nrm = np.asarray(sp.shading_normal)
    t = np.cross(nrm, np.where(np.abs(nrm[:, :1]) < 0.9,
                               [[1, 0, 0]], [[0, 1, 0]]))
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    b = np.cross(nrm, t)
    dirs = local[:, 0:1] * t + local[:, 1:2] * b + local[:, 2:3] * nrm
    o2 = np.asarray(sp.position) + 1e-4 * nrm
    return jnp.asarray(o2, jnp.float32), jnp.asarray(dirs, jnp.float32)


def bench_variant(name, fn, bvh, tris, o, d):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda bvh_, tris_, o_, d_, s: fn(
        bvh_, tris_, o_ + 0.0 * s, d_))

    hit = jfn(bvh, tris, o, d, jnp.float32(0))
    np.asarray(hit.t)
    t0 = time.time()
    acc = jnp.zeros((), jnp.float32)
    for r in range(REPS):
        hit = jfn(bvh, tris, o, d, acc)  # dependency chain via seed arg
        acc = jnp.sum(hit.t) * 0
    _ = float(np.asarray(acc))
    np.asarray(hit.t)
    dt = (time.time() - t0) / REPS
    n = o.shape[0]
    hitrate = float(np.asarray(hit.hit).mean())
    return n / dt / 1e6, hitrate


def main():
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax

    from bench import build_bench_scene
    import jax.numpy as jnp

    scene, bvh = build_bench_scene()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    tris = scene.triangles
    print(f"scene: {scene.num_triangles} tris, {bvh.num_nodes} skip nodes",
          file=sys.stderr)

    from gfxexp_tpu.accel.pallas_traverse import intersect_closest_pallas
    from gfxexp_tpu.accel.pallas_rowcursor import intersect_closest_rowcursor
    from gfxexp_tpu.accel.pallas_widestack import (
        intersect_closest_widestack,
        pack_widerows,
    )
    from gfxexp_tpu.accel.bvh_build import build_bvh

    # wide-row tables need the *wide* BVH; rebuild from the (already
    # permuted) scene triangles — the rebuild re-permutes, so each ws
    # variant closes over its own consistent (table, tris) pair and
    # cross-variant agreement is checked on hit.t, not tri id
    wide_cache = {}

    def widestack_fn(arity, max_leaf, rows):
        key = (arity, max_leaf)
        if key not in wide_cache:  # built EAGERLY here (host numpy)
            p0 = np.asarray(tris.p0)
            e1 = np.asarray(tris.e1)
            e2 = np.asarray(tris.e2)
            wbvh, perm = build_bvh(p0, e1, e2, arity=arity,
                                   max_leaf=max_leaf)
            tris2 = tris.replace(
                p0=jnp.asarray(p0[perm]), e1=jnp.asarray(e1[perm]),
                e2=jnp.asarray(e2[perm]))
            wide_cache[key] = (pack_widerows(wbvh, tris2), tris2)
        wrow, tris2 = wide_cache[key]

        def fn(bvh_, tris_, o, d):
            return intersect_closest_widestack(wrow, tris2, o, d, rows=rows)

        return fn

    base = {
        "tile": intersect_closest_pallas,
        "row8": functools.partial(intersect_closest_rowcursor, rows=8),
        "row16": functools.partial(intersect_closest_rowcursor, rows=16),
        "row32": functools.partial(intersect_closest_rowcursor, rows=32),
        "ws4x4r8": widestack_fn(4, 4, 8),
        "ws4x4r16": widestack_fn(4, 4, 16),
        "ws8x4r8": widestack_fn(8, 4, 8),
        "ws8x4r32": widestack_fn(8, 4, 32),
        "ws4x4r64": widestack_fn(4, 4, 64),
        "ws8x4r64": widestack_fn(8, 4, 64),
        "ws4x4r32": widestack_fn(4, 4, 32),
    }
    variants = {}
    for k, v in base.items():
        variants[k] = v
        variants[k + "+sort"] = make_sorted(v)

    want = sys.argv[1:] or ["tile", "row8", "row8+sort"]
    N = 512 * 512
    rays = {k: make_rays(scene, bvh, N, k) for k in ("primary", "bounce")}

    ref = {}
    for vname in want:
        fn = variants[vname]
        for kind, (o, d) in rays.items():
            mrays, hitrate = bench_variant(vname, fn, bvh, tris, o, d)
            print(f"{vname:12s} {kind:8s} {mrays:8.2f} Mrays/s "
                  f"(hit {hitrate:.3f})", flush=True)
            hit = variants[vname](bvh, tris, o, d)
            # agreement on (hit mask, t): tri ids differ across variants
            # whose builds permute triangles differently
            sig = (np.asarray(hit.hit), np.asarray(hit.t))
            if kind in ref:
                h0, t0 = ref[kind]
                agree = float(np.mean(
                    (sig[0] == h0)
                    & (~h0 | np.isclose(sig[1], t0, rtol=1e-3, atol=1e-4))))
                if agree < 1.0:
                    print(f"  !! {vname} {kind} agreement {agree:.5f}",
                          flush=True)
            else:
                ref[kind] = sig


if __name__ == "__main__":
    main()
