#!/usr/bin/env python
"""Glue probe: where do the ~24 ms/step of non-traversal time go?

Chained-in-one-jit measurements of the shading-path pieces at bench-scene
scale (262144 lanes): compute_surface_point (12 random gathers), a packed
single-gather prototype, light sampling, bsdf sample+eval, camera rays.
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

CHAIN = 8
WARM = 6
REPS = 8
N = WIDTH * HEIGHT


def timeit(label, fn):
    for _ in range(WARM):
        out = fn()
    np.asarray(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(out)
    ms = (time.time() - t0) / (REPS * CHAIN) * 1e3
    print(f"{label:52s} {ms:8.2f} ms/step")
    return ms


def main():
    scene, bvh = build_bench_scene()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    tris = scene.triangles
    n_tris = int(scene.num_triangles)
    key = jax.random.PRNGKey(0)
    tri_idx = jax.random.randint(key, (N,), 0, n_tris)
    u = jax.random.uniform(jax.random.PRNGKey(1), (N,)) * 0.5
    v = jax.random.uniform(jax.random.PRNGKey(2), (N,)) * 0.5

    from gfxexp_tpu.render.pathtrace import compute_surface_point

    @jax.jit
    def chain_csp(scene, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            sp = compute_surface_point(scene, idx + (acc * 0).astype(idx.dtype), u, v)
            acc = acc + sp.position.sum() + sp.emittance.sum()
        return acc

    timeit("compute_surface_point (12 gathers)",
           lambda: chain_csp(scene, tri_idx))

    # packed prototype: ONE [T, 32] row gather + in-register unpack
    packed = jnp.concatenate([
        tris.p0, tris.e1, tris.e2, tris.n0, tris.n1, tris.n2,
        tris.uv0, tris.uv1, tris.uv2,
        tris.unit_id[:, None].astype(jnp.float32),
        jnp.zeros((n_tris, 7), jnp.float32),
    ], axis=1)  # [T, 32]

    @jax.jit
    def chain_packed(packed, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            rows = packed[idx + (acc * 0).astype(idx.dtype)]  # [N, 32]
            p0 = rows[:, 0:3]
            e1 = rows[:, 3:6]
            e2 = rows[:, 6:9]
            pos = p0 + u[:, None] * e1 + v[:, None] * e2
            acc = acc + pos.sum() + rows[:, 9:18].sum()
        return acc

    timeit("packed single [N,32] row gather + unpack",
           lambda: chain_packed(packed, tri_idx))

    # one bare 3-wide gather for scale
    @jax.jit
    def chain_one_gather(p0, idx):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(CHAIN):
            acc = acc + p0[idx + (acc * 0).astype(idx.dtype)].sum()
        return acc

    timeit("single [N,3] gather", lambda: chain_one_gather(tris.p0, tri_idx))

    # light sampling + NEE math (no traversal)
    from gfxexp_tpu.core.rng import SampleStream
    from gfxexp_tpu.scene.lights import sample_light

    @jax.jit
    def chain_light(scene, seed):
        acc = jnp.zeros((), jnp.float32)
        for i in range(CHAIN):
            rs = SampleStream(jnp.arange(N, dtype=jnp.uint32),
                              seed + i, stream=3)
            ls = sample_light(scene, rs.next(), *rs.next2())
            acc = acc + ls.position.sum() + ls.pdf.sum()
        return acc

    timeit("sample_light (alias tables)",
           lambda: chain_light(scene, jnp.uint32(7)))

    # BSDF sample + evaluate
    from gfxexp_tpu.render.bsdf import (bsdf_evaluate, bsdf_pdf, bsdf_sample,
                                        material_params)

    mat_idx = jnp.zeros((N,), jnp.int32)
    vo = jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]], jnp.float32), (N, 1))

    @jax.jit
    def chain_bsdf(scene, u0, u1):
        acc = jnp.zeros((), jnp.float32)
        params = material_params(scene.materials, mat_idx)
        for _ in range(CHAIN):
            vi, f, pdf = bsdf_sample(params, vo + acc * 0, u0, u1)
            f2 = bsdf_evaluate(params, vo, vi)
            p2 = bsdf_pdf(params, vo, vi)
            acc = acc + vi.sum() + f.sum() + pdf.sum() + f2.sum() + p2.sum()
        return acc

    timeit("bsdf sample+evaluate+pdf",
           lambda: chain_bsdf(scene, u, v))

    # camera rays
    from gfxexp_tpu.render.camera import (generate_rays_for_lanes,
                                          make_camera, pixel_from_lane)
    camera = make_camera([0.0, 0.8, 1.6], fov_y=np.deg2rad(45),
                         aspect=WIDTH / HEIGHT, target=[0.0, 0.2, 0.0])
    lane = jnp.arange(N, dtype=jnp.uint32)

    @jax.jit
    def chain_cam(camera, jx):
        acc = jnp.zeros((), jnp.float32)
        pixel = pixel_from_lane(lane, WIDTH, HEIGHT)
        for _ in range(CHAIN):
            o, d = generate_rays_for_lanes(camera, WIDTH, HEIGHT, pixel,
                                           jx + acc * 0, jx)
            acc = acc + o.sum() + d.sum()
        return acc

    timeit("generate_rays_for_lanes", lambda: chain_cam(camera, u))

    # RNG stream draw
    @jax.jit
    def chain_rng(seed):
        acc = jnp.zeros((), jnp.float32)
        for i in range(CHAIN):
            rs = SampleStream(jnp.arange(N, dtype=jnp.uint32), seed + i,
                              stream=1)
            a = rs.next()
            b, c = rs.next2()
            acc = acc + a.sum() + b.sum() + c.sum()
        return acc

    timeit("SampleStream 3 draws", lambda: chain_rng(jnp.uint32(3)))


if __name__ == "__main__":
    main()
