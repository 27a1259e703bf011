#!/usr/bin/env python
"""A/B the quantized qrow format against widerow on the bench scene:
kernel-only closest/any on primary + bounce populations, and the full
render_sample. Run on TPU as the only JAX process:
  python perf/qrow_ab.py [big]
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
from gfxexp_tpu.accel.pallas_qrow import (  # noqa: E402
    build_qrow,
    intersect_any_qrow,
    intersect_closest_qrow,
)
from gfxexp_tpu.accel.pallas_widestack import (  # noqa: E402
    intersect_any_widestack,
    intersect_closest_widestack,
)
from gfxexp_tpu.render.camera import (  # noqa: E402
    generate_rays_for_lanes,
    make_camera,
    pixel_from_lane,
)
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample  # noqa: E402


def timeit(name, fn, *args, reps=8, warm=6):
    """args must be DEVICE arrays (host numpy pays a ~120 ms tunnel copy
    per call); reps are chained through a zero derived from the previous
    output so the runtime cannot overlap them."""
    args = tuple(jnp.asarray(a) if isinstance(a, np.ndarray) else a
                 for a in args)
    out = None
    for _ in range(warm):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        leaf = jax.tree_util.tree_leaves(out)[0]
        dep = (leaf.astype(jnp.float32).ravel()[:1] * 0.0)[0]
        a0 = args[0] + dep.astype(args[0].dtype)
        out = fn(a0, *args[1:])
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ms = (time.time() - t0) / reps * 1e3
    print(f"{name:16s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    big = "big" in sys.argv[1:]
    scene, wrow = bench.build_bench_scene(big=big)
    if getattr(scene, "is_instanced", False):
        print("instanced scene: qrow A/B needs the flattened variant; "
              "rebuilding flattened")
        return
    tris = scene.triangles
    p0 = np.asarray(tris.p0)
    e1 = np.asarray(tris.e1)
    e2 = np.asarray(tris.e2)
    qb, perm, (dq0, dqe1, dqe2) = build_qrow(p0, e1, e2)
    print(f"tris {p0.shape[0]}  widerow rows {wrow.nodes.shape} "
          f"qrow rows {qb.nodes.shape}", flush=True)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    wrow_j = jax.tree_util.tree_map(jnp.asarray, wrow)
    qb_j = jax.tree_util.tree_map(jnp.asarray, qb)

    W = H = bench.WIDTH
    cam = make_camera([0.0, 0.8, 1.6], fov_y=np.deg2rad(45), aspect=1.0,
                      target=[0.0, 0.2, 0.0])
    n = W * H
    pixel = pixel_from_lane(jnp.arange(n, dtype=jnp.uint32), W, H)
    half = jnp.full((n,), 0.5, jnp.float32)
    o, d = generate_rays_for_lanes(cam, W, H, pixel, half, half)
    o, d = np.asarray(o), np.asarray(d)

    @jax.jit
    def w_closest(o, d):
        return intersect_closest_widestack(wrow_j, scene.triangles,
                                           jnp.asarray(o), jnp.asarray(d))

    @jax.jit
    def q_closest(o, d):
        return intersect_closest_qrow(qb_j, scene.triangles,
                                      jnp.asarray(o), jnp.asarray(d))

    @jax.jit
    def w_any(o, d):
        return intersect_any_widestack(wrow_j, scene.triangles,
                                       jnp.asarray(o), jnp.asarray(d))

    @jax.jit
    def q_any(o, d):
        return intersect_any_qrow(qb_j, scene.triangles,
                                  jnp.asarray(o), jnp.asarray(d))

    # bounce-like population
    hw = w_closest(o, d)
    t_np = np.asarray(hw.t)
    hit_np = np.asarray(hw.hit)
    pos = o + np.minimum(t_np, 100.0)[:, None] * d
    rng = np.random.default_rng(0)
    bd = rng.normal(size=(n, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    bo = np.where(hit_np[:, None], pos - 1e-3 * d, o).astype(np.float32)

    m1w = timeit("widerow primary", w_closest, o, d)
    m1q = timeit("qrow    primary", q_closest, o, d)
    mbw = timeit("widerow bounce", w_closest, bo, bd)
    mbq = timeit("qrow    bounce", q_closest, bo, bd)
    msw = timeit("widerow any", w_any, bo, bd)
    msq = timeit("qrow    any", q_any, bo, bd)

    # agreement sanity (hits within quantization epsilon)
    hq = q_closest(o, d)
    agree = (np.asarray(hq.hit) == hit_np).mean()
    print(f"primary hit agreement {agree:.4f}")

    # full pipeline through each structure
    from gfxexp_tpu.scene.compile import apply_triangle_permutation

    cfg = PTConfig(max_path_length=bench.MAX_PATH_LENGTH, count_rays=True)

    def full_w(s):
        return render_sample(scene, wrow_j, cam, W, H, jnp.uint32(s), cfg)[0]

    scene_np = bench.build_bench_scene(big=big)[0]
    scene_q = apply_triangle_permutation(scene_np, perm)
    scene_q = scene_q.replace(triangles=scene_q.triangles.replace(
        p0=dq0, e1=dqe1, e2=dqe2))
    scene_q = jax.tree_util.tree_map(jnp.asarray, scene_q)

    def full_q(s):
        return render_sample(scene_q, qb_j, cam, W, H, jnp.uint32(s), cfg)[0]

    mrw = timeit("widerow render", full_w, jnp.uint32(3))
    mrq = timeit("qrow    render", full_q, jnp.uint32(3))
    print(f"summary: primary {m1w:.1f}/{m1q:.1f}  bounce {mbw:.1f}/{mbq:.1f}"
          f"  any {msw:.1f}/{msq:.1f}  render {mrw:.1f}/{mrq:.1f} ms")


if __name__ == "__main__":
    main()
