#!/usr/bin/env python
"""CPU-mesh scaling evidence for the multi-chip path (VERDICT r5 item #9).

This host has ONE physical core, so the 8 "devices" of the virtual mesh
serialize on one thread and a strong-scaling curve is flat by construction.
What IS honestly measurable here:

  1. sharding OVERHEAD — total wall time of the same fixed-size render
     partitioned over n = 1/2/4/8 virtual devices. Work is conserved, so
     any growth over n=1 is the cost of partitioning + collectives + the
     per-shard program launches (upper-bounds the per-chip overhead a real
     ICI mesh would pay; the real mesh then divides the flat term by n).
  2. the sharded 1080p SVGF frame — the à-trous pyramid sharded over image
     rows with ppermute halo exchange, exercised at production resolution
     (tests only cover 32²) with a parity check vs the single-device frame,
     plus the halo-exchange overhead measured the same way as (1).

Real multi-chip scaling stays out of scope (no hardware in this container);
the driver's dryrun_multichip validates the shardings compile + execute.
"""

from __future__ import annotations

import os
import sys
import time

# scrub the interpreter env: the container's sitecustomize registers the
# TPU plugin (keyed on PALLAS_AXON_POOL_IPS) before this file runs, so env
# assignments here are too late for jax — re-exec once with a clean env
# (same pattern as tests/conftest.py).
if os.environ.get("_GFXEXP_SCRUB") != "1":
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_GFXEXP_SCRUB"] = "1"
    os.execvpe(sys.executable, [sys.executable] + sys.argv, env)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from gfxexp_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()

from scenes import box_scene  # noqa: E402

from gfxexp_tpu.parallel.sharding import (  # noqa: E402
    make_mesh, render_sample_sharded, svgf_frame_sharded)
from gfxexp_tpu.render.camera import make_camera  # noqa: E402
from gfxexp_tpu.render.pathtrace import PTConfig, render_sample  # noqa: E402
from gfxexp_tpu.scene.compile import compile_scene  # noqa: E402
from gfxexp_tpu.techniques.svgf import (  # noqa: E402
    SVGFConfig, make_svgf_state, svgf_frame)

WARM = 2
REPS = 4


def timeit(label, fn):
    for _ in range(WARM):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ms = (time.time() - t0) / REPS * 1e3
    print(f"{label:44s} {ms:9.1f} ms", flush=True)
    return ms


def render_overhead():
    print("== render: fixed 128x128 work over n virtual devices ==",
          flush=True)
    scene, bvh = compile_scene(box_scene())
    cam = make_camera([0.0, 0.5, 1.9], fov_y=np.deg2rad(75), aspect=1.0,
                      target=[0, 0.3, -1.0])
    w = h = 128
    cfg = PTConfig(max_path_length=3)
    base = timeit("single-device render_sample",
                  lambda: render_sample(scene, bvh, cam, w, h,
                                        jnp.uint32(0), cfg))
    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:n])
        ms = timeit(
            f"sharded n={n}",
            lambda mesh=mesh: render_sample_sharded(
                mesh, scene, bvh, cam, w, h, jnp.uint32(0), cfg))
        rows.append((n, ms, ms / base))
    print("| n_dev | ms (1-core serial) | vs single-device |")
    print("|---|---|---|")
    for n, ms, rel in rows:
        print(f"| {n} | {ms:.1f} | {rel:.3f}x |")
    return rows


def svgf_1080p():
    print("== svgf: sharded 1080p a-trous pyramid (8 devices) ==",
          flush=True)
    from gfxexp_tpu.render.gbuffer import GBuffer

    H, W = 1080, 1920
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing="ij")
    # procedural but structured: a depth ramp with a sphere bump and a
    # miss band so edge-stopping weights see real discontinuities
    depth = (2.0 + 3.0 * yy).astype(np.float32)
    r2 = (xx - 0.5) ** 2 * 3.2 + (yy - 0.45) ** 2
    sphere = r2 < 0.04
    depth = np.where(sphere, depth - 0.8, depth).astype(np.float32)
    hit = (yy > 0.06).astype(bool)
    depth = np.where(hit, depth, np.inf).astype(np.float32)
    nz = np.where(sphere, 0.6, 1.0)
    normal = np.stack([np.where(sphere, (xx - 0.5) * 1.5, 0.0),
                       np.where(sphere, (yy - 0.45) * 1.5, 0.2), nz], -1)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    z3 = np.zeros((H, W, 3), np.float32)
    rng = np.random.default_rng(7)
    albedo = np.stack([0.6 + 0.2 * np.sin(xx * 21),
                       0.5 + 0.1 * np.cos(yy * 13),
                       0.55 + 0.0 * xx], -1).astype(np.float32)
    gb = GBuffer(
        position=jnp.asarray(np.stack([xx, yy, np.zeros_like(xx)], -1),
                             jnp.float32),
        normal=jnp.asarray(normal, jnp.float32),
        geom_normal=jnp.asarray(normal, jnp.float32),
        albedo=jnp.asarray(albedo),
        emittance=jnp.asarray(z3),
        texcoord=jnp.asarray(np.stack([xx, yy], -1), jnp.float32),
        motion=jnp.zeros((H, W, 2), jnp.float32),
        depth=jnp.asarray(depth),
        tri=jnp.zeros((H, W), jnp.int32),
        bary=jnp.zeros((H, W, 2), jnp.float32),
        unit=jnp.where(jnp.asarray(hit), 0, -1).astype(jnp.int32),
        material=jnp.where(jnp.asarray(hit), 0, -1).astype(jnp.int32),
        hit=jnp.asarray(hit),
        view_dir=jnp.asarray(np.broadcast_to([0, 0, -1.0], (H, W, 3)),
                             jnp.float32),
    )
    signal = 0.3 + 0.4 * np.where(sphere, 1.6, 1.0)[..., None]
    lighting = jnp.asarray(
        (signal * albedo
         + rng.normal(0, 0.25, (H, W, 3)) ** 2).astype(np.float32))

    cfg = SVGFConfig()
    mesh = make_mesh(jax.devices()[:8])

    def run_single():
        st = make_svgf_state(W, H)
        out, st = svgf_frame(st, gb, lighting, cfg)
        out2, _ = svgf_frame(st, gb, lighting, cfg)
        return out2

    def run_sharded():
        st = make_svgf_state(W, H)
        out, st = svgf_frame_sharded(mesh, st, gb, lighting, cfg)
        out2, _ = svgf_frame_sharded(mesh, st, gb, lighting, cfg)
        return out2

    ms_single = timeit("svgf_frame 1080p single-device (2 frames)",
                       run_single)
    ms_shard = timeit("svgf_frame 1080p sharded x8    (2 frames)",
                      run_sharded)
    a = np.asarray(run_single())
    b = np.asarray(run_sharded())
    err = np.abs(a - b).max()
    print(f"parity max|diff| = {err:.2e}  "
          f"(finite: {np.isfinite(b).all()})")
    assert err < 1e-4, err
    print(f"halo-exchange overhead on 1 core: "
          f"{ms_shard / ms_single:.3f}x")


def main():
    render_overhead()
    svgf_1080p()


if __name__ == "__main__":
    main()
