#!/usr/bin/env python
"""Headline benchmark: path-tracing ray throughput on one TPU chip.

Config mirrors BASELINE.json "path_tracing": teapot + stanford bunny (the
reference's bundled assets, loaded read-only from /root/reference/data when
present; a procedural fallback otherwise), 512x512, NEE+MIS unidirectional
path tracing, max path length 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured Mrays/s divided by the 100 Mrays/s/chip north-star
target (BASELINE.md) — the reference publishes no numbers of its own.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_REPO, ".cache")
_REF_DATA = "/root/reference/data"

WIDTH = HEIGHT = 512
MAX_PATH_LENGTH = 5
WARMUP_SAMPLES = 6  # this runtime's first ~4 executions of a program run 2-6x slow
TIMED_SAMPLES = 16
TARGET_MRAYS = 100.0


def build_bench_scene(big: bool = False, fmt: str = None, arity: int = 4,
                      city: bool = False, rebraid: float = 0.0):
    """Teapot + bunny + area light + floor (reference README's path_tracing
    recipe shape). Cached — the host-side BVH build dominates cold time.

    big=True: a 6x6 grid of teapots + bunnies (>500k triangles) exercising
    the chunked HBM-streaming traversal (reference-scale scenes like
    Bistro/Zero-Day are external downloads the judge environment lacks).
    city=True: a 16x16 grid (514 instances, ~4.1M tris through sharing) —
    the instance-count regime the ray-sorted TLAS driver is built for.
    rebraid>1: open the largest instances into subtree TLAS entries."""
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.scene.loaders import load_obj

    if fmt is None:
        fmt = "instanced" if (big or city) else "widerow"
    tag = "city_" if city else ("big_" if big else "")
    rb = f"_rb{rebraid:g}" if rebraid else ""
    cache_file = os.path.join(
        _CACHE, f"bench_scene_{tag}{fmt}_a{arity}{rb}_v13.pkl")
    if os.path.exists(cache_file):
        try:
            with open(cache_file, "rb") as f:
                pair = pickle.load(f)  # numpy pytrees; moved on-device later
            # smoke the unpickled schema (field additions can silently skew
            # old pickles); any failure falls through to a clean rebuild
            _ = pair[0].num_triangles, pair[0].is_instanced
            return pair
        except Exception as e:  # stale schema — rebuild
            sys.stderr.write(f"bench: scene cache invalid ({e}); rebuilding\n")
            os.remove(cache_file)

    b = SceneBuilder()
    floor = b.add_lambert_material((0.8, 0.8, 0.8))
    light = b.add_lambert_material((0.0, 0.0, 0.0), emittance=(300.0, 300.0, 300.0))
    side = 10.0 if city else (4.0 if big else 2.0)
    floor_geom = b.add_rectangle(side, side, floor)
    b.add_instance(floor_geom)
    light_geom = b.add_rectangle(0.6 * side / 2, 0.6 * side / 2, light)
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(light_geom, affine(rotation=flip, translation=[0.0, 1.5, 0.0]))

    teapot = os.path.join(_REF_DATA, "teapot.obj")
    bunny = os.path.join(_REF_DATA, "stanford_bunny_309_faces.obj")

    # load each mesh ONCE and share the geometry ids across instances —
    # compile_instanced dedupes BLAS groups by geometry-id tuple, so
    # re-loading per instance would give every instance a private BLAS
    # table (74x memory, a fresh ~2 MB node-table DMA per grid step)
    teapot_geoms = (load_obj(teapot, b, material_convention="trad")
                    if os.path.exists(teapot) else None)
    bunny_geoms = (load_obj(bunny, b, material_convention="trad")
                   if os.path.exists(bunny) else None)
    sphere_a = sphere_b = None

    def teapot_at(tx, tz):
        nonlocal sphere_a
        if teapot_geoms is not None:
            b.add_instance(teapot_geoms,
                           affine(scale=0.004, translation=[tx, 0.0, tz]))
        else:
            if sphere_a is None:
                mat = b.add_diffuse_specular_material(
                    (0.7, 0.4, 0.2), (0.2,) * 3, 0.7)
                sphere_a = b.add_sphere(0.25, mat)
            b.add_instance(sphere_a, affine(translation=[tx, 0.25, tz]))

    def bunny_at(tx, tz):
        nonlocal sphere_b
        if bunny_geoms is not None:
            # the bundled bunny OBJ spans ~85 object units (teapot ~154);
            # 0.004 matches the teapot normalization. The old 0.3 made
            # every bunny a 25-world-unit shell ENCLOSING the scene (the
            # big render showed no bunnies, just a white surround; the
            # city camera sat inside one and rendered black).
            b.add_instance(bunny_geoms,
                           affine(scale=0.004, translation=[tx, 0.0, tz]))
        else:
            if sphere_b is None:
                mat = b.add_lambert_material((0.3, 0.6, 0.3))
                sphere_b = b.add_sphere(0.2, mat)
            b.add_instance(sphere_b, affine(translation=[tx, 0.2, tz]))

    if city:
        for gx in range(16):
            for gz in range(16):
                tx = (gx - 7.5) * 0.62
                tz = (gz - 7.5) * 0.62
                teapot_at(tx, tz)
                bunny_at(tx + 0.28, tz)
    elif big:
        for gx in range(6):
            for gz in range(6):
                tx = (gx - 2.5) * 0.62
                tz = (gz - 2.5) * 0.62
                teapot_at(tx, tz)
                bunny_at(tx + 0.28, tz)
    else:
        teapot_at(-0.3, 0.0)
        bunny_at(0.35, 0.0)

    # big: two-level instancing (36 teapots+bunnies share 2 BLAS tables —
    # memory does not scale with the instance count); fmt overrides let
    # perf probes A/B the traversal structure (qrow = quantized rows)
    pair = compile_scene(b, arity=arity, max_leaf=4, traversal=fmt,
                         rebraid=rebraid)
    os.makedirs(_CACHE, exist_ok=True)
    with open(cache_file, "wb") as f:
        import jax

        pickle.dump(jax.tree_util.tree_map(np.asarray, pair), f)
    return pair


def _measure(argv, emit=True):
    """Build + render one benchmark config described by `argv` (same tokens
    as the CLI) and return its Mrays/s. Prints the driver JSON line when
    `emit`."""
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from gfxexp_tpu.render.camera import make_camera
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample

    global WIDTH, HEIGHT
    big = "big" in argv
    city = "city" in argv
    hd = "1080p" in argv
    if hd:
        # the BASELINE.json target metric is Mrays/s/chip at 1080p —
        # rendered through render_tile_accumulate so per-lane live state
        # (traversal stacks) stays bounded at the 512^2 working-set size
        WIDTH, HEIGHT = 1920, 1080
    else:
        WIDTH = HEIGHT = 512
    fmt = None
    arity = 4
    rebraid = 0.0
    for a in argv:
        if a in ("widerow", "qrow", "instanced"):
            fmt = a
        elif a == "a8":
            arity = 8
        elif a.startswith("rebraid"):
            rebraid = float(a[7:] or 4.0)
    if "persist" in argv or "nopersist" in argv:
        # A/B the persistent row-slot scheduler on single-chunk tables
        from gfxexp_tpu.accel import pallas_widestack

        pallas_widestack.PERSISTENT = "persist" in argv
    t0 = time.time()
    scene, bvh = build_bench_scene(big=big, fmt=fmt, arity=arity,
                                   city=city, rebraid=rebraid)
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    if "tlas" in argv:
        if hasattr(bvh, "use_tlas"):
            bvh = bvh.replace(use_tlas=True)
        else:
            sys.stderr.write(
                "bench: 'tlas' ignored — non-instanced structure "
                "(add 'big' or 'city')\n")
    build_s = time.time() - t0
    sys.stderr.write(f"bench: scene built in {build_s:.1f}s; compiling...\n")
    sys.stderr.flush()

    if city:
        camera = make_camera(
            [0.0, 4.5, 8.0], fov_y=np.deg2rad(45), aspect=WIDTH / HEIGHT,
            target=[0.0, 0.1, 0.0],
        )
    elif big:
        camera = make_camera(
            [0.0, 2.2, 3.4], fov_y=np.deg2rad(45), aspect=WIDTH / HEIGHT,
            target=[0.0, 0.1, 0.0],
        )
    else:
        camera = make_camera(
            [0.0, 0.8, 1.6], fov_y=np.deg2rad(45), aspect=WIDTH / HEIGHT,
            target=[0.0, 0.2, 0.0],
        )
    cfg = PTConfig(max_path_length=MAX_PATH_LENGTH, count_rays=True,
                   fuse_shadow_rays="fused" in argv,
                   # VERDICT r5 #8: re-test coherence extraction at 1080p
                   # batch sizes (declined at 262k rays in r3/r4)
                   sort_secondary_rays="sort" in argv,
                   compact_rays="compact" in argv)

    compile_s = 0.0
    if not hd:
        t0 = time.time()
        img, nrays = render_sample(scene, bvh, camera, WIDTH, HEIGHT, jnp.uint32(0), cfg)
        np.asarray(img)
        compile_s = time.time() - t0
        sys.stderr.write(f"bench: compiled+first sample in {compile_s:.1f}s; warming...\n")
        sys.stderr.flush()
        for s in range(1, WARMUP_SAMPLES):
            img, nrays = render_sample(scene, bvh, camera, WIDTH, HEIGHT, jnp.uint32(s), cfg)
        np.asarray(img)

    if hd:
        # tiled 1080p frame: 8 tiles of 259200 lanes (one compile serves
        # every tile; lane_start is traced); each tile accumulates ALL
        # samples in one program (render_tile_accumulate) so the whole
        # 16-sample run is 8 dispatches
        from gfxexp_tpu.render.pathtrace import render_tile_accumulate

        n = WIDTH * HEIGHT
        n_tiles = 8
        for a in argv:  # "tiles1" = whole 2.07M-lane frame in one program
            if a.startswith("tiles"):
                n_tiles = int(a[5:])
        lane_count = n // n_tiles
        assert lane_count * n_tiles == n

        def frame(s0, n_samp):
            imgs, rays = [], jnp.zeros((), jnp.float32)
            for ti in range(n_tiles):
                img_t, nr = render_tile_accumulate(
                    scene, bvh, camera, WIDTH, HEIGHT,
                    jnp.uint32(ti * lane_count), lane_count,
                    jnp.uint32(s0), n_samp, cfg)
                imgs.append(img_t)
                rays = rays + nr
            return jnp.concatenate(imgs, axis=0), rays

        acc, _ = frame(0, 1)
        np.asarray(acc)  # compile fence
        sys.stderr.write("bench: 1080p compiled; warming...\n")
        for s in range(1, WARMUP_SAMPLES):
            acc, _ = frame(s, 1)
        np.asarray(acc)
        # warm the n_samples=TIMED_SAMPLES instantiation too
        acc, _ = frame(50, TIMED_SAMPLES)
        np.asarray(acc)
        t0 = time.time()
        acc, total_rays_dev = frame(100, TIMED_SAMPLES)
        acc_host = np.asarray(acc)
        total_rays = float(np.asarray(total_rays_dev))
        elapsed = time.time() - t0
        img = jnp.asarray(acc_host / TIMED_SAMPLES)
    elif "nobatch" not in argv:
        # DEFAULT since r4: single-program multi-sample accumulation
        # measured 13.05 vs 9.83 Mrays/s for the per-sample dispatch chain
        # on the 512^2 headline (per-program dispatch through the tunnel
        # is ~2 ms; 16 samples in one program amortize it away)
        # one jitted program accumulating all samples (render_accumulate):
        # amortizes per-program dispatch through the tunnel
        from gfxexp_tpu.render.pathtrace import render_accumulate

        mean0, _ = render_accumulate(scene, bvh, camera, WIDTH, HEIGHT,
                                     jnp.uint32(0), TIMED_SAMPLES, cfg)
        np.asarray(mean0)  # compile + warm
        t0 = time.time()
        mean, nrays_dev = render_accumulate(
            scene, bvh, camera, WIDTH, HEIGHT, jnp.uint32(100),
            TIMED_SAMPLES, cfg)
        acc_host = np.asarray(mean) * TIMED_SAMPLES
        total_rays = float(np.asarray(nrays_dev))
        elapsed = time.time() - t0
        img = jnp.asarray(acc_host / TIMED_SAMPLES)
    else:
        # accumulate through a device-side dependency chain: this runtime
        # executes independent programs concurrently, so blocking on the
        # last output alone does NOT fence earlier samples — the chain
        # makes timing honest while still allowing dispatch pipelining
        acc = jnp.zeros((WIDTH * HEIGHT, 3), jnp.float32)
        total_rays_dev = jnp.zeros((), jnp.float32)
        t0 = time.time()
        for s in range(TIMED_SAMPLES):
            img, nrays = render_sample(
                scene, bvh, camera, WIDTH, HEIGHT, jnp.uint32(100 + s), cfg
            )
            acc = acc + img
            total_rays_dev = total_rays_dev + nrays
        # block_until_ready can return before execution completes; a host
        # copy is the only trustworthy fence
        acc_host = np.asarray(acc)
        total_rays = float(np.asarray(total_rays_dev))
        elapsed = time.time() - t0
        img = jnp.asarray(acc_host / TIMED_SAMPLES)

    mrays = total_rays / elapsed / 1e6
    sys.stderr.write(
        f"bench: {scene.num_triangles} tris, build {build_s:.1f}s, "
        f"compile {compile_s:.1f}s, {TIMED_SAMPLES} samples in {elapsed:.2f}s, "
        f"{total_rays/1e6:.1f} Mrays, mean radiance {float(img.mean()):.4f}\n"
    )
    if big or city:
        # also keep the render so correctness on the big scene is auditable
        from gfxexp_tpu.utils.image_io import save_png

        if hd:
            # the hd path concatenates render_tile_accumulate outputs, which
            # are in LANE (block-major) order; unscramble to pixel order
            # before the row-major reshape (render_sample already does this
            # for the non-hd paths)
            from gfxexp_tpu.render.camera import lane_from_pixel

            order = lane_from_pixel(
                jnp.arange(WIDTH * HEIGHT, dtype=jnp.uint32), WIDTH, HEIGHT)
            img = img[order]
        tone = img.reshape(HEIGHT, WIDTH, 3)
        save_png(os.path.join(_REPO, "out",
                              f"bench_{'city' if city else 'big'}.png"),
                 tone / (1.0 + tone))
    if emit:
        print(json.dumps({
            "metric": ("pt_ray_throughput_city" if city
                       else "pt_ray_throughput_big" if big
                       else "pt_ray_throughput_1080p" if hd
                       else "pt_ray_throughput_512"),
            "value": round(mrays, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / TARGET_MRAYS, 4),
        }))
    return mrays


TECHNIQUES = ("restir", "restir_rearch", "regir", "svgf", "nrc")


def _measure_technique(name, argv):
    """Per-technique ms/frame (VERDICT r4 item #4): chained-frame timing on
    the headline scene via perf/technique_bench.py. vs_baseline is the
    fraction of 60 fps real-time (16.7 ms) the frame achieves — the
    reference's apps are interactive on RTX hardware but publish no
    numbers (BASELINE.md)."""
    sys.path.insert(0, os.path.join(_REPO, "perf"))
    import technique_bench

    if "1080p" in argv:
        w, h = 1920, 1080
    else:
        w, h = 512, 512
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    row = technique_bench.BENCHES[name](w, h)
    print(json.dumps({
        "metric": f"{name}_ms_frame",
        "value": row["ms_frame"],
        "unit": "ms/frame",
        "vs_baseline": round(16.7 / max(row["ms_frame"], 1e-9), 4),
        "extra": {"resolution": row["resolution"],
                  "passes_ms": row.get("passes_ms")},
    }))


def main():
    argv = sys.argv[1:]
    for name in TECHNIQUES:
        if name in argv:
            _measure_technique(name, argv)
            return
    # default run (no resolution/scene selector): measure BOTH the
    # r1-r3-comparable 512^2 config and the 1080p tiled config — the
    # BASELINE.json target metric is DEFINED at 1080p, so that is the
    # headline value; the 512^2 number rides in "extra" (VERDICT r3
    # item 5: the BENCH JSON must contain both)
    single = ("big" in argv or "city" in argv or "1080p" in argv
              or "512" in argv)
    if single:
        _measure(argv)
        return
    mrays_512 = _measure(argv + ["512"], emit=False)
    mrays_hd = _measure(argv + ["1080p"], emit=False)
    print(json.dumps({
        "metric": "pt_ray_throughput",
        "value": round(mrays_hd, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_hd / TARGET_MRAYS, 4),
        "extra": {
            "resolution": "1920x1080 (BASELINE.json metric resolution)",
            "mrays_512": round(mrays_512, 2),
        },
    }))


if __name__ == "__main__":
    main()
