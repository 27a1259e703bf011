#!/usr/bin/env python
"""Per-technique frame-time battery (VERDICT r4 item #4).

Measures ms/frame for each rendering technique on the headline scene
(teapot + bunny — the bundled-asset stand-in for the Bistro/Zero-Day
configs BASELINE.json names, which are external downloads this
environment lacks). The shape matches the reference's live stats window:
per-pass moving-average GPU ms (update / setup G-buffers / path trace /
denoise..., /root/reference/path_tracing/path_tracing_main.cpp:1641-1680)
and the NRC-specific split (infer / train,
neural_radiance_caching_main.cpp:2120-2154).

Two measurements per technique:
  * total ms/frame: N state-chained frames timed as a block, fenced by ONE
    host copy of a scalar reduction of the final frame's outputs (data
    dependence fences the whole chain; per CLAUDE.md block_until_ready can
    return early on this runtime). Dispatch pipelines across frames, like
    the real app loop.
  * per-pass split: each pass fenced separately by a host copy of a small
    reduction — includes ~2 ms/pass tunnel-dispatch overhead, so the split
    rows sum to MORE than the chained total; use them for ratios only.

Usage: python perf/technique_bench.py [pt|restir|restir_rearch|regir|svgf|nrc ...]
       [512|1080p] [--frames N]
Prints one JSON line per technique; also usable via `bench.py <technique>`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

WARMUP_FRAMES = 6  # first ~4 executions of a fresh program run 2-6x slow
TIMED_FRAMES = 16


def _fence(x):
    """Host copy of a scalar reduction — the only trustworthy fence."""
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    import jax.numpy as jnp

    acc = jnp.zeros((), jnp.float32)
    for l in leaves:
        acc = acc + jnp.sum(l).astype(jnp.float32)
    return float(np.asarray(acc))


class PassClock:
    """Per-pass wall ms with a host-copy fence per pass."""

    def __init__(self):
        self.ms = {}

    def run(self, name, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        _fence(out)
        self.ms.setdefault(name, []).append((time.time() - t0) * 1e3)
        return out

    def means(self):
        return {k: float(np.mean(v)) for k, v in self.ms.items()}


def _setup(width, height):
    from bench import build_bench_scene

    import jax
    import jax.numpy as jnp

    from gfxexp_tpu.render.camera import make_camera

    scene, bvh = build_bench_scene()
    scene = jax.tree_util.tree_map(jnp.asarray, scene)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)
    camera = make_camera(
        [0.0, 0.8, 1.6], fov_y=np.deg2rad(45), aspect=width / height,
        target=[0.0, 0.2, 0.0])
    return scene, bvh, camera


def bench_pt(width, height, frames=TIMED_FRAMES):
    import jax.numpy as jnp

    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample

    scene, bvh, camera = _setup(width, height)
    cfg = PTConfig(max_path_length=5)

    def frame(f, carry):
        img = render_sample(scene, bvh, camera, width, height,
                            jnp.uint32(f), cfg)
        return carry + jnp.sum(img), None

    return _drive("pt", frame, width, height, frames)


def _restir(width, height, frames, rearch):
    import jax.numpy as jnp

    from gfxexp_tpu.render.gbuffer import render_gbuffer
    from gfxexp_tpu.techniques.restir_di import (
        ReSTIRConfig,
        empty_reservoir,
        empty_sample_visibility,
        pixel_ctx,
        restir_di_frame,
    )

    scene, bvh, camera = _setup(width, height)
    cfg = ReSTIRConfig(use_rearchitected_pipeline=rearch,
                       reuse_visibility_for_temporal=rearch)
    n = width * height
    st = {
        "res": empty_reservoir(n),
        "vis": empty_sample_visibility(n),
    }
    gb0 = render_gbuffer(scene, bvh, camera, camera, width, height,
                         jnp.uint32(0), True)
    st["ctx"] = pixel_ctx(scene, gb0, camera)
    st["prev_hit"] = gb0.hit.reshape(n)
    st["prev_pos"] = gb0.position.reshape(n, 3)
    st["prev_nrm"] = gb0.normal.reshape(n, 3)

    def frame(f, carry, st=st):
        gb = render_gbuffer(scene, bvh, camera, camera, width, height,
                            jnp.uint32(f), True)
        color, st["res"], st["ctx"], st["vis"] = restir_di_frame(
            scene, bvh, gb, camera, st["res"], st["ctx"], st["prev_hit"],
            st["prev_pos"], st["prev_nrm"], jnp.uint32(f), cfg, st["vis"])
        st["prev_hit"] = gb.hit.reshape(n)
        st["prev_pos"] = gb.position.reshape(n, 3)
        st["prev_nrm"] = gb.normal.reshape(n, 3)
        return carry + jnp.sum(color), None

    name = "restir_rearch" if rearch else "restir"
    return _drive(name, frame, width, height, frames, split_fn=lambda f: (
        _restir_split(scene, bvh, camera, width, height, cfg, f)))


def _restir_split(scene, bvh, camera, width, height, cfg, frames):
    """Per-pass split: gbuffer vs restir, each fenced."""
    import jax.numpy as jnp

    from gfxexp_tpu.render.gbuffer import render_gbuffer
    from gfxexp_tpu.techniques.restir_di import (
        empty_reservoir,
        empty_sample_visibility,
        pixel_ctx,
        restir_di_frame,
    )

    n = width * height
    clock = PassClock()
    gb = render_gbuffer(scene, bvh, camera, camera, width, height,
                        jnp.uint32(0), True)
    res, vis = empty_reservoir(n), empty_sample_visibility(n)
    ctx = pixel_ctx(scene, gb, camera)
    ph, pp, pn = gb.hit.reshape(n), gb.position.reshape(n, 3), \
        gb.normal.reshape(n, 3)
    for f in range(frames + WARMUP_FRAMES):
        if f == WARMUP_FRAMES:
            clock = PassClock()
        gb = clock.run("gbuffer", render_gbuffer, scene, bvh, camera,
                       camera, width, height, jnp.uint32(f), True)
        _, res, ctx, vis = clock.run(
            "restir", restir_di_frame, scene, bvh, gb, camera, res, ctx,
            ph, pp, pn, jnp.uint32(f), cfg, vis)
        ph, pp, pn = gb.hit.reshape(n), gb.position.reshape(n, 3), \
            gb.normal.reshape(n, 3)
    return clock.means()


def bench_restir(width, height, frames=TIMED_FRAMES):
    return _restir(width, height, frames, rearch=False)


def bench_restir_rearch(width, height, frames=TIMED_FRAMES):
    return _restir(width, height, frames, rearch=True)


def bench_regir(width, height, frames=TIMED_FRAMES):
    import jax.numpy as jnp

    from gfxexp_tpu.render.pathtrace import PTConfig
    from gfxexp_tpu.techniques.regir import (
        ReGIRConfig,
        build_cell_reservoirs,
        finalize_frame,
        make_grid,
        make_regir_state,
        render_sample_regir,
    )

    scene, bvh, camera = _setup(width, height)
    pt_cfg = PTConfig(max_path_length=5)
    regir_cfg = ReGIRConfig()
    grid = make_grid(scene, regir_cfg)
    st = {"state": make_regir_state(regir_cfg)}

    def frame(f, carry, st=st):
        st["state"] = build_cell_reservoirs(
            scene, st["state"], grid, jnp.uint32(f), regir_cfg)
        radiance, st["state"] = render_sample_regir(
            scene, bvh, camera, st["state"], grid, width, height,
            jnp.uint32(f), pt_cfg, regir_cfg)
        st["state"] = finalize_frame(st["state"], f)
        return carry + jnp.sum(radiance), None

    def split(frames):
        clock = PassClock()
        state = make_regir_state(regir_cfg)
        for f in range(frames + WARMUP_FRAMES):
            if f == WARMUP_FRAMES:
                clock = PassClock()
            state = clock.run("buildCellReservoirs", build_cell_reservoirs,
                              scene, state, grid, jnp.uint32(f), regir_cfg)
            radiance, state = clock.run(
                "pathTrace", render_sample_regir, scene, bvh, camera, state,
                grid, width, height, jnp.uint32(f), pt_cfg, regir_cfg)
            state = finalize_frame(state, f)
        return clock.means()

    return _drive("regir", frame, width, height, frames, split_fn=split)


def bench_svgf(width, height, frames=TIMED_FRAMES):
    import jax.numpy as jnp

    from gfxexp_tpu.render.gbuffer import render_gbuffer
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.techniques.svgf import (
        SVGFConfig,
        make_svgf_state,
        svgf_frame,
    )

    scene, bvh, camera = _setup(width, height)
    pt_cfg = PTConfig(max_path_length=5)
    svgf_cfg = SVGFConfig()
    st = {"state": make_svgf_state(width, height)}

    def frame(f, carry, st=st):
        gb = render_gbuffer(scene, bvh, camera, camera, width, height,
                            jnp.uint32(f), True)
        lighting = render_sample(scene, bvh, camera, width, height,
                                 jnp.uint32(f), pt_cfg)
        lighting = lighting.reshape(height, width, 3)
        final, st["state"] = svgf_frame(st["state"], gb, lighting, svgf_cfg)
        return carry + jnp.sum(final), None

    def split(frames):
        clock = PassClock()
        state = make_svgf_state(width, height)
        for f in range(frames + WARMUP_FRAMES):
            if f == WARMUP_FRAMES:
                clock = PassClock()
            gb = clock.run("gbuffer", render_gbuffer, scene, bvh, camera,
                           camera, width, height, jnp.uint32(f), True)
            lighting = clock.run("pathTrace", render_sample, scene, bvh,
                                 camera, width, height, jnp.uint32(f), pt_cfg)
            lighting = lighting.reshape(height, width, 3)
            _, state = clock.run("denoise", svgf_frame, state, gb,
                                 lighting, svgf_cfg)
        return clock.means()

    return _drive("svgf", frame, width, height, frames, split_fn=split)


def bench_nrc(width, height, frames=TIMED_FRAMES, train_steps=4):
    import jax
    import jax.numpy as jnp

    from gfxexp_tpu.techniques.nrc import (
        NRCConfig, init_nrc, train_on_frame)
    from gfxexp_tpu.techniques.nrc.cache import (
        NRCIntegratorConfig,
        render_sample_nrc,
        scene_aabb,
    )

    scene, bvh, camera = _setup(width, height)
    nrc_cfg = NRCConfig()
    icfg = NRCIntegratorConfig(max_path_length=5)
    st = {"state": init_nrc(jax.random.PRNGKey(0), nrc_cfg)}
    lo, hi = scene_aabb(scene)

    def frame(f, carry, st=st):
        radiance, tq, tt, tm = render_sample_nrc(
            scene, bvh, camera, st["state"]["ema"], lo, hi, width, height,
            jnp.uint32(f), icfg, nrc_cfg)
        st["state"], loss = train_on_frame(
            st["state"], tq, tt, tm, jax.random.PRNGKey(f), nrc_cfg,
            train_steps)
        return carry + jnp.sum(radiance) + loss, None

    def split(frames):
        clock = PassClock()
        state = init_nrc(jax.random.PRNGKey(0), nrc_cfg)
        for f in range(frames + WARMUP_FRAMES):
            if f == WARMUP_FRAMES:
                clock = PassClock()
            radiance, tq, tt, tm = clock.run(
                "pathTrace+infer", render_sample_nrc, scene, bvh, camera,
                state["ema"], lo, hi, width, height, jnp.uint32(f), icfg,
                nrc_cfg)
            # one jitted program per frame: `train_steps` Adam steps on
            # disjoint shuffled slices (reference main.cpp:2350)
            state, _ = clock.run("train(x%d)" % train_steps, train_on_frame,
                                 state, tq, tt, tm, jax.random.PRNGKey(f),
                                 nrc_cfg, train_steps)
        return clock.means()

    return _drive("nrc", frame, width, height, frames, split_fn=split)


def _drive(name, frame_fn, width, height, frames, split_fn=None):
    """Warm, then time `frames` state-chained frames with one final fence."""
    import jax.numpy as jnp

    carry = jnp.zeros(())
    for f in range(WARMUP_FRAMES):
        carry, _ = frame_fn(f, carry)
    _fence(carry)

    carry = jnp.zeros(())
    t0 = time.time()
    for f in range(WARMUP_FRAMES, WARMUP_FRAMES + frames):
        carry, _ = frame_fn(f, carry)
    _fence(carry)
    total_ms = (time.time() - t0) * 1e3 / frames

    passes = split_fn(frames) if split_fn else None
    row = {
        "technique": name,
        "resolution": f"{width}x{height}",
        "ms_frame": round(total_ms, 2),
    }
    if passes:
        row["passes_ms"] = {k: round(v, 2) for k, v in passes.items()}
    return row


BENCHES = {
    "pt": bench_pt,
    "restir": bench_restir,
    "restir_rearch": bench_restir_rearch,
    "regir": bench_regir,
    "svgf": bench_svgf,
    "nrc": bench_nrc,
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    width, height = 512, 512
    if "1080p" in argv:
        width, height = 1920, 1080
        argv.remove("1080p")
    if "512" in argv:
        argv.remove("512")
    for a in list(argv):  # NxM smoke sizes (CPU correctness runs)
        if "x" in a and a.replace("x", "").isdigit():
            width, height = map(int, a.split("x"))
            argv.remove(a)
    frames = TIMED_FRAMES
    if "--frames" in argv:
        i = argv.index("--frames")
        frames = int(argv[i + 1])
        del argv[i:i + 2]
    names = [a for a in argv if a in BENCHES] or list(BENCHES)

    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    rows = []
    for n in names:
        sys.stderr.write(f"technique_bench: {n} @ {width}x{height}...\n")
        sys.stderr.flush()
        row = BENCHES[n](width, height, frames=frames)
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()
    return rows


if __name__ == "__main__":
    main()
