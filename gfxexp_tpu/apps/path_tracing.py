"""path_tracing app — baseline NEE+MIS path tracer with progressive
accumulation (reference: path_tracing/path_tracing_main.cpp).

Usage (reference-style DSL):
  python -m gfxexp_tpu.apps.path_tracing -cam-pos 0 0 3.2 -frames 64 \
      -name floor -rectangle 4 4 -inst floor \
      -name lamp -emittance 30 30 30 -rectangle 1 1 -inst lamp -position 0 2 0
"""

from __future__ import annotations

import sys

import numpy as np

from gfxexp_tpu.apps import common


def main(argv=None):
    args = common.parse_scene_args(common.make_arg_parser("path_tracing"), argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gfxexp_tpu.render.film import add_sample, make_film
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.animation import advance_frame
    from gfxexp_tpu.scene.compile import compile_scene

    builder, controllers = common.build_scene_from_dsl(args, args.scene_args)
    if not builder.instances:
        builder = common.default_demo_builder()
    traversal = args.traversal or ("skip" if controllers else "widerow")
    scene, bvh = compile_scene(
        builder,
        # static scenes default to the fast wide-row kernel; animated
        # ones need the refittable skip-link structure
        traversal=traversal,
        spatial_splits=args.spatial_splits
        if traversal in ("widerow", "qrow") else False,
        rebraid=args.rebraid if traversal.startswith("instanced") else 0.0)
    camera = common.make_camera_from_args(args)
    cfg = PTConfig(max_path_length=args.max_path_length,
                   enable_jitter=not args.no_jitter,
                   enable_bump_mapping=args.bump,
                   fuse_shadow_rays=args.fused_shadow_rays,
                   texture_lod=args.texture_lod)

    film = make_film(args.width, args.height)
    timer = common.PassTimer()
    denoiser = common.maybe_denoiser(args)
    denoised = None
    viewer = common.maybe_viewer(args)
    rig = common.maybe_camera_rig(args, viewer)
    debug_switches = args.debug_switches
    sample_key = 0
    for f in range(args.frames):
        # interactive camera/toggles (live viewer): a move rebuilds the
        # camera and restarts accumulation (reference: camera state machine
        # + resetAccumulation, path_tracing_main.cpp:1359-1436)
        new_cam, film, new_sw = common.rig_step(
            rig, viewer, args, film, make_film)
        if new_cam is not None:
            camera = new_cam
            debug_switches = new_sw
            sample_key = f  # fresh RNG stream for the restarted accum
        if controllers:
            if traversal.startswith("instanced"):
                from gfxexp_tpu.scene.animation import (
                    advance_frame_instanced,
                )

                scene, bvh = timer.measure(
                    "update", advance_frame_instanced, scene, bvh,
                    controllers, f / 60.0)
            else:
                scene, bvh = timer.measure(
                    "update", advance_frame, scene, bvh, controllers,
                    f / 60.0)
        radiance = timer.measure(
            "pathTrace", render_sample, scene, bvh, camera,
            args.width, args.height, jnp.uint32(f - sample_key), cfg,
            jnp.uint32(debug_switches))
        film = add_sample(film, radiance.reshape(args.height, args.width, 3))
        if denoiser is not None:
            denoised = denoiser.step(scene, bvh, camera, f, film.beauty,
                                     timer, not args.no_jitter)
        if rig is not None and rig.pick_requests:
            # pick-under-cursor readback (reference:
            # path_tracing_main.cpp:1541-1567): one G-buffer render at the
            # current camera, inspected at the clicked pixel
            from gfxexp_tpu.render.gbuffer import render_gbuffer

            gb = render_gbuffer(scene, bvh, camera, camera, args.width,
                                args.height, jnp.uint32(f),
                                enable_jitter=False)
            for (pu, pv) in rig.take_picks():
                px = min(max(int(pu * args.width), 0), args.width - 1)
                py = min(max(int(pv * args.height), 0), args.height - 1)
                viewer.set_pick(common.pick_info(scene, gb, px, py))
        common.viewer_update(
            viewer, denoised if denoised is not None else film.beauty, f + 1,
            brightness=rig.brightness if rig is not None else 1.0)
        if args.stats and (f % 16 == 15):
            print(f"frame {f + 1}/{args.frames}: {timer.report()}",
                  file=sys.stderr)

    common.save_outputs(
        args, np.asarray(denoised if denoised is not None else film.beauty))
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
