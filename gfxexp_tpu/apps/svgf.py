"""svgf app — 1-spp path tracing + SVGF denoising + TAA
(reference: svgf/svgf_main.cpp)."""

from __future__ import annotations

import sys

import numpy as np

from gfxexp_tpu.apps import common


def main(argv=None):
    p = common.make_arg_parser("svgf")
    p.add_argument("-no-svgf", action="store_true")
    p.add_argument("-no-temporal", action="store_true")
    p.add_argument("-no-taa", action="store_true")
    p.add_argument("-feedback-1st", action="store_true")
    p.add_argument("-filter-stages", type=int, default=5)
    p.add_argument("-mollify-specular", action="store_true")
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gfxexp_tpu.render.gbuffer import render_gbuffer
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.animation import advance_frame
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.techniques.svgf import SVGFConfig, make_svgf_state, svgf_frame

    builder, controllers = common.build_scene_from_dsl(args, args.scene_args)
    if not builder.instances:
        builder = common.default_demo_builder()
    # static scenes default to the fast wide-row kernel; animated
    # ones need the refittable skip-link structure
    traversal = args.traversal or ("skip" if controllers else "widerow")
    scene, bvh = compile_scene(
        builder,
        traversal=traversal,
        spatial_splits=args.spatial_splits,
        rebraid=args.rebraid if traversal.startswith("instanced") else 0.0)
    camera = common.make_camera_from_args(args)
    prev_camera = camera
    pt_cfg = PTConfig(max_path_length=args.max_path_length,
                      enable_jitter=not args.no_jitter,
                      enable_bump_mapping=args.bump,
                      mollify_specular=args.mollify_specular)
    svgf_cfg = SVGFConfig(
        enable_svgf=not args.no_svgf,
        enable_temporal_accumulation=not args.no_temporal,
        enable_taa=not args.no_taa,
        feedback_1st_filtered=args.feedback_1st,
        num_filter_stages=args.filter_stages,
        mollify_specular=args.mollify_specular,
    )

    state = make_svgf_state(args.width, args.height)
    timer = common.PassTimer()
    final = None
    for f in range(args.frames):
        if controllers:
            scene, bvh = timer.measure(
                "update", advance_frame, scene, bvh, controllers, f / 60.0)
        gb = timer.measure(
            "gbuffer", render_gbuffer, scene, bvh, camera, prev_camera,
            args.width, args.height, jnp.uint32(f),
            not args.no_jitter)
        lighting = timer.measure(
            "pathTrace", render_sample, scene, bvh, camera,
            args.width, args.height, jnp.uint32(f), pt_cfg)
        lighting = lighting.reshape(args.height, args.width, 3)
        final, state = timer.measure(
            "svgf", svgf_frame, state, gb, lighting, svgf_cfg)
        prev_camera = camera
        if args.stats and (f % 16 == 15):
            print(f"frame {f + 1}/{args.frames}: {timer.report()}",
                  file=sys.stderr)

    common.save_outputs(args, np.asarray(final))
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
