"""restir_di app — reservoir spatiotemporal resampled direct illumination
(reference: restir_di/restir_di_main.cpp)."""

from __future__ import annotations

import sys

import numpy as np

from gfxexp_tpu.apps import common


def main(argv=None):
    p = common.make_arg_parser("restir_di")
    p.add_argument("-unbiased", action="store_true")
    p.add_argument("-log2-num-candidates", type=int, default=3)
    p.add_argument("-spatial-passes", type=int, default=2)
    p.add_argument("-spatial-neighbors", type=int, default=3)
    p.add_argument("-spatial-radius", type=float, default=20.0)
    p.add_argument("-no-temporal", action="store_true")
    p.add_argument("-no-spatial", action="store_true")
    p.add_argument("-no-reuse-visibility", action="store_true")
    p.add_argument("-rearch", action="store_true",
                   help="rearchitected pipeline (light presampling + "
                        "decoupled shadow/shade passes)")
    p.add_argument("-reuse-vis-temporal", action="store_true",
                   help="rearch: reuse last frame's selected-sample "
                        "visibility for the temporal candidate (no ray)")
    p.add_argument("-light-subsets", type=int, default=128)
    p.add_argument("-light-subset-size", type=int, default=1024)
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gfxexp_tpu.render.film import add_sample, make_film
    from gfxexp_tpu.render.gbuffer import render_gbuffer
    from gfxexp_tpu.scene.animation import advance_frame
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.techniques.restir_di import (
        empty_sample_visibility,
        ReSTIRConfig,
        empty_reservoir,
        pixel_ctx,
        restir_di_frame,
    )

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
    cfg = ReSTIRConfig(
        log2_num_candidates=args.log2_num_candidates,
        enable_temporal_reuse=not args.no_temporal,
        enable_spatial_reuse=not args.no_spatial,
        num_spatial_passes=args.spatial_passes,
        num_spatial_neighbors=args.spatial_neighbors,
        spatial_radius=args.spatial_radius,
        use_unbiased_estimator=args.unbiased,
        reuse_visibility=not args.no_reuse_visibility,
        use_rearchitected_pipeline=args.rearch,
        num_light_subsets=args.light_subsets,
        light_subset_size=args.light_subset_size,
        reuse_visibility_for_temporal=args.reuse_vis_temporal,
    )

    n = args.width * args.height
    film = make_film(args.width, args.height)
    timer = common.PassTimer()
    denoiser = common.maybe_denoiser(args)
    denoised = None
    res = empty_reservoir(n)
    vis = empty_sample_visibility(n)
    gb = render_gbuffer(scene, bvh, camera, prev_camera,
                        args.width, args.height, jnp.uint32(0),
                        not args.no_jitter)
    ctx = pixel_ctx(scene, gb, camera)
    prev_hit = gb.hit.reshape(n)
    prev_pos = gb.position.reshape(n, 3)
    prev_nrm = gb.normal.reshape(n, 3)

    for f in range(args.frames):
        if controllers:
            scene, bvh = timer.measure(
                "update", advance_frame, scene, bvh, controllers, f / 60.0)
        gb = timer.measure(
            "gbuffer", render_gbuffer, scene, bvh, camera, prev_camera,
            args.width, args.height, jnp.uint32(f), not args.no_jitter)
        color, res, ctx, vis = timer.measure(
            "restir", restir_di_frame, scene, bvh, gb, camera, res, ctx,
            prev_hit, prev_pos, prev_nrm, jnp.uint32(f), cfg, vis)
        prev_hit = gb.hit.reshape(n)
        prev_pos = gb.position.reshape(n, 3)
        prev_nrm = gb.normal.reshape(n, 3)
        film = add_sample(film, color)
        if denoiser is not None:
            # reuse this frame's G-buffer for guides (no second render)
            denoised = denoiser.step(scene, bvh, camera, f, film.beauty,
                                     timer, gb=gb)
        prev_camera = camera
        if args.stats and (f % 16 == 15):
            print(f"frame {f + 1}/{args.frames}: {timer.report()}",
                  file=sys.stderr)

    common.save_outputs(
        args, np.asarray(denoised if denoised is not None else film.beauty))
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
