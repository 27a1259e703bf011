"""regir app — world-space grid reservoir light sampling
(reference: regir/regir_main.cpp)."""

from __future__ import annotations

import sys

import numpy as np

from gfxexp_tpu.apps import common


def main(argv=None):
    p = common.make_arg_parser("regir")
    p.add_argument("-grid-dim", type=int, nargs=3, default=[16, 16, 16])
    p.add_argument("-light-slots", type=int, default=512,
                   help="reference: kNumLightSlotsPerCell (regir_shared.h:7)")
    p.add_argument("-log2-candidates-per-slot", type=int, default=3)
    p.add_argument("-log2-candidates-per-cell", type=int, default=3)
    p.add_argument("-no-temporal", action="store_true")
    p.add_argument("-no-cell-randomization", action="store_true")
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gfxexp_tpu.render.film import add_sample, make_film
    from gfxexp_tpu.render.pathtrace import PTConfig
    from gfxexp_tpu.scene.animation import advance_frame
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.techniques.regir import (
        ReGIRConfig,
        build_cell_reservoirs,
        finalize_frame,
        make_grid,
        make_regir_state,
        render_sample_regir,
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
    pt_cfg = PTConfig(max_path_length=args.max_path_length,
                      enable_jitter=not args.no_jitter,
                      enable_bump_mapping=args.bump)
    regir_cfg = ReGIRConfig(
        grid_dimension=tuple(args.grid_dim),
        num_light_slots_per_cell=args.light_slots,
        log2_num_candidates_per_slot=args.log2_candidates_per_slot,
        log2_num_candidates_per_cell=args.log2_candidates_per_cell,
        enable_temporal_reuse=not args.no_temporal,
        enable_cell_randomization=not args.no_cell_randomization,
    )

    grid = make_grid(scene, regir_cfg)
    state = make_regir_state(regir_cfg)
    film = make_film(args.width, args.height)
    timer = common.PassTimer()
    denoiser = common.maybe_denoiser(args)
    denoised = None
    for f in range(args.frames):
        if controllers:
            scene, bvh = timer.measure(
                "update", advance_frame, scene, bvh, controllers, f / 60.0)
        state = timer.measure(
            "buildCellReservoirs", build_cell_reservoirs, scene, state, grid,
            jnp.uint32(f), regir_cfg)
        radiance, state = timer.measure(
            "pathTrace", render_sample_regir, scene, bvh, camera, state, grid,
            args.width, args.height, jnp.uint32(f), pt_cfg, regir_cfg)
        state = finalize_frame(state, f)
        film = add_sample(film, radiance.reshape(args.height, args.width, 3))
        if denoiser is not None:
            denoised = denoiser.step(scene, bvh, camera, f, film.beauty,
                                     timer, not args.no_jitter)
        if args.stats and (f % 16 == 15):
            n_active = int(np.asarray(state.num_accesses > 0).sum())
            print(f"frame {f + 1}/{args.frames}: {timer.report()}, "
                  f"active cells {n_active}", file=sys.stderr)

    common.save_outputs(
        args, np.asarray(denoised if denoised is not None else film.beauty))
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
