"""neural_radiance_caching app — path tracing with an online-trained neural
radiance cache (reference:
neural_radiance_caching/neural_radiance_caching_main.cpp; CLI flags
-position-encoding / -num-hidden-layers / -learning-rate mirror
main.cpp:458-460,762-787)."""

from __future__ import annotations

import sys

import numpy as np

from gfxexp_tpu.apps import common


def main(argv=None):
    p = common.make_arg_parser("neural_radiance_caching")
    p.add_argument("-position-encoding", choices=["triangle_wave", "hash_grid"],
                   default="triangle_wave",
                   help="TPU default is triangle_wave (hash-grid corner "
                        "gathers are ~400x slower on TPU — "
                        "perf/RESULTS_r5.md; reference defaults hash_grid)")
    p.add_argument("-num-hidden-layers", type=int, default=2)
    p.add_argument("-learning-rate", type=float, default=1e-2)
    p.add_argument("-train-steps", type=int, default=4,
                   help="optimizer steps per frame (reference: 4)")
    p.add_argument("-train-stride", type=int, default=16)
    p.add_argument("-visualize-cache", action="store_true",
                   help="render the raw cache prediction at the primary hit")
    p.add_argument("-checkpoint", type=str, default=None,
                   help="save the trained cache to this file at the end")
    p.add_argument("-resume", type=str, default=None,
                   help="load cache weights before rendering")
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from gfxexp_tpu.render.film import add_sample, make_film
    from gfxexp_tpu.scene.animation import advance_frame
    from gfxexp_tpu.scene.compile import compile_scene
    from gfxexp_tpu.techniques.nrc import NRCConfig, init_nrc, train_on_frame
    from gfxexp_tpu.techniques.nrc.cache import (
        NRCIntegratorConfig,
        render_sample_nrc,
        scene_aabb,
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
    nrc_cfg = NRCConfig(position_encoding=args.position_encoding,
                        num_hidden_layers=args.num_hidden_layers,
                        learning_rate=args.learning_rate)
    icfg = NRCIntegratorConfig(max_path_length=args.max_path_length,
                               train_stride=args.train_stride,
                               enable_jitter=not args.no_jitter)

    state = init_nrc(jax.random.PRNGKey(0), nrc_cfg)
    if args.resume:
        from gfxexp_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(args.resume, like=state)
        print(f"resumed cache from {args.resume}", file=sys.stderr)
    lo, hi = scene_aabb(scene)

    film = make_film(args.width, args.height)
    timer = common.PassTimer()
    denoiser = common.maybe_denoiser(args)
    denoised = None
    for f in range(args.frames):
        if controllers:
            scene, bvh = timer.measure(
                "update", advance_frame, scene, bvh, controllers, f / 60.0)
        radiance, tq, tt, tm = timer.measure(
            "pathTrace+infer", render_sample_nrc, scene, bvh, camera,
            state["ema"], lo, hi, args.width, args.height, jnp.uint32(f),
            icfg, nrc_cfg)
        state, loss = timer.measure(
            "train", train_on_frame, state, tq, tt, tm,
            jax.random.PRNGKey(f), nrc_cfg, args.train_steps)
        film = add_sample(film, radiance.reshape(args.height, args.width, 3))
        if denoiser is not None:
            denoised = denoiser.step(scene, bvh, camera, f, film.beauty,
                                     timer, not args.no_jitter)
        if args.stats and (f % 16 == 15):
            print(f"frame {f + 1}/{args.frames}: {timer.report()}, "
                  f"loss {float(loss):.4f}", file=sys.stderr)

    if args.visualize_cache:
        # render the raw cache prediction at primary hits (reference:
        # visualizePrediction entry point, optix_pathtracing_kernels.cu:702)
        from gfxexp_tpu.render.gbuffer import render_gbuffer
        from gfxexp_tpu.render.bsdf import material_params_textured
        from gfxexp_tpu.techniques.nrc import infer
        from gfxexp_tpu.techniques.nrc.cache import make_query, _query_ref_factor

        gb = render_gbuffer(scene, bvh, camera, camera, args.width,
                            args.height, jnp.uint32(0), False)
        n = args.width * args.height
        pos = gb.position.reshape(n, 3)
        nrm = gb.normal.reshape(n, 3)
        vout = -gb.view_dir.reshape(n, 3)
        mat = jnp.maximum(gb.material.reshape(n), 0)
        params = material_params_textured(
            scene.materials, scene.textures, mat, gb.texcoord.reshape(n, 2))
        q = make_query(lo, hi, pos, nrm, vout, params)
        pred = jnp.maximum(infer(state, q, nrc_cfg), 0.0)
        pred = pred * _query_ref_factor(q)
        pred = jnp.where(gb.hit.reshape(n)[:, None], pred, 0.0)
        from gfxexp_tpu.utils.image_io import save_png

        vis = np.asarray(pred).reshape(args.height, args.width, 3)
        save_png(args.output + "_cache.png", vis / (1.0 + vis))
        print(f"wrote {args.output}_cache.png", file=sys.stderr)

    common.save_outputs(
        args, np.asarray(denoised if denoised is not None else film.beauty))
    if args.checkpoint:
        from gfxexp_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, state)
        print(f"saved cache to {args.checkpoint}", file=sys.stderr)
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
