"""App-level smoke tests: the CLI surface must produce non-black images
(this layer had a silent all-black default-camera bug once — never again)."""

import os

import numpy as np


def test_path_tracing_app(tmp_path):
    from gfxexp_tpu.apps.path_tracing import main

    out = str(tmp_path / "pt")
    main(["-width", "16", "-height", "16", "-frames", "2",
          "-cam-pos", "0", "0.5", "1.9", "-fov", "75", "-output", out])
    from gfxexp_tpu.utils.image_io import load_png

    img = load_png(out + ".png")
    assert img.shape[:2] == (16, 16)
    assert img.mean() > 0.005, img.mean()


def test_scene_dsl_parser():
    from gfxexp_tpu.apps import common

    args = common.parse_scene_args(
        common.make_arg_parser("t"),
        ["-width", "8", "-height", "8",
         "-name", "floor", "-rectangle", "4", "4", "-inst", "floor",
         "-name", "lamp", "-emittance", "30", "30", "30",
         "-rectangle", "1", "1", "-inst", "lamp",
         "-begin-pos", "0", "2", "0", "-end-pos", "0", "1", "0",
         "-freq", "0.5"])
    builder, controllers = common.build_scene_from_dsl(args, args.scene_args)
    assert len(builder.instances) == 2
    assert len(controllers) == 1
    assert controllers[0].end_position == (0.0, 1.0, 0.0)
    # emissive material created for the lamp
    emitting = [m for m in builder.materials if max(m.emittance) > 0]
    assert len(emitting) == 1
