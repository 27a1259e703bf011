"""nrtdsm app — nonlinear ray tracing for displacement mapping
(reference: nrtdsm/nrtdsm_main.cpp). Same demo scene as the tfdm app
(floor + area light + sphere + displaced base mesh path-traced through the
common pipeline) but with the exact nonlinear shell intersection (curved
rays in shell space) and tilted vertex normals, which TFDM's tangent-space
walk only approximates."""

from __future__ import annotations

import numpy as np

from gfxexp_tpu.apps import common
from gfxexp_tpu.apps.tfdm import (
    add_displacement_args,
    run_displaced_app,
)


def main(argv=None):
    p = common.make_arg_parser("nrtdsm")
    add_displacement_args(p)
    p.add_argument("-normal-tilt", type=float, default=0.3,
                   help="tilt of vertex normals (exercises the nonlinear "
                        "shells; the demo tilts normals radially outward)")
    p.set_defaults(cam_pos=[0.0, 2.1, 3.4], cam_yaw=180.0, cam_pitch=30.0, base_res=16)
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from gfxexp_tpu.techniques.tfdm import DisplacementParameters

    params = DisplacementParameters(
        h_offset=args.h_offset, h_scale=args.h_scale, h_bias=args.h_bias)
    run_displaced_app(args, "nrtdsm", params)


if __name__ == "__main__":
    main()
