"""nrtdsm app — nonlinear ray tracing for displacement mapping
(reference: nrtdsm/nrtdsm_main.cpp). Same loop as the tfdm app but with the
exact nonlinear shell intersection (curved rays in shell space); supports
tilted vertex normals which TFDM's tangent-space walk approximates."""

from __future__ import annotations

import numpy as np

from gfxexp_tpu.apps import common
from gfxexp_tpu.apps.tfdm import displaced_lighting_loop, procedural_height


def main(argv=None):
    p = common.make_arg_parser("nrtdsm")
    p.add_argument("-height-kind", choices=["ridges", "bumps", "flat"],
                   default="bumps")
    p.add_argument("-h-offset", type=float, default=0.0)
    p.add_argument("-h-scale", type=float, default=0.25)
    p.add_argument("-h-bias", type=float, default=0.0)
    p.add_argument("-normal-tilt", type=float, default=0.3,
                   help="tilt of vertex normals (exercises the nonlinear shells)")
    p.add_argument("-heatmap", action="store_true")
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from gfxexp_tpu.techniques import nrtdsm as N
    from gfxexp_tpu.techniques.tfdm import DisplacementParameters

    height = procedural_height(kind=args.height_kind)
    params = DisplacementParameters(
        h_offset=args.h_offset, h_scale=args.h_scale, h_bias=args.h_bias)

    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    t = args.normal_tilt
    normals = np.array([[t, 1, 0], [0, 1, t], [-t, 1, 0], [0, 1, -t]],
                       np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    geom = N.build_nrtdsm_geometry(positions, indices, uvs, height,
                                   params=params, normals=normals)

    def intersect(o, d):
        return N.intersect_nrtdsm(geom, o, d)

    displaced_lighting_loop(args, geom, intersect, args.heatmap)


if __name__ == "__main__":
    main()
