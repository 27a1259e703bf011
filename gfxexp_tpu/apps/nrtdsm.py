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


def shell_contents_mesh(obj_path, grid: int):
    """Normalize an OBJ into the unit shell box and tile it grid x grid in
    (u, v) — the reference's shell demo instances an OBJ per texel region
    (nrtdsm_main.cpp:772-875)."""
    from gfxexp_tpu.scene import loaders
    from gfxexp_tpu.scene.builder import SceneBuilder

    b = SceneBuilder()
    geoms = loaders.load_obj(obj_path, b, material_convention="trad")
    pos_l, idx_l = [], []
    voff = 0
    for gid in geoms:
        g = b.geometries[gid]
        pos_l.append(np.asarray(g.positions, np.float32))
        idx_l.append(np.asarray(g.indices, np.int32) + voff)
        voff += len(g.positions)
    pos = np.concatenate(pos_l)
    idx = np.concatenate(idx_l)
    lo = pos.min(axis=0)
    span = np.maximum(pos.max(axis=0) - lo, 1e-9)
    unit = (pos - lo) / span.max()  # uniform scale into <= unit cube
    # x -> u, z -> v, y -> hn; shrink slightly and center per cell
    cell = 1.0 / grid
    unit = unit * 0.85 * cell + 0.075 * cell
    tiles_p, tiles_i = [], []
    for gu in range(grid):
        for gv in range(grid):
            off = np.asarray([gu * cell, gv * cell, 0.0], np.float32)
            tiles_p.append(unit[:, [0, 2, 1]] + off)
            tiles_i.append(idx + len(tiles_p[-1]) * (len(tiles_p) - 1))
    return np.concatenate(tiles_p), np.concatenate(tiles_i)


def main(argv=None):
    p = common.make_arg_parser("nrtdsm")
    add_displacement_args(p)
    p.add_argument("-normal-tilt", type=float, default=0.3,
                   help="tilt of vertex normals (exercises the nonlinear "
                        "shells; the demo tilts normals radially outward)")
    p.add_argument("-shell", action="store_true",
                   help="shell mapping: instance an OBJ inside the shells "
                        "instead of a height field (reference: nrtdsm "
                        "shell demo)")
    p.add_argument("-shell-obj", type=str,
                   default="/root/reference/data/stanford_bunny_309_faces.obj")
    p.add_argument("-shell-grid", type=int, default=3,
                   help="tile the shell contents N x N in texture space")
    p.add_argument("-local-intersection",
                   choices=["bilinear", "two_triangle"], default="bilinear",
                   help="local surface type: bilinear (marched) or "
                        "two_triangle (EXACT cubic roots per micro "
                        "triangle, reference "
                        "nrtdsm_intersection_kernels.h:498)")
    p.set_defaults(cam_pos=[0.0, 2.1, 3.4], cam_yaw=180.0, cam_pitch=30.0, base_res=16)
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from gfxexp_tpu.techniques import tfdm as T

    lit = {"bilinear": T.LOCAL_INTERSECTION_BILINEAR,
           "two_triangle": T.LOCAL_INTERSECTION_TWO_TRIANGLE}[
        args.local_intersection]
    params = T.DisplacementParameters(
        h_offset=args.h_offset, h_scale=args.h_scale, h_bias=args.h_bias,
        local_intersection_type=lit)
    shell = None
    if args.shell:
        shell = shell_contents_mesh(args.shell_obj, args.shell_grid)
    run_displaced_app(args, "nrtdsm", params, shell_contents=shell)


if __name__ == "__main__":
    main()
