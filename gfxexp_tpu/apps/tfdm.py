"""tfdm app — tessellation-free displacement mapping
(reference: tfdm/tfdm_main.cpp). Renders a displaced heightfield patch over
the demo scene with NEE direct lighting; -heatmap writes the traversal-stats
visualization (reference: TraversalStats heatmap display, tfdm_shared.h:33).
"""

from __future__ import annotations

import sys

import numpy as np

from gfxexp_tpu.apps import common


def procedural_height(size: int = 128, kind: str = "ridges") -> np.ndarray:
    """Built-in height maps (the reference's .dds assets are git-LFS stubs)."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    if kind == "ridges":
        h = 0.5 + 0.25 * np.sin(8 * np.pi * x) * np.cos(6 * np.pi * y)
    elif kind == "bumps":
        h = ((np.sin(10 * np.pi * x) * np.sin(10 * np.pi * y)) ** 2)
    else:
        h = 0.5 * np.ones_like(x)
    return h.astype(np.float32)


def subdivided_plane(n: int, extent: float = 2.0):
    """n x n grid plane on XZ centered at the origin; uv spans [0,1]^2."""
    xs = np.linspace(-extent / 2, extent / 2, n + 1, dtype=np.float32)
    vx, vz = np.meshgrid(xs, xs, indexing="ij")
    positions = np.stack([vx, np.zeros_like(vx), vz], -1).reshape(-1, 3)
    normals = np.tile(np.array([[0, 1, 0]], np.float32),
                      (positions.shape[0], 1))
    idx = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            dd = c + 1
            idx.append([a, b, dd])
            idx.append([a, dd, c])
    indices = np.asarray(idx, np.int32)
    uvs = (positions[:, [0, 2]] / extent) + 0.5
    return positions, indices, uvs.astype(np.float32), normals


def load_or_procedural_height(args):
    if args.height_map:
        if args.height_map.lower().endswith(".dds"):
            from gfxexp_tpu.scene.textures import load_dds

            height = load_dds(args.height_map)[..., 0]
        else:
            from gfxexp_tpu.utils.image_io import load_png

            height = load_png(args.height_map, to_linear=False)[..., 0]
        s = 1 << int(np.log2(min(height.shape[:2])))
        return height[:s, :s]
    return procedural_height(kind=args.height_kind)


def add_displacement_args(p):
    p.add_argument("-height-map", type=str, default=None,
                   help="height map file (.dds/.png); procedural if omitted")
    p.add_argument("-height-kind", choices=["ridges", "bumps", "flat"],
                   default="ridges")
    p.add_argument("-h-offset", type=float, default=0.0)
    p.add_argument("-h-scale", type=float, default=0.25)
    p.add_argument("-h-bias", type=float, default=0.0)
    p.add_argument("-base-res", type=int, default=24,
                   help="displaced base mesh grid (2*n^2 triangles; 24 -> "
                        "1152 base tris)")
    p.add_argument("-heatmap", action="store_true")


def demo_scene(args, kind: str, params, shell_contents=None):
    """Full demo scene: floor + area light + specular sphere + the
    displaced base mesh as a first-class scene primitive (reference: the
    tfdm/nrtdsm apps path-trace displaced surfaces through the common
    pipeline, tfdm/gpu_kernels/optix_pathtracing_kernels.cu).
    shell_contents=(positions, indices) switches to shell mapping."""
    from gfxexp_tpu.scene.builder import SceneBuilder, affine

    height = None if shell_contents is not None \
        else load_or_procedural_height(args)
    b = SceneBuilder()
    floor = b.add_lambert_material((0.7, 0.7, 0.72))
    b.add_instance(b.add_rectangle(7.0, 7.0, floor),
                   affine(translation=[0.0, -0.02, 0.0]))
    lamp = b.add_lambert_material((0, 0, 0), emittance=(120.0, 110.0, 100.0))
    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(b.add_rectangle(1.0, 1.0, lamp),
                   affine(rotation=flip, translation=[0.8, 2.6, 0.8]))
    shiny = b.add_diffuse_specular_material((0.2, 0.25, 0.5),
                                            (0.25,) * 3, 0.85)
    b.add_instance(b.add_sphere(0.35, shiny),
                   affine(translation=[-1.35, 0.35, -0.6]))
    disp_mat = b.add_lambert_material((0.65, 0.6, 0.55))
    positions, indices, uvs, normals = subdivided_plane(args.base_res)
    tilt = getattr(args, "normal_tilt", 0.0)
    if tilt:
        # tilt vertex normals radially outward — curved (nonlinear) shells,
        # the case NRTDSM handles exactly (reference: nrtdsm README)
        radial = positions * np.asarray([[1.0, 0.0, 1.0]], np.float32)
        normals = normals + tilt * radial
        normals = normals / np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    if shell_contents is not None:
        spos, sidx = shell_contents
        b.add_shell(positions, indices, uvs, spos, sidx, params=params,
                    material=disp_mat, normals=normals)
    else:
        b.add_displaced(positions, indices, uvs, height, params=params,
                        material=disp_mat, kind=kind, normals=normals)
    return b


def run_displaced_app(args, kind: str, params, shell_contents=None):
    import jax.numpy as jnp

    from gfxexp_tpu.render.film import add_sample, make_film
    from gfxexp_tpu.render.pathtrace import PTConfig, render_sample
    from gfxexp_tpu.scene.compile import compile_scene

    builder = demo_scene(args, kind, params, shell_contents=shell_contents)
    scene, bvh = compile_scene(builder,
                               traversal=args.traversal or "widerow",
                               spatial_splits=args.spatial_splits)
    camera = common.make_camera_from_args(args)
    cfg = PTConfig(max_path_length=args.max_path_length,
                   enable_jitter=not args.no_jitter)

    film = make_film(args.width, args.height)
    timer = common.PassTimer()
    viewer = common.maybe_viewer(args)
    rig = common.maybe_camera_rig(args, viewer)
    sample_key = 0
    for f in range(args.frames):
        new_cam, film, _ = common.rig_step(rig, viewer, args, film,
                                           make_film)
        if new_cam is not None:
            camera = new_cam
            sample_key = f
        radiance = timer.measure(
            "pathTrace", render_sample, scene, bvh, camera,
            args.width, args.height, jnp.uint32(f - sample_key), cfg)
        film = add_sample(film, radiance.reshape(args.height, args.width, 3))
        common.viewer_update(
            viewer, film.beauty, f + 1,
            brightness=rig.brightness if rig is not None else 1.0)

    common.save_outputs(args, np.asarray(film.beauty))
    if args.heatmap:
        # traversal-stats heatmap over primary rays (reference:
        # TraversalStats display, tfdm_shared.h:33-36)
        from gfxexp_tpu.render.camera import generate_rays
        from gfxexp_tpu.techniques.nrtdsm import intersect_nrtdsm_v2
        from gfxexp_tpu.techniques.tfdm import intersect_tfdm_v2
        from gfxexp_tpu.utils.image_io import save_png

        n = args.width * args.height
        jx = jnp.full((n,), 0.5, jnp.float32)
        o, d = generate_rays(camera, args.width, args.height, jx, jx)
        g = scene.displaced[0]
        if shell_contents is not None:
            from gfxexp_tpu.techniques.shell import intersect_shell as fn
        else:
            fn = (intersect_tfdm_v2 if kind == "tfdm"
                  else intersect_nrtdsm_v2)
        dh = fn(g, o, d)
        s = np.asarray(dh.steps).reshape(
            args.height, args.width).astype(np.float64)
        s = s / max(s.max(), 1.0)
        heat = np.stack([s, 1.0 - np.abs(2 * s - 1), 1.0 - s], axis=-1)
        save_png(args.output + "_heatmap.png", heat, apply_srgb=False)
        print(f"wrote {args.output}_heatmap.png")
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


def main(argv=None):
    p = common.make_arg_parser("tfdm")
    add_displacement_args(p)
    p.add_argument("-local-intersection",
                   choices=["box", "two_triangle", "bilinear", "bspline"],
                   default="bilinear")
    p.set_defaults(cam_pos=[0.0, 2.1, 3.4], cam_yaw=180.0, cam_pitch=30.0)
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from gfxexp_tpu.techniques import tfdm as T

    lit = {"box": T.LOCAL_INTERSECTION_BOX,
           "two_triangle": T.LOCAL_INTERSECTION_TWO_TRIANGLE,
           "bilinear": T.LOCAL_INTERSECTION_BILINEAR,
           "bspline": T.LOCAL_INTERSECTION_BSPLINE}[args.local_intersection]
    params = T.DisplacementParameters(
        h_offset=args.h_offset, h_scale=args.h_scale, h_bias=args.h_bias,
        local_intersection_type=lit)
    run_displaced_app(args, "tfdm", params)


if __name__ == "__main__":
    main()
