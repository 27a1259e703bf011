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


def displaced_lighting_loop(args, geom, intersect_fn, heat_field):
    """Shared offline loop for tfdm/nrtdsm: direct lighting of the displaced
    surface from a fixed area light + constant sky."""
    import jax.numpy as jnp

    from gfxexp_tpu.core.rng import SampleStream
    from gfxexp_tpu.render.camera import generate_rays, make_camera

    cam = common.make_camera_from_args(args)
    w, h = args.width, args.height
    n = w * h
    light_pos = jnp.asarray([0.5, 2.5, 0.5])
    light_radius = 0.4
    sky = 0.15

    import jax

    @jax.jit
    def frame(sample):
        rs = SampleStream(jnp.arange(n, dtype=jnp.uint32), sample, stream=7)
        jx, jy = rs.next2()
        o, d = generate_rays(cam, w, h, jx, jy)
        hit = intersect_fn(o, d)
        albedo = jnp.asarray([0.65, 0.6, 0.55])
        # jittered spherical light sample
        u0, u1 = rs.next2()
        theta = jnp.arccos(1 - 2 * u0)
        phi = 2 * jnp.pi * u1
        lp = light_pos + light_radius * jnp.stack(
            [jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
             jnp.sin(theta) * jnp.sin(phi)], axis=-1)
        lvec = lp - hit.position
        ldist2 = jnp.maximum(jnp.sum(lvec**2, -1), 1e-6)
        ldir = lvec / jnp.sqrt(ldist2)[:, None]
        ndl = jnp.maximum(jnp.sum(hit.normal * ldir, -1), 0.0)
        # shadow: re-trace toward the light against the displaced surface
        sh = intersect_fn(hit.position + 1e-3 * hit.normal, ldir)
        lit = ~(sh.hit & (sh.t < jnp.sqrt(ldist2)))
        direct = 6.0 * ndl * lit / ldist2
        amb = sky * (0.5 + 0.5 * hit.normal[:, 1])
        color = albedo[None, :] * (direct + amb)[:, None]
        color = jnp.where(hit.hit[:, None], color, jnp.asarray([[0.1, 0.12, 0.16]]))
        return color, hit.steps

    acc = np.zeros((n, 3), np.float64)
    steps = None
    timer = common.PassTimer()
    for f in range(args.frames):
        color, steps = timer.measure("render", frame, jnp.uint32(f))
        acc += np.asarray(color)
    img = (acc / args.frames).reshape(h, w, 3)
    common.save_outputs(args, img)
    if heat_field:
        s = np.asarray(steps).reshape(h, w).astype(np.float64)
        s = s / max(s.max(), 1.0)
        from gfxexp_tpu.utils.image_io import save_png

        heat = np.stack([s, 1.0 - np.abs(2 * s - 1), 1.0 - s], axis=-1)
        save_png(args.output + "_heatmap.png", heat, apply_srgb=False)
        print(f"wrote {args.output}_heatmap.png")
    if args.stats:
        print("final:", timer.report(), file=sys.stderr)


def main(argv=None):
    p = common.make_arg_parser("tfdm")
    p.add_argument("-height-map", type=str, default=None,
                   help="height map file (.dds/.png); procedural if omitted")
    p.add_argument("-height-kind", choices=["ridges", "bumps", "flat"],
                   default="ridges")
    p.add_argument("-h-offset", type=float, default=0.0)
    p.add_argument("-h-scale", type=float, default=0.25)
    p.add_argument("-h-bias", type=float, default=0.0)
    p.add_argument("-local-intersection",
                   choices=["box", "two_triangle", "bilinear", "bspline"],
                   default="bilinear")
    p.add_argument("-heatmap", action="store_true")
    args = common.parse_scene_args(p, argv)
    from gfxexp_tpu.utils.runtime import enable_compile_cache

    enable_compile_cache()
    from gfxexp_tpu.techniques import tfdm as T

    if args.height_map:
        if args.height_map.lower().endswith(".dds"):
            from gfxexp_tpu.scene.textures import load_dds

            height = load_dds(args.height_map)[..., 0]
        else:
            from gfxexp_tpu.utils.image_io import load_png

            height = load_png(args.height_map, to_linear=False)[..., 0]
        s = 1 << int(np.log2(min(height.shape[:2])))
        height = height[:s, :s]
    else:
        height = procedural_height(kind=args.height_kind)

    lit = {"box": T.LOCAL_INTERSECTION_BOX,
           "two_triangle": T.LOCAL_INTERSECTION_TWO_TRIANGLE,
           "bilinear": T.LOCAL_INTERSECTION_BILINEAR,
           "bspline": T.LOCAL_INTERSECTION_BSPLINE}[args.local_intersection]
    params = T.DisplacementParameters(
        h_offset=args.h_offset, h_scale=args.h_scale, h_bias=args.h_bias,
        local_intersection_type=lit)

    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
                         np.float32)
    normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    indices = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = positions[:, [0, 2]]
    geom = T.build_tfdm_geometry(positions, indices, uvs, height,
                                 params=params, normals=normals)

    def intersect(o, d):
        return T.intersect_tfdm(geom, o, d)

    displaced_lighting_loop(args, geom, intersect, args.heatmap)


if __name__ == "__main__":
    main()
