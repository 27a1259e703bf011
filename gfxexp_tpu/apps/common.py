"""Shared app framework: the scene-description CLI and the offline frame loop.

Counterpart of the reference's per-app boilerplate (reference:
path_tracing_main.cpp — parseCommandline:347-618 with the scene DSL
(-cam-pos, -cam-roll/-pitch/-yaw, -brightness, -env-texture, -name,
-emittance, -rectangle, -obj <path> <scale> trad|simple_pbr, -begin-pos/
-end-pos/-begin-roll../-freq/-time animation, -inst), the GLFW/ImGui frame
loop :1278-1912, per-pass GPUTimer stats :1245-1273 + :1641-1680, screenshot
saving :1469-1497, pick info readback :1541-1567).

TPU re-architecture: the apps are offline/headless — they render N frames,
write PNG/EXR outputs, and print per-pass timing stats (the reference's
interactive ImGui panels become CLI flags + stats lines). The same scene DSL
is accepted so reference command lines port over."""

from __future__ import annotations

import argparse
import math
import os
import time
from typing import List

import numpy as np


def make_arg_parser(name: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog=name,
        description=f"{name} (gfxexp_tpu) — offline TPU renderer",
    )
    # render controls (reference: ImGui panel equivalents)
    p.add_argument("-width", type=int, default=512)
    p.add_argument("-height", type=int, default=512)
    p.add_argument("-frames", type=int, default=32, help="samples/frames to accumulate")
    p.add_argument("-max-path-length", type=int, default=5)
    p.add_argument("-output", type=str, default="output", help="output basename")
    p.add_argument("-exr", action="store_true", help="also write HDR EXR")
    p.add_argument("-no-jitter", action="store_true")
    p.add_argument("-bump", action="store_true", help="enable normal mapping")
    p.add_argument("-stats", action="store_true", help="print per-pass timings")
    p.add_argument("-live", type=int, nargs="?", const=8716, default=None,
                   metavar="PORT",
                   help="serve a live progressive view over HTTP (the "
                        "streaming stand-in for the reference's GLFW/ImGui "
                        "window; default port 8716)")
    p.add_argument("-traversal", type=str, default=None,
                   choices=["skip", "widerow", "qrow", "instanced"],
                   help="acceleration-structure format (default: widerow "
                        "for static scenes, skip for animated)")
    p.add_argument("-spatial-splits", action="store_true",
                   help="SBVH spatial splits at BVH build")
    p.add_argument("-rebraid", type=float, default=0.0,
                   help="TLAS rebraiding budget for -traversal instanced: "
                        "open the largest instances into ~REBRAID x "
                        "n_instances subtree entries (reference: "
                        "common/bvh_builder.h:68-75); 0/1 disables")
    p.add_argument("-fused-shadow-rays", action="store_true",
                   help="batch NEE shadow rays with the next bounce's "
                        "closest rays in one traversal launch")
    p.add_argument("-texture-lod", action="store_true",
                   help="trilinear mip LOD for material textures")
    p.add_argument("-denoise", action="store_true",
                   help="denoise the accumulated beauty every frame with the "
                        "SVGF stack (the TPU-native stand-in for the "
                        "reference's OptiX temporal denoiser, "
                        "path_tracing_main.cpp:1094-1141,1801-1829)")
    p.add_argument("-debug-switches", type=int, default=0,
                   help="8-bit runtime debug bitfield forwarded into kernels "
                        "(reference: PerFramePipelineLaunchParameters::"
                        "debugSwitches). PT: bit0=no NEE, bit1=no implicit "
                        "light, bit2=no Russian roulette")
    # camera
    p.add_argument("-cam-pos", type=float, nargs=3, default=[0.0, 0.0, 3.16])
    p.add_argument("-cam-roll", type=float, default=0.0)
    p.add_argument("-cam-pitch", type=float, default=0.0)
    p.add_argument("-cam-yaw", type=float, default=180.0,
                   help="default 180: identity orientation looks +z, scenes "
                        "sit toward -z (reference convention)")
    p.add_argument("-fov", type=float, default=50.0, help="vertical fov (deg)")
    p.add_argument("-brightness", type=float, default=1.0)
    p.add_argument("-env-texture", type=str, default=None)
    p.add_argument("-env-power", type=float, default=1.0)
    # scene DSL args (-name/-obj/-rectangle/-sphere/-emittance/-inst/...) are
    # intentionally NOT registered: parse with parse_scene_args() so unknown
    # options flow to the DSL parser (reference parses argv by hand)
    return p


def parse_scene_args(parser, argv=None):
    """parse_known_args wrapper: returns (args, scene_dsl_leftovers)."""
    args, rest = parser.parse_known_args(argv)
    args.scene_args = rest
    return args


def euler_orientation(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """Reference camera orientation: qRotateZ(roll) * qRotateX(pitch) *
    qRotateY(yaw) applied in camera convention; returns [3,3] camera-to-world
    with the (left, up, forward) column layout of render/camera.py."""
    cr, sr = math.cos(roll), math.sin(roll)
    cp, sp = math.cos(pitch), math.sin(pitch)
    cy, sy = math.cos(yaw), math.sin(yaw)
    rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    return (ry @ rx @ rz).astype(np.float32)


def build_scene_from_dsl(args, extra_argv: List[str]):
    """Parse the reference scene DSL from leftover argv and build the scene.
    Returns (SceneBuilder, controllers)."""
    from gfxexp_tpu.scene.animation import InstanceController
    from gfxexp_tpu.scene.builder import SceneBuilder, affine
    from gfxexp_tpu.scene.loaders import load_obj

    b = SceneBuilder(texture_mips=getattr(args, "texture_lod", False))
    controllers: List[InstanceController] = []
    named = {}  # name -> geometry group (list of geometry ids)
    pending_name = "unnamed"
    pending_emittance = (0.0, 0.0, 0.0)

    i = 0
    argv = list(extra_argv)
    n_used_instances = 0

    def floats(k):
        nonlocal i
        vals = [float(argv[i + 1 + j]) for j in range(k)]
        i += k
        return vals

    while i < len(argv):
        a = argv[i]
        if a == "-name":
            pending_name = argv[i + 1]
            i += 1
        elif a == "-emittance":
            pending_emittance = tuple(floats(3))
        elif a == "-obj":
            path = argv[i + 1]
            scale = float(argv[i + 2])
            convention = argv[i + 3] if i + 3 < len(argv) and not argv[i + 3].startswith("-") else "trad"
            i += 3 if convention in ("trad", "simple_pbr") else 2
            geoms = load_obj(path, b, material_convention=convention)
            named[pending_name] = (geoms, scale)
        elif a == "-rectangle":
            w, d = floats(2)
            mat = b.add_lambert_material((0.0, 0.0, 0.0),
                                         emittance=pending_emittance)
            geom = b.add_rectangle(w, d, mat)
            named[pending_name] = ([geom], 1.0)
            pending_emittance = (0.0, 0.0, 0.0)
        elif a == "-sphere":
            (r,) = floats(1)
            mat = b.add_lambert_material((0.0, 0.0, 0.0),
                                         emittance=pending_emittance)
            geom = b.add_sphere(r, mat)
            named[pending_name] = ([geom], 1.0)
            pending_emittance = (0.0, 0.0, 0.0)
        elif a == "-inst":
            name = argv[i + 1]
            i += 1
            geoms, base_scale = named[name]
            # look ahead for animation/placement args
            pos = [0.0, 0.0, 0.0]
            begin_pos = end_pos = None
            begin_scale = end_scale = 1.0
            freq = 1.0
            t0 = 0.0
            while i + 1 < len(argv) and argv[i + 1].startswith("-"):
                k = argv[i + 1]
                if k == "-position":
                    i += 1
                    pos = floats(3)
                elif k == "-begin-pos":
                    i += 1
                    begin_pos = floats(3)
                elif k == "-end-pos":
                    i += 1
                    end_pos = floats(3)
                elif k == "-begin-scale":
                    i += 1
                    begin_scale = floats(1)[0]
                elif k == "-end-scale":
                    i += 1
                    end_scale = floats(1)[0]
                elif k == "-freq":
                    i += 1
                    freq = floats(1)[0]
                elif k == "-time":
                    i += 1
                    t0 = floats(1)[0]
                else:
                    break
            inst = b.add_instance(
                geoms, affine(scale=base_scale, translation=pos))
            if begin_pos is not None or end_pos is not None:
                controllers.append(InstanceController(
                    instance=inst,
                    begin_position=tuple(begin_pos or pos),
                    end_position=tuple(end_pos or begin_pos or pos),
                    begin_scale=begin_scale * base_scale,
                    end_scale=end_scale * base_scale,
                    frequency=freq, initial_time=t0,
                ))
            n_used_instances += 1
        i += 1

    # auto-instantiate groups never explicitly instanced (reference does the
    # same for bare -obj usage)
    if n_used_instances == 0:
        for name, (geoms, scale) in named.items():
            b.add_instance(geoms, affine(scale=scale))

    if args.env_texture:
        from gfxexp_tpu.utils.image_io import load_exr

        b.set_environment(load_exr(args.env_texture)[:, :, :3],
                          power_coeff=args.env_power)
    return b, controllers


def make_camera_from_args(args):
    from gfxexp_tpu.render.camera import make_camera

    orientation = euler_orientation(
        math.radians(args.cam_roll), math.radians(args.cam_pitch),
        math.radians(args.cam_yaw))
    return make_camera(args.cam_pos, fov_y=math.radians(args.fov),
                       aspect=args.width / args.height,
                       orientation=orientation)


class PassTimer:
    """Per-pass wall-clock stats with moving averages (reference:
    GPUTimer + MovingAverageTime, common_host.h:464; stats window
    path_tracing_main.cpp:1641-1680). Forces device sync per measured pass."""

    def __init__(self, window: int = 60):
        self.window = window
        self.samples = {}

    def measure(self, name: str, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        try:
            import jax

            # block_until_ready can return early on this TPU runtime; a host
            # copy of one output leaf is a real fence (one executable's
            # outputs complete together)
            leaves = jax.tree_util.tree_leaves(out)
            if leaves:
                np.asarray(leaves[0])
        except Exception:
            pass
        dt = (time.time() - t0) * 1000.0
        self.samples.setdefault(name, []).append(dt)
        if len(self.samples[name]) > self.window:
            self.samples[name].pop(0)
        return out

    def report(self) -> str:
        parts = []
        for name, vals in self.samples.items():
            parts.append(f"{name}: {np.mean(vals):.2f} ms")
        return ", ".join(parts)


def maybe_viewer(args):
    """Returns a LiveViewer when -live was requested, else None."""
    if getattr(args, "live", None) is None:
        return None
    from gfxexp_tpu.utils.viewer import LiveViewer

    return LiveViewer(port=args.live)


def viewer_update(viewer, film_beauty, frame: int, brightness: float = 1.0):
    if viewer is not None:
        viewer.update(np.asarray(film_beauty), frame=frame,
                      brightness=brightness)


def maybe_camera_rig(args, viewer):
    """An interactive CameraRig when a live viewer is attached (the
    reference's WASD+mouse camera, path_tracing_main.cpp:1359-1436);
    None for plain offline renders."""
    if viewer is None:
        return None
    import math as _math

    from gfxexp_tpu.utils.viewer import CameraRig

    # derive an orbit target from the CLI camera: a point along the view
    # direction at a plausible focus distance
    cam_pos = np.asarray(args.cam_pos, np.float64)
    ori = euler_orientation(
        _math.radians(args.cam_roll), _math.radians(args.cam_pitch),
        _math.radians(args.cam_yaw))
    fwd = np.asarray(ori, np.float64) @ np.asarray([0.0, 0.0, -1.0])
    dist = max(float(np.linalg.norm(cam_pos)), 1.0)
    rig = CameraRig(cam_pos, cam_pos + fwd * dist)
    rig.debug_switches = int(getattr(args, "debug_switches", 0))
    return rig


def rig_step(rig, viewer, args, film, make_film_fn):
    """Drain viewer events into the rig; on camera change return a fresh
    (camera, film, debug_switches) with accumulation reset — the
    reference's resetAccumulation-on-move. No-op (returns None camera)
    when nothing changed."""
    import math as _math

    if rig is None or viewer is None:
        return None, film, None
    changed = rig.apply(viewer.drain_events())
    if not changed and not rig.reset_requested:
        return None, film, None
    rig.reset_requested = False
    camera = rig.make_camera(_math.radians(args.fov),
                             args.width / args.height)
    return camera, make_film_fn(args.width, args.height), rig.debug_switches


def save_outputs(args, hdr_image: np.ndarray):
    """PNG (+EXR) output (reference: screenshot save SDR/HDR,
    path_tracing_main.cpp:1469-1497)."""
    from gfxexp_tpu.utils.image_io import save_exr, save_png

    out = args.output
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    sdr = np.clip(hdr_image * args.brightness, 0.0, 1.0)
    save_png(out + ".png", sdr)
    if args.exr:
        save_exr(out + ".exr", hdr_image)
    print(f"wrote {out}.png" + (f" and {out}.exr" if args.exr else ""))


class Denoiser:
    """Per-frame SVGF denoiser for the non-SVGF apps (reference: every app
    runs the OptiX temporal denoiser on its beauty buffer each frame —
    path_tracing_main.cpp:1094-1141 setup, :1801-1829 invoke; here the SVGF
    stack IS the denoiser, SURVEY §7 phase 2). Owns its temporal state and
    the G-buffer needed for guides/demodulation; call step() once per frame
    with the current accumulated HDR beauty [H, W, 3]."""

    def __init__(self, width: int, height: int, taa: bool = False):
        from gfxexp_tpu.techniques.svgf import SVGFConfig, make_svgf_state

        # accumulated input is already temporally averaged: keep the à-trous
        # spatial stages + reprojection-validated EMA, skip TAA by default
        # (it double-smooths a converged accumulation)
        self.cfg = SVGFConfig(enable_taa=taa)
        self.state = make_svgf_state(width, height)
        self.width, self.height = width, height
        self.prev_camera = None

    def step(self, scene, bvh, camera, frame: int, hdr, timer=None,
             jitter: bool = False, gb=None):
        """Returns the denoised [H, W, 3] image; updates temporal state."""
        import jax.numpy as jnp

        from gfxexp_tpu.render.gbuffer import render_gbuffer
        from gfxexp_tpu.techniques.svgf import svgf_frame

        prev_camera = self.prev_camera if self.prev_camera is not None else camera
        if gb is None:
            if timer is not None:
                gb = timer.measure(
                    "gbuffer", render_gbuffer, scene, bvh, camera,
                    prev_camera, self.width, self.height,
                    jnp.uint32(frame), jitter)
            else:
                gb = render_gbuffer(scene, bvh, camera, prev_camera,
                                    self.width, self.height,
                                    jnp.uint32(frame), jitter)
        hdr = jnp.asarray(hdr).reshape(self.height, self.width, 3)
        if timer is not None:
            final, self.state = timer.measure(
                "denoise", svgf_frame, self.state, gb, hdr, self.cfg)
        else:
            final, self.state = svgf_frame(self.state, gb, hdr, self.cfg)
        self.prev_camera = camera
        return final


def maybe_denoiser(args):
    """A Denoiser when -denoise was requested, else None."""
    if not getattr(args, "denoise", False):
        return None
    return Denoiser(args.width, args.height)


def pick_info(scene, gb, x: int, y: int) -> dict:
    """Pixel inspection (reference: pick info readback under the mouse,
    path_tracing_main.cpp:1541-1567 + PickInfo struct)."""
    import jax.numpy as jnp

    mat = int(gb.material[y, x])
    info = {
        "pixel": (x, y),
        "hit": bool(gb.hit[y, x]),
        "instance": int(scene.units.instance[int(gb.unit[y, x])]) if int(gb.unit[y, x]) >= 0 else -1,
        "unit": int(gb.unit[y, x]),
        "triangle": int(gb.tri[y, x]),
        "material": mat,
        "position": np.asarray(gb.position[y, x]).tolist(),
        "normal": np.asarray(gb.normal[y, x]).tolist(),
        "albedo": np.asarray(gb.albedo[y, x]).tolist(),
        "emittance": (np.asarray(scene.materials.emittance[mat]).tolist()
                      if mat >= 0 else [0, 0, 0]),
    }
    return info


def default_demo_builder():
    """Fallback scene when no DSL was given: the classic box + lamp."""
    from gfxexp_tpu.scene.builder import SceneBuilder, affine

    b = SceneBuilder()
    wall = b.add_lambert_material((0.7, 0.7, 0.7))
    light = b.add_lambert_material((0, 0, 0), emittance=(20.0, 20.0, 20.0))
    s = 2.0
    flipx = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float64)
    b.add_instance(b.add_rectangle(2 * s, 2 * s, wall), affine(translation=[0, -s, 0]))
    b.add_instance(b.add_rectangle(2 * s, 2 * s, wall),
                   affine(rotation=flipx, translation=[0, s, 0]))
    rot_zp = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    b.add_instance(b.add_rectangle(2 * s, 2 * s, wall),
                   affine(rotation=rot_zp, translation=[0, 0, -s]))
    rot_xp = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float64)
    b.add_instance(b.add_rectangle(2 * s, 2 * s, wall),
                   affine(rotation=rot_xp, translation=[-s, 0, 0]))
    rot_xm = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    b.add_instance(b.add_rectangle(2 * s, 2 * s, wall),
                   affine(rotation=rot_xm, translation=[s, 0, 0]))
    b.add_instance(b.add_rectangle(0.8, 0.8, light),
                   affine(rotation=flipx, translation=[0, s - 0.01, 0]))
    return b
