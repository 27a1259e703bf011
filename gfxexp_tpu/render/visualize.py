"""Debug buffer visualization (reference: per-buffer display selector —
svgf_shared.h:247-256 bufferToDisplay enum + visualize.cu / copy_buffers.cu
kernelVisualizeToOutputBuffer) and the 8 generic debug switches
(PerFramePipelineLaunchParameters::debugSwitches, path_tracing_shared.h:173).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gfxexp_tpu.core.math import linear_to_srgb

BUFFER_BEAUTY = "beauty"
BUFFER_ALBEDO = "albedo"
BUFFER_NORMAL = "normal"
BUFFER_MOTION = "motion"
BUFFER_DEPTH = "depth"
BUFFER_TEXCOORD = "texcoord"
BUFFER_EMITTANCE = "emittance"
ALL_BUFFERS = (BUFFER_BEAUTY, BUFFER_ALBEDO, BUFFER_NORMAL, BUFFER_MOTION,
               BUFFER_DEPTH, BUFFER_TEXCOORD, BUFFER_EMITTANCE)


@dataclasses.dataclass(frozen=True)
class DebugSwitches:
    """8 generic debug flags forwarded into kernels (reference bitfield).

    Wired into the path tracer as a TRACED uint32 uniform (no recompile on
    toggle — the TPU analogue of the reference's per-frame launch params):
    see render_lanes(debug_switches=...) for the bit assignments, and the
    apps' `-debug-switches N` CLI flag."""

    flags: int = 0

    def get(self, i: int) -> bool:
        return bool((self.flags >> i) & 1)

    def as_uint32(self):
        return jnp.uint32(self.flags)


def visualize(mode: str, beauty=None, gbuffer=None, brightness: float = 1.0):
    """Returns a display-ready [H, W, 3] sRGB image for the selected buffer."""
    if mode == BUFFER_BEAUTY:
        return linear_to_srgb(jnp.clip(beauty * brightness, 0.0, 1.0))
    gb = gbuffer
    if mode == BUFFER_ALBEDO:
        return linear_to_srgb(jnp.clip(gb.albedo, 0.0, 1.0))
    if mode == BUFFER_NORMAL:
        return 0.5 * (gb.normal + 1.0)
    if mode == BUFFER_MOTION:
        m = gb.motion
        return jnp.stack(
            [0.5 + 0.05 * m[..., 0], 0.5 + 0.05 * m[..., 1],
             jnp.zeros_like(m[..., 0])], axis=-1)
    if mode == BUFFER_DEPTH:
        d = jnp.where(jnp.isfinite(gb.depth), gb.depth, 0.0)
        d = d / jnp.maximum(d.max(), 1e-6)
        return jnp.stack([d, d, d], axis=-1)
    if mode == BUFFER_TEXCOORD:
        tc = gb.texcoord % 1.0
        return jnp.stack([tc[..., 0], tc[..., 1], jnp.zeros_like(tc[..., 0])],
                         axis=-1)
    if mode == BUFFER_EMITTANCE:
        e = gb.emittance
        return e / (1.0 + e)
    raise ValueError(f"unknown buffer {mode!r} (choose from {ALL_BUFFERS})")
