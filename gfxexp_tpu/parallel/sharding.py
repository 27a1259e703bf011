"""Multi-chip scaling: image-plane sharding over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.4); this is the new
capability the TPU port adds. Design (SURVEY.md §7 phase 6 / "How to Scale
Your Model" recipe): the scene + BVH are small relative to HBM and are
REPLICATED on every chip; the image plane (ray lanes) is SHARDED — rendering
is embarrassingly parallel per pixel, so the only collectives are stats
reductions (psum) and, later, halo exchange for SVGF stencils and gradient
psum for NRC training.

Implemented with `jax.shard_map` over a 1-D mesh axis "tiles": each device
renders its contiguous lane range via render_lanes(lane_start =
axis_index * lanes_per_device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gfxexp_tpu.render.pathtrace import PTConfig, render_lanes

AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (AXIS,))


@functools.lru_cache(maxsize=32)
def _sharded_render_fn(mesh: Mesh, width: int, height: int, cfg: PTConfig):
    n_dev = mesh.devices.size
    lanes_per = (width * height) // n_dev

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),  # scene/bvh/camera/sample replicated
        out_specs=P(AXIS),
        # the traversal while_loop carries are initialized from constants
        # (replicated) and become device-varying through lane_start; skip the
        # varying-manual-axes strictness check
        check_vma=False,
    )
    def tile_fn(scene_, bvh_, camera_, sample_):
        d = jax.lax.axis_index(AXIS)
        out = render_lanes(
            scene_, bvh_, camera_, width, height,
            d.astype(jnp.uint32) * jnp.uint32(lanes_per), lanes_per,
            sample_, cfg,
        )
        return out

    # jit is REQUIRED, not a nicety: an eager shard_map call dispatches
    # primitive-by-primitive (one tiny XLA program each — measured 316s vs
    # 8s for the whole jitted pipeline on the CPU mesh)
    return jax.jit(tile_fn)


def render_sample_sharded(
    mesh: Mesh,
    scene,
    bvh,
    camera,
    width: int,
    height: int,
    sample_idx,
    cfg: PTConfig = PTConfig(),
):
    """One sample per pixel, image rows sharded across the mesh. Returns a
    fully-addressable [H*W, 3] array sharded over lanes."""
    total = width * height
    assert total % mesh.devices.size == 0, (total, mesh.devices.size)
    fn = _sharded_render_fn(mesh, width, height, cfg)
    return fn(scene, bvh, camera, jnp.asarray(sample_idx, jnp.uint32))


def nrc_train_step_dp(mesh: Mesh, state, query, target, mask, nrc_cfg):
    """Data-parallel NRC training over the mesh: batch sharded on AXIS,
    parameters replicated, ONE fused gradient all-reduce (the renderer's
    analogue of dp training; SURVEY.md §5 distributed backend).

    Written as an explicit shard_map + a single psum over the flattened
    (loss, count, grads) pytree rather than pjit auto-sharding: one
    collective per step is both the efficient ICI pattern (one ring pass
    over a contiguous buffer) and the only shape that executes reliably on
    hosts with fewer cores than virtual devices (XLA:CPU's rendezvous
    starves when several all-reduces interleave on one worker thread).
    Returns (new_state, loss)."""
    return _nrc_dp_step_fn(mesh, nrc_cfg)(state, query, target, mask)


def svgf_frame_sharded(mesh: Mesh, state, gb, lighting, cfg=None):
    """One SVGF frame with the à-trous stencil pyramid SHARDED over image
    rows and explicit halo exchange via jax.lax.ppermute (SURVEY §5
    distributed backend; the per-stage halo is radius*step+1 rows of
    color/variance/guides traded with the two row-neighbors over ICI).

    The temporal passes (reprojection gather, variance estimation, TAA)
    stay replicated — they are one cheap gather/stencil each, while the
    5-stage filter pyramid is the HBM-bandwidth hot loop worth sharding.
    Bit-parity with techniques.svgf.svgf_frame is tested on the 8-device
    CPU mesh (tests/test_parallel.py)."""
    from gfxexp_tpu.techniques.svgf import SVGFConfig, svgf_frame

    if cfg is None:
        cfg = SVGFConfig()

    # all pre/post logic (temporal accumulate, demodulation, feedback
    # selection, TAA, state construction) is svgf_frame's — only the
    # à-trous pyramid driver is substituted, so the two paths cannot drift.
    # The pyramid closure is cached by mesh: pyramid_fn is a STATIC jit
    # argument of svgf_frame, so a fresh closure per call would retrace.
    return svgf_frame(state, gb, lighting, cfg,
                      pyramid_fn=_sharded_pyramid_fn(mesh))


@functools.lru_cache(maxsize=8)
def _sharded_pyramid_fn(mesh: Mesh):
    from gfxexp_tpu.techniques.svgf import _depth_gradients

    def pyramid(noisy, variance, gb_, cfg_):
        dzdx, dzdy = _depth_gradients(jnp.where(gb_.hit, gb_.depth, jnp.inf))
        height, width = gb_.depth.shape
        fn = _atrous_sharded_fn(mesh, height, width, cfg_)
        return fn(noisy, variance, gb_.depth, gb_.normal, gb_.hit,
                  dzdx, dzdy)

    return pyramid


@functools.lru_cache(maxsize=16)
def _atrous_sharded_fn(mesh: Mesh, height: int, width: int, cfg):
    from gfxexp_tpu.techniques.svgf import (
        ATROUS_GAUSS5, _STEP_WIDTHS, _atrous_stage_core)

    n_dev = mesh.devices.size
    assert height % n_dev == 0, (height, n_dev)
    rows_per = height // n_dev
    radius = 2 if cfg.atrous_kernel == ATROUS_GAUSS5 else 1
    steps = _STEP_WIDTHS[: cfg.num_filter_stages]
    max_halo = max(radius * s + 1 for s in steps) if steps else 0
    # one ppermute hop reaches only the adjacent row block; deeper filter
    # stages than the shard height would need multi-hop halos
    assert max_halo <= rows_per, (
        f"à-trous halo {max_halo} rows exceeds the {rows_per}-row shard; "
        f"use a taller image, fewer devices, or fewer filter stages")

    fwd = [(i, i + 1) for i in range(n_dev - 1)]
    bwd = [(i, i - 1) for i in range(1, n_dev)]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)),
        check_vma=False,
    )
    def fn(color, variance, depth, normal, hit, dzdx, dzdy):
        def pad(x, h):
            # rows ABOVE my block = previous device's bottom rows; rows
            # BELOW = next device's top rows. ppermute zero-fills at the
            # mesh edges, which matches _shift's zero fill at the image
            # border because every à-trous tap is gated by nb_hit (zeros
            # -> False -> weight 0)
            top = jax.lax.ppermute(x[-h:], AXIS, fwd)
            bot = jax.lax.ppermute(x[:h], AXIS, bwd)
            return jnp.concatenate([top, x, bot], axis=0)

        first_filtered = color
        for si, step in enumerate(steps):
            h = radius * step + 1
            c2, v2 = _atrous_stage_core(
                pad(color, h), pad(variance, h), pad(depth, h),
                pad(normal, h), pad(hit, h), pad(dzdx, h), pad(dzdy, h),
                step, cfg)
            color, variance = c2[h:-h], v2[h:-h]
            if si == 0:
                first_filtered = color
        return color, first_filtered

    return jax.jit(fn)  # jit required: eager shard_map dispatches per-primitive


@functools.lru_cache(maxsize=8)
def _nrc_dp_step_fn(mesh: Mesh, nrc_cfg):
    import optax
    from jax.flatten_util import ravel_pytree

    from gfxexp_tpu.techniques.nrc.network import apply, make_optimizer

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(state_, q, t, m):
        def loss_fn(params):
            pred = apply(params, q, nrc_cfg)
            lum = (
                0.2126 * pred[..., 0] + 0.7152 * pred[..., 1]
                + 0.0722 * pred[..., 2]
            )
            denom = jax.lax.stop_gradient(lum * lum) + 0.01
            per = jnp.sum((pred - t) ** 2, axis=-1) / denom
            return jnp.sum(jnp.where(m, per, 0.0))  # local sum, psum'd below

        loss_sum, grads = jax.value_and_grad(loss_fn)(state_["params"])
        n_valid = jnp.sum(m).astype(jnp.float32)
        flat, unravel = ravel_pytree((loss_sum, n_valid, grads))
        loss_sum, n_valid, grads = unravel(jax.lax.psum(flat, AXIS))
        inv_n = 1.0 / jnp.maximum(n_valid, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g * inv_n, grads)

        tx = make_optimizer(nrc_cfg)
        updates, new_opt = tx.update(grads, state_["opt"], state_["params"])
        new_params = optax.apply_updates(state_["params"], updates)
        d = nrc_cfg.ema_decay
        new_ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, state_["ema"], new_params
        )
        new_state = {
            "params": new_params,
            "ema": new_ema,
            "opt": new_opt,
            "step": state_["step"] + 1,
        }
        return new_state, loss_sum * inv_n

    return jax.jit(step)  # jit required: eager shard_map dispatches per-primitive
