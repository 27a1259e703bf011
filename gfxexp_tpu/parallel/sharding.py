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
    n_dev = mesh.devices.size
    total = width * height
    assert total % n_dev == 0, (total, n_dev)
    lanes_per = total // n_dev

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

    return tile_fn(scene, bvh, camera, jnp.asarray(sample_idx, jnp.uint32))


def nrc_train_step_dp(mesh: Mesh, state, query, target, mask, nrc_cfg):
    """Data-parallel NRC training over the mesh: batch sharded on AXIS,
    parameters replicated — XLA inserts the gradient all-reduce (the
    renderer's analogue of dp training; SURVEY.md §5 distributed backend).
    Returns (new_state, loss)."""
    from jax.sharding import NamedSharding

    from gfxexp_tpu.techniques.nrc.network import train_step

    batch_sharding = NamedSharding(mesh, P(AXIS))
    replicated = NamedSharding(mesh, P())
    query = jax.device_put(query, batch_sharding)
    target = jax.device_put(target, batch_sharding)
    mask = jax.device_put(mask, batch_sharding)
    state = jax.device_put(state, replicated)
    return train_step(state, query, target, mask, nrc_cfg)
