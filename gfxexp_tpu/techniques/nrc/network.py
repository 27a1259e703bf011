"""NRC network: encoding -> 64-wide ReLU MLP -> RGB radiance, trained online
with RelativeL2Luminance loss, Adam + EMA(0.99).

Reproduces the reference's tiny-cuda-nn setup (reference:
neural_radiance_caching/network_interface.cu:47-131 — FullyFusedMLP
n_neurons=64, ReLU, no output activation, numHiddenLayers configurable
(CLI -num-hidden-layers, default 2 in neural_radiance_caching_main.cpp);
loss RelativeL2Luminance; optimizer EMA(0.99) over Adam(lr, b1=0.9, b2=0.99,
l2_reg=1e-6, eps per encoding); infer/train batches multiple of 128/256).

TPU mapping: the "fully fused" property comes for free — the whole MLP is a
chain of [B, 64] bf16 matmuls that XLA fuses onto the MXU; training is a
standard jitted value_and_grad + optax step. Inference uses the EMA params
(reference: EMA optimizer wraps inference weights)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from gfxexp_tpu.techniques.nrc import encoding as enc

NUM_INPUT_DIMS = 14  # pos(3) dir(2) normal(2) roughness(1) diffuse(3) specular(3)
NUM_OUTPUT_DIMS = 3

POSITION_ENCODING_TRIANGLE_WAVE = "triangle_wave"
POSITION_ENCODING_HASH_GRID = "hash_grid"


@dataclasses.dataclass(frozen=True)
class NRCConfig:
    # TPU-first default: TriangleWave (the original NRC-paper encoding;
    # the reference defaults to HashGrid and exposes both via CLI,
    # neural_radiance_caching_main.cpp:458,762). Measured on v5e at the
    # production batch (81920 records): hash-grid train_step 496 ms /
    # fwd 62 ms vs triangle-wave 1.2 ms / 1.0 ms — the 16x8 corner
    # lookups are 10.5M 8-byte random gathers (+ scatter-adds backward),
    # a structural ~5.7 ns/row XLA:TPU cost no layout fixes (single
    # fused gather, 1D flattening, optimization_barrier) could move
    # (perf/RESULTS_r5.md). HashGrid stays fully supported via
    # -position-encoding hash_grid.
    position_encoding: str = POSITION_ENCODING_TRIANGLE_WAVE
    num_hidden_layers: int = 2
    learning_rate: float = 1e-2
    ema_decay: float = 0.99
    width: int = 64

    @property
    def adam_eps(self):
        # reference: 1e-8 for TriangleWave, 1e-15 for HashGrid
        return 1e-8 if self.position_encoding == POSITION_ENCODING_TRIANGLE_WAVE else 1e-15

    @property
    def encoded_dims(self):
        if self.position_encoding == POSITION_ENCODING_TRIANGLE_WAVE:
            pos = 3 * enc.N_FREQUENCIES
        else:
            pos = enc.HASH_LEVELS * enc.HASH_FEATURES
        return pos + 5 * enc.ONE_BLOB_BINS + 6


def encode_query(params: Dict[str, Any], query, cfg: NRCConfig):
    """query [..., 14] -> encoded features. Layout (reference: RadianceQuery,
    neural_radiance_caching_shared.h:118): pos.xyz | dir phi,theta |
    normal phi,theta | roughness | diffuse rgb | specular rgb, all in [0,1]
    (position normalized by scene AABB upstream)."""
    pos = query[..., 0:3]
    rest5 = query[..., 3:8]
    ident6 = query[..., 8:14]
    if cfg.position_encoding == POSITION_ENCODING_TRIANGLE_WAVE:
        pos_feat = enc.triangle_wave_encoding(pos)
    else:
        pos_feat = enc.hash_grid_encoding(params["hash_table"], pos)
    return jnp.concatenate(
        [pos_feat, enc.one_blob_encoding(rest5), ident6], axis=-1
    )


def init_nrc(key, cfg: NRCConfig = NRCConfig()):
    """Returns NRCState dict: params, ema params, optimizer state."""
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    dims = [cfg.encoded_dims] + [cfg.width] * (cfg.num_hidden_layers + 1) + [
        NUM_OUTPUT_DIMS]
    params: Dict[str, Any] = {}
    if cfg.position_encoding == POSITION_ENCODING_HASH_GRID:
        params["hash_table"] = enc.init_hash_table(keys[0])
    ws = []
    for i in range(len(dims) - 1):
        # He init for ReLU nets; output layer starts at zero so the fresh
        # cache predicts 0 radiance (stabilizes the self-training loop's
        # first frames)
        w = jax.random.normal(keys[i + 1], (dims[i], dims[i + 1]), jnp.float32)
        w = w * jnp.sqrt(2.0 / dims[i])
        if i == len(dims) - 2:
            w = jnp.zeros_like(w)
        ws.append(w)
    params["weights"] = ws
    tx = make_optimizer(cfg)
    return {
        "params": params,
        "ema": jax.tree_util.tree_map(jnp.copy, params),
        "opt": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


NRCState = Dict[str, Any]


def make_optimizer(cfg: NRCConfig):
    return optax.chain(
        optax.add_decayed_weights(1e-6),  # reference: l2_reg
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=cfg.adam_eps),
        optax.scale(-cfg.learning_rate),
    )


def apply(params: Dict[str, Any], query, cfg: NRCConfig):
    """Forward pass: [B, 14] -> [B, 3] radiance. bf16 matmuls on the MXU
    with f32 accumulation (the TPU equivalent of tcnn's fp16 FullyFusedMLP)."""
    x = encode_query(params, query, cfg)
    x = x.astype(jnp.bfloat16)
    ws = params["weights"]
    for i, w in enumerate(ws):
        x = jnp.dot(x, w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if i < len(ws) - 1:
            x = jnp.maximum(x, 0.0).astype(jnp.bfloat16)
    return x


def relative_l2_luminance_loss(pred, target):
    """reference: tcnn RelativeL2Luminance — (p - t)^2 / (lum(p)^2 + 0.01),
    gradient detached through the normalizer."""
    lum = (
        0.2126 * pred[..., 0] + 0.7152 * pred[..., 1] + 0.0722 * pred[..., 2]
    )
    denom = jax.lax.stop_gradient(lum * lum) + 0.01
    return jnp.mean(jnp.sum((pred - target) ** 2, axis=-1) / denom)


@functools.partial(jax.jit, static_argnames=("cfg",))
def infer(state: NRCState, query, cfg: NRCConfig = NRCConfig()):
    """Cache lookup with the EMA (smoothed) weights."""
    return apply(state["ema"], query, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(state: NRCState, query, target, mask,
               cfg: NRCConfig = NRCConfig()):
    """One Adam step on a batch (mask selects valid records — the TPU
    replacement for the reference's dynamic-count batches). Returns
    (new_state, loss)."""

    def loss_fn(params):
        pred = apply(params, query, cfg)
        lum = (
            0.2126 * pred[..., 0] + 0.7152 * pred[..., 1]
            + 0.0722 * pred[..., 2]
        )
        denom = jax.lax.stop_gradient(lum * lum) + 0.01
        per = jnp.sum((pred - target) ** 2, axis=-1) / denom
        per = jnp.where(mask, per, 0.0)
        return jnp.sum(per) / jnp.maximum(jnp.sum(mask), 1.0)

    loss, grads = jax.value_and_grad(loss_fn)(state["params"])
    tx = make_optimizer(cfg)
    updates, new_opt = tx.update(grads, state["opt"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    d = cfg.ema_decay
    new_ema = jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p, state["ema"], new_params
    )
    return {
        "params": new_params,
        "ema": new_ema,
        "opt": new_opt,
        "step": state["step"] + 1,
    }, loss


@functools.partial(jax.jit, static_argnames=("cfg", "steps"),
                   donate_argnames=("state",))
def train_on_frame(state: NRCState, query, target, mask, key,
                   cfg: NRCConfig = NRCConfig(), steps: int = 4):
    """One frame's training: `steps` Adam steps on DISJOINT shuffled
    slices of the frame's records — the reference's exact loop
    (neural_radiance_caching_main.cpp:2350: batchSize =
    numTrainingDataPerFrame / 4, dataStartIndex advances per step, after
    the dataShufflerBuffer permutation). The r4 app trained `steps` times
    on the FULL batch — 4x the sample work and off-spec semantics.

    One jitted program: permutation + lax.scan over the mini-batches.
    Returns (new_state, mean step loss)."""
    n = query.shape[0]
    m = (n // steps) * steps
    perm = jax.random.permutation(key, n)[:m].reshape(steps, m // steps)

    def body(st, idx):
        st, loss = train_step.__wrapped__(
            st, query[idx], target[idx], mask[idx], cfg)
        return st, loss

    state, losses = jax.lax.scan(body, state, perm)
    return state, jnp.mean(losses)
