#!/usr/bin/env python
"""NRC network probe (r5): where do the 540 ms/train-step go?

Times apply() forward and train_step() for both position encodings at the
512^2 production batch size (n_train * L = 81920 records). Suspect: the
hash-grid backward is 16 levels x 8 corners = 128 scatter-adds into the
[L, 32768, 2] table — TPU scatter serializes. TriangleWave has no learned
table (pure-MXU MLP backward).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfxexp_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gfxexp_tpu.techniques.nrc import NRCConfig, init_nrc, train_step  # noqa: E402
from gfxexp_tpu.techniques.nrc.network import (  # noqa: E402
    POSITION_ENCODING_HASH_GRID, POSITION_ENCODING_TRIANGLE_WAVE, apply)

B = 81920
CHAIN = 4
WARM = 6
REPS = 8


def timeit(label, fn):
    for _ in range(WARM):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ms = (time.time() - t0) / (REPS * CHAIN) * 1e3
    print(f"{label:44s} {ms:8.2f} ms", flush=True)
    return ms


@functools.partial(jax.jit, static_argnames=("cfg",))
def fwd_chain(params, q, cfg):
    acc = jnp.zeros((), jnp.float32)
    for _ in range(CHAIN):
        acc = acc + apply(params, q + acc * 0.0, cfg).sum()
    return acc


@functools.partial(jax.jit, static_argnames=("cfg",))
def train_chain(state, q, t, m, cfg):
    loss = jnp.zeros(())
    for _ in range(CHAIN):
        state, loss = train_step(state, q + loss * 0.0, t, m, cfg)
    return state, loss


def main():
    k = jax.random.PRNGKey(0)
    q = jax.random.uniform(k, (B, 14))
    t = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))
    m = jnp.ones((B,), bool)
    for enc in (POSITION_ENCODING_HASH_GRID,
                POSITION_ENCODING_TRIANGLE_WAVE):
        cfg = NRCConfig(position_encoding=enc)
        state = init_nrc(jax.random.PRNGKey(0), cfg)
        timeit(f"apply fwd   [{enc}] B={B}",
               lambda: fwd_chain(state["params"], q, cfg))
        timeit(f"train step  [{enc}] B={B}",
               lambda: train_chain(state, q, t, m, cfg))


if __name__ == "__main__":
    main()
