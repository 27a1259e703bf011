#!/usr/bin/env python
"""Layout probe: is [N,3] elementwise math the hidden glue cost on TPU?

Compares chained mul-add/normalize on [N,3] vs [3,N] vs flat [3N], plus the
cost of a 262k argsort + permutation gathers (ray-sorting feasibility).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfxexp_tpu.utils.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 262144
CHAIN = 32
WARM = 6
REPS = 8


def timeit(label, fn, per_call=CHAIN):
    for _ in range(WARM):
        out = fn()
    np.asarray(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn()
    np.asarray(out)
    ms = (time.time() - t0) / (REPS * per_call) * 1e3
    print(f"{label:52s} {ms:8.3f} ms/op")
    return ms


def main():
    k = jax.random.PRNGKey(0)
    a3 = jax.random.normal(k, (N, 3), jnp.float32)
    b3 = jax.random.normal(jax.random.PRNGKey(1), (N, 3), jnp.float32)
    a3t = jnp.asarray(np.asarray(a3).T.copy())
    b3t = jnp.asarray(np.asarray(b3).T.copy())
    af = a3.reshape(-1)
    bf = b3.reshape(-1)

    @jax.jit
    def chain_n3(a, b):
        x = a
        for _ in range(CHAIN):
            x = x * b + a
            x = x - 0.1 * x * x
        return x.sum()

    timeit("muladd chain [N,3]", lambda: chain_n3(a3, b3), per_call=2 * CHAIN)
    timeit("muladd chain [3,N]", lambda: chain_n3(a3t, b3t), per_call=2 * CHAIN)
    timeit("muladd chain [3N] flat", lambda: chain_n3(af, bf), per_call=2 * CHAIN)

    @jax.jit
    def norm_n3(a, b):
        x = a
        for _ in range(CHAIN):
            x = x + b
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-20)
        return x.sum()

    @jax.jit
    def norm_3n(a, b):
        x = a
        for _ in range(CHAIN):
            x = x + b
            x = x / jnp.maximum(
                jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True)), 1e-20)
        return x.sum()

    timeit("normalize chain [N,3] (axis=-1)", lambda: norm_n3(a3, b3))
    timeit("normalize chain [3,N] (axis=0)", lambda: norm_3n(a3t, b3t))

    @jax.jit
    def cross_n3(a, b):
        x = a
        for _ in range(CHAIN):
            x = jnp.cross(x, b) + a
        return x.sum()

    @jax.jit
    def cross_3n(a, b):
        x = a
        for _ in range(CHAIN):
            cx = x[1] * b[2] - x[2] * b[1]
            cy = x[2] * b[0] - x[0] * b[2]
            cz = x[0] * b[1] - x[1] * b[0]
            x = jnp.stack([cx, cy, cz]) + a
        return x.sum()

    timeit("cross chain [N,3]", lambda: cross_n3(a3, b3))
    timeit("cross chain [3,N]", lambda: cross_3n(a3t, b3t))

    # sorting feasibility: u32 key argsort + apply perm to 6 ray floats
    keys = jax.random.randint(k, (N,), 0, 1 << 20, jnp.int32)

    @jax.jit
    def sort_apply(keys, a, b):
        acc = jnp.zeros((), jnp.float32)
        for i in range(4):
            perm = jnp.argsort(keys + (acc * 0).astype(jnp.int32))
            acc = acc + a[perm].sum() + b[perm].sum()
        return acc

    timeit("argsort 262k + 2x [N,3] permute", lambda: sort_apply(keys, a3, b3),
           per_call=4)

    @jax.jit
    def sort_only(keys):
        acc = jnp.zeros((), jnp.int32)
        for i in range(4):
            perm = jnp.argsort(keys + acc * 0)
            acc = acc + perm[0]
        return acc

    timeit("argsort 262k alone", lambda: sort_only(keys), per_call=4)


if __name__ == "__main__":
    main()
