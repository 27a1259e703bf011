"""Counter-based per-lane RNG.

The reference carries a per-pixel PCG32 state through frames
(reference: common_shared.h:116 `PCG32RNG`, 64-bit LCG state). 64-bit integer
math is awkward on TPU (no native u64 without x64 mode), so we use the
counter-based PCG4D / PCG3D hashes (Jarzynski & Olano, JCGT 2020) — pure u32
mults, fully stateless and parallel: every random draw is
`hash(pixel, frame/sample, bounce, dim)`. This is TPU-idiomatic (no carried
state, perfect for lax.scan bodies) and gives reproducible streams for golden
tests.

All functions operate on uint32 arrays of any (broadcastable) shape.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x).astype(U32)


def pcg4d(v0, v1, v2, v3):
    """PCG4D hash: four u32 in, four decorrelated u32 out."""
    x = _u32(v0)
    y = _u32(v1)
    z = _u32(v2)
    w = _u32(v3)
    mul = U32(1664525)
    add = U32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    w = w * mul + add
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def pcg3d(v0, v1, v2):
    x = _u32(v0)
    y = _u32(v1)
    z = _u32(v2)
    mul = U32(1664525)
    add = U32(1013904223)
    x = x * mul + add
    y = y * mul + add
    z = z * mul + add
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


def bits_to_unit_float(bits):
    """u32 -> float32 in [0, 1) with 24-bit precision."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def uniform4(v0, v1, v2, v3):
    """Four independent U[0,1) floats from a 4D counter."""
    a, b, c, d = pcg4d(v0, v1, v2, v3)
    return (
        bits_to_unit_float(a),
        bits_to_unit_float(b),
        bits_to_unit_float(c),
        bits_to_unit_float(d),
    )


class SampleStream:
    """Convenience wrapper: a 3-component counter (lane, sample, stream) plus an
    auto-incrementing dimension index, mirroring how the reference draws
    successive `rng.getFloat0cTo1o()` values from a carried PCG32 state.

    Usage inside a traced function:
        rs = SampleStream(pixel_idx, sample_idx, stream_id)
        u0 = rs.next()           # scalar-per-lane U[0,1)
        u1, u2 = rs.next2()
    The dimension counter is Python-side (static), so each call sites a new
    independent hash — no carried state through the computation graph.
    """

    def __init__(self, lane, sample, stream=0):
        self._lane = _u32(lane)
        self._sample = _u32(sample)
        self._stream = _u32(stream)
        self._dim = 0
        # one pcg4d evaluation yields FOUR decorrelated u32 streams; buffer
        # all of them so consecutive draws cost 1/4 of a hash each (a hash
        # is ~24 u32 vector ops per lane — measurable at 262k lanes)
        self._buf = []

    def _next_raw(self):
        if not self._buf:
            self._buf = list(pcg4d(self._lane, self._sample, self._stream,
                                   U32(self._dim)))
            self._dim += 1
        return self._buf.pop(0)

    def next(self):
        return bits_to_unit_float(self._next_raw())

    def next2(self):
        return self.next(), self.next()

    def next3(self):
        return self.next(), self.next(), self.next()

    def next_bits(self):
        return self._next_raw()
