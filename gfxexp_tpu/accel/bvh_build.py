"""Host-side wide-BVH construction.

TPU-native counterpart of the reference's software BVH builder
(reference: common/bvh_builder.h/.cpp — binned SAH object splits
`findBestObjectSplit`:213, arity-{2,4,8} wide nodes; node formats in
common_shared.h:757 `CompressedInternalNode_T`). The reference uses it for
shell-mapping BVHs and as a CPU reference; here the software BVH is the *only*
acceleration structure (no RT cores), so it backs all traversal.

Build pipeline: binned-SAH BVH2 (numpy, host) -> collapse to arity-K wide
nodes -> flat SoA arrays ordered so that leaf triangles are contiguous. The
output includes per-node depth so device-side refit (scene/animation.py) can
sweep bottom-up level by level.

A native C++ builder with the same output layout lives in native/ (used when
built; this numpy path is the always-available fallback and the test oracle).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

_N_BINS = 16


@struct.dataclass
class BVH:
    """Arity-K wide BVH, SoA. child_count semantics: -1 empty slot, 0 internal
    (child_idx = node index), >0 leaf (child_idx = first triangle,
    child_count = #tris; triangles are permuted into leaf order)."""

    child_min: jnp.ndarray  # [N, K, 3] float32
    child_max: jnp.ndarray  # [N, K, 3] float32
    child_idx: jnp.ndarray  # [N, K] int32
    child_count: jnp.ndarray  # [N, K] int32
    # static metadata (not traced)
    max_depth: int = struct.field(pytree_node=False, default=32)
    arity: int = struct.field(pytree_node=False, default=4)
    max_leaf: int = struct.field(pytree_node=False, default=4)

    @property
    def num_nodes(self):
        return self.child_idx.shape[0]


class _Bvh2(NamedTuple):
    # flat BVH2; leaf if count > 0 (left = first primitive in permuted order)
    mins: np.ndarray  # [N, 3]
    maxs: np.ndarray  # [N, 3]
    left: np.ndarray  # [N]
    right: np.ndarray  # [N]
    count: np.ndarray  # [N]
    perm: np.ndarray  # [T] primitive permutation


def _build_bvh2(tri_min: np.ndarray, tri_max: np.ndarray, max_leaf: int) -> _Bvh2:
    n_tris = tri_min.shape[0]
    centroid = 0.5 * (tri_min + tri_max)
    perm = np.arange(n_tris)

    mins, maxs, left, right, count = [], [], [], [], []

    def alloc():
        mins.append(None)
        maxs.append(None)
        left.append(0)
        right.append(0)
        count.append(0)
        return len(mins) - 1

    # (node_id, start, end)
    root = alloc()
    stack = [(root, 0, n_tris)]
    while stack:
        node, start, end = stack.pop()
        ids = perm[start:end]
        bmin = tri_min[ids].min(axis=0)
        bmax = tri_max[ids].max(axis=0)
        mins[node] = bmin
        maxs[node] = bmax
        n = end - start
        if n <= max_leaf:
            left[node] = start
            count[node] = n
            continue
        cen = centroid[ids]
        cmin = cen.min(axis=0)
        cmax = cen.max(axis=0)
        extent = cmax - cmin
        axis = int(np.argmax(extent))
        if extent[axis] <= 1e-12:
            # degenerate: median split
            order = np.argsort(cen[:, axis], kind="stable")
            mid = n // 2
        else:
            # binned SAH (reference: findBestObjectSplit, bvh_builder.cpp:213)
            scale = _N_BINS * (1.0 - 1e-6) / extent[axis]
            bins = np.clip(((cen[:, axis] - cmin[axis]) * scale).astype(np.int32), 0, _N_BINS - 1)
            bin_count = np.bincount(bins, minlength=_N_BINS)
            bin_min = np.full((_N_BINS, 3), np.inf)
            bin_max = np.full((_N_BINS, 3), -np.inf)
            for b in range(_N_BINS):
                sel = bins == b
                if bin_count[b]:
                    bin_min[b] = tri_min[ids[sel]].min(axis=0)
                    bin_max[b] = tri_max[ids[sel]].max(axis=0)
            # prefix/suffix areas
            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                d[~np.isfinite(d)] = 0.0
                return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0])

            lcnt = np.cumsum(bin_count)
            cost = area(lmin, lmax)[:-1] * lcnt[:-1] + area(rmin, rmax)[1:] * (n - lcnt[:-1])
            best = int(np.argmin(cost))
            go_left = bins <= best
            mid = int(go_left.sum())
            if mid == 0 or mid == n:
                order = np.argsort(cen[:, axis], kind="stable")
                mid = n // 2
            else:
                order = np.argsort(~go_left, kind="stable")
        perm[start:end] = ids[order]
        l_node = alloc()
        r_node = alloc()
        left[node] = l_node
        right[node] = r_node
        stack.append((l_node, start, start + mid))
        stack.append((r_node, start + mid, end))

    return _Bvh2(
        mins=np.stack(mins),
        maxs=np.stack(maxs),
        left=np.asarray(left, np.int64),
        right=np.asarray(right, np.int64),
        count=np.asarray(count, np.int64),
        perm=perm,
    )


def _collapse_to_wide(b2: _Bvh2, arity: int) -> Tuple[np.ndarray, ...]:
    """Collapse BVH2 to arity-K by pulling up children (largest-area first),
    matching the wide-node construction in the reference builder."""

    def area(i):
        d = np.maximum(b2.maxs[i] - b2.mins[i], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    child_min, child_max, child_idx, child_count = [], [], [], []
    node_depth = []

    def alloc():
        child_min.append(np.zeros((arity, 3), np.float32))
        child_max.append(np.zeros((arity, 3), np.float32))
        child_idx.append(np.zeros(arity, np.int32))
        child_count.append(np.full(arity, -1, np.int32))
        node_depth.append(0)
        return len(child_idx) - 1

    root = alloc()
    max_depth = 1
    # stack of (wide_node, bvh2_node, depth)
    stack = [(root, 0, 1)]
    while stack:
        wnode, b2node, depth = stack.pop()
        node_depth[wnode] = depth
        max_depth = max(max_depth, depth)
        # gather up to `arity` BVH2 subtrees
        group = [b2node] if b2.count[b2node] > 0 else [b2.left[b2node], b2.right[b2node]]
        while len(group) < arity:
            # expand the internal child with the largest surface area
            candidates = [g for g in group if b2.count[g] == 0]
            if not candidates:
                break
            pick = max(candidates, key=area)
            group.remove(pick)
            group.extend([b2.left[pick], b2.right[pick]])
        for k, g in enumerate(group):
            child_min[wnode][k] = b2.mins[g]
            child_max[wnode][k] = b2.maxs[g]
            if b2.count[g] > 0:
                child_idx[wnode][k] = b2.left[g]
                child_count[wnode][k] = b2.count[g]
            else:
                sub = alloc()
                child_idx[wnode][k] = sub
                child_count[wnode][k] = 0
                stack.append((sub, g, depth + 1))

    return (
        np.stack(child_min),
        np.stack(child_max),
        np.stack(child_idx),
        np.stack(child_count),
        np.asarray(node_depth, np.int32),
        max_depth,
    )


def build_bvh_arrays(
    tri_min: np.ndarray, tri_max: np.ndarray, arity: int = 4, max_leaf: int = 4
):
    """Pure-numpy build; returns (child_min, child_max, child_idx, child_count,
    perm, max_depth). Exposed separately so tests can check invariants."""
    b2 = _build_bvh2(np.asarray(tri_min, np.float64), np.asarray(tri_max, np.float64), max_leaf)
    cmin, cmax, cidx, ccount, _, max_depth = _collapse_to_wide(b2, arity)
    return cmin, cmax, cidx, ccount, b2.perm, max_depth


def build_bvh(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray, arity: int = 4,
              max_leaf: int = 4, use_native: bool = True):
    """Build from triangle soup (p0, e1=p1-p0, e2=p2-p0 as in TriangleSoA).

    Returns (BVH, perm) — callers must permute their per-triangle arrays by
    `perm` so that leaves reference contiguous triangle ranges.

    Uses the native C++ builder (accel/native.py) when available; the numpy
    path is the always-available fallback and the test oracle.
    """
    p0 = np.asarray(p0)
    p1 = p0 + np.asarray(e1)
    p2 = p0 + np.asarray(e2)
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    # epsilon-pad degenerate (axis-aligned flat) boxes
    pad = 1e-7 * np.maximum(1.0, np.abs(tri_max))
    result = None
    if use_native:
        from gfxexp_tpu.accel.native import build_bvh_arrays_native

        result = build_bvh_arrays_native(
            tri_min - pad, tri_max + pad, arity=arity, max_leaf=max_leaf
        )
    if result is None:
        result = build_bvh_arrays(
            tri_min - pad, tri_max + pad, arity=arity, max_leaf=max_leaf
        )
    cmin, cmax, cidx, ccount, perm, max_depth = result
    bvh = BVH(
        child_min=jnp.asarray(cmin, jnp.float32),
        child_max=jnp.asarray(cmax, jnp.float32),
        child_idx=jnp.asarray(cidx, jnp.int32),
        child_count=jnp.asarray(ccount, jnp.int32),
        max_depth=int(max_depth),
        arity=int(arity),
        max_leaf=int(max_leaf),
    )
    return bvh, perm
