"""Stackless skip-link BVH traversal — the TPU-friendly traversal scheme.

Why: the stack-based wide-node traverser (accel/traverse.py) needs a per-ray
stack scatter (`stack.at[lane, pos].set`) inside a while_loop; that scatter
lowers catastrophically on the TPU compiler (observed: >10 min compiles for a
64x64 render). Skip-link ("threaded") traversal removes ALL scatters: nodes
are laid out in DFS preorder, each with a `skip` pointer to the next preorder
node outside its subtree. Per-ray state is a single node cursor:

    hit(node.aabb) and internal -> cur + 1   (descend)
    otherwise                   -> node.skip (skip subtree)

plus masked leaf triangle tests. The loop body is pure gathers + vector math
with identical shape for every scene (no depth-dependent stack), so one
compile serves all scenes.

The skip layout is derived from the wide BVH (each non-empty child slot
becomes one skip node), so both the numpy and native builders feed it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gfxexp_tpu.accel.traverse import HitInfo, intersect_tris
from gfxexp_tpu.scene.types import TriangleSoA


@struct.dataclass
class SkipBVH:
    """DFS-preorder node array with skip links. count>0 => leaf with
    triangles [first, first+count); count==0 => internal (next = index+1).

    `depth` + static `n_levels` support device-side bottom-up refit for
    animated scenes (accel/refit.py): all children of an internal node at
    depth d sit at depth d+1 and are reached by the sibling chain
    i+1, skip[i+1], skip[skip[i+1]], ... below skip[i]."""

    aabb_min: jnp.ndarray  # [M, 3]
    aabb_max: jnp.ndarray  # [M, 3]
    first: jnp.ndarray  # [M] int32 (leaf tri offset; 0 for internal)
    count: jnp.ndarray  # [M] int32
    skip: jnp.ndarray  # [M] int32 (M = end sentinel)
    depth: jnp.ndarray  # [M] int32 (root children = 0)
    max_leaf: int = struct.field(pytree_node=False, default=4)
    n_levels: int = struct.field(pytree_node=False, default=1)
    arity: int = struct.field(pytree_node=False, default=4)

    @property
    def num_nodes(self):
        return self.first.shape[0]


def build_skip_links(child_min, child_max, child_idx, child_count,
                     max_leaf: int = 4) -> SkipBVH:
    """Flatten a wide BVH (arrays as produced by accel/bvh_build) into
    preorder skip-link nodes. Host-side numpy; O(total child slots)."""
    child_min = np.asarray(child_min)
    child_max = np.asarray(child_max)
    child_idx = np.asarray(child_idx)
    child_count = np.asarray(child_count)
    arity = child_idx.shape[1]

    amin, amax, first, count, skip, depth = [], [], [], [], [], []

    # iterative DFS: emit nodes in preorder; fix up skip pointers after
    # each subtree completes. Stack holds (wide_node, slot) work plus
    # emitted-node indices whose skip needs patching once we know the size.
    def emit(lo, hi, fi, ct, d):
        amin.append(lo)
        amax.append(hi)
        first.append(fi)
        count.append(ct)
        skip.append(-1)
        depth.append(d)
        return len(skip) - 1

    def walk(wnode: int, d: int):
        for k in range(arity):
            ct = child_count[wnode, k]
            if ct < 0:
                continue  # empty slot
            if ct > 0:
                emit(child_min[wnode, k], child_max[wnode, k],
                     int(child_idx[wnode, k]), int(ct), d)
                skip[-1] = len(skip)  # leaf: skip = next emitted node
            else:
                me = emit(child_min[wnode, k], child_max[wnode, k], 0, 0, d)
                walk(int(child_idx[wnode, k]), d + 1)
                skip[me] = len(skip)  # past my whole subtree

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        walk(0, 0)
    finally:
        sys.setrecursionlimit(old_limit)

    m = len(skip)
    if m == 0:  # degenerate single-leaf scene
        emit(np.zeros(3), np.zeros(3), 0, 0, 0)
        skip[0] = 1
        m = 1
    return SkipBVH(
        aabb_min=jnp.asarray(np.asarray(amin, np.float32)),
        aabb_max=jnp.asarray(np.asarray(amax, np.float32)),
        first=jnp.asarray(first, jnp.int32),
        count=jnp.asarray(count, jnp.int32),
        skip=jnp.asarray(skip, jnp.int32),
        depth=jnp.asarray(depth, jnp.int32),
        max_leaf=max_leaf,
        n_levels=int(max(depth) + 1) if depth else 1,
        arity=int(arity),
    )


def _traverse_skip(bvh: SkipBVH, tris: TriangleSoA, o, d, t_min, t_max,
                   any_hit: bool):
    n_rays = o.shape[0]
    n_nodes = bvh.num_nodes
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    state = (
        jnp.zeros((n_rays,), jnp.int32),  # cur node
        t_max,  # best_t
        jnp.full((n_rays,), -1, jnp.int32),  # best_tri
        jnp.zeros((n_rays,), jnp.float32),  # best_u
        jnp.zeros((n_rays,), jnp.float32),  # best_v
    )

    def cond(s):
        return jnp.any(s[0] < n_nodes)

    def body(s):
        cur, best_t, best_tri, best_u, best_v = s
        active = cur < n_nodes
        node = jnp.where(active, cur, 0)

        lo = bvh.aabb_min[node]
        hi = bvh.aabb_max[node]
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
        far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), best_t)
        box_hit = (near <= far) & active

        cnt = bvh.count[node]
        fst = bvh.first[node]
        is_leaf = cnt > 0

        leaf_hit = box_hit & is_leaf
        for j in range(bvh.max_leaf):
            valid = leaf_hit & (j < cnt)
            tri_i = jnp.where(valid, fst + j, 0)
            ok, t, u, v = intersect_tris(tris, tri_i, o, d, t_min, best_t)
            take = valid & ok
            best_tri = jnp.where(take, tri_i, best_tri)
            best_t = jnp.where(take, t, best_t)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, cur + 1, bvh.skip[node])
        nxt = jnp.where(active, nxt, cur)
        if any_hit:
            nxt = jnp.where(best_tri >= 0, n_nodes, nxt)
        return (nxt, best_t, best_tri, best_u, best_v)

    cur, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, state)
    return HitInfo(t=best_t, tri=best_tri, u=best_u, v=best_v, hit=best_tri >= 0)


def intersect_closest_skip(bvh: SkipBVH, tris: TriangleSoA, o, d,
                           t_min=1e-4, t_max=1e30) -> HitInfo:
    return _traverse_skip(bvh, tris, o, d, t_min, t_max, any_hit=False)


def intersect_any_skip(bvh: SkipBVH, tris: TriangleSoA, o, d,
                       t_min=1e-4, t_max=1e30):
    return _traverse_skip(bvh, tris, o, d, t_min, t_max, any_hit=True).hit
