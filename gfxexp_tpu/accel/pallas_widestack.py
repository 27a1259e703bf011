"""Wide-node ordered-stack Pallas traversal — per-row BVH-K descent.

Third-generation TPU traversal kernel (after the tile-shared union walk in
pallas_traverse.py and the binary row-cursor walk in pallas_rowcursor.py).
Structural wins over the binary skip-link row walk:

1. **Children are tested at the parent.** A K-ary node row packs all K child
   AABBs; one scalar row fetch + K slab tests on [ROWS, 128] vregs decides
   every child at once. The skip-link walk pays a full step (fetch + test)
   for every *missed* node too — here missed children cost nothing beyond
   their slab test, so only genuinely hit nodes are ever visited. Measured
   on the 16k-tri bench scene: ~15 node visits per 128-ray row vs ~100+ for
   the binary walk.

2. **Ordered descent with a vectorized per-row stack.** Hit children are
   sorted by row-min entry distance (a K-element sorting network on [ROWS,1]
   scalars); the nearest is descended first and the rest are pushed far->
   first. The stack is a dense [ROWS, S] i32 array updated with
   `where(iota == sp)` selects — no scatter, which is what made stack
   traversal catastrophic in plain XLA (accel/traverse.py docstring).
   Nearest-first order tightens best_t early, and far subtrees then fail
   the `far >= near` test against the shrunken best_t wholesale.

3. **Leaf triangles live inside the leaf row.** A leaf row carries its
   max_leaf triangles inline, so a leaf visit is the SAME single row fetch
   as an internal visit — no extra per-triangle loads. Measured: per-row
   dynamic VMEM loads are ~16 ns each and were the dominant per-step cost
   when leaves fetched 4 triangle rows separately. Triangles are stored in
   Baldwin–Weber precomputed-transform form (plane n/d0 + barycentric rows
   U/Ud, V/Vd — 12 floats): the hit point is shared between the u and v
   evaluations, ~35% fewer VPU ops per triangle than Möller–Trumbore on
   [ROWS, 128] vregs (the leaf phase was ~half the per-iteration cost).

4. **Any-hit traversals run a diet kernel.** Occlusion rays don't need
   nearest-first ordering or u/v/t tracking: the any-hit instantiation
   skips the per-child entry-distance reductions, the K-element sorting
   network, and the per-triangle best-hit selects (a row exits as soon as
   every lane is resolved).

Both phases run unconditionally with masks (`_USE_PHASE_CONDS = False`):
lax.cond gates measured SLOWER than predicated always-execution on v5e.

Replaces the reference's RT-core pipeline (OptiX, SURVEY.md §7 hard part
#1); the packed child layout follows the spirit of the reference's wide
nodes (common_shared.h:757 CompressedInternalNode_T) without the 8-bit
quantization. Correctness oracle: intersect_closest_brute + the CPU
interpret path used by tests/test_accel.py.

Note: the row table bakes triangle positions (static scenes; animated
scenes use the SkipBVH + device refit path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfxexp_tpu.accel.bvh_build import BVH
from gfxexp_tpu.accel.traverse import HitInfo
from gfxexp_tpu.scene.types import TriangleSoA

_LANE = 128
ROWS = 64  # 128-ray rows per tile (64 best on the mixed primary+bounce mix)
_COUNT_SHIFT = 24
# lax.cond phase gates: measured slower than always-execute-predicated on
# v5e (branch overhead > the masked work it saves); kept for A/B experiments
_USE_PHASE_CONDS = False

# sorting networks (ascending), pairs applied in sequence
_NET4 = ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2))
_NET8 = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6), (3, 6), (2, 4), (1, 2), (3, 5), (4, 5), (3, 4),
)


@struct.dataclass
class WideRowBVH:
    """Packed row-table acceleration structure for the wide-stack kernel.

    Built once at scene-compile time (pack_widerows — host numpy); the row
    table is a plain device array so it rides the scene pytree through jit
    as a traced arg (never closed over — CLAUDE.md).

    Row format ([R, W] f32, W = 64 for arity<=8 & max_leaf<=5):
    - internal (tag col W-1 == 0): child k at cols [7k, 7k+7) =
      lo.xyz hi.xyz bitcast(child_row index, or -1 for an empty slot)
    - leaf (tag col W-1 == 1): triangle j at cols [12j, 12j+12) in
      Baldwin–Weber form = n.xyz d0 U.xyz Ud V.xyz Vd where n = e1 x e2,
      d0 = -n.p0, U = (e2 x n)/|n|^2, Ud = -U.p0, V = (n x e1)/|n|^2,
      Vd = -V.p0 (t = -(n.o + d0)/(n.d); P = o + t d; u = U.P + Ud;
      v = V.P + Vd — barycentrics match Moller-Trumbore's u/v exactly);
      col W-4 = bitcast(first | count << 24) giving the global tri ids."""

    nodes: jnp.ndarray  # [C, R, W] f32 packed rows (C spatial chunks)
    arity: int = struct.field(pytree_node=False, default=4)
    width: int = struct.field(pytree_node=False, default=64)
    max_leaf: int = struct.field(pytree_node=False, default=4)
    max_depth: int = struct.field(pytree_node=False, default=32)
    # per-chunk world AABBs for tile-level culling (the TLAS analogue —
    # reference: InstanceBVH_T, common_shared.h:1059). None on single-chunk
    # tables and legacy caches (culling skipped).
    chunk_lo: jnp.ndarray = None  # [C, 3]
    chunk_hi: jnp.ndarray = None  # [C, 3]

    @property
    def num_chunks(self):
        return self.nodes.shape[0]

    @property
    def num_nodes(self):
        return self.nodes.shape[0] * self.nodes.shape[1]


def _pack_one(bvh: BVH, p0, e1, e2, tri_offset: int = 0):
    """Flatten one wide BVH + its (chunk-local, leaf-order) triangles into
    an [r, 64] numpy row table. Leaf rows bake GLOBAL triangle ids as
    (tri_offset + local first)."""
    import numpy as np

    child_min = np.asarray(bvh.child_min, np.float32)
    child_max = np.asarray(bvh.child_max, np.float32)
    child_idx = np.asarray(bvh.child_idx, np.int32)
    child_count = np.asarray(bvh.child_count, np.int32)
    n_int, arity = child_idx.shape
    max_leaf = int(bvh.max_leaf)
    assert arity <= 8 and max_leaf * 12 + 4 <= 64, (arity, max_leaf)
    width = 64

    # leaf child slots become rows appended after the internal rows
    is_leaf = child_count > 0
    leaf_id = np.cumsum(is_leaf.ravel()).reshape(is_leaf.shape) - 1
    n_leaf = int(is_leaf.sum())
    meta = np.where(
        is_leaf, n_int + leaf_id,
        np.where(child_count == 0, child_idx, -1)).astype(np.int32)
    leaf_first = child_idx[is_leaf].astype(np.int32)
    leaf_count = child_count[is_leaf].astype(np.int32)

    r = n_int + n_leaf
    tab = np.zeros((r, width), np.float32)
    for k in range(arity):
        tab[:n_int, 7 * k + 0:7 * k + 3] = child_min[:, k]
        tab[:n_int, 7 * k + 3:7 * k + 6] = child_max[:, k]
        tab[:n_int, 7 * k + 6] = meta[:, k].view(np.float32)
    if n_leaf:
        # leaf rows pack global ids as first | count << _COUNT_SHIFT: ids
        # must fit 24 bits or they corrupt silently at huge scene sizes
        assert int(leaf_first.max(initial=0)) + tri_offset < (1 << _COUNT_SHIFT), (
            "global triangle id exceeds the 24-bit leaf packing "
            f"({int(leaf_first.max(initial=0)) + tri_offset} >= {1 << _COUNT_SHIFT})")
        n_tris = p0.shape[0]
        for j in range(max_leaf):
            ti = np.minimum(leaf_first + j, n_tris - 1)
            # Baldwin–Weber transform rows, precomputed in f64 so the f32
            # barycentrics stay accurate for small/sliver triangles
            P = p0[ti].astype(np.float64)
            E1 = e1[ti].astype(np.float64)
            E2 = e2[ti].astype(np.float64)
            Nn = np.cross(E1, E2)
            nn2 = np.maximum((Nn * Nn).sum(-1, keepdims=True), 1e-300)
            U = np.cross(E2, Nn) / nn2
            V = np.cross(Nn, E1) / nn2
            base = 12 * j
            tab[n_int:, base + 0:base + 3] = Nn
            tab[n_int:, base + 3] = -(Nn * P).sum(-1)
            tab[n_int:, base + 4:base + 7] = U
            tab[n_int:, base + 7] = -(U * P).sum(-1)
            tab[n_int:, base + 8:base + 11] = V
            tab[n_int:, base + 11] = -(V * P).sum(-1)
        tab[n_int:, width - 4] = (
            (leaf_first + tri_offset)
            | (leaf_count << _COUNT_SHIFT)).view(np.float32)
    tab[n_int:, width - 1] = 1.0  # tag: leaf
    return tab


def pack_widerows(bvh: BVH, tris: TriangleSoA) -> WideRowBVH:
    """Single-chunk pack: one wide BVH + its (leaf-order permuted)
    triangles -> WideRowBVH with nodes [1, R, 64]."""
    import numpy as np

    tab = _pack_one(bvh, np.asarray(tris.p0, np.float32),
                    np.asarray(tris.e1, np.float32),
                    np.asarray(tris.e2, np.float32))
    return WideRowBVH(
        nodes=jnp.asarray(tab[None]), arity=int(bvh.arity), width=64,
        max_leaf=int(bvh.max_leaf), max_depth=int(bvh.max_depth))


# budget: [R, 64] f32 rows pad to 128 lanes in VMEM (512 B/row). Mosaic
# DOUBLE-BUFFERS the chunk-table input block (overlapping the next chunk's
# HBM DMA with traversal), so the working set is 2x table + rays/outputs
# against the ~16 MB/core VMEM: 13k rows = 6.7 MB/table fits.
MAX_ROWS_PER_CHUNK = 13000


def build_widerow(p0, e1, e2, arity: int = 4, max_leaf: int = 4,
                  max_rows: int = MAX_ROWS_PER_CHUNK,
                  spatial_splits: bool = False):
    """Build the wide-row acceleration structure for arbitrary scene sizes.

    Scenes whose row table fits the VMEM budget get one chunk. Larger
    scenes are partitioned into spatial chunks (Morton order over triangle
    centroids, then contiguous ranges) with one wide BVH per chunk; the
    kernel iterates chunks in an inner grid dimension, carrying best-hit
    state in its output refs, so node tables stream HBM->VMEM one chunk at
    a time (the TPU analogue of traversal working sets exceeding cache —
    lifts the VMEM triangle cap flagged in round 1).

    Returns (WideRowBVH with nodes [C, R, 64], perm) — callers permute
    their per-triangle arrays by `perm` exactly as for build_bvh."""
    import numpy as np

    from gfxexp_tpu.accel.bvh_build import build_bvh

    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n = p0.shape[0]
    # rows ~ leaves + internals; leaves ~ n/max_leaf * fill-slack
    est_rows = int(n / max_leaf * 1.5 * (1.0 + 1.0 / max(arity - 1, 1))) + 64
    if est_rows <= max_rows:
        bvh, perm = build_bvh(p0, e1, e2, arity=arity, max_leaf=max_leaf,
                              spatial_splits=spatial_splits)
        tab = _pack_one(bvh, p0[perm], e1[perm], e2[perm])
        # the estimate is a heuristic: a poorly-filled build (many 1-tri
        # leaves) can exceed it — verify the ACTUAL packed size and fall
        # through to the chunked path instead of blowing the VMEM budget
        if tab.shape[0] <= max_rows:
            return WideRowBVH(
                nodes=jnp.asarray(tab[None]), arity=arity, width=64,
                max_leaf=max_leaf, max_depth=int(bvh.max_depth)), perm
        est_rows = tab.shape[0]

    # ---- chunked: Morton-order spatial partition ----
    c0 = p0 + (e1 + e2) / 3.0  # centroids
    lo = c0.min(axis=0)
    span = np.maximum(c0.max(axis=0) - lo, 1e-12)
    q = np.minimum(((c0 - lo) / span) * 1024.0, 1023.0).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    order = np.argsort(morton, kind="stable").astype(np.int32)

    tris_per_chunk = max(int(n * max_rows / est_rows), max_leaf)
    n_chunks = -(-n // tris_per_chunk)
    # ordered worklist of [start, end) ranges over `order`; a chunk whose
    # ACTUAL packed table exceeds max_rows is split in half and retried
    # (the estimate-only sizing could silently exceed the VMEM budget)
    work = [(c * tris_per_chunk, min((c + 1) * tris_per_chunk, n))
            for c in range(n_chunks)]
    work.reverse()  # pop() processes ranges in ascending order
    tabs, perms = [], []
    chunk_lo, chunk_hi = [], []
    max_depth = 1
    tri_offset = 0
    while work:
        start, end = work.pop()
        sel = order[start:end]
        bvh, lperm = build_bvh(p0[sel], e1[sel], e2[sel], arity=arity,
                               max_leaf=max_leaf)
        gsel = sel[lperm]
        tab = _pack_one(bvh, p0[gsel], e1[gsel], e2[gsel],
                        tri_offset=tri_offset)
        if tab.shape[0] > max_rows and end - start > max_leaf:
            mid = (start + end) // 2
            work.append((mid, end))
            work.append((start, mid))
            continue
        tabs.append(tab)
        perms.append(gsel)
        # chunk world AABB (for per-tile culling)
        q0, q1, q2 = p0[gsel], p0[gsel] + e1[gsel], p0[gsel] + e2[gsel]
        chunk_lo.append(np.minimum(np.minimum(q0, q1), q2).min(axis=0))
        chunk_hi.append(np.maximum(np.maximum(q0, q1), q2).max(axis=0))
        max_depth = max(max_depth, int(bvh.max_depth))
        tri_offset += end - start
    r_max = max(t.shape[0] for t in tabs)
    stacked = np.zeros((len(tabs), r_max, 64), np.float32)
    for c, t in enumerate(tabs):
        stacked[c, :t.shape[0]] = t
        # padding rows: leaf-tagged with count 0 (unreachable anyway)
        stacked[c, t.shape[0]:, 63] = 1.0
    perm = np.concatenate(perms)
    return WideRowBVH(
        nodes=jnp.asarray(stacked), arity=arity, width=64,
        max_leaf=max_leaf, max_depth=max_depth,
        chunk_lo=jnp.asarray(np.stack(chunk_lo), jnp.float32),
        chunk_hi=jnp.asarray(np.stack(chunk_hi), jnp.float32)), perm


def _make_kernel(n_rows_tab: int, arity: int, width: int, max_leaf: int,
                 stack_depth: int, any_hit: bool, rows: int,
                 instanced: bool = False, culled: bool = False,
                 n_chunks: int = 0, step_skip: bool = False,
                 rebraid: bool = False):
    net = _NET4 if arity <= 4 else _NET8
    K = arity

    def kernel(*refs):
        work = cnt = work_near = start_rows = None
        if culled:
            (work, cnt), refs = refs[:2], refs[2:]
        if step_skip:
            (work_near,), refs = refs[:1], refs[1:]
        if instanced:
            if rebraid:
                (blas_ids, start_rows, transforms, nodes, rays,
                 out_t, out_tri, out_u, out_v, out_it, out_inst) = refs
            else:
                (blas_ids, transforms, nodes, rays,
                 out_t, out_tri, out_u, out_v, out_it, out_inst) = refs
        else:
            nodes, rays, out_t, out_tri, out_u, out_v, out_it = refs
            transforms = out_inst = None

        # with culling, the chunk/instance this step traverses comes from
        # the per-tile worklist (scalar prefetch); steps past the tile's
        # live count SKIP the whole body via pl.when (a padded step used
        # to pay the full prologue/epilogue: ~0.35 ms each on v5e) and
        # revisit the resident node block. The first step always runs so
        # the carried out blocks are initialized.
        if culled:
            chunk_id = work[pl.program_id(0) * n_chunks + pl.program_id(1)]
            step_valid = pl.program_id(1) < cnt[pl.program_id(0)]
        else:
            chunk_id = pl.program_id(1)
            step_valid = True
        first_chunk = pl.program_id(1) == 0

        if step_skip:
            # dynamic worklist truncation: worklists are ordered by entry
            # distance, so once every lane's best t beats this step's
            # entry distance no later step of this tile can improve —
            # skip the whole body (grid bookkeeping + overlapped DMA
            # only). The entry distance rides scalar prefetch as f32 in
            # SMEM (Mosaic cannot bitcast scalars); out_t is garbage at
            # the first step but first_chunk forces that step to run.
            near_f = work_near[
                pl.program_id(0) * n_chunks + pl.program_id(1)]
            cant_improve = near_f > jnp.max(out_t[0])
            step_valid = step_valid & jnp.logical_not(cant_improve)

        def step_body():
         def comp(c):
             return rays[0, c, :].reshape(rows, _LANE)

         ox, oy, oz = comp(0), comp(1), comp(2)
         dx, dy, dz = comp(3), comp(4), comp(5)
         tmin = comp(6)
         tmax = comp(7)

         if instanced:
             # world ray -> this instance's object space. The direction is
             # NOT renormalized, so the ray parameter t is preserved across
             # the affine map — best_t stays in world units and composes
             # across instances (reference: OptiX does the same transform
             # into GAS space for IAS traversal). Transforms live in SMEM
             # (scalar prefetch): 12 scalar reads, broadcast into the VPU.
             tbase = chunk_id * 16
             m = [transforms[tbase + j] for j in range(12)]
             ox2 = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
             oy2 = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
             oz2 = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
             dx2 = m[0] * dx + m[1] * dy + m[2] * dz
             dy2 = m[4] * dx + m[5] * dy + m[6] * dz
             dz2 = m[8] * dx + m[9] * dy + m[10] * dz
             ox, oy, oz, dx, dy, dz = ox2, oy2, oz2, dx2, dy2, dz2

         def safe_inv(v):
             tiny = jnp.where(v < 0, -1e-12, 1e-12)
             return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

         ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
         sp_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, stack_depth), 1)

         # chunk dimension is INNER (grid = (tiles, chunks)): the best-hit
         # state carries across chunks through the (revisited) output block,
         # so each chunk's traversal starts pre-culled by every earlier
         # chunk's hits. First chunk initializes from the rays. In instanced
         # mode a chunk IS an instance (sorted by BLAS so consecutive
         # instances reuse the resident node table without a new DMA).
         # invalid (padding) steps start every row at -1: the while loop
         # exits immediately and the carried best-hit state passes through.
         # Rebraided entries start at their subtree row instead of the root.
         row0 = start_rows[chunk_id] if rebraid else 0
         cur0 = jnp.where(step_valid, row0, -1) if culled else row0
         init = (
             jnp.full((rows, 1), 0, jnp.int32) + cur0,  # cur row (-1 = done)
             jnp.zeros((rows, 1), jnp.int32),  # sp
             jnp.full((rows, stack_depth), -1, jnp.int32),  # stack
             jnp.where(first_chunk, tmax, out_t[0]),
             jnp.where(first_chunk, -1, out_tri[0]),
             jnp.where(first_chunk, 0.0, out_u[0]),
             jnp.where(first_chunk, 0.0, out_v[0]),
             # per-row iteration count [rows, LANE]. Initialized from
             # runtime data, NOT a constant: a splat init gets a replicated
             # Mosaic layout and the loop-carry relayout from the body's
             # non-replicated value is then rejected.
             jnp.where(first_chunk, (tmax * 0.0).astype(jnp.int32),
                       out_it[0]),
             jnp.where(first_chunk, ((tmax * 0.0).astype(jnp.int32) - 1),
                       out_inst[0]) if instanced else
             (tmax * 0.0).astype(jnp.int32),
         )

         def cond(s):
             return jnp.max(s[0]) >= 0

         def body(s):
             (cur, sp, stack, best_t, best_tri, best_u, best_v, iters,
              best_inst) = s
             active = cur >= 0  # [rows, 1]
             iters = iters + active.astype(jnp.int32)
             curc = jnp.clip(cur, 0, n_rows_tab - 1)
             rowdat = jnp.concatenate(
                 [nodes[0, pl.ds(curc[r, 0], 1), :] for r in range(rows)],
                 axis=0)  # [rows, width]
             is_leaf = rowdat[:, width - 1:width] > 0.5  # [rows, 1]
             int_active = active & ~is_leaf
             leaf_active = active & is_leaf

             # ---- internal phase: test K children, ordered push ----------
             def internal_fn(carry):
                 sp, stack = carry
                 nears, metas, valids = [], [], []
                 for k in range(K):
                     base = 7 * k
                     lox = rowdat[:, base + 0:base + 1]
                     loy = rowdat[:, base + 1:base + 2]
                     loz = rowdat[:, base + 2:base + 3]
                     hix = rowdat[:, base + 3:base + 4]
                     hiy = rowdat[:, base + 4:base + 5]
                     hiz = rowdat[:, base + 5:base + 6]
                     meta = jax.lax.bitcast_convert_type(
                         rowdat[:, base + 6:base + 7], jnp.int32)
                     tx0 = (lox - ox) * ix
                     tx1 = (hix - ox) * ix
                     ty0 = (loy - oy) * iy
                     ty1 = (hiy - oy) * iy
                     tz0 = (loz - oz) * iz
                     tz1 = (hiz - oz) * iz
                     near = jnp.maximum(
                         jnp.maximum(jnp.minimum(tx0, tx1),
                                     jnp.minimum(ty0, ty1)),
                         jnp.maximum(jnp.minimum(tz0, tz1), tmin))
                     far = jnp.minimum(
                         jnp.minimum(jnp.maximum(tx0, tx1),
                                     jnp.maximum(ty0, ty1)),
                         jnp.minimum(jnp.maximum(tz0, tz1), best_t))
                     hits = near <= far  # [rows, 128]
                     ok = int_active & (meta >= 0) & jnp.any(
                         hits, axis=1, keepdims=True)
                     # entry distance orders the descent. Nearest-first
                     # matters for any-hit too: descending toward the
                     # occluder resolves lanes early (unordered descent
                     # measured 16.8 -> 28.1 ms on incoherent occlusion rays)
                     row_near = jnp.min(jnp.where(hits, near, jnp.inf),
                                        axis=1, keepdims=True)
                     nears.append(jnp.where(ok, row_near, jnp.inf))
                     metas.append(meta)
                     # i32, not bool: Mosaic can't lower selects on i1
                     # vectors ("Unsupported target bitwidth for truncation")
                     valids.append(ok.astype(jnp.int32))
                 # ascending sort by near; invalid children park at +inf
                 for a, b in net:
                     swap = nears[a] > nears[b]
                     na = jnp.where(swap, nears[b], nears[a])
                     nb = jnp.where(swap, nears[a], nears[b])
                     ma = jnp.where(swap, metas[b], metas[a])
                     mb = jnp.where(swap, metas[a], metas[b])
                     va = jnp.where(swap, valids[b], valids[a])
                     vb = jnp.where(swap, valids[a], valids[b])
                     nears[a], nears[b] = na, nb
                     metas[a], metas[b] = ma, mb
                     valids[a], valids[b] = va, vb
                 # push far->near so pops come nearest-first
                 for srt in range(K - 1, 0, -1):
                     do = valids[srt] > 0
                     stack = jnp.where(do & (sp_iota == sp), metas[srt], stack)
                     sp = sp + valids[srt]
                 nxt = jnp.where(valids[0] > 0, metas[0], -1)
                 return sp, stack, nxt

             def internal_skip(carry):
                 sp, stack = carry
                 return sp, stack, jnp.full((rows, 1), -1, jnp.int32)

             if _USE_PHASE_CONDS:
                 sp, stack, nxt_int = jax.lax.cond(
                     jnp.any(int_active), internal_fn, internal_skip,
                     (sp, stack))
             else:
                 sp, stack, nxt_int = internal_fn((sp, stack))

             # ---- leaf phase: Baldwin–Weber triangles inline in the row --
             def leaf_fn(carry):
                 best_t, best_tri, best_u, best_v, best_inst = carry
                 packed = jax.lax.bitcast_convert_type(
                     rowdat[:, width - 4:width - 3], jnp.int32)
                 fst = packed & ((1 << _COUNT_SHIFT) - 1)
                 cnt = jnp.where(leaf_active, packed >> _COUNT_SHIFT, 0)
                 row_any = None
                 for j in range(max_leaf):
                     base = 12 * j
                     nx = rowdat[:, base + 0:base + 1]
                     ny = rowdat[:, base + 1:base + 2]
                     nz = rowdat[:, base + 2:base + 3]
                     nd = rowdat[:, base + 3:base + 4]
                     den = nx * dx + ny * dy + nz * dz
                     num = nx * ox + ny * oy + nz * oz + nd
                     # den = n.d = -det(MT): same scale as the old MT guard
                     den_ok = jnp.abs(den) > 1e-12
                     t = -num / jnp.where(den_ok, den, 1.0)
                     # hit point shared by both barycentric rows
                     px = ox + t * dx
                     py = oy + t * dy
                     pz = oz + t * dz
                     ux = rowdat[:, base + 4:base + 5]
                     uy = rowdat[:, base + 5:base + 6]
                     uz = rowdat[:, base + 6:base + 7]
                     ud = rowdat[:, base + 7:base + 8]
                     u = ux * px + uy * py + uz * pz + ud
                     vx = rowdat[:, base + 8:base + 9]
                     vy = rowdat[:, base + 9:base + 10]
                     vz = rowdat[:, base + 10:base + 11]
                     vd = rowdat[:, base + 11:base + 12]
                     v = vx * px + vy * py + vz * pz + vd
                     ok = (
                         (j < cnt) & den_ok
                         & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                         & (t > tmin) & (t < best_t)
                     )
                     if any_hit:
                         # occlusion: only the fact of a hit matters
                         row_any = ok if row_any is None else (row_any | ok)
                     else:
                         best_tri = jnp.where(ok, fst + j, best_tri)
                         best_t = jnp.where(ok, t, best_t)
                         best_u = jnp.where(ok, u, best_u)
                         best_v = jnp.where(ok, v, best_v)
                         if instanced:
                             best_inst = jnp.where(ok, chunk_id, best_inst)
                 if any_hit:
                     best_tri = jnp.where(row_any, fst, best_tri)
                     # kill the resolved lane's descent votes outright:
                     # best_t = -1 makes every future far < near for this
                     # lane (stronger than shrinking to the hit t — resolved
                     # lanes contribute NO further union-walk work)
                     best_t = jnp.where(row_any, -1.0, best_t)
                     if instanced:
                         best_inst = jnp.where(row_any, chunk_id, best_inst)
                 return best_t, best_tri, best_u, best_v, best_inst

             if _USE_PHASE_CONDS:
                 best_t, best_tri, best_u, best_v, best_inst = jax.lax.cond(
                     jnp.any(leaf_active), leaf_fn, lambda c: c,
                     (best_t, best_tri, best_u, best_v, best_inst))
             else:
                 best_t, best_tri, best_u, best_v, best_inst = leaf_fn(
                     (best_t, best_tri, best_u, best_v, best_inst))

             # ---- advance: descend, else pop, else done ------------------
             nxt = jnp.where(int_active, nxt_int, -1)
             can_pop = (nxt < 0) & (sp > 0)
             popped = jnp.max(
                 jnp.where(can_pop & (sp_iota == sp - 1), stack, -1),
                 axis=1, keepdims=True)
             sp = sp - can_pop.astype(jnp.int32)
             nxt = jnp.where(can_pop, popped, nxt)
             if any_hit:
                 live = jnp.any((tmax > 0.0) & (best_tri < 0), axis=1,
                                keepdims=True)
                 nxt = jnp.where(live, nxt, -1)
             return (nxt, sp, stack, best_t, best_tri, best_u, best_v,
                     iters, best_inst)

         out = jax.lax.while_loop(cond, body, init)
         _, _, _, best_t, best_tri, best_u, best_v, iters, best_inst = out
         out_t[0] = best_t
         out_tri[0] = best_tri
         out_u[0] = best_u
         out_v[0] = best_v
         out_it[0] = iters
         if instanced:
             out_inst[0] = best_inst

        if culled:
            pl.when(step_valid | first_chunk)(step_body)
        else:
            step_body()

    return kernel


def _cull_worklists(lo, hi, rays, g, rows):
    """Per-tile chunk culling: slab-test every ray against every chunk
    AABB and compact the surviving chunks into NEAREST-FIRST worklists
    (ordered by the tile-min entry distance). The TPU analogue of the
    reference's instance AS (common_shared.h:1059 InstanceBVH_T): a tile
    only traverses chunks some ray of it can enter, and the in-kernel
    step skip truncates the tail once every lane's best t beats the next
    chunk's entry distance (valid precisely because of this ordering).

    rays: [g, 8, tile] packed components. Returns (work [g*C] i32 flat,
    cnt [g] i32, work_near [g*C] f32 entry distances); entries past cnt
    repeat the last live chunk so the Pallas index map revisits the
    resident block (no DMA, no work)."""
    n_chunks = lo.shape[0]
    o = rays[:, 0:3]  # [g, 3, tile]
    d = rays[:, 3:6]
    tmin = rays[:, 6]  # [g, tile]
    tmax = rays[:, 7]

    def safe_inv(v):
        tiny = jnp.where(v < 0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

    inv = safe_inv(d)
    tile_nears = []
    for c in range(n_chunks):
        t0 = (lo[c][None, :, None] - o) * inv  # [g, 3, tile]
        t1 = (hi[c][None, :, None] - o) * inv
        near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=1), tmin)
        far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=1), tmax)
        tile_nears.append(jnp.min(
            jnp.where(near <= far, near, jnp.inf), axis=1))  # [g]
    tile_near = jnp.stack(tile_nears, axis=1)  # [g, C]
    work = jnp.argsort(tile_near, axis=1).astype(jnp.int32)
    near_sorted = jnp.take_along_axis(tile_near, work, axis=1)
    live = jnp.isfinite(near_sorted)
    cnt = jnp.sum(live, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(
        work, jnp.maximum(cnt - 1, 0)[:, None], axis=1)
    work = jnp.where(live, work, last)
    work_near = jnp.where(live, near_sorted, 3e38)
    return work.reshape(-1), cnt, work_near.reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_tab", "arity", "width", "max_leaf",
                     "stack_depth", "any_hit", "rows"))
def _run(nodes, rays, n_rows_tab, arity, width, max_leaf,
         stack_depth, any_hit, rows, chunk_lo=None, chunk_hi=None):
    g = rays.shape[0]
    n_chunks = nodes.shape[0]
    tile = rows * _LANE
    culled = chunk_lo is not None and n_chunks > 1
    kernel = _make_kernel(n_rows_tab, arity, width, max_leaf, stack_depth,
                          any_hit, rows, culled=culled, n_chunks=n_chunks,
                          step_skip=culled)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),  # iterations
    ]
    # chunk dim inner: out blocks for tile i are revisited across
    # consecutive c steps (the Pallas accumulation pattern); each chunk's
    # node table is DMA'd HBM->VMEM for its steps
    if culled:
        work, cnt, work_near = _cull_worklists(chunk_lo, chunk_hi, rays,
                                               g, rows)
        out_block = pl.BlockSpec((1, rows, _LANE),
                                 lambda i, c, w, n, wn: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # work, cnt, work_near
            grid=(g, n_chunks),
            in_specs=[
                # node table selected by the tile's worklist; padding steps
                # repeat the previous index -> block revisited, no DMA
                pl.BlockSpec((1, n_rows_tab, width),
                             lambda i, c, w, n, wn:
                             (w[i * n_chunks + c], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, tile), lambda i, c, w, n, wn: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_block] * 5,
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=jax.default_backend() != "tpu",
        )(work, cnt, work_near, nodes, rays)
    out_block = pl.BlockSpec((1, rows, _LANE), lambda i, c: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(g, n_chunks),
        in_specs=[
            pl.BlockSpec((1, n_rows_tab, width), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),  # nodes chunk
            pl.BlockSpec((1, 8, tile), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 5,
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(nodes, rays)


def _traverse_widestack(bvh: WideRowBVH, tris: TriangleSoA, o, d, t_min,
                        t_max, any_hit: bool, rows: int = ROWS,
                        with_stats: bool = False):
    n_rays = o.shape[0]
    tile = rows * _LANE
    g = -(-n_rays // tile)
    n_pad = g * tile

    nodes = bvh.nodes
    arity, width = bvh.arity, bvh.width
    # ordered K-ary descent pushes at most K-1 per level
    stack_depth = int(bvh.max_depth + 2) * max(arity - 1, 1)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    def pad(x, fill):
        if x.shape[0] == n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - x.shape[0],) + x.shape[1:], fill, x.dtype)]
        )

    comps = jnp.stack(
        [
            pad(o[:, 0], 0.0), pad(o[:, 1], 0.0), pad(o[:, 2], 0.0),
            pad(d[:, 0], 1.0), pad(d[:, 1], 0.0), pad(d[:, 2], 0.0),
            pad(t_min, 0.0), pad(t_max, -1.0),
        ],
        axis=0,
    )
    rays = comps.reshape(8, g, tile).transpose(1, 0, 2)

    best_t, best_tri, best_u, best_v, iters = _run(
        nodes, rays,
        n_rows_tab=nodes.shape[1], arity=arity, width=width,
        max_leaf=bvh.max_leaf, stack_depth=stack_depth, any_hit=any_hit,
        rows=rows,
        chunk_lo=getattr(bvh, "chunk_lo", None),
        chunk_hi=getattr(bvh, "chunk_hi", None),
    )
    flat = lambda x: x.reshape(n_pad)[:n_rays]
    best_tri = flat(best_tri)
    hit = HitInfo(
        t=flat(best_t), tri=best_tri, u=flat(best_u), v=flat(best_v),
        hit=best_tri >= 0,
    )
    if with_stats:
        return hit, flat(iters)  # per-ray row iteration count
    return hit


# route single-chunk queries through the persistent row-slot kernel
# (pallas_persistent.py) instead of the static-tile walk. Flipped via env
# GFXEXP_PERSIST=0/1 (read at CALL time so toggles after import work),
# set_persistent(), or bench.py's `persist`/`nopersist` tokens; default
# decided by the round-5 A/B (perf/RESULTS_r5.md).
PERSISTENT: bool | None = None  # None -> defer to env var


def set_persistent(on: bool | None) -> None:
    """Override the persistent-kernel routing (None = env GFXEXP_PERSIST)."""
    global PERSISTENT
    PERSISTENT = on


def _persist_on() -> bool:
    on = PERSISTENT
    if on is None:
        on = os.environ.get("GFXEXP_PERSIST", "1") == "1"
    return on


def _use_persistent(bvh) -> bool:
    # default ON since r5: persistent wins every measured population
    # (kernel-only bounce 39.7 vs 24.7 Mrays/s; end-to-end 512^2 6.84 vs
    # 5.53, 1080p 7.09 vs 5.85 — perf/RESULTS_r5.md)
    from gfxexp_tpu.accel.pallas_persistent import persistent_supported

    return _persist_on() and persistent_supported(bvh)


def _use_persistent_inst(acc) -> bool:
    # default ON since r5: per-row worklists + per-slot entry advance win
    # 3-8x over the static (tiles x entries) grid on the 514-entry city
    # scene (perf/RESULTS_r5.md)
    from gfxexp_tpu.accel.pallas_persistent_inst import (
        persistent_inst_supported,
    )

    return _persist_on() and persistent_inst_supported(acc)


def intersect_closest_widestack(bvh: WideRowBVH, tris: TriangleSoA, o, d,
                                t_min=1e-4, t_max=1e30, rows: int = ROWS,
                                with_stats: bool = False) -> HitInfo:
    """with_stats=True additionally returns per-ray row-iteration counts
    (the reference's TraversalStats heatmap analogue, tfdm_shared.h:33)."""
    if _use_persistent(bvh):
        from gfxexp_tpu.accel.pallas_persistent import (
            intersect_closest_persistent,
        )

        return intersect_closest_persistent(bvh, tris, o, d, t_min, t_max,
                                            rows=rows, with_stats=with_stats)
    return _traverse_widestack(bvh, tris, o, d, t_min, t_max, any_hit=False,
                               rows=rows, with_stats=with_stats)


def intersect_any_widestack(bvh: WideRowBVH, tris: TriangleSoA, o, d,
                            t_min=1e-4, t_max=1e30, rows: int = ROWS):
    if _use_persistent(bvh):
        from gfxexp_tpu.accel.pallas_persistent import (
            intersect_any_persistent,
        )

        return intersect_any_persistent(bvh, tris, o, d, t_min, t_max,
                                        rows=rows)
    return _traverse_widestack(bvh, tris, o, d, t_min, t_max, any_hit=True,
                               rows=rows).hit


# ---------------------------------------------------------------------------
# two-level (instanced) traversal — the TPU analogue of OptiX GAS/IAS
# (reference: Scene::updateASs, common_host.h:1027; Instance/GAS model)
# ---------------------------------------------------------------------------


@struct.dataclass
class InstancedAccel:
    """Per-BLAS wide-row tables shared by N instances.

    Instances are the kernel's inner chunk dimension: each (ray-tile,
    instance) grid step transforms the rays into the instance's object
    space in-kernel (12 scalar reads + ~30 VPU ops) and traverses the
    instance's BLAS, selected through a scalar-prefetch index map — so
    consecutive instances of the same BLAS reuse the VMEM-resident table
    without a new DMA (instances are sorted by BLAS id at build).

    Memory no longer scales with instance count: N instances of a mesh
    share ONE node/triangle table. Rigid animation = rewriting
    inv_transforms (and the scene-side transforms); nothing is rebuilt."""

    nodes: jnp.ndarray  # [B, R, 64] per-BLAS row tables
    blas_ids: jnp.ndarray  # [C] i32 blas of chunk (sorted)
    inv_transforms: jnp.ndarray  # [C, 16] world->object 3x4, row-major
    inst_of_chunk: jnp.ndarray  # [C] i32 chunk -> original instance id
    arity: int = struct.field(pytree_node=False, default=4)
    width: int = struct.field(pytree_node=False, default=64)
    max_leaf: int = struct.field(pytree_node=False, default=4)
    max_depth: int = struct.field(pytree_node=False, default=32)
    # per-instance WORLD AABBs for tile-level culling (TLAS analogue —
    # reference: InstanceBVH_T, common_shared.h:1059); None on legacy caches
    chunk_lo: jnp.ndarray = None  # [C, 3]
    chunk_hi: jnp.ndarray = None  # [C, 3]
    # per-BLAS OBJECT-space AABBs (rigid animation recomputes the world
    # chunk AABBs from these on device; None on legacy caches)
    blas_lo: jnp.ndarray = None  # [B, 3]
    blas_hi: jnp.ndarray = None  # [B, 3]
    # rebraiding (reference: InstanceBVH rebraiding budget,
    # common/bvh_builder.h:68-75): a large instance contributes SEVERAL
    # TLAS entries, each starting traversal at a BLAS subtree row with the
    # subtree's (tighter) AABB — per-tile culling then skips subtrees
    # instead of whole instances. start_rows[c] is the BLAS row entry c
    # begins at (0 = root); obj_lo/obj_hi are the entry's OBJECT-space
    # subtree AABBs (rigid animation recomputes world chunk AABBs from
    # these). None on non-rebraided builds.
    start_rows: jnp.ndarray = None  # [C] i32
    obj_lo: jnp.ndarray = None  # [C, 3]
    obj_hi: jnp.ndarray = None  # [C, 3]
    # route every query through the ray-sorted single-pass TLAS driver
    # (static so the render path picks it up without threading a flag
    # through PTConfig; neutral-to-slower at ~74 instances, built for
    # 500+ instance scenes)
    use_tlas: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_entries(self):
        """TLAS entry count. With rebraiding an instance contributes one
        entry per opened subtree, so this EXCEEDS the instance count."""
        return self.blas_ids.shape[0]

    # NOTE: kept for back-compat; with rebraid>0 this is the TLAS ENTRY
    # count, not the true instance count (entries > instances). The >1
    # guards in dispatch only care about "more than one entry", which is
    # the correct semantics there.
    num_instances = num_entries


def _row_children(tab, row, arity):
    """Child (row, lo, hi) triples of an INTERNAL packed row (numpy)."""
    import numpy as np

    out = []
    for k in range(arity):
        meta = int(tab[row, 7 * k + 6:7 * k + 7].view(np.int32)[0])
        if meta >= 0:
            out.append((meta, tab[row, 7 * k:7 * k + 3].copy(),
                        tab[row, 7 * k + 3:7 * k + 6].copy()))
    return out


def _rebraid_entries(entries, tabs, transforms, arity, budget):
    """Greedily open the largest-world-area entries into their BLAS
    children until the entry count reaches `budget` (reference:
    rebraiding budget, common/bvh_builder.h:68-75). entries are
    (blas, inst, row, obj_lo, obj_hi); transforms[inst] is the 3x4
    object->world matrix (numpy f64)."""
    import heapq

    import numpy as np

    def world_area(inst, lo, hi):
        m = transforms[inst]
        e = 0.5 * (hi - lo).astype(np.float64)
        we = np.abs(m[:, :3]) @ e  # rotation/scale part only
        return 2.0 * (we[0] * we[1] + we[1] * we[2] + we[2] * we[0])

    seq = 0
    heap = []
    for ent in entries:
        heapq.heappush(heap, (-world_area(ent[1], ent[3], ent[4]), seq, ent))
        seq += 1
    done = []
    total = len(heap)
    while heap and total < budget:
        _, _, (b, i, row, lo, hi) = heapq.heappop(heap)
        tab = tabs[b]
        if tab[row, 63] > 0.5:  # leaf row: cannot open further
            done.append((b, i, row, lo, hi))
            continue
        children = _row_children(tab, row, arity)
        if total - 1 + len(children) > budget or len(children) <= 1:
            done.append((b, i, row, lo, hi))
            continue
        total += len(children) - 1
        for crow, clo, chi in children:
            heapq.heappush(
                heap, (-world_area(i, clo, chi), seq, (b, i, crow, clo, chi)))
            seq += 1
    done.extend(ent for _, _, ent in heap)
    return done


def build_instanced(blas_geoms, instances, arity: int = 4,
                    max_leaf: int = 4, rebraid: float = 0.0):
    """blas_geoms: list of (p0, e1, e2) object-space triangle arrays.
    instances: list of (blas_id, transform_3x4 object->world).

    rebraid > 1 opens the largest instances' BLAS roots into subtree
    entries until there are ~rebraid * n_instances TLAS entries
    (reference: InstanceBVH rebraiding, common/bvh_builder.h:68-75) —
    per-tile culling then skips subtrees of big instances instead of
    paying a full-BLAS traversal whenever any part of it is near.

    Returns (InstancedAccel, perms) with perms[b] the triangle permutation
    applied to BLAS b's arrays (for shading-side attribute reorder).
    Triangle ids baked into BLAS b's leaves are GLOBAL across the
    concatenated (permuted) BLAS triangle arrays."""
    import numpy as np

    from gfxexp_tpu.accel.bvh_build import build_bvh

    tabs, perms, offsets = [], [], []
    blas_lo, blas_hi = [], []
    off = 0
    max_depth = 1
    for (p0, e1, e2) in blas_geoms:
        p0 = np.asarray(p0, np.float32)
        e1 = np.asarray(e1, np.float32)
        e2 = np.asarray(e2, np.float32)
        bvh, perm = build_bvh(p0, e1, e2, arity=arity, max_leaf=max_leaf)
        tabs.append(_pack_one(bvh, p0[perm], e1[perm], e2[perm],
                              tri_offset=off))
        perms.append(perm)
        offsets.append(off)
        off += p0.shape[0]
        max_depth = max(max_depth, int(bvh.max_depth))
        q1, q2 = p0 + e1, p0 + e2
        blas_lo.append(np.minimum(np.minimum(p0, q1), q2).min(axis=0))
        blas_hi.append(np.maximum(np.maximum(p0, q1), q2).max(axis=0))
    r_max = max(t.shape[0] for t in tabs)
    stacked = np.zeros((len(tabs), r_max, 64), np.float32)
    for b, t in enumerate(tabs):
        stacked[b, :t.shape[0]] = t
        stacked[b, t.shape[0]:, 63] = 1.0

    mats = [np.asarray(t, np.float64).reshape(3, 4) for _, t in instances]
    # TLAS entries: (blas, instance, start row, object lo, object hi).
    # Default one whole-BLAS entry per instance; rebraiding opens the
    # biggest ones into subtree entries.
    entries = [(b, i, 0, np.asarray(blas_lo[b], np.float32),
                np.asarray(blas_hi[b], np.float32))
               for i, (b, _) in enumerate(instances)]
    rebraided = rebraid and rebraid > 1 and len(instances) >= 1
    if rebraided:
        entries = _rebraid_entries(entries, tabs, mats, arity,
                                   int(rebraid * len(instances)))
    # sort by BLAS id so consecutive grid steps reuse the resident table
    order = np.argsort([e[0] for e in entries], kind="stable")
    entries = [entries[j] for j in order]

    n_c = len(entries)
    blas_ids = np.asarray([e[0] for e in entries], np.int32)
    inst_of_chunk = np.asarray([e[1] for e in entries], np.int32)
    start_rows = np.asarray([e[2] for e in entries], np.int32)
    obj_lo = np.stack([e[3] for e in entries]).astype(np.float32)
    obj_hi = np.stack([e[4] for e in entries]).astype(np.float32)
    inv = np.zeros((n_c, 16), np.float32)
    chunk_lo = np.zeros((n_c, 3), np.float32)
    chunk_hi = np.zeros((n_c, 3), np.float32)
    for j, (b, i, row, lo, hi) in enumerate(entries):
        m = mats[i]
        r_inv = np.linalg.inv(m[:, :3])
        t_inv = -r_inv @ m[:, 3]
        inv[j, 0:12] = np.concatenate(
            [np.concatenate([r_inv[k], [t_inv[k]]]) for k in range(3)])
        # world AABB of the entry's subtree (affine AABB transform)
        c = 0.5 * (lo + hi)
        e = 0.5 * (hi - lo)
        wc = m[:, :3] @ c + m[:, 3]
        we = np.abs(m[:, :3]) @ e
        chunk_lo[j] = wc - we
        chunk_hi[j] = wc + we
    return InstancedAccel(
        nodes=jnp.asarray(stacked),
        blas_ids=jnp.asarray(blas_ids),
        inv_transforms=jnp.asarray(inv),
        inst_of_chunk=jnp.asarray(inst_of_chunk),
        arity=arity, width=64, max_leaf=max_leaf, max_depth=max_depth,
        chunk_lo=jnp.asarray(chunk_lo), chunk_hi=jnp.asarray(chunk_hi),
        blas_lo=jnp.asarray(np.stack(blas_lo).astype(np.float32)),
        blas_hi=jnp.asarray(np.stack(blas_hi).astype(np.float32)),
        start_rows=jnp.asarray(start_rows) if rebraided else None,
        obj_lo=jnp.asarray(obj_lo) if rebraided else None,
        obj_hi=jnp.asarray(obj_hi) if rebraided else None,
    ), perms


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_tab", "arity", "width", "max_leaf",
                     "stack_depth", "any_hit", "rows"))
def _run_instanced(nodes, blas_ids, transforms, rays, n_rows_tab, arity,
                   width, max_leaf, stack_depth, any_hit, rows,
                   chunk_lo=None, chunk_hi=None, start_rows=None):
    g = rays.shape[0]
    n_inst = blas_ids.shape[0]
    tile = rows * _LANE
    culled = chunk_lo is not None and n_inst > 1
    rebraid = start_rows is not None
    kernel = _make_kernel(n_rows_tab, arity, width, max_leaf, stack_depth,
                          any_hit, rows, instanced=True, culled=culled,
                          n_chunks=n_inst, rebraid=rebraid)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),  # iterations
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),  # instance
    ]
    if culled:
        # per-tile instance worklists, nearest-first + in-kernel step
        # skip (delegates to the shared TLAS pass runner)
        work, cnt, work_near = _cull_worklists(chunk_lo, chunk_hi, rays,
                                               g, rows)
        return _run_instanced_pass(
            nodes, blas_ids, transforms, rays, work, cnt,
            n_rows_tab, arity, width, max_leaf, stack_depth, any_hit,
            rows, n_inst, work_near=work_near, start_rows=start_rows)
    out_block = pl.BlockSpec((1, rows, _LANE), lambda i, c, *p: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # blas_ids, [start_rows], flat inv transforms (SMEM)
        num_scalar_prefetch=3 if rebraid else 2,
        grid=(g, n_inst),
        in_specs=[
            # BLAS table selected by the prefetched id; consecutive equal
            # ids revisit the resident block (no DMA)
            pl.BlockSpec((1, n_rows_tab, width),
                         lambda i, c, b, *p: (b[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda i, c, *p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 6,
    )
    pref = (blas_ids,) + ((start_rows,) if rebraid else ()) + (
        transforms.reshape(-1),)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(*pref, nodes, rays)


def _traverse_instanced(acc: InstancedAccel, o, d, t_min, t_max,
                        any_hit: bool, rows: int = ROWS):
    n_rays = o.shape[0]
    tile = rows * _LANE
    g = -(-n_rays // tile)
    n_pad = g * tile
    stack_depth = int(acc.max_depth + 2) * max(acc.arity - 1, 1)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    def pad(x, fill):
        if x.shape[0] == n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - x.shape[0],) + x.shape[1:], fill, x.dtype)]
        )

    comps = jnp.stack(
        [
            pad(o[:, 0], 0.0), pad(o[:, 1], 0.0), pad(o[:, 2], 0.0),
            pad(d[:, 0], 1.0), pad(d[:, 1], 0.0), pad(d[:, 2], 0.0),
            pad(t_min, 0.0), pad(t_max, -1.0),
        ],
        axis=0,
    )
    rays = comps.reshape(8, g, tile).transpose(1, 0, 2)

    # (the quantized instanced variant was removed in r5 — it crashed the
    # TPU worker and lost its A/B; perf/RESULTS_r4.md:101-104)
    best_t, best_tri, best_u, best_v, _, best_chunk = _run_instanced(
        acc.nodes, acc.blas_ids, acc.inv_transforms, rays,
        n_rows_tab=acc.nodes.shape[1], arity=acc.arity, width=acc.width,
        max_leaf=acc.max_leaf, stack_depth=stack_depth, any_hit=any_hit,
        rows=rows,
        chunk_lo=getattr(acc, "chunk_lo", None),
        chunk_hi=getattr(acc, "chunk_hi", None),
        start_rows=getattr(acc, "start_rows", None),
    )
    flat = lambda x: x.reshape(n_pad)[:n_rays]
    best_tri = flat(best_tri)
    best_chunk = flat(best_chunk)
    inst = jnp.where(best_chunk >= 0,
                     jnp.asarray(acc.inst_of_chunk)[
                         jnp.maximum(best_chunk, 0)], -1)
    hit = HitInfo(
        t=flat(best_t), tri=best_tri, u=flat(best_u), v=flat(best_v),
        hit=best_tri >= 0,
    )
    return hit, inst


# ---------------------------------------------------------------------------
# TLAS wavefront — per-RAY instance assignment + ray sorting so each tile's
# worklist collapses to ~1-2 instances (the tile-level culling above still
# visits every instance some ray of the 8k-ray tile can enter; a tile spans
# too much of the scene for that to prune). The TPU analogue of descending
# the reference's instance AS per ray (common_shared.h:1059 InstanceBVH_T /
# OptiX IAS): each round every unresolved ray picks its nearest unvisited
# instance AABB, rays are argsorted by that pick, and the Pallas kernel runs
# with a tiny static inner grid (max_w) over per-tile unique-instance
# worklists. Rounds repeat until no ray has an unvisited instance closer
# than its best hit (usually 1-3 rounds: nearest-first + best_t pruning).
# ---------------------------------------------------------------------------


def _run_instanced_pass(nodes, blas_ids, transforms, rays, work, cnt,
                        n_rows_tab, arity, width, max_leaf, stack_depth,
                        any_hit, rows, max_w, work_near=None,
                        start_rows=None):
    """One sorted TLAS pass: grid (tiles, max_w); the node table for step
    (i, c) is BLAS blas_ids[work[i*max_w+c]]; steps past cnt[i] are no-ops
    revisiting the resident block. work_near (i32 bits of the f32 entry
    distances, same layout as work) additionally skips any step whose
    entry distance exceeds the tile's current worst best-t. start_rows
    (rebraiding) makes each entry start its BLAS walk at a subtree row."""
    g = rays.shape[0]
    tile = rows * _LANE
    step_skip = work_near is not None
    rebraid = start_rows is not None
    kernel = _make_kernel(n_rows_tab, arity, width, max_leaf, stack_depth,
                          any_hit, rows, instanced=True, culled=True,
                          n_chunks=max_w, step_skip=step_skip,
                          rebraid=rebraid)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),  # iterations
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),  # instance
    ]
    n_pref = 4 + int(step_skip) + int(rebraid)
    # prefetch layout: work, cnt, [near], blas_ids, [start_rows], tfs
    bi = -3 if rebraid else -2

    def out_ix(i, c, *_):
        return (i, 0, 0)

    def tab_ix(i, c, w, *rest):
        b = rest[bi]
        return (b[w[i * max_w + c]], 0, 0)

    out_block = pl.BlockSpec((1, rows, _LANE), out_ix,
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pref,  # work, cnt, [near], blas_ids, tfs
        grid=(g, max_w),
        in_specs=[
            pl.BlockSpec((1, n_rows_tab, width), tab_ix,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), out_ix,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_block] * 6,
    )
    pref = (work, cnt) + ((work_near,) if step_skip else ()) + (
        blas_ids,) + ((start_rows,) if rebraid else ()) + (
        transforms.reshape(-1),)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(*pref, nodes, rays)


def _instance_entry_dists(chunk_lo, chunk_hi, o, d, t_min, t_max):
    """Entry distance of every ray into every instance's world AABB.
    Returns [N, C] f32, +inf where the slab test misses (or the ray is a
    padded no-op with t_max < t_min)."""

    def safe_inv(v):
        tiny = jnp.where(v < 0, -1e-12, 1e-12)
        return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

    inv = safe_inv(d)  # [N, 3]
    t0 = (chunk_lo[None, :, :] - o[:, None, :]) * inv[:, None, :]  # [N,C,3]
    t1 = (chunk_hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=2),
                       t_min[:, None])
    far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=2),
                      t_max[:, None])
    return jnp.where(near <= far, near, jnp.inf)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_tab", "arity", "width", "max_leaf",
                     "stack_depth", "any_hit", "rows"))
def _run_tlas_wavefront(nodes, blas_ids, transforms, chunk_lo, chunk_hi,
                        o, d, t_min, t_max, n_rows_tab, arity, width,
                        max_leaf, stack_depth, any_hit, rows,
                        start_rows=None):
    """ONE sorted nearest-first pass over instance-sorted rays.

    Rays are argsorted by their nearest-entered instance AABB, then each
    tile builds a worklist of every instance ANY of its rays can enter
    (cnt real, padding steps no-op), ordered by the tile-min entry
    distance. The single Pallas pass walks the worklist with best-hit
    state carried across steps, so by the time the far chunks come up
    best_t has collapsed and their root slab tests fail in ~1 step.

    Complete by construction — every chunk a ray can enter within
    [t_min, t_max] is in its tile's worklist, and distance pruning only
    skips chunks that cannot beat the current best. Multi-round variants
    (per-ray or per-tile frontier wavefronts with a lax.while_loop)
    measured STRICTLY worse on this runtime: each while iteration costs
    ~100-150 ms of un-pipelined dispatch overhead, and one-candidate-
    per-ray worklists took 39 rounds on the 74-instance scene. Ray
    sorting + nearest-first ordering alone gave 510 -> ~120 ms."""
    n_pad = o.shape[0]  # already tile-padded by the caller
    n_chunks = blas_ids.shape[0]
    tile = rows * _LANE
    g = n_pad // tile
    # optimization_barrier between stages: without it XLA fuses the
    # [N, C] entry-distance production into its several consumers
    # (argmin/sort/gather) and the whole call ran 407 ms vs 132 ms —
    # the barrier forces one materialization of each stage
    ob = jax.lax.optimization_barrier

    nears = ob(_instance_entry_dists(chunk_lo, chunk_hi, o, d,
                                     t_min, t_max))

    # sort rays once by first (nearest) candidate instance
    first = jnp.argmin(nears, axis=1).astype(jnp.int32)
    has0 = jnp.isfinite(jnp.min(nears, axis=1))
    perm = ob(jnp.argsort(jnp.where(has0, first, n_chunks)))
    nears = ob(nears[perm]).reshape(g, tile, n_chunks)
    t_min = t_min[perm]
    t_max = t_max[perm].reshape(g, tile)

    # per-tile worklist: every chunk any ray of the tile enters, ordered
    # nearest-first by tile-min entry distance — ONE [g, C] argsort (an
    # iterative masked-argmin chain here was C sequentially-dependent
    # tiny launches, ~150 ms of dispatch on this runtime). Padding
    # entries repeat the last live chunk so the index map revisits the
    # resident block.
    tile_near = jnp.min(nears, axis=1)  # [g, C]
    work = jnp.argsort(tile_near, axis=1).astype(jnp.int32)  # [g, C]
    near_sorted = jnp.take_along_axis(tile_near, work, axis=1)
    live = jnp.isfinite(near_sorted)
    cnt = jnp.sum(live, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(work, jnp.maximum(cnt - 1, 0)[:, None],
                               axis=1)
    work = jnp.where(live, work, last).astype(jnp.int32)
    # f32 entry distances for the in-kernel step skip (+inf -> big
    # finite so SMEM compares stay well-defined)
    work_near = jnp.where(jnp.isfinite(near_sorted), near_sorted, 3e38)

    # rays with no candidate at all carry t_max = -1 (kernel no-op)
    has = jnp.any(jnp.isfinite(nears), axis=2)
    rays = jnp.stack([
        o[:, 0][perm], o[:, 1][perm], o[:, 2][perm],
        d[:, 0][perm], d[:, 1][perm], d[:, 2][perm],
        t_min, jnp.where(has, t_max, -1.0).reshape(n_pad),
    ], axis=0).reshape(8, g, tile).transpose(1, 0, 2)
    rays, work, cnt, work_near = ob((rays, work, cnt, work_near))

    pt, ptri, pu, pv, _, pchunk = _run_instanced_pass(
        nodes, blas_ids, transforms, rays, work.reshape(-1), cnt,
        n_rows_tab, arity, width, max_leaf, stack_depth, any_hit,
        rows, n_chunks, work_near=work_near.reshape(-1),
        start_rows=start_rows)
    pt, ptri, pu, pv, pchunk = ob((pt, ptri, pu, pv, pchunk))

    def unperm(x, dtype):
        return jnp.zeros((n_pad,), dtype).at[perm].set(x.reshape(n_pad))

    # misses carried t_max through the kernel; restore the original value
    # for no-candidate rays (their tmax was -1)
    t_out = jnp.where(has, pt.reshape(g, tile), t_max).reshape(n_pad)
    return (unperm(t_out.reshape(g, tile), jnp.float32),
            unperm(ptri, jnp.int32),
            unperm(pu, jnp.float32), unperm(pv, jnp.float32),
            unperm(pchunk, jnp.int32), jnp.ones((), jnp.int32))


def _traverse_instanced_tlas(acc: InstancedAccel, o, d, t_min, t_max,
                             any_hit: bool, rows: int = ROWS,
                             with_rounds: bool = False, **_compat):
    n_rays = o.shape[0]
    tile = rows * _LANE
    g = -(-n_rays // tile)
    n_pad = g * tile
    stack_depth = int(acc.max_depth + 2) * max(acc.arity - 1, 1)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    def pad(x, fill):
        if x.shape[0] == n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - x.shape[0],) + x.shape[1:], fill, x.dtype)]
        )

    o_p = jnp.stack([pad(o[:, 0], 0.0), pad(o[:, 1], 0.0),
                     pad(o[:, 2], 0.0)], axis=1)
    d_p = jnp.stack([pad(d[:, 0], 1.0), pad(d[:, 1], 0.0),
                     pad(d[:, 2], 0.0)], axis=1)

    best_t, best_tri, best_u, best_v, best_chunk, rounds = \
        _run_tlas_wavefront(
        acc.nodes, acc.blas_ids, acc.inv_transforms,
        acc.chunk_lo, acc.chunk_hi,
        o_p, d_p, pad(t_min, 0.0), pad(t_max, -1.0),
        n_rows_tab=acc.nodes.shape[1], arity=acc.arity, width=acc.width,
        max_leaf=acc.max_leaf, stack_depth=stack_depth, any_hit=any_hit,
        rows=rows, start_rows=getattr(acc, "start_rows", None))
    flat = lambda x: x[:n_rays]
    best_tri = flat(best_tri)
    best_chunk = flat(best_chunk)
    inst = jnp.where(best_chunk >= 0,
                     jnp.asarray(acc.inst_of_chunk)[
                         jnp.maximum(best_chunk, 0)], -1)
    hit = HitInfo(
        t=flat(best_t), tri=best_tri, u=flat(best_u), v=flat(best_v),
        hit=best_tri >= 0,
    )
    if with_rounds:
        return hit, inst, rounds
    return hit, inst


def intersect_closest_instanced(acc: InstancedAccel, o, d, t_min=1e-4,
                                t_max=1e30, rows: int = ROWS,
                                tlas: bool = False):
    """Closest hit through the two-level structure. Returns
    (HitInfo with GLOBAL blas-triangle ids, instance id per ray, -1 miss).

    The default path runs per-tile nearest-first instance worklists with
    an in-kernel distance step-skip (a TLAS analogue at tile
    granularity). tlas=True (or acc.use_tlas) additionally argsorts RAYS
    by nearest instance before the pass — measured neutral-to-slower on
    the 74-instance bench scene (the sort/permute glue costs more than
    the extra coherence buys), kept for A/B on scenes with more
    instances."""
    tlas = tlas or getattr(acc, "use_tlas", False)
    if tlas and getattr(acc, "chunk_lo", None) is not None \
            and acc.num_instances > 1 and acc.width != 32:
        return _traverse_instanced_tlas(acc, o, d, t_min, t_max,
                                        any_hit=False, rows=rows)
    if _use_persistent_inst(acc):
        from gfxexp_tpu.accel.pallas_persistent_inst import (
            _traverse_persistent_inst,
        )

        return _traverse_persistent_inst(acc, o, d, t_min, t_max,
                                         any_hit=False, rows=rows)
    return _traverse_instanced(acc, o, d, t_min, t_max, any_hit=False,
                               rows=rows)


def intersect_any_instanced(acc: InstancedAccel, o, d, t_min=1e-4,
                            t_max=1e30, rows: int = ROWS,
                            tlas: bool = False):
    tlas = tlas or getattr(acc, "use_tlas", False)
    if tlas and getattr(acc, "chunk_lo", None) is not None \
            and acc.num_instances > 1 and acc.width != 32:
        hit, _ = _traverse_instanced_tlas(acc, o, d, t_min, t_max,
                                          any_hit=True, rows=rows)
        return hit.hit
    if _use_persistent_inst(acc):
        from gfxexp_tpu.accel.pallas_persistent_inst import (
            intersect_any_persistent_inst,
        )

        return intersect_any_persistent_inst(acc, o, d, t_min, t_max,
                                             rows=rows)
    hit, _ = _traverse_instanced(acc, o, d, t_min, t_max, any_hit=True,
                                 rows=rows)
    return hit.hit
