"""Quantized wide-row traversal — compressed BVH-8 nodes in 128-byte rows.

Fourth-generation TPU traversal format (after accel/pallas_widestack.py's
f32 BVH-4 rows). The row shrinks from 256 B to 128 B and the arity doubles,
following the reference's compressed wide nodes
(common/common_shared.h:757 CompressedInternalNode_T — 8-bit quantized
child AABBs with exponent-only power-of-two scales; 48/64/80 B for
arity 2/4/8) re-architected for the [8, 128]-vreg decode:

- INTERNAL row ([32] f32): cols 0-2 parent lo (f32), col 3 packed scale
  exponents (ex | ey<<8 | ez<<16; per-axis scale = 2^(e-127), decoded by
  bit-shifting the exponent into an f32), cols 4-11 child meta (i32; -1
  empty, bit 30 = child-is-leaf), cols 12-27 per-child quantized bounds
  (2 cols: qlo.xyz | qhi.x<<24 and qhi.y | qhi.z<<8). Dequantized lo is
  rounded DOWN, hi UP (qhi stores ceil-1, decoded +1) so every decoded
  box conservatively contains the child.
- LEAF row ([32] f32): cols 0-2 base (f32), cols 3-5 per-axis scale
  (extent/65535), cols 6-28 up to 5 triangles as 9 x uint16 quantized
  vertices (two shorts per i32 col), col 29 meta (global first | count
  << 24). Intersection is Moller-Trumbore on the dequantized vertices.

There is NO leaf tag column: leafness rides bit 30 of the parent's child
meta (and of the stack entries), so a row fetch is [1, 32] — half the
bytes of the f32 format. All node bounds are recomputed bottom-up from
the DEQUANTIZED leaf vertices before quantization, so every traced box
covers the actual (epsilon-shifted) geometry — hits can differ from the
f32 format by the 16-bit vertex quantum, which the oracle tests bound.

Capacity: a leaf row holds 5 triangles in 128 B (25.6 B/tri vs 64) and
arity-8 internals are ~half as many rows — ~2.5x more triangles per VMEM
chunk than the f32 format, cutting chunk count and HBM streaming for big
scenes (VERDICT r2 item 2). Kept as a selectable variant
(traversal="qrow") A/B-able against widerow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfxexp_tpu.accel.bvh_build import BVH, build_bvh
from gfxexp_tpu.accel.pallas_widestack import _NET8, ROWS, _cull_worklists
from gfxexp_tpu.accel.traverse import HitInfo
from gfxexp_tpu.scene.types import TriangleSoA

_LANE = 128
_WIDTH = 32
_ARITY = 8
_MAX_LEAF = 5
_COUNT_SHIFT = 24
_LEAF_BIT = 1 << 30
# 128 B/row: double-buffered chunk tables fit twice the f32 format's rows
MAX_ROWS_PER_CHUNK = 26000


@struct.dataclass
class QRowBVH:
    nodes: jnp.ndarray  # [C, R, 32] f32
    max_depth: int = struct.field(pytree_node=False, default=32)
    chunk_lo: jnp.ndarray = None  # [C, 3] (chunked tables only)
    chunk_hi: jnp.ndarray = None

    @property
    def num_chunks(self):
        return self.nodes.shape[0]


def _pack_one_q(bvh: BVH, p0, e1, e2, tri_offset: int = 0):
    """Flatten one arity-8 BVH + leaf-order triangles into a quantized
    [r, 32] row table. Returns (table, dequantized (p0, e1, e2)) — the
    dequantized arrays are what the kernel actually intersects; callers
    use them for bounds so every box covers the traced geometry."""
    child_min = np.asarray(bvh.child_min, np.float64).copy()
    child_max = np.asarray(bvh.child_max, np.float64).copy()
    child_idx = np.asarray(bvh.child_idx, np.int64)
    child_count = np.asarray(bvh.child_count, np.int64)
    n_int, arity = child_idx.shape
    assert arity == _ARITY and bvh.max_leaf <= _MAX_LEAF
    n_tris = p0.shape[0]
    v0 = np.asarray(p0, np.float64)
    v1 = v0 + np.asarray(e1, np.float64)
    v2 = v0 + np.asarray(e2, np.float64)

    is_leaf = child_count > 0
    leaf_id = np.cumsum(is_leaf.ravel()).reshape(is_leaf.shape) - 1
    n_leaf = int(is_leaf.sum())
    leaf_first = child_idx[is_leaf]
    leaf_count = child_count[is_leaf]
    assert int(leaf_first.max(initial=0)) + tri_offset < (1 << _COUNT_SHIFT)

    # ---- leaf rows: quantize vertices to 16 bits vs the leaf box -------
    # vert gather per leaf slot j: triangle min(first + j, n-1)
    ti = np.minimum(leaf_first[:, None] + np.arange(_MAX_LEAF)[None, :],
                    n_tris - 1)  # [L, 5]
    slot_live = np.arange(_MAX_LEAF)[None, :] < leaf_count[:, None]
    verts = np.stack([v0[ti], v1[ti], v2[ti]], axis=2)  # [L, 5, 3, 3]
    live_verts = np.where(slot_live[:, :, None, None], verts, np.nan)
    base = np.nanmin(live_verts.reshape(n_leaf, -1, 3), axis=1)  # [L, 3]
    top = np.nanmax(live_verts.reshape(n_leaf, -1, 3), axis=1)
    base = np.where(np.isfinite(base), base, 0.0)
    top = np.where(np.isfinite(top), top, 0.0)
    scale = np.maximum(top - base, 1e-12) / 65535.0  # [L, 3]
    q = np.clip(np.rint((verts - base[:, None, None, :])
                        / scale[:, None, None, :]), 0, 65535
                ).astype(np.uint64)  # [L, 5, 3, 3]
    deq = base[:, None, None, :] + q.astype(np.float64) \
        * scale[:, None, None, :]

    # dequantized triangle soup in leaf order (the kernel's ground truth)
    dq0 = v0.copy()
    dq1 = v1.copy()
    dq2 = v2.copy()
    li, si = np.nonzero(slot_live)
    dq0[ti[li, si]] = deq[li, si, 0]
    dq1[ti[li, si]] = deq[li, si, 1]
    dq2[ti[li, si]] = deq[li, si, 2]

    # leaf AABBs from dequantized verts (for the bounds fix-up below)
    lv = np.where(slot_live[:, :, None, None],
                  np.stack([dq0[ti], dq1[ti], dq2[ti]], 2), np.nan)
    leaf_lo = np.nanmin(lv.reshape(n_leaf, -1, 3), axis=1)
    leaf_hi = np.nanmax(lv.reshape(n_leaf, -1, 3), axis=1)
    leaf_lo = np.where(np.isfinite(leaf_lo), leaf_lo, 0.0)
    leaf_hi = np.where(np.isfinite(leaf_hi), leaf_hi, 0.0)

    # ---- bottom-up bounds fix-up over the wide tree (vectorized) --------
    # every box must cover the DEQUANTIZED leaves; resolved level by level
    # (levels <= tree depth, each pass fully vectorized — the per-node
    # python sweep dominated host build time at reference scale)
    node_lo = np.zeros((n_int, 3))
    node_hi = np.zeros((n_int, 3))
    is_int_child = child_count == 0  # [N, K]
    empty_child = child_count < 0
    # leaf child bounds are known immediately
    lid = np.where(is_leaf, leaf_id, 0)
    child_min = np.where(is_leaf[:, :, None], leaf_lo[lid], child_min)
    child_max = np.where(is_leaf[:, :, None], leaf_hi[lid], child_max)
    resolved = np.zeros(n_int, bool)
    cidx = np.where(is_int_child, child_idx, 0)
    for _ in range(n_int + 1):
        ready = ~resolved & np.all(
            np.where(is_int_child, resolved[cidx], True), axis=1)
        if not ready.any():
            break
        # pull resolved internal-child bounds into the child slots
        sub_lo = node_lo[cidx]  # [N, K, 3]
        sub_hi = node_hi[cidx]
        upd = ready[:, None] & is_int_child
        child_min = np.where(upd[:, :, None], sub_lo, child_min)
        child_max = np.where(upd[:, :, None], sub_hi, child_max)
        occ = ~empty_child[:, :, None]
        lo = np.where(occ, child_min, np.inf).min(axis=1)
        hi = np.where(occ, child_max, -np.inf).max(axis=1)
        node_lo[ready] = np.where(np.isfinite(lo[ready]), lo[ready], 0.0)
        node_hi[ready] = np.where(np.isfinite(hi[ready]), hi[ready], 0.0)
        resolved |= ready
    assert resolved.all() or n_int == 0, "bounds fix-up did not converge"

    # ---- internal rows: 8-bit quantized child bounds --------------------
    tab = np.zeros((n_int + n_leaf, _WIDTH), np.float32)
    valid = child_count >= 0
    plo = np.where(valid[:, :, None], child_min, np.inf).min(axis=1)
    plo = np.where(np.isfinite(plo), plo, 0.0)  # [N, 3]
    phi = np.where(valid[:, :, None], child_max, -np.inf).max(axis=1)
    phi = np.where(np.isfinite(phi), phi, 0.0)
    extent = np.maximum(phi - plo, 0.0)
    # exponent-only scale: smallest power of two with extent/s <= 255
    e = np.where(extent > 0,
                 np.ceil(np.log2(np.maximum(extent, 1e-300) / 255.0)),
                 -126.0).astype(np.int64) + 127
    e = np.clip(e, 1, 254)  # [N, 3]
    s = np.exp2(e - 127).astype(np.float64)
    rel_lo = np.maximum(child_min - plo[:, None, :], 0.0) / s[:, None, :]
    rel_hi = np.maximum(child_max - plo[:, None, :], 0.0) / s[:, None, :]
    qlo = np.clip(np.floor(rel_lo), 0, 255).astype(np.uint64)
    qhi = np.clip(np.ceil(rel_hi) - 1, 0, 255).astype(np.uint64)

    meta = np.where(
        is_leaf, (n_int + leaf_id) | _LEAF_BIT,
        np.where(child_count == 0, child_idx, -1)).astype(np.int64)

    tab[:n_int, 0:3] = plo.astype(np.float32)
    tab[:n_int, 3] = (e[:, 0] | (e[:, 1] << 8) | (e[:, 2] << 16)) \
        .astype(np.uint32).view(np.float32)
    for k in range(arity):
        tab[:n_int, 4 + k] = meta[:, k].astype(np.int32).view(np.float32)
        c0 = (qlo[:, k, 0] | (qlo[:, k, 1] << 8) | (qlo[:, k, 2] << 16)
              | (qhi[:, k, 0] << 24))
        c1 = qhi[:, k, 1] | (qhi[:, k, 2] << 8)
        tab[:n_int, 12 + 2 * k] = c0.astype(np.uint32).view(np.float32)
        tab[:n_int, 13 + 2 * k] = c1.astype(np.uint32).view(np.float32)

    # ---- leaf rows -------------------------------------------------------
    lrow = np.zeros((n_leaf, _WIDTH), np.float32)
    lrow[:, 0:3] = base.astype(np.float32)
    lrow[:, 3:6] = scale.astype(np.float32)
    shorts = q.reshape(n_leaf, _MAX_LEAF * 9)  # [L, 45] uint64
    lo16 = shorts[:, 0::2]
    hi16 = np.zeros_like(lo16)
    hi16[:, : shorts[:, 1::2].shape[1]] = shorts[:, 1::2]
    packed = (lo16 | (hi16 << 16)).astype(np.uint32)  # [L, 23]
    lrow[:, 6:6 + packed.shape[1]] = packed.view(np.float32)
    lrow[:, 29] = ((leaf_first + tri_offset)
                   | (leaf_count << _COUNT_SHIFT)) \
        .astype(np.uint32).view(np.float32)
    tab[n_int:] = lrow
    return tab, (dq0.astype(np.float32),
                 (dq1 - dq0).astype(np.float32),
                 (dq2 - dq0).astype(np.float32))


def build_qrow(p0, e1, e2, max_rows: int = MAX_ROWS_PER_CHUNK,
               spatial_splits: bool = False):
    """Build the quantized row structure. Returns (QRowBVH, perm,
    dequantized (p0, e1, e2) in permuted order) — callers who need
    EXACT agreement with the traced geometry (tests) use the dequantized
    soup; the shifts are bounded by the 16-bit vertex quantum."""
    p0 = np.asarray(p0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    n = p0.shape[0]
    est_rows = int(n / _MAX_LEAF * 1.5 * (1.0 + 1.0 / (_ARITY - 1))) + 64
    if est_rows <= max_rows:
        bvh, perm = build_bvh(p0, e1, e2, arity=_ARITY, max_leaf=_MAX_LEAF,
                              spatial_splits=spatial_splits)
        tab, dq = _pack_one_q(bvh, p0[perm], e1[perm], e2[perm])
        if tab.shape[0] <= max_rows:
            return QRowBVH(nodes=jnp.asarray(tab[None]),
                           max_depth=int(bvh.max_depth)), perm, dq
        est_rows = tab.shape[0]

    # chunked: Morton partition (same recipe as build_widerow)
    c0 = p0 + (e1 + e2) / 3.0
    lo = c0.min(axis=0)
    span = np.maximum(c0.max(axis=0) - lo, 1e-12)
    qm = np.minimum(((c0 - lo) / span) * 1024.0, 1023.0).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(qm[:, 0]) | (spread(qm[:, 1]) << 1) \
        | (spread(qm[:, 2]) << 2)
    order = np.argsort(morton, kind="stable").astype(np.int64)
    tris_per_chunk = max(int(n * max_rows / est_rows), _MAX_LEAF)
    n_chunks = -(-n // tris_per_chunk)
    work = [(c * tris_per_chunk, min((c + 1) * tris_per_chunk, n))
            for c in range(n_chunks)]
    work.reverse()
    tabs, perms, dqs = [], [], []
    chunk_lo, chunk_hi = [], []
    max_depth = 1
    tri_offset = 0
    while work:
        start, end = work.pop()
        sel = order[start:end]
        bvh, lperm = build_bvh(p0[sel], e1[sel], e2[sel], arity=_ARITY,
                               max_leaf=_MAX_LEAF,
                               spatial_splits=spatial_splits)
        gsel = sel[lperm]
        tab, dq = _pack_one_q(bvh, p0[gsel], e1[gsel], e2[gsel],
                              tri_offset=tri_offset)
        if tab.shape[0] > max_rows and end - start > _MAX_LEAF:
            mid = (start + end) // 2
            work.append((mid, end))
            work.append((start, mid))
            continue
        tabs.append(tab)
        perms.append(gsel)
        dqs.append(dq)
        q0, q1, q2 = dq[0], dq[0] + dq[1], dq[0] + dq[2]
        chunk_lo.append(np.minimum(np.minimum(q0, q1), q2).min(axis=0))
        chunk_hi.append(np.maximum(np.maximum(q0, q1), q2).max(axis=0))
        max_depth = max(max_depth, int(bvh.max_depth))
        tri_offset += len(gsel)
    r_max = max(t.shape[0] for t in tabs)
    stacked = np.zeros((len(tabs), r_max, _WIDTH), np.float32)
    for c, t in enumerate(tabs):
        stacked[c, :t.shape[0]] = t
    perm = np.concatenate(perms)
    dq = tuple(np.concatenate([d[i] for d in dqs]) for i in range(3))
    return QRowBVH(
        nodes=jnp.asarray(stacked), max_depth=max_depth,
        chunk_lo=jnp.asarray(np.stack(chunk_lo), jnp.float32),
        chunk_hi=jnp.asarray(np.stack(chunk_hi), jnp.float32)), perm, dq


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _make_kernel_q(n_rows_tab: int, stack_depth: int, any_hit: bool,
                   rows: int, culled: bool = False, n_chunks: int = 0):
    # NOTE: the two-level (instanced) qrow variant was REMOVED in r5: it
    # crashed the TPU worker with a data-dependent Mosaic fault and lost
    # its A/B anyway (perf/RESULTS_r4.md:101-104). Instanced scenes use the
    # f32 widerow tables (pallas_widestack/pallas_persistent_inst).
    K = _ARITY

    def kernel(*refs):
        work = cnt = work_near = None
        if culled:
            (work, cnt, work_near), refs = refs[:3], refs[3:]
        nodes, rays, out_t, out_tri, out_u, out_v, out_it = refs

        if culled:
            chunk_id = work[pl.program_id(0) * n_chunks + pl.program_id(1)]
            step_valid = pl.program_id(1) < cnt[pl.program_id(0)]
        else:
            step_valid = True
        first_chunk = pl.program_id(1) == 0
        if culled:
            near_f = work_near[
                pl.program_id(0) * n_chunks + pl.program_id(1)]
            step_valid = step_valid & jnp.logical_not(
                near_f > jnp.max(out_t[0]))

        def step_body():
            def comp(c):
                return rays[0, c, :].reshape(rows, _LANE)

            ox, oy, oz = comp(0), comp(1), comp(2)
            dx, dy, dz = comp(3), comp(4), comp(5)
            tmin = comp(6)
            tmax = comp(7)

            def safe_inv(v):
                tiny = jnp.where(v < 0, -1e-12, 1e-12)
                return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

            ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
            sp_iota = jax.lax.broadcasted_iota(
                jnp.int32, (rows, stack_depth), 1)

            cur0 = jnp.where(step_valid, 0, -1) if culled else 0
            init = (
                jnp.full((rows, 1), 0, jnp.int32) + cur0,
                jnp.zeros((rows, 1), jnp.int32),
                jnp.full((rows, stack_depth), -1, jnp.int32),
                jnp.where(first_chunk, tmax, out_t[0]),
                jnp.where(first_chunk, -1, out_tri[0]),
                jnp.where(first_chunk, 0.0, out_u[0]),
                jnp.where(first_chunk, 0.0, out_v[0]),
                jnp.where(first_chunk, (tmax * 0.0).astype(jnp.int32),
                          out_it[0]),
                (tmax * 0.0).astype(jnp.int32),
            )

            def cond(s):
                return jnp.max(s[0]) >= 0

            def body(s):
                (cur, sp, stack, best_t, best_tri, best_u, best_v,
                 iters, best_inst) = s
                active = cur >= 0  # [rows, 1]
                iters = iters + active.astype(jnp.int32)
                # leafness rides bit 30 of the walker state
                is_leaf = active & ((cur & _LEAF_BIT) > 0)
                curc = jnp.clip(cur & (_LEAF_BIT - 1), 0, n_rows_tab - 1)
                rowdat = jnp.concatenate(
                    [nodes[0, pl.ds(curc[r, 0], 1), :] for r in range(rows)],
                    axis=0)  # [rows, 32]
                int_active = active & ~is_leaf
                leaf_active = is_leaf

                def bits(col):
                    return jax.lax.bitcast_convert_type(
                        rowdat[:, col:col + 1], jnp.int32)

                # ---- internal: dequantize + slab-test 8 children --------
                def internal_fn(carry):
                    sp, stack = carry
                    plo_x = rowdat[:, 0:1]
                    plo_y = rowdat[:, 1:2]
                    plo_z = rowdat[:, 2:3]
                    sc = bits(3)
                    # 2^(e-127) by placing the exponent byte in an f32
                    sx = jax.lax.bitcast_convert_type(
                        (sc & 0xFF) << 23, jnp.float32)
                    sy = jax.lax.bitcast_convert_type(
                        ((sc >> 8) & 0xFF) << 23, jnp.float32)
                    sz = jax.lax.bitcast_convert_type(
                        ((sc >> 16) & 0xFF) << 23, jnp.float32)
                    nears, metas, valids = [], [], []
                    for k in range(K):
                        meta = bits(4 + k)
                        c0 = bits(12 + 2 * k)
                        c1 = bits(13 + 2 * k)
                        lox = plo_x + (c0 & 0xFF).astype(jnp.float32) * sx
                        loy = plo_y + ((c0 >> 8) & 0xFF) \
                            .astype(jnp.float32) * sy
                        loz = plo_z + ((c0 >> 16) & 0xFF) \
                            .astype(jnp.float32) * sz
                        hix = plo_x + (((c0 >> 24) & 0xFF) + 1) \
                            .astype(jnp.float32) * sx
                        hiy = plo_y + ((c1 & 0xFF) + 1) \
                            .astype(jnp.float32) * sy
                        hiz = plo_z + (((c1 >> 8) & 0xFF) + 1) \
                            .astype(jnp.float32) * sz
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
                        hits = near <= far
                        ok = int_active & (meta >= 0) & jnp.any(
                            hits, axis=1, keepdims=True)
                        row_near = jnp.min(jnp.where(hits, near, jnp.inf),
                                           axis=1, keepdims=True)
                        nears.append(jnp.where(ok, row_near, jnp.inf))
                        metas.append(meta)
                        valids.append(ok.astype(jnp.int32))
                    for a, b in _NET8:
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
                    for srt in range(K - 1, 0, -1):
                        do = valids[srt] > 0
                        stack = jnp.where(do & (sp_iota == sp),
                                          metas[srt], stack)
                        sp = sp + valids[srt]
                    nxt = jnp.where(valids[0] > 0, metas[0], -1)
                    return sp, stack, nxt

                sp, stack, nxt_int = internal_fn((sp, stack))

                # ---- leaf: dequantize verts + Moller-Trumbore ------------
                def leaf_fn(carry):
                    best_t, best_tri, best_u, best_v, best_inst = carry
                    bx = rowdat[:, 0:1]
                    by = rowdat[:, 1:2]
                    bz = rowdat[:, 2:3]
                    sx = rowdat[:, 3:4]
                    sy = rowdat[:, 4:5]
                    sz = rowdat[:, 5:6]
                    packedm = bits(29)
                    fst = packedm & ((1 << _COUNT_SHIFT) - 1)
                    cntv = jnp.where(leaf_active,
                                     packedm >> _COUNT_SHIFT, 0)

                    def short(i):
                        w = bits(6 + (i >> 1))
                        h = (w >> (16 * (i & 1))) & 0xFFFF
                        return h.astype(jnp.float32)

                    row_any = None
                    for j in range(_MAX_LEAF):
                        o9 = 9 * j
                        ax = bx + short(o9 + 0) * sx
                        ay = by + short(o9 + 1) * sy
                        az = bz + short(o9 + 2) * sz
                        bx2 = bx + short(o9 + 3) * sx
                        by2 = by + short(o9 + 4) * sy
                        bz2 = bz + short(o9 + 5) * sz
                        cx = bx + short(o9 + 6) * sx
                        cy = by + short(o9 + 7) * sy
                        cz = bz + short(o9 + 8) * sz
                        e1x, e1y, e1z = bx2 - ax, by2 - ay, bz2 - az
                        e2x, e2y, e2z = cx - ax, cy - ay, cz - az
                        # pvec = d x e2
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        det_ok = jnp.abs(det) > 1e-12
                        inv = 1.0 / jnp.where(det_ok, det, 1.0)
                        tx = ox - ax
                        ty = oy - ay
                        tz = oz - az
                        u = (tx * px + ty * py + tz * pz) * inv
                        # qvec = tvec x e1
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        v = (dx * qx + dy * qy + dz * qz) * inv
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv
                        ok = (
                            (j < cntv) & det_ok
                            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                            & (t > tmin) & (t < best_t)
                        )
                        if any_hit:
                            row_any = ok if row_any is None else (
                                row_any | ok)
                        else:
                            best_tri = jnp.where(ok, fst + j, best_tri)
                            best_t = jnp.where(ok, t, best_t)
                            best_u = jnp.where(ok, u, best_u)
                            best_v = jnp.where(ok, v, best_v)
                    if any_hit:
                        best_tri = jnp.where(row_any, fst, best_tri)
                        best_t = jnp.where(row_any, -1.0, best_t)
                    return best_t, best_tri, best_u, best_v, best_inst

                best_t, best_tri, best_u, best_v, best_inst = leaf_fn(
                    (best_t, best_tri, best_u, best_v, best_inst))

                # ---- advance ---------------------------------------------
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
            (_, _, _, best_t, best_tri, best_u, best_v, iters,
             best_inst) = out
            out_t[0] = best_t
            out_tri[0] = best_tri
            out_u[0] = best_u
            out_v[0] = best_v
            out_it[0] = iters

        if culled:
            pl.when(step_valid | first_chunk)(step_body)
        else:
            step_body()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_tab", "stack_depth", "any_hit", "rows",
                     "n_chunks"))
def _run_q(nodes, rays, n_rows_tab, stack_depth, any_hit, rows,
           chunk_lo=None, chunk_hi=None, n_chunks=1):
    g = rays.shape[0]
    tile = rows * _LANE
    culled = chunk_lo is not None and n_chunks > 1
    kernel = _make_kernel_q(n_rows_tab, stack_depth, any_hit, rows,
                            culled=culled, n_chunks=n_chunks)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
    ]
    if culled:
        work, cnt, work_near = _cull_worklists(chunk_lo, chunk_hi, rays,
                                               g, rows)
        out_block = pl.BlockSpec((1, rows, _LANE),
                                 lambda i, c, w, n, wn: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g, n_chunks),
            in_specs=[
                pl.BlockSpec((1, n_rows_tab, _WIDTH),
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
        grid=(g, 1),
        in_specs=[
            pl.BlockSpec((1, n_rows_tab, _WIDTH), lambda i, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
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


def _traverse_qrow(bvh: QRowBVH, tris: TriangleSoA, o, d, t_min, t_max,
                   any_hit: bool, rows: int = ROWS,
                   with_stats: bool = False):
    n_rays = o.shape[0]
    tile = rows * _LANE
    g = -(-n_rays // tile)
    n_pad = g * tile
    stack_depth = int(bvh.max_depth + 2) * (_ARITY - 1)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    def pad(x, fill):
        if x.shape[0] == n_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - x.shape[0],) + x.shape[1:], fill,
                         x.dtype)])

    comps = jnp.stack([
        pad(o[:, 0], 0.0), pad(o[:, 1], 0.0), pad(o[:, 2], 0.0),
        pad(d[:, 0], 1.0), pad(d[:, 1], 0.0), pad(d[:, 2], 0.0),
        pad(t_min, 0.0), pad(t_max, -1.0),
    ], axis=0)
    rays = comps.reshape(8, g, tile).transpose(1, 0, 2)
    best_t, best_tri, best_u, best_v, iters = _run_q(
        bvh.nodes, rays, n_rows_tab=bvh.nodes.shape[1],
        stack_depth=stack_depth, any_hit=any_hit, rows=rows,
        chunk_lo=bvh.chunk_lo, chunk_hi=bvh.chunk_hi,
        n_chunks=bvh.num_chunks)
    flat = lambda x: x.reshape(n_pad)[:n_rays]
    best_tri = flat(best_tri)
    hit = HitInfo(t=flat(best_t), tri=best_tri, u=flat(best_u),
                  v=flat(best_v), hit=best_tri >= 0)
    if with_stats:
        return hit, flat(iters)
    return hit


def intersect_closest_qrow(bvh: QRowBVH, tris: TriangleSoA, o, d,
                           t_min=1e-4, t_max=1e30, rows: int = ROWS,
                           with_stats: bool = False) -> HitInfo:
    return _traverse_qrow(bvh, tris, o, d, t_min, t_max, any_hit=False,
                          rows=rows, with_stats=with_stats)


def intersect_any_qrow(bvh: QRowBVH, tris: TriangleSoA, o, d,
                       t_min=1e-4, t_max=1e30, rows: int = ROWS):
    return _traverse_qrow(bvh, tris, o, d, t_min, t_max, any_hit=True,
                          rows=rows).hit
