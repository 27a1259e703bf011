"""Persistent row-slot Pallas traversal — dynamic work scheduling.

Fourth-generation TPU traversal kernel. The wide-stack kernel
(pallas_widestack.py) pays its SLOWEST row per tile: one while_loop steps
all 64 rows of a tile until the last row finishes, so a tile's cost is
`max(per-row iteration count)` while the useful work is the mean — a
measured x2.5-4.3 straggler tax on the open bench scene (perf/ROOFLINE.md,
the top round-5 lever).

This kernel keeps the 64-row x 128-lane vectorized walk (the per-iteration
code is IDENTICAL: same slab tests, same ordered-stack descent, same
Baldwin-Weber inline leaves) but decouples rows from slots:

- A grid step owns a POOL of `pool` ray rows resident in VMEM (not 64).
- 64 row-SLOTS walk the BVH. When a slot's row finishes, the slot writes
  that row's results to the output block with a dynamic store, pulls the
  next unconsumed pool row off a shared counter, loads its rays into a
  VMEM scratch row, and keeps walking — no dead iterations.
- The while loop ends when the pool is consumed and every slot has
  written back: total iterations ~= sum(per-row walks)/64 + tail,
  instead of n_tiles * E[max per-row walk].

Scheduling machinery per iteration (all measured-cheap primitives):
- done/refill masks are dataflow on [64,1] vregs; the rank of each
  finishing slot (its claim on the shared counter) is an exclusive
  cumulative sum computed with log2(rows) static sublane shifts —
  no scatter, no cumsum lowering, no cross-lane transpose.
- The writeback + refill block is a `pl.when`-gated unrolled slot loop
  (scalar extracts + one dynamic [1,5,128] store / one dynamic
  [1,8,128] load per event). Refills are ~1 event/iter on incoherent
  populations and ~8/iter on coherent ones (mean walk 7.8 iters), so
  the event cost rides well under the x2.5-4.3 straggler savings.
- Per-slot ray components and reciprocals live in VMEM scratch (pl.when
  regions can only mutate refs, not loop carries); best-hit state stays
  in the carry and is re-initialized for refilled slots with [64,1]-
  predicated selects.

Results pack into ONE output component row per ray row ([5,128]:
t, u, v, bitcast(tri), bitcast(iters)) so a writeback is a single
dynamic store.

v1 scope: single-chunk, non-instanced tables (the headline/1080p bench
path). Chunked & instanced variants keep the wide-stack kernel; the
dispatcher falls through automatically.

Replaces the reference's RT-core MIMD scheduling (OptiX persistent
warps / SM work distribution, SURVEY.md §7 hard part #1) with explicit
in-kernel work distribution. Correctness oracle: intersect_closest_brute
(tests/test_persistent.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfxexp_tpu.accel.pallas_widestack import (
    _COUNT_SHIFT,
    _NET4,
    _NET8,
    ROWS,
    WideRowBVH,
)
from gfxexp_tpu.accel.traverse import HitInfo
from gfxexp_tpu.scene.types import TriangleSoA

_LANE = 128
# pool sizing: VMEM budget 16 MB/core. Per pool row: rays [8,128] f32
# (4 KB) + packed out [5,128] f32 padded to 8 sublanes (4 KB), and Mosaic
# DOUBLE-BUFFERS both blocks (their index maps move with the grid) =
# 16 KB/row. The node table block has a constant index map (one copy);
# carries/scratch/stack ~1 MB. Measured: pool=1024 with a 7084-row table
# was 19.09 M (3.09 M over the scoped limit) — consistent with this model.
_POOL_CAP = int(os.environ.get("GFXEXP_PERSIST_POOL", "2048"))
# scheduling batch: run the unrolled writeback/refill block only when this
# many slots are simultaneously done (r5 sweep; 1 = original per-finish)
SCHED_K = int(os.environ.get("GFXEXP_PERSIST_SCHED_K", "16"))


def _default_pool(n_rows_tab: int, rows: int) -> int:
    # r5 empirical VMEM envelope on v5e: pool=4096 with a 7084-row table
    # (16 MB rays + 16 MB out, double-buffered at g=2) compiles and runs —
    # the effective budget is far above the 16 MB scoped default. Keep a
    # conservative 60 MB model: 16 KB per pool row (rays+out, double-
    # buffered) + 256 B per table row. pool=2048 measured best (fewest
    # grid steps; the straggler tail amortizes over the whole pool).
    avail = 60_000_000 - n_rows_tab * 256 - 3_500_000
    pool = min(_POOL_CAP, max(rows, avail // 16384))
    return int(pool)


def _safe_inv(v):
    tiny = jnp.where(v < 0, -1e-12, 1e-12)
    return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)


def _make_persistent_kernel(n_rows_tab: int, arity: int, width: int,
                            max_leaf: int, stack_depth: int, any_hit: bool,
                            rows: int, pool: int, sched_k: int = 1):
    """sched_k: only run the (expensive, 64-slot unrolled) writeback/refill
    block when >= sched_k slots are simultaneously done. Done slots idle
    masked for a few iterations (bounded waste ~sched_k/finish-rate) but the
    ~13 us scheduling block amortizes over sched_k refills — measured r5:
    ungated (sched_k=1) scheduling cost x6 the per-iteration walk cost."""
    net = _NET4 if arity <= 4 else _NET8
    K = arity
    sched_k = min(sched_k, rows)

    def kernel(nodes, rays, out_pk, ray_s, inv_s):
        # ---- prefill: slots 0..rows-1 take pool rows 0..rows-1 ----------
        # rays is COMPONENT-MAJOR [1, 8, pool, 128] so the per-iteration
        # scratch reads below are contiguous [rows, 128] blocks (the
        # row-major [rows, 8, 128] layout forced a strided sublane
        # relayout per component per iteration — measured x4 c_iter)
        dat0 = rays[0, :, 0:rows, :]  # [8, rows, 128]
        ray_s[...] = dat0
        inv_s[...] = _safe_inv(dat0[3:6])
        tmax0 = dat0[7]  # [rows, 128]
        # init from runtime data, not splats (Mosaic: splat-init while
        # carries get replicated layouts the body then can't match)
        zero_i = (tmax0 * 0.0).astype(jnp.int32)  # [rows, 128]
        zcol = zero_i[:, :1]  # [rows, 1]
        sp_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, stack_depth), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

        init = (
            jnp.int32(rows),                      # ctr: next pool row
            zcol,                                 # cur row (root = 0)
            zcol,                                 # sp
            jnp.broadcast_to(zcol, (rows, stack_depth)) - 1,  # stack
            row_iota + zcol,                      # slot_row
            tmax0,                                # best_t
            zero_i - 1,                           # best_tri
            tmax0 * 0.0,                          # best_u
            tmax0 * 0.0,                          # best_v
            zero_i,                               # iters
        )

        def cond(s):
            ctr, slot_row = s[0], s[4]
            # slot_row >= 0 while a slot is walking OR holds unwritten
            # results; writeback (body top) drops it to -1
            return (ctr < pool) | (jnp.max(slot_row) >= 0)

        def body(s):
            (ctr, cur, sp, stack, slot_row, best_t, best_tri, best_u,
             best_v, iters) = s

            # ---- writeback + refill (uses PREVIOUS iteration's state) ---
            done = (cur < 0).astype(jnp.int32)            # [rows, 1]
            pend = done * (slot_row >= 0).astype(jnp.int32)
            # trigger the scheduling block only when >= sched_k slots wait
            # (or the pool is drained, so the tail drains promptly)
            n_pend = jnp.sum(pend)
            do_sched = (n_pend >= sched_k) | ((ctr >= pool) & (n_pend > 0))
            pend = pend * do_sched.astype(jnp.int32)
            # exclusive rank among refillable slots via log-shift cumsum
            cum = pend
            sh = 1
            while sh < rows:
                cum = cum + jnp.concatenate(
                    [cum[:sh] * 0, cum[:-sh]], axis=0)
                sh *= 2
            rank = cum - pend
            new_row = rank + ctr                          # [rows, 1]
            can = pend * (new_row < pool).astype(jnp.int32)
            do_any = do_sched

            @pl.when(do_any)
            def _wb_refill():
                for r in range(rows):
                    @pl.when(pend[r, 0] > 0)
                    def _wb(r=r):
                        jrow = slot_row[r, 0]
                        pk = jnp.concatenate([
                            best_t[r:r + 1], best_u[r:r + 1],
                            best_v[r:r + 1],
                            jax.lax.bitcast_convert_type(
                                best_tri[r:r + 1], jnp.float32),
                            jax.lax.bitcast_convert_type(
                                iters[r:r + 1], jnp.float32),
                        ], axis=0)  # [5, 128]
                        out_pk[0, pl.ds(jrow, 1)] = pk[None]

                    @pl.when(can[r, 0] > 0)
                    def _refill(r=r):
                        j = new_row[r, 0]
                        dat = rays[0, :, pl.ds(j, 1), :]  # [8, 1, 128]
                        ray_s[:, r:r + 1, :] = dat
                        inv_s[:, r:r + 1, :] = _safe_inv(dat[3:6])

            # ---- merge refills into the carry (dataflow) ----------------
            rs = ray_s[...]   # [8, rows, 128] component-major
            iv = inv_s[...]   # [3, rows, 128]
            canb = can > 0
            cur = jnp.where(canb, 0, cur)
            sp = jnp.where(canb, 0, sp)
            # retire only slots whose writeback actually ran (gated pend);
            # ungated done slots keep slot_row and idle masked until the
            # next scheduling trigger
            slot_row = jnp.where(canb, new_row,
                                 jnp.where(pend > 0, -1, slot_row))
            best_t = jnp.where(canb, rs[7], best_t)
            best_tri = jnp.where(canb, -1, best_tri)
            best_u = jnp.where(canb, 0.0, best_u)
            best_v = jnp.where(canb, 0.0, best_v)
            iters = jnp.where(canb, 0, iters)
            ctr = ctr + jnp.sum(can)

            ox, oy, oz = rs[0], rs[1], rs[2]
            dx, dy, dz = rs[3], rs[4], rs[5]
            tmin = rs[6]
            tmax = rs[7]
            ix, iy, iz = iv[0], iv[1], iv[2]

            # ---- traversal step (identical to pallas_widestack) ---------
            active = cur >= 0  # [rows, 1]
            iters = iters + active.astype(jnp.int32)
            curc = jnp.clip(cur, 0, n_rows_tab - 1)
            rowdat = jnp.concatenate(
                [nodes[0, pl.ds(curc[r, 0], 1), :] for r in range(rows)],
                axis=0)  # [rows, width]
            is_leaf = rowdat[:, width - 1:width] > 0.5
            int_active = active & ~is_leaf
            leaf_active = active & is_leaf

            # internal phase: test K children, ordered push
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
                hits = near <= far
                ok = int_active & (meta >= 0) & jnp.any(
                    hits, axis=1, keepdims=True)
                row_near = jnp.min(jnp.where(hits, near, jnp.inf),
                                   axis=1, keepdims=True)
                nears.append(jnp.where(ok, row_near, jnp.inf))
                metas.append(meta)
                valids.append(ok.astype(jnp.int32))
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
            for srt in range(K - 1, 0, -1):
                do = valids[srt] > 0
                stack = jnp.where(do & (sp_iota == sp), metas[srt], stack)
                sp = sp + valids[srt]
            nxt_int = jnp.where(valids[0] > 0, metas[0], -1)

            # leaf phase: Baldwin-Weber triangles inline in the row
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
                den_ok = jnp.abs(den) > 1e-12
                t = -num / jnp.where(den_ok, den, 1.0)
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
                    row_any = ok if row_any is None else (row_any | ok)
                else:
                    best_tri = jnp.where(ok, fst + j, best_tri)
                    best_t = jnp.where(ok, t, best_t)
                    best_u = jnp.where(ok, u, best_u)
                    best_v = jnp.where(ok, v, best_v)
            if any_hit:
                best_tri = jnp.where(row_any, fst, best_tri)
                best_t = jnp.where(row_any, -1.0, best_t)

            # advance: descend, else pop, else done
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
            return (ctr, nxt, sp, stack, slot_row, best_t, best_tri,
                    best_u, best_v, iters)

        jax.lax.while_loop(cond, body, init)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_tab", "arity", "width", "max_leaf",
                     "stack_depth", "any_hit", "rows", "pool", "sched_k"))
def _run_persistent(nodes, rays, n_rows_tab, arity, width, max_leaf,
                    stack_depth, any_hit, rows, pool, sched_k=1):
    g = rays.shape[0]
    kernel = _make_persistent_kernel(n_rows_tab, arity, width, max_leaf,
                                     stack_depth, any_hit, rows, pool,
                                     sched_k=sched_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, pool, 5, _LANE), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_rows_tab, width), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, pool, _LANE), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pool, 5, _LANE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, rows, _LANE), jnp.float32),   # per-slot rays
            pltpu.VMEM((3, rows, _LANE), jnp.float32),   # reciprocals
        ],
        interpret=jax.default_backend() != "tpu",
    )(nodes, rays)


def _traverse_persistent(bvh: WideRowBVH, tris: TriangleSoA, o, d, t_min,
                         t_max, any_hit: bool, rows: int = ROWS,
                         pool: int | None = None, with_stats: bool = False,
                         sched_k: int = SCHED_K):
    assert bvh.nodes.shape[0] == 1, "persistent kernel is single-chunk (v1)"
    n_rays = o.shape[0]
    n_rows_tab = bvh.nodes.shape[1]
    if pool is None:
        pool = _default_pool(n_rows_tab, rows)
    pool = max(pool, rows)
    tile = pool * _LANE
    g = -(-n_rays // tile)
    n_pad = g * tile

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
    )  # [8, n_pad]
    rays = comps.reshape(8, g, pool, _LANE).transpose(1, 0, 2, 3)

    stack_depth = int(bvh.max_depth + 2) * max(bvh.arity - 1, 1)
    out_pk = _run_persistent(
        bvh.nodes, rays,
        n_rows_tab=n_rows_tab, arity=bvh.arity, width=bvh.width,
        max_leaf=bvh.max_leaf, stack_depth=stack_depth, any_hit=any_hit,
        rows=rows, pool=pool, sched_k=sched_k)  # [g, pool, 5, 128]

    def flat(c):
        return out_pk[:, :, c, :].reshape(n_pad)[:n_rays]

    best_tri = jax.lax.bitcast_convert_type(flat(3), jnp.int32)
    hit = HitInfo(
        t=flat(0), tri=best_tri, u=flat(1), v=flat(2),
        hit=best_tri >= 0,
    )
    if with_stats:
        iters = jax.lax.bitcast_convert_type(flat(4), jnp.int32)
        return hit, iters
    return hit


def intersect_closest_persistent(bvh: WideRowBVH, tris: TriangleSoA, o, d,
                                 t_min=1e-4, t_max=1e30, rows: int = ROWS,
                                 pool: int | None = None,
                                 with_stats: bool = False,
                                 sched_k: int | None = None) -> HitInfo:
    return _traverse_persistent(bvh, tris, o, d, t_min, t_max,
                                any_hit=False, rows=rows, pool=pool,
                                with_stats=with_stats,
                                sched_k=sched_k or SCHED_K)


def intersect_any_persistent(bvh: WideRowBVH, tris: TriangleSoA, o, d,
                             t_min=1e-4, t_max=1e30, rows: int = ROWS,
                             pool: int | None = None,
                             sched_k: int | None = None):
    return _traverse_persistent(bvh, tris, o, d, t_min, t_max,
                                any_hit=True, rows=rows, pool=pool,
                                sched_k=sched_k or SCHED_K).hit


def persistent_supported(bvh) -> bool:
    """The v1 persistent kernel covers single-chunk WideRowBVH tables."""
    return (isinstance(bvh, WideRowBVH) and bvh.nodes.shape[0] == 1
            and bvh.width == 64)
