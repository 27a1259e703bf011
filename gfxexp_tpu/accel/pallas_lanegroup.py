"""Lane-group traversal prototype: sub-row cursors (VERDICT r5 item #5).

The reference gets per-ray MIMD traversal from RT cores
(/root/reference/utils/optix_util.h:1963 launches; SURVEY §7 hard part #1).
On the TPU VPU true per-lane traversal is structurally impossible: lanes
are SIMD and Mosaic exposes no per-lane gather from VMEM, so every cursor
granularity must share one dynamically-indexed node fetch. The widestack
kernel (accel/pallas_widestack.py) uses one cursor per 128-lane row, which
pays the measured x6.3 "union footprint" tax on incoherent rays
(perf/ROOFLINE.md): the row walks the UNION of the subtrees its 128 lanes
want.

This prototype halves/quarters the sharing: each 128-lane row is split
into G lane-GROUPS (G = 2 or 4), each with its own cursor, stack, and
worklist; per iteration the kernel fetches G node rows per row and builds
lane-mixed component vectors (one select per component per extra group) so
the shared [rows, 128] slab/leaf ALU tests every lane against ITS group's
node. Union footprint shrinks to a 128/G-lane union at the cost of:

  * G x rows dynamic row fetches per iteration (vs rows),
  * (G-1) selects per node component (~78 components/iteration),
  * G x K masked per-group entry-distance reductions (vs K).

Closest-hit, single-chunk only — this is a measurement prototype, not a
production path; perf/lanegroup_ab.py A/Bs it against widestack/persistent
and perf/RESULTS_r5.md records the adopt-or-decline verdict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfxexp_tpu.accel.pallas_widestack import (
    _COUNT_SHIFT,
    _LANE,
    _NET4,
    _NET8,
    WideRowBVH,
)
from gfxexp_tpu.accel.traverse import HitInfo
from gfxexp_tpu.scene.types import TriangleSoA


def _make_kernel(n_rows_tab: int, arity: int, width: int, max_leaf: int,
                 stack_depth: int, rows: int, groups: int):
    net = _NET4 if arity <= 4 else _NET8
    K = arity
    G = groups
    lsz = _LANE // G

    def kernel(nodes, rays, out_t, out_tri, out_u, out_v, out_it):
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
        sp_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, stack_depth), 1)
        lane_grp = jax.lax.broadcasted_iota(
            jnp.int32, (rows, _LANE), 1) // lsz

        def gmask(g):
            return lane_grp == g

        def mix(vals):
            """[rows,1] per group -> lane-mixed [rows, _LANE] (group g's
            value on its lsz lanes); one select per extra group."""
            acc = jnp.where(gmask(0), vals[0], vals[-1])
            for g in range(1, G - 1):
                acc = jnp.where(gmask(g), vals[g], acc)
            return acc

        # while carry: G copies of (cur, sp) [rows,1], G stacks
        # [rows, depth], shared best-hit lanes [rows, _LANE], iters.
        zero_rows = (tmax[:, :1] * 0.0).astype(jnp.int32)  # runtime zeros
        init = (
            tuple(zero_rows for _ in range(G)),            # cur (root = 0)
            tuple(zero_rows for _ in range(G)),            # sp
            tuple(jnp.zeros((rows, stack_depth), jnp.int32) - 1
                  for _ in range(G)),                      # stacks
            tmax,                                          # best_t
            (tmax * 0.0).astype(jnp.int32) - 1,            # best_tri
            tmax * 0.0,                                    # best_u
            tmax * 0.0,                                    # best_v
            (tmax * 0.0).astype(jnp.int32),                # iters
        )

        def cond(s):
            m = s[0][0]
            for g in range(1, G):
                m = jnp.maximum(m, s[0][g])
            return jnp.max(m) >= 0

        def body(s):
            curs, sps, stacks, best_t, best_tri, best_u, best_v, iters = s
            active = [c >= 0 for c in curs]                # [rows,1] each
            iters = iters + mix([a.astype(jnp.int32) for a in active])
            rowdats = []
            for g in range(G):
                curc = jnp.clip(curs[g], 0, n_rows_tab - 1)
                rowdats.append(jnp.concatenate(
                    [nodes[0, pl.ds(curc[r, 0], 1), :] for r in range(rows)],
                    axis=0))                               # [rows, width]
            is_leaf = [rd[:, width - 1:width] > 0.5 for rd in rowdats]
            int_act = [a & ~l for a, l in zip(active, is_leaf)]
            leaf_act = [a & l for a, l in zip(active, is_leaf)]

            def mslice(c):
                return mix([rd[:, c:c + 1] for rd in rowdats])

            # ---- internal phase: per-group ordered push ------------------
            nears = [[] for _ in range(G)]
            metas = [[] for _ in range(G)]
            valids = [[] for _ in range(G)]
            for k in range(K):
                base = 7 * k
                lox, loy, loz = mslice(base), mslice(base + 1), mslice(base + 2)
                hix, hiy, hiz = mslice(base + 3), mslice(base + 4), mslice(base + 5)
                tx0 = (lox - ox) * ix
                tx1 = (hix - ox) * ix
                ty0 = (loy - oy) * iy
                ty1 = (hiy - oy) * iy
                tz0 = (loz - oz) * iz
                tz1 = (hiz - oz) * iz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tmin))
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), best_t))
                hits = near <= far                         # [rows, _LANE]
                near_m = jnp.where(hits, near, jnp.inf)
                for g in range(G):
                    meta = jax.lax.bitcast_convert_type(
                        rowdats[g][:, base + 6:base + 7], jnp.int32)
                    grp_hits = hits & gmask(g)
                    ok = int_act[g] & (meta >= 0) & jnp.any(
                        grp_hits, axis=1, keepdims=True)
                    row_near = jnp.min(
                        jnp.where(gmask(g), near_m, jnp.inf),
                        axis=1, keepdims=True)
                    nears[g].append(jnp.where(ok, row_near, jnp.inf))
                    metas[g].append(meta)
                    valids[g].append(ok.astype(jnp.int32))

            new_sps, new_stacks, nxts = [], [], []
            for g in range(G):
                ng, mg, vg = nears[g], metas[g], valids[g]
                for a, b in net:
                    swap = ng[a] > ng[b]
                    ng[a], ng[b] = (jnp.where(swap, ng[b], ng[a]),
                                    jnp.where(swap, ng[a], ng[b]))
                    mg[a], mg[b] = (jnp.where(swap, mg[b], mg[a]),
                                    jnp.where(swap, mg[a], mg[b]))
                    vg[a], vg[b] = (jnp.where(swap, vg[b], vg[a]),
                                    jnp.where(swap, vg[a], vg[b]))
                sp, stack = sps[g], stacks[g]
                for srt in range(K - 1, 0, -1):
                    do = vg[srt] > 0
                    stack = jnp.where(do & (sp_iota == sp), mg[srt], stack)
                    sp = sp + vg[srt]
                nxts.append(jnp.where(vg[0] > 0, mg[0], -1))
                new_sps.append(sp)
                new_stacks.append(stack)

            # ---- leaf phase: lane-mixed Baldwin–Weber triangles ----------
            packed = [jax.lax.bitcast_convert_type(
                rd[:, width - 4:width - 3], jnp.int32) for rd in rowdats]
            fst = mix([p & ((1 << _COUNT_SHIFT) - 1) for p in packed])
            cnt = mix([jnp.where(la, p >> _COUNT_SHIFT, 0)
                       for la, p in zip(leaf_act, packed)])
            for j in range(max_leaf):
                base = 12 * j
                nx, ny, nz = mslice(base), mslice(base + 1), mslice(base + 2)
                nd = mslice(base + 3)
                den = nx * dx + ny * dy + nz * dz
                num = nx * ox + ny * oy + nz * oz + nd
                den_ok = jnp.abs(den) > 1e-12
                t = -num / jnp.where(den_ok, den, 1.0)
                px = ox + t * dx
                py = oy + t * dy
                pz = oz + t * dz
                ux, uy, uz = mslice(base + 4), mslice(base + 5), mslice(base + 6)
                ud = mslice(base + 7)
                u = ux * px + uy * py + uz * pz + ud
                vx, vy, vz = mslice(base + 8), mslice(base + 9), mslice(base + 10)
                vd = mslice(base + 11)
                v = vx * px + vy * py + vz * pz + vd
                ok = (
                    (j < cnt) & den_ok
                    & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > tmin) & (t < best_t)
                )
                best_tri = jnp.where(ok, fst + j, best_tri)
                best_t = jnp.where(ok, t, best_t)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)

            # ---- advance per group --------------------------------------
            new_curs = []
            for g in range(G):
                nxt = jnp.where(int_act[g], nxts[g], -1)
                sp, stack = new_sps[g], new_stacks[g]
                can_pop = (nxt < 0) & (sp > 0)
                popped = jnp.max(
                    jnp.where(can_pop & (sp_iota == sp - 1), stack, -1),
                    axis=1, keepdims=True)
                new_sps[g] = sp - can_pop.astype(jnp.int32)
                new_curs.append(jnp.where(can_pop, popped, nxt))

            return (tuple(new_curs), tuple(new_sps), tuple(new_stacks),
                    best_t, best_tri, best_u, best_v, iters)

        out = jax.lax.while_loop(cond, body, init)
        _, _, _, best_t, best_tri, best_u, best_v, iters = out
        out_t[0] = best_t
        out_tri[0] = best_tri
        out_u[0] = best_u
        out_v[0] = best_v
        out_it[0] = iters

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_tab", "arity", "width", "max_leaf",
                     "stack_depth", "rows", "groups"))
def _run(nodes, rays, n_rows_tab, arity, width, max_leaf, stack_depth,
         rows, groups):
    g = rays.shape[0]
    tile = rows * _LANE
    kernel = _make_kernel(n_rows_tab, arity, width, max_leaf, stack_depth,
                          rows, groups)
    out_shape = [
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, rows, _LANE), jnp.int32),
    ]
    out_block = pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, n_rows_tab, width), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tile), lambda i: (i, 0, 0),
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


def intersect_closest_lanegroup(bvh: WideRowBVH, tris: TriangleSoA, o, d,
                                t_min=1e-4, t_max=1e30, rows: int = 32,
                                groups: int = 2,
                                with_stats: bool = False) -> HitInfo:
    """Closest-hit via the lane-group prototype. Single-chunk tables only.

    `groups` cursors per 128-lane row; rays keep their natural lane order,
    so group membership is (lane // (128/groups)) — the same coherence the
    widestack row enjoys, split G ways."""
    assert bvh.nodes.shape[0] == 1, "lanegroup prototype is single-chunk"
    assert _LANE % groups == 0 and groups >= 1
    n_rays = o.shape[0]
    tile = rows * _LANE
    g = -(-n_rays // tile)
    n_pad = g * tile
    nodes = bvh.nodes
    stack_depth = int(bvh.max_depth + 2) * max(bvh.arity - 1, 1)

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
        nodes, rays, n_rows_tab=nodes.shape[1], arity=bvh.arity,
        width=bvh.width, max_leaf=bvh.max_leaf, stack_depth=stack_depth,
        rows=rows, groups=groups)
    flat = lambda x: x.reshape(n_pad)[:n_rays]
    best_tri = flat(best_tri)
    hit = HitInfo(
        t=flat(best_t), tri=best_tri, u=flat(best_u), v=flat(best_v),
        hit=best_tri >= 0,
    )
    if with_stats:
        return hit, flat(iters)
    return hit
