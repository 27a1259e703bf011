"""Pallas TPU BVH traversal kernel — the hot kernel of the framework.

Why Pallas: in the XLA formulation (accel/tiled.py) each while-loop step
gathers node rows with per-tile indices; XLA lowers those gathers as one-hot
matmuls (cost ~ tiles x nodes x 16), measured at ~0.5 ms *per traversal step*
on v5e. Inside a Pallas kernel the node fetch is a real addressed VMEM load
(~cycles), so the tile-shared walk runs at silicon speed.

Scheme (same algorithm as accel/tiled.py): one skip-list cursor per tile of
TILE=1024 rays (one [8, 128] vreg set). Per step: load one node row (scalar
dynamic index), broadcast AABB test against all rays of the tile, and for
leaves broadcast-test up to max_leaf triangles. Descend iff ANY ray hits.
The grid iterates over ray tiles; node/triangle tables are VMEM-resident
(limits: ~64 B/node, 48 B/tri — fine up to ~100k nodes / ~80k tris per
VMEM; larger scenes need the HBM-streaming variant, later round).

Replaces the reference's RT-core traversal (OptiX) per SURVEY.md §7
"hard parts #1". Correctness oracle: accel/tiled.py + brute force.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gfxexp_tpu.accel.skiplink import SkipBVH
from gfxexp_tpu.accel.traverse import HitInfo
from gfxexp_tpu.scene.types import TriangleSoA

TILE = 4096  # rays per tile (TILE/128 sublanes x 128 lanes per vreg group)
_LANE = 128
_SUB = TILE // _LANE


def _node_tables(bvh: SkipBVH):
    """nodes_f [M, 8] f32: lo.xyz hi.xyz pad pad; nodes_i [M, 4] i32:
    first count skip pad."""
    m = bvh.num_nodes
    nf = jnp.zeros((m, 8), jnp.float32)
    nf = nf.at[:, 0:3].set(bvh.aabb_min)
    nf = nf.at[:, 3:6].set(bvh.aabb_max)
    ni = jnp.zeros((m, 4), jnp.int32)
    ni = ni.at[:, 0].set(bvh.first)
    ni = ni.at[:, 1].set(bvh.count)
    ni = ni.at[:, 2].set(bvh.skip)
    return nf, ni


def _tri_table(tris: TriangleSoA, max_leaf: int):
    t = tris.p0.shape[0]
    tp = jnp.zeros((t + max_leaf, 12), jnp.float32)
    tp = tp.at[:t, 0:3].set(tris.p0)
    tp = tp.at[:t, 3:6].set(tris.e1)
    tp = tp.at[:t, 6:9].set(tris.e2)
    return tp


def _make_kernel(n_nodes: int, max_leaf: int, any_hit: bool):
    def kernel(nodes_f, nodes_i, tri_pack, rays, out_t, out_tri, out_u, out_v):
        # rays block: [1, 8, TILE] -> components o.xyz d.xyz tmin tmax
        def comp(c):
            return rays[0, c, :].reshape(_SUB, _LANE)

        ox, oy, oz = comp(0), comp(1), comp(2)
        dx, dy, dz = comp(3), comp(4), comp(5)
        tmin = comp(6)
        tmax = comp(7)

        def safe_inv(v):
            tiny = jnp.where(v < 0, -1e-12, 1e-12)
            return 1.0 / jnp.where(jnp.abs(v) < 1e-12, tiny, v)

        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        init = (
            jnp.int32(0),
            tmax,
            jnp.full((_SUB, _LANE), -1, jnp.int32),
            jnp.zeros((_SUB, _LANE), jnp.float32),
            jnp.zeros((_SUB, _LANE), jnp.float32),
        )

        def cond(s):
            return s[0] < n_nodes

        def body(s):
            cur, best_t, best_tri, best_u, best_v = s
            frow = nodes_f[pl.ds(cur, 1), :]  # [1, 8]
            lox, loy, loz = frow[0, 0], frow[0, 1], frow[0, 2]
            hix, hiy, hiz = frow[0, 3], frow[0, 4], frow[0, 5]
            irow = nodes_i[pl.ds(cur, 1), :]  # [1, 4]
            fst, cnt, skp = irow[0, 0], irow[0, 1], irow[0, 2]

            tx0 = (lox - ox) * ix
            tx1 = (hix - ox) * ix
            ty0 = (loy - oy) * iy
            ty1 = (hiy - oy) * iy
            tz0 = (loz - oz) * iz
            tz1 = (hiz - oz) * iz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.maximum(jnp.minimum(tz0, tz1), tmin),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.minimum(jnp.maximum(tz0, tz1), best_t),
            )
            ray_hits = near <= far
            tile_hit = jnp.any(ray_hits)

            is_leaf = cnt > 0

            # leaf triangle tests behind a scalar branch: at large TILE the
            # kernel is VPU-bound and skipping the ~max_leaf x 140 vector ops
            # on internal-node steps wins (at TILE=1024 the branch lost to
            # scalar-op latency — re-evaluate if TILE changes)
            def leaf_fn(carry):
                best_t, best_tri, best_u, best_v = carry
                for j in range(max_leaf):
                    trow = tri_pack[pl.ds(fst + j, 1), :]
                    p0x, p0y, p0z = trow[0, 0], trow[0, 1], trow[0, 2]
                    e1x, e1y, e1z = trow[0, 3], trow[0, 4], trow[0, 5]
                    e2x, e2y, e2z = trow[0, 6], trow[0, 7], trow[0, 8]
                    # pv = d x e2
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    det_ok = jnp.abs(det) > 1e-12
                    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                    tvx = ox - p0x
                    tvy = oy - p0y
                    tvz = oz - p0z
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    ok = (
                        (j < cnt) & ray_hits
                        & det_ok
                        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        & (t > tmin) & (t < best_t)
                    )
                    best_tri = jnp.where(ok, fst + j, best_tri)
                    best_t = jnp.where(ok, t, best_t)
                    best_u = jnp.where(ok, u, best_u)
                    best_v = jnp.where(ok, v, best_v)
                return best_t, best_tri, best_u, best_v

            best_t, best_tri, best_u, best_v = jax.lax.cond(
                tile_hit & is_leaf, leaf_fn, lambda c: c,
                (best_t, best_tri, best_u, best_v),
            )

            nxt = jnp.where(tile_hit & (cnt == 0), cur + 1, skp)
            if any_hit:
                live = (tmax > 0.0) & (best_tri < 0)
                nxt = jnp.where(jnp.any(live), nxt, n_nodes)
            return (nxt, best_t, best_tri, best_u, best_v)

        _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, init)
        out_t[0] = best_t
        out_tri[0] = best_tri
        out_u[0] = best_u
        out_v[0] = best_v

    return kernel


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_leaf", "any_hit"))
def _run(nodes_f, nodes_i, tri_pack, rays, n_nodes, max_leaf, any_hit):
    g = rays.shape[0]
    kernel = _make_kernel(n_nodes, max_leaf, any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((g, _SUB, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, _SUB, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((g, _SUB, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((g, _SUB, _LANE), jnp.float32),
    ]
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes_f (whole array)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes_i
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tri_pack
            pl.BlockSpec((1, 8, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
    )(nodes_f, nodes_i, tri_pack, rays)


def _traverse_pallas(bvh: SkipBVH, tris: TriangleSoA, o, d, t_min, t_max,
                     any_hit: bool):
    n_rays = o.shape[0]
    g = -(-n_rays // TILE)
    n_pad = g * TILE

    nodes_f, nodes_i = _node_tables(bvh)
    tri_pack = _tri_table(tris, bvh.max_leaf)

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
            pad(t_min, 0.0), pad(t_max, -1.0),  # padded rays: tmax<0, no hits
        ],
        axis=0,
    )  # [8, n_pad]
    rays = comps.reshape(8, g, TILE).transpose(1, 0, 2)  # [g, 8, TILE]

    best_t, best_tri, best_u, best_v = _run(
        nodes_f, nodes_i, tri_pack, rays,
        n_nodes=bvh.num_nodes, max_leaf=bvh.max_leaf, any_hit=any_hit,
    )
    flat = lambda x: x.reshape(n_pad)[:n_rays]
    best_tri = flat(best_tri)
    return HitInfo(
        t=flat(best_t), tri=best_tri, u=flat(best_u), v=flat(best_v),
        hit=best_tri >= 0,
    )


def intersect_closest_pallas(bvh: SkipBVH, tris: TriangleSoA, o, d,
                             t_min=1e-4, t_max=1e30) -> HitInfo:
    return _traverse_pallas(bvh, tris, o, d, t_min, t_max, any_hit=False)


def intersect_any_pallas(bvh: SkipBVH, tris: TriangleSoA, o, d,
                         t_min=1e-4, t_max=1e30):
    return _traverse_pallas(bvh, tris, o, d, t_min, t_max, any_hit=True).hit
