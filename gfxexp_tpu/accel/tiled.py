"""Tile-shared skip-link traversal — the TPU execution scheme.

Per-lane traversal (accel/skiplink.py) makes every while_loop step do a
262k-lane gather of node data; TPU gathers dominate and throughput collapses
(measured 0.04 Mrays/s at 512^2). This scheme assigns ONE traversal cursor
per *tile* of T consecutive rays: the tile walks the skip-list; the node is
fetched with a [G]-row gather (G = #tiles, tiny) and broadcast against all T
rays (pure vector math). The tile descends if ANY of its rays hits the node.

Per-step op count is the second-order bottleneck (each while iteration pays
per-op dispatch latency), so node and leaf-triangle data are PACKED:
- nodes: one [M, 16] f32 row = lo.xyz | hi.xyz | first | count | skip | pad
  (int fields bitcast) -> ONE gather per step
- leaf triangles: [T, 12] rows = p0 | e1 | e2 | pad; a leaf's <=max_leaf rows
  are contiguous -> ONE [max_leaf, 12] gather per step

Cost model: trip count = skip nodes visited by the UNION of the tile's rays;
wins require intra-tile coherence (block-major pixel order for primary and
shadow rays — see render/pathtrace.py; octant sorting for bounce rays).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.accel.skiplink import SkipBVH
from gfxexp_tpu.accel.traverse import HitInfo
from gfxexp_tpu.scene.types import TriangleSoA

DEFAULT_TILE = 256


def pack_nodes(bvh: SkipBVH) -> jnp.ndarray:
    """[M, 16] f32 node rows (ints bitcast into float lanes)."""
    m = bvh.num_nodes
    packed = jnp.zeros((m, 16), jnp.float32)
    packed = packed.at[:, 0:3].set(bvh.aabb_min)
    packed = packed.at[:, 3:6].set(bvh.aabb_max)
    as_f = lambda x: jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)
    packed = packed.at[:, 6].set(as_f(bvh.first))
    packed = packed.at[:, 7].set(as_f(bvh.count))
    packed = packed.at[:, 8].set(as_f(bvh.skip))
    return packed


def pack_triangles(tris: TriangleSoA) -> jnp.ndarray:
    """[T, 12] f32 rows: p0 | e1 | e2 | pad."""
    t = tris.p0.shape[0]
    packed = jnp.zeros((t, 12), jnp.float32)
    packed = packed.at[:, 0:3].set(tris.p0)
    packed = packed.at[:, 3:6].set(tris.e1)
    packed = packed.at[:, 6:9].set(tris.e2)
    return packed


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
    )


def _traverse_tiled(bvh: SkipBVH, tris: TriangleSoA, o, d, t_min, t_max,
                    any_hit: bool, tile: int):
    n_rays = o.shape[0]
    n_nodes = bvh.num_nodes
    max_leaf = bvh.max_leaf
    g = -(-n_rays // tile)
    n_pad = g * tile

    nodes = pack_nodes(bvh)
    tri_pack = pack_triangles(tris)
    # pad so a leaf slice never reads out of bounds
    tri_pack = jnp.concatenate(
        [tri_pack, jnp.zeros((max_leaf, 12), jnp.float32)], axis=0
    )

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))
    o_p = _pad_to(o, n_pad, 0.0).reshape(g, tile, 3)
    d_p = _pad_to(d, n_pad, 1.0).reshape(g, tile, 3)
    tmin_p = _pad_to(t_min, n_pad, 0.0).reshape(g, tile)
    # padded lanes get t_max = -1 so they never hit anything
    tmax_p = _pad_to(t_max, n_pad, -1.0).reshape(g, tile)

    inv_d = 1.0 / jnp.where(
        jnp.abs(d_p) < 1e-12, jnp.where(d_p < 0, -1e-12, 1e-12), d_p
    )

    def tile_fn(o_t, inv_t, d_t, tmin_t, tmax_t):
        init = (
            jnp.int32(0),
            tmax_t,
            jnp.full((tile,), -1, jnp.int32),
            jnp.zeros((tile,), jnp.float32),
            jnp.zeros((tile,), jnp.float32),
        )

        def cond(s):
            return s[0] < n_nodes

        def body(s):
            cur, best_t, best_tri, best_u, best_v = s
            row = jax.lax.dynamic_slice(nodes, (cur, 0), (1, 16))[0]
            lo = row[0:3]
            hi = row[3:6]
            fst = jax.lax.bitcast_convert_type(row[6], jnp.int32)
            cnt = jax.lax.bitcast_convert_type(row[7], jnp.int32)
            skp = jax.lax.bitcast_convert_type(row[8], jnp.int32)

            t0 = (lo[None, :] - o_t) * inv_t
            t1 = (hi[None, :] - o_t) * inv_t
            near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), tmin_t)
            far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), best_t)
            ray_hits = near <= far
            tile_hit = jnp.any(ray_hits)

            is_leaf = cnt > 0
            # leaf: ONE gather of the tile's triangle rows, masked tests
            leaf_rows = jax.lax.dynamic_slice(
                tri_pack, (jnp.where(is_leaf, fst, 0), 0), (max_leaf, 12)
            )  # [L, 12]
            p0 = leaf_rows[:, 0:3][:, None, :]  # [L, 1, 3]
            e1 = leaf_rows[:, 3:6][:, None, :]
            e2 = leaf_rows[:, 6:9][:, None, :]
            db = d_t[None, :, :]  # [1, T, 3]
            ob = o_t[None, :, :]
            pv = jnp.cross(db, e2)
            det = jnp.sum(e1 * pv, axis=-1)  # [L, T]
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tv = ob - p0
            u = jnp.sum(tv * pv, axis=-1) * inv_det
            qv = jnp.cross(tv, e1)
            v = jnp.sum(db * qv, axis=-1) * inv_det
            t = jnp.sum(e2 * qv, axis=-1) * inv_det
            jrange = jnp.arange(max_leaf, dtype=jnp.int32)[:, None]
            ok = (
                is_leaf & tile_hit & (jrange < cnt) & ray_hits[None, :]
                & (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > tmin_t[None, :]) & (t < best_t[None, :])
            )
            t_masked = jnp.where(ok, t, jnp.inf)
            jbest = jnp.argmin(t_masked, axis=0)  # [T]
            tcols = jnp.arange(tile)
            any_ok = ok[jbest, tcols]
            tbest = t_masked[jbest, tcols]
            take = any_ok & (tbest < best_t)
            best_tri = jnp.where(take, fst + jbest, best_tri)
            best_t = jnp.where(take, tbest, best_t)
            best_u = jnp.where(take, u[jbest, tcols], best_u)
            best_v = jnp.where(take, v[jbest, tcols], best_v)

            nxt = jnp.where(tile_hit & ~is_leaf, cur + 1, skp)
            if any_hit:
                live = (tmax_t > 0) & (best_tri < 0)
                nxt = jnp.where(jnp.any(live), nxt, n_nodes)
            return (nxt, best_t, best_tri, best_u, best_v)

        _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(cond, body, init)
        return best_t, best_tri, best_u, best_v

    best_t, best_tri, best_u, best_v = jax.vmap(tile_fn)(
        o_p, inv_d, d_p, tmin_p, tmax_p
    )
    flat = lambda x: x.reshape(n_pad)[:n_rays]
    best_tri = flat(best_tri)
    return HitInfo(
        t=flat(best_t),
        tri=best_tri,
        u=flat(best_u),
        v=flat(best_v),
        hit=best_tri >= 0,
    )


def intersect_closest_tiled(bvh: SkipBVH, tris: TriangleSoA, o, d,
                            t_min=1e-4, t_max=1e30,
                            tile: int = DEFAULT_TILE) -> HitInfo:
    return _traverse_tiled(bvh, tris, o, d, t_min, t_max, any_hit=False,
                           tile=tile)


def intersect_any_tiled(bvh: SkipBVH, tris: TriangleSoA, o, d,
                        t_min=1e-4, t_max=1e30,
                        tile: int = DEFAULT_TILE):
    return _traverse_tiled(bvh, tris, o, d, t_min, t_max, any_hit=True,
                           tile=tile).hit
