"""Batched BVH traversal (pure JAX; a Pallas variant lives in
traverse_pallas.py once profiled).

Replaces the reference's hardware OptiX traversal (RG/IS/AH/CH programs over
RT cores) with a data-parallel software traverser: every ray keeps a stack in
a fixed [R, S] array, one `lax.while_loop` steps all rays together, masked
lanes idle. Wide nodes amortize the per-step gather: one pop tests K child
AABBs; leaves run a static K x L masked triangle loop. Conceptual counterpart
of the reference's CPU traverser (reference: bvh_builder.h:89 `traverse`, and
the device node formats common_shared.h:757).

Everything is statically shaped; fits under jit on TPU and CPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.accel.bvh_build import BVH
from gfxexp_tpu.scene.types import TriangleSoA

_TMIN_EPS = 0.0


@struct.dataclass
class HitInfo:
    """Closest-hit record, SoA over rays (reference: HitObject,
    common_shared.h:1065 + hit-point params computed in CH programs)."""

    t: jnp.ndarray  # [R] hit distance (= t_max when missed)
    tri: jnp.ndarray  # [R] int32 triangle index, -1 on miss
    u: jnp.ndarray  # [R] barycentric of corner 1
    v: jnp.ndarray  # [R] barycentric of corner 2
    hit: jnp.ndarray  # [R] bool
    # instance id per ray (two-level traversal only; -1 on miss/None when
    # the acceleration structure is single-level)
    inst: object = None


def intersect_tris(tri: TriangleSoA, idx, o, d, t_min, t_cur):
    """Möller–Trumbore for gathered triangle indices.

    idx: [R] int32; o, d: [R, 3]. Returns (ok, t, u, v) with ok requiring
    t_min < t < t_cur. Intersects both faces (the reference's OptiX pipelines
    do not enable backface culling)."""
    p0 = tri.p0[idx]
    e1 = tri.e1[idx]
    e2 = tri.e2[idx]
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tv = o - p0
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_cur)
    )
    return ok, t, u, v


class _TravState(NamedTuple):
    stack: jnp.ndarray  # [R, S]
    sp: jnp.ndarray  # [R]
    best_t: jnp.ndarray  # [R]
    best_tri: jnp.ndarray  # [R]
    best_u: jnp.ndarray
    best_v: jnp.ndarray


def _traverse(bvh: BVH, tris: TriangleSoA, o, d, t_min, t_max, any_hit: bool,
              max_leaf: int = 4):
    n_rays = o.shape[0]
    arity = bvh.arity
    stack_size = bvh.max_depth * (arity - 1) + 2
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    lane = jnp.arange(n_rays)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,))

    init = _TravState(
        stack=jnp.zeros((n_rays, stack_size), jnp.int32),
        sp=jnp.ones((n_rays,), jnp.int32),  # root pre-pushed at slot 0
        best_t=t_max,
        best_tri=jnp.full((n_rays,), -1, jnp.int32),
        best_u=jnp.zeros((n_rays,), jnp.float32),
        best_v=jnp.zeros((n_rays,), jnp.float32),
    )

    def cond(s: _TravState):
        return jnp.any(s.sp > 0)

    def body(s: _TravState):
        active = s.sp > 0
        sp1 = jnp.maximum(s.sp - 1, 0)
        node = jnp.where(active, s.stack[lane, sp1], 0)
        sp = jnp.where(active, sp1, s.sp)

        cmin = bvh.child_min[node]  # [R, K, 3]
        cmax = bvh.child_max[node]
        ccount = bvh.child_count[node]  # [R, K]
        cidx = bvh.child_idx[node]

        t0 = (cmin - o[:, None, :]) * inv_d[:, None, :]
        t1 = (cmax - o[:, None, :]) * inv_d[:, None, :]
        near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min[:, None])
        far = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), s.best_t[:, None])
        box_hit = (near <= far) & active[:, None] & (ccount >= 0)

        # push hit internal children (unordered; ordered push costs a sort)
        internal = box_hit & (ccount == 0)
        offs = jnp.cumsum(internal.astype(jnp.int32), axis=1)
        pos = jnp.where(internal, sp[:, None] + offs - 1, stack_size)  # OOB -> drop
        stack = s.stack.at[lane[:, None], pos].set(cidx, mode="drop")
        sp = sp + offs[:, -1]

        # leaf children: static K x L masked triangle tests
        leaf = box_hit & (ccount > 0)
        best_t, best_tri = s.best_t, s.best_tri
        best_u, best_v = s.best_u, s.best_v
        for k in range(arity):
            for j in range(max_leaf):
                valid = leaf[:, k] & (j < ccount[:, k])
                tri_i = jnp.where(valid, cidx[:, k] + j, 0)
                ok, t, u, v = intersect_tris(tris, tri_i, o, d, t_min, best_t)
                take = valid & ok
                best_tri = jnp.where(take, tri_i, best_tri)
                best_t = jnp.where(take, t, best_t)
                best_u = jnp.where(take, u, best_u)
                best_v = jnp.where(take, v, best_v)

        if any_hit:
            sp = jnp.where(best_tri >= 0, 0, sp)

        return _TravState(stack, sp, best_t, best_tri, best_u, best_v)

    final = jax.lax.while_loop(cond, body, init)
    return HitInfo(
        t=final.best_t,
        tri=final.best_tri,
        u=final.best_u,
        v=final.best_v,
        hit=final.best_tri >= 0,
    )


def intersect_closest(bvh, tris: TriangleSoA, o, d, t_min=1e-4, t_max=1e30,
                      max_leaf: int = 4) -> HitInfo:
    """Closest-hit query for a ray batch. o, d: [R, 3]. Dispatches on the
    acceleration-structure type (stack-based wide BVH, the stackless
    SkipBVH, or the packed wide-row table for the ordered-stack Pallas
    kernel)."""
    from gfxexp_tpu.accel.pallas_widestack import (
        InstancedAccel,
        WideRowBVH,
        intersect_closest_instanced,
        intersect_closest_widestack,
    )
    from gfxexp_tpu.accel.skiplink import SkipBVH

    if isinstance(bvh, InstancedAccel):
        hit, inst = intersect_closest_instanced(bvh, o, d, t_min, t_max)
        return hit.replace(inst=inst)
    if isinstance(bvh, WideRowBVH):
        return intersect_closest_widestack(bvh, tris, o, d, t_min, t_max)
    from gfxexp_tpu.accel.pallas_qrow import QRowBVH, intersect_closest_qrow

    if isinstance(bvh, QRowBVH):
        return intersect_closest_qrow(bvh, tris, o, d, t_min, t_max)
    if isinstance(bvh, SkipBVH):
        if jax.default_backend() == "tpu":
            from gfxexp_tpu.accel.pallas_traverse import intersect_closest_pallas

            return intersect_closest_pallas(bvh, tris, o, d, t_min, t_max)
        from gfxexp_tpu.accel.tiled import intersect_closest_tiled

        return intersect_closest_tiled(bvh, tris, o, d, t_min, t_max)
    return _traverse(bvh, tris, o, d, t_min, t_max, any_hit=False, max_leaf=max_leaf)


def intersect_any(bvh, tris: TriangleSoA, o, d, t_min=1e-4, t_max=1e30,
                  max_leaf: int = 4) -> jnp.ndarray:
    """Shadow-ray query: returns occluded [R] bool (reference: visibility AH
    program, optix_pathtracing_kernels.cu:5)."""
    from gfxexp_tpu.accel.pallas_widestack import (
        InstancedAccel,
        WideRowBVH,
        intersect_any_instanced,
        intersect_any_widestack,
    )
    from gfxexp_tpu.accel.skiplink import SkipBVH

    if isinstance(bvh, InstancedAccel):
        return intersect_any_instanced(bvh, o, d, t_min, t_max)
    if isinstance(bvh, WideRowBVH):
        return intersect_any_widestack(bvh, tris, o, d, t_min, t_max)
    from gfxexp_tpu.accel.pallas_qrow import QRowBVH, intersect_any_qrow

    if isinstance(bvh, QRowBVH):
        return intersect_any_qrow(bvh, tris, o, d, t_min, t_max)
    if isinstance(bvh, SkipBVH):
        if jax.default_backend() == "tpu":
            from gfxexp_tpu.accel.pallas_traverse import intersect_any_pallas

            return intersect_any_pallas(bvh, tris, o, d, t_min, t_max)
        from gfxexp_tpu.accel.tiled import intersect_any_tiled

        return intersect_any_tiled(bvh, tris, o, d, t_min, t_max)
    hit = _traverse(bvh, tris, o, d, t_min, t_max, any_hit=True, max_leaf=max_leaf)
    return hit.hit


def intersect_closest_brute(tris: TriangleSoA, o, d, t_min=1e-4, t_max=1e30,
                            chunk: int = 1024) -> HitInfo:
    """O(R x T) brute-force closest hit — correctness oracle for tests and
    tiny scenes. Chunked over triangles to bound memory."""
    n_rays = o.shape[0]
    n_tris = tris.count
    best_t = jnp.full((n_rays,), t_max, jnp.float32)
    best_tri = jnp.full((n_rays,), -1, jnp.int32)
    best_u = jnp.zeros((n_rays,), jnp.float32)
    best_v = jnp.zeros((n_rays,), jnp.float32)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))

    for start in range(0, n_tris, chunk):
        size = min(chunk, n_tris - start)
        idx = jnp.arange(start, start + size)
        p0 = tris.p0[idx][None]  # [1, C, 3]
        e1 = tris.e1[idx][None]
        e2 = tris.e2[idx][None]
        ob = o[:, None, :]
        db = d[:, None, :]
        pv = jnp.cross(db, e2)
        det = jnp.sum(e1 * pv, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
        tv = ob - p0
        u = jnp.sum(tv * pv, axis=-1) * inv_det
        qv = jnp.cross(tv, e1)
        v = jnp.sum(db * qv, axis=-1) * inv_det
        t = jnp.sum(e2 * qv, axis=-1) * inv_det
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0) & (v >= 0) & (u + v <= 1.0)
            & (t > t_min[:, None]) & (t < best_t[:, None])
        )
        t_masked = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=1)
        anyhit = jnp.take_along_axis(ok, j[:, None], axis=1)[:, 0]
        tj = jnp.take_along_axis(t_masked, j[:, None], axis=1)[:, 0]
        take = anyhit & (tj < best_t)
        best_t = jnp.where(take, tj, best_t)
        best_tri = jnp.where(take, (start + j).astype(jnp.int32), best_tri)
        best_u = jnp.where(take, jnp.take_along_axis(u, j[:, None], 1)[:, 0], best_u)
        best_v = jnp.where(take, jnp.take_along_axis(v, j[:, None], 1)[:, 0], best_v)

    return HitInfo(t=best_t, tri=best_tri, u=best_u, v=best_v, hit=best_tri >= 0)
