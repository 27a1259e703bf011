"""Animation: keyframed instance controllers + per-frame device updates.

Reference counterparts: InstanceController (common_host.h:798 — lerp of
scale, slerp of orientation, lerp of position over a time cycle, driven by
the -begin-pos/-end-pos/-frequency CLI), Scene::updateASs (common_host.h:1027
— per-frame AS rebuild) and the per-frame light-distribution rebuild
(setupLightInstDistribution, common_host.h:1268 + compute_light_probs.cu).

TPU re-architecture: the world geometry update is one batched transform over
object-space triangles; the acceleration structure is REFIT in place on
device (bottom-up level sweep over the skip-link BVH — topology fixed, boxes
recomputed), and the light CDFs are rebuilt with segment scans. All three are
jitted; a frame of animation never leaves the device.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.accel.skiplink import SkipBVH
from gfxexp_tpu.core import math as gm
from gfxexp_tpu.scene.types import SceneData

_LUMA = jnp.asarray([0.2126729, 0.7151522, 0.0721750])


# ---------------------------------------------------------------------------
# host-side keyframe controller (reference: InstanceController,
# common_host.h:798)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class InstanceController:
    instance: int
    begin_position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    end_position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    begin_orientation: Tuple[float, float, float, float] = (0, 0, 0, 1)  # xyzw
    end_orientation: Tuple[float, float, float, float] = (0, 0, 0, 1)
    begin_scale: float = 1.0
    end_scale: float = 1.0
    frequency: float = 1.0  # cycles per second
    initial_time: float = 0.0

    def transform_at(self, t: float) -> np.ndarray:
        """[3, 4] affine at time t (triangle-wave ping-pong over the cycle,
        matching the reference's update loop)."""
        cycle = (self.initial_time + t) * self.frequency % 1.0
        s = 1.0 - abs(2.0 * cycle - 1.0)  # 0 -> 1 -> 0 over one cycle
        import numpy as _np

        q0 = _np.asarray(self.begin_orientation, _np.float64)
        q1 = _np.asarray(self.end_orientation, _np.float64)
        q = np.asarray(
            gm.slerp(jnp.asarray(q0, jnp.float32), jnp.asarray(q1, jnp.float32),
                     jnp.float32(s)))
        rot = np.asarray(gm.quaternion_to_matrix(jnp.asarray(q)))
        scale = (1.0 - s) * self.begin_scale + s * self.end_scale
        pos = (1.0 - s) * _np.asarray(self.begin_position) + s * _np.asarray(
            self.end_position)
        m = _np.zeros((3, 4), _np.float32)
        m[:, :3] = rot * scale
        m[:, 3] = pos
        return m


def controller_transforms(scene: SceneData, controllers, t: float) -> jnp.ndarray:
    """New [I, 3, 4] transform stack at time t (host, tiny)."""
    m = np.asarray(scene.instances.transform).copy()
    for c in controllers:
        m[c.instance] = c.transform_at(t)
    return jnp.asarray(m)


# ---------------------------------------------------------------------------
# device-side per-frame update
# ---------------------------------------------------------------------------


@jax.jit
def set_instance_transforms(scene: SceneData, new_transforms) -> SceneData:
    """Update instance transforms; previous ones become prev_transform
    (motion vectors)."""
    inv = gm.invert_transform(new_transforms)
    det = jnp.linalg.det(new_transforms[:, :, :3])
    scale = jnp.cbrt(jnp.maximum(jnp.abs(det), 1e-30))
    return scene.replace(
        instances=scene.instances.replace(
            prev_transform=scene.instances.transform,
            transform=new_transforms,
            inv_transform=inv,
            uniform_scale=scale,
        )
    )


@jax.jit
def update_world_geometry(scene: SceneData) -> SceneData:
    """Recompute world-space TriangleSoA from object space + transforms
    (a batched matmul — the cheap part of the frame)."""
    ot = scene.object_triangles
    m = scene.instances.transform[ot.instance]  # [T, 3, 4]
    mi = scene.instances.inv_transform[ot.instance]
    p0 = gm.transform_point(m, ot.p0)
    e1 = gm.transform_vector(m, ot.e1)
    e2 = gm.transform_vector(m, ot.e2)
    n0 = gm.normalize(gm.transform_normal(mi, ot.n0))
    n1 = gm.normalize(gm.transform_normal(mi, ot.n1))
    n2 = gm.normalize(gm.transform_normal(mi, ot.n2))
    return scene.replace(
        triangles=scene.triangles.replace(
            p0=p0, e1=e1, e2=e2, n0=n0, n1=n1, n2=n2,
        )
    )


@jax.jit
def refit_skip_bvh(bvh: SkipBVH, tris) -> SkipBVH:
    """Bottom-up AABB refit over the fixed skip-link topology (device).

    Leaves take their triangles' bounds; internal nodes at depth d union
    their children (all at depth d+1) via the sibling chain — one masked
    gather sweep per level."""
    m = bvh.num_nodes
    is_leaf = bvh.count > 0
    t_count = tris.p0.shape[0]

    lo = jnp.full((m, 3), jnp.inf, jnp.float32)
    hi = jnp.full((m, 3), -jnp.inf, jnp.float32)
    for j in range(bvh.max_leaf):
        idx = jnp.clip(bvh.first + j, 0, t_count - 1)
        valid = is_leaf & (j < bvh.count)
        p0 = tris.p0[idx]
        p1 = p0 + tris.e1[idx]
        p2 = p0 + tris.e2[idx]
        tlo = jnp.minimum(jnp.minimum(p0, p1), p2)
        thi = jnp.maximum(jnp.maximum(p0, p1), p2)
        lo = jnp.where(valid[:, None], jnp.minimum(lo, tlo), lo)
        hi = jnp.where(valid[:, None], jnp.maximum(hi, thi), hi)
    pad = 1e-7 * jnp.maximum(1.0, jnp.abs(hi))
    amin = jnp.where(is_leaf[:, None], lo - pad, bvh.aabb_min)
    amax = jnp.where(is_leaf[:, None], hi + pad, bvh.aabb_max)

    idx_all = jnp.arange(m, dtype=jnp.int32)
    for d in range(bvh.n_levels - 1, -1, -1):
        sel = (~is_leaf) & (bvh.depth == d)
        node_lo = jnp.full((m, 3), jnp.inf, jnp.float32)
        node_hi = jnp.full((m, 3), -jnp.inf, jnp.float32)
        c = idx_all + 1
        for _ in range(bvh.arity):
            cc = jnp.clip(c, 0, m - 1)
            valid = sel & (c < bvh.skip)
            node_lo = jnp.where(valid[:, None],
                                jnp.minimum(node_lo, amin[cc]), node_lo)
            node_hi = jnp.where(valid[:, None],
                                jnp.maximum(node_hi, amax[cc]), node_hi)
            c = bvh.skip[cc]
        amin = jnp.where(sel[:, None], node_lo, amin)
        amax = jnp.where(sel[:, None], node_hi, amax)

    return bvh.replace(aabb_min=amin, aabb_max=amax)


@jax.jit
def rebuild_light_distributions(scene: SceneData) -> SceneData:
    """Per-frame light PMF/CDF rebuild on device (reference:
    compute_light_probs.cu kernels + CUBd exclusive scans orchestrated by
    setupLightGeomDistributions/setupLightInstDistribution,
    common_host.h:1102/1268) — segment scans over the light-order arrays."""
    tris = scene.triangles
    units = scene.units
    n_units = units.material.shape[0]

    # per-triangle importance in TRAVERSAL order: world area x emittance lum
    cr = jnp.cross(tris.e1, tris.e2)
    area = 0.5 * jnp.linalg.norm(cr, axis=-1)
    emit = scene.materials.emittance[units.material[tris.unit_id]]
    imp = area * jnp.sum(emit * _LUMA, axis=-1)

    # light-order view + segment ids
    imp_lo = imp[units.light_tri_index]
    seg = tris.unit_id[units.light_tri_index]  # unit per light-order position

    seg_sum = jax.ops.segment_sum(imp_lo, seg, num_segments=n_units)
    denom = jnp.where(seg_sum > 0, seg_sum, 1.0)
    pmf_lo = imp_lo / denom[seg]
    # exclusive prefix within each segment
    g = jnp.cumsum(pmf_lo) - pmf_lo
    seg_start = g[units.tri_offset]  # prefix at each segment start
    cdf_lo = g - seg_start[seg]

    pmf_traversal = jnp.zeros_like(imp).at[units.light_tri_index].set(pmf_lo)

    total = jnp.sum(seg_sum)
    unit_pmf = jnp.where(total > 0, seg_sum / jnp.where(total > 0, total, 1.0), 0.0)
    unit_cdf = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(unit_pmf)])
    unit_cdf = unit_cdf / jnp.maximum(unit_cdf[-1:], 1e-20)

    return scene.replace(
        units=units.replace(
            light_tri_cdf=cdf_lo,
            light_tri_pmf=pmf_traversal,
            emissive_importance=seg_sum,
            # alias tables are host-built (sequential Vose); after a device
            # rebuild they are stale, so drop them — sampling falls back to
            # the CDF binary-search path
            light_tri_alias_prob=None,
            light_tri_alias_local=None,
        ),
        light_unit_cdf=unit_cdf,
        light_unit_pmf=unit_pmf,
        light_unit_alias_prob=None,
        light_unit_alias_idx=None,
        total_emissive_importance=total,
    )


def advance_frame(scene: SceneData, bvh: SkipBVH, controllers, t: float):
    """Full per-frame animation step: transforms -> world geometry -> BVH
    refit -> light distributions. Returns (scene, bvh)."""
    scene = set_instance_transforms(
        scene, controller_transforms(scene, controllers, t))
    scene = update_world_geometry(scene)
    bvh = refit_skip_bvh(bvh, scene.triangles)
    scene = rebuild_light_distributions(scene)
    return scene, bvh


# ---------------------------------------------------------------------------
# instanced (two-level) animation: rigid transforms only — the TPU analogue
# of the reference's per-frame IAS transform update (Scene::updateASs,
# common_host.h:1027: GAS contents untouched, instance transforms + light
# instance distribution refreshed)
# ---------------------------------------------------------------------------


@jax.jit
def update_instanced_accel(acc, new_transforms):
    """Refresh an InstancedAccel for new [I, 3, 4] instance transforms:
    world->object inverses and world chunk AABBs recomputed on device from
    the stored object-space BLAS bounds. BLAS node tables are untouched
    (rigid motion)."""
    m = new_transforms[acc.inst_of_chunk]  # [C, 3, 4] object->world
    rinv = jnp.linalg.inv(m[:, :, :3])
    tinv = -jnp.einsum("cij,cj->ci", rinv, m[:, :, 3])
    n_c = m.shape[0]
    inv16 = jnp.zeros((n_c, 16), jnp.float32)
    inv16 = inv16.at[:, 0:12].set(
        jnp.concatenate([rinv, tinv[:, :, None]], axis=2).reshape(n_c, 12))
    # affine AABB transform: |R| e trick over the entry's object bounds —
    # per-chunk subtree AABBs when rebraided, else the BLAS root AABBs
    if getattr(acc, "obj_lo", None) is not None:
        blo, bhi = acc.obj_lo, acc.obj_hi
    else:
        blo = acc.blas_lo[acc.blas_ids]
        bhi = acc.blas_hi[acc.blas_ids]
    c = 0.5 * (blo + bhi)
    e = 0.5 * (bhi - blo)
    wc = jnp.einsum("cij,cj->ci", m[:, :, :3], c) + m[:, :, 3]
    we = jnp.einsum("cij,cj->ci", jnp.abs(m[:, :, :3]), e)
    return acc.replace(inv_transforms=inv16,
                       chunk_lo=wc - we, chunk_hi=wc + we)


@jax.jit
def _rebuild_unit_distribution_instanced(scene: SceneData, old_scale):
    """Unit-level light distribution under new instance scales: rigid +
    UNIFORM scale leaves each unit's per-triangle pmf/alias invariant
    (every triangle area scales by s^2), so only the unit-level
    importances rescale — world importance x (s_new/s_old)^2."""
    units = scene.units
    s_new = scene.instances.uniform_scale[units.instance]
    s_old = old_scale[units.instance]
    ratio = (s_new / jnp.maximum(s_old, 1e-30)) ** 2
    seg_sum = units.emissive_importance * ratio
    total = jnp.sum(seg_sum)
    unit_pmf = jnp.where(total > 0, seg_sum / jnp.where(total > 0, total,
                                                        1.0), 0.0)
    unit_cdf = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(unit_pmf)])
    unit_cdf = unit_cdf / jnp.maximum(unit_cdf[-1:], 1e-20)
    return scene.replace(
        units=units.replace(emissive_importance=seg_sum),
        light_unit_cdf=unit_cdf,
        light_unit_pmf=unit_pmf,
        # unit-level alias tables are host-built; drop after a device
        # rebuild (sampling falls back to the CDF path); the per-unit
        # TRIANGLE alias tables stay valid under uniform scale
        light_unit_alias_prob=None,
        light_unit_alias_idx=None,
        total_emissive_importance=total,
    )


def advance_frame_instanced(scene: SceneData, acc, controllers, t: float):
    """Per-frame animation for two-level scenes: new rigid transforms ->
    device inverse/chunk-AABB refresh + unit-level light rescale. Nothing
    is rebuilt — N instances of a BLAS keep sharing its node table."""
    old_scale = scene.instances.uniform_scale
    tf = controller_transforms(scene, controllers, t)
    scene = set_instance_transforms(scene, tf)
    scene = _rebuild_unit_distribution_instanced(scene, old_scale)
    acc = update_instanced_accel(acc, tf)
    return scene, acc
