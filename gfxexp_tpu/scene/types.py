"""Device-side scene data model (SoA pytrees).

TPU-native counterpart of the reference's slot-indexed device tables
(reference: common_shared.h — MaterialData:1144, GeometryInstanceData:1179,
InstanceData:1243; host side common_host.h `Scene`:859 with
materialDataBuffer / geomInstDataBuffer / instDataBuffer slots).

Key re-architecture decisions vs. the reference:

* The reference dispatches BSDFs through dynamic callables; the material model
  here is a closed set (Lambert / DiffuseAndSpecular / SimplePBR) evaluated
  branchlessly over a unified parameterization (see render/bsdf.py), so the
  material table is flat SoA arrays.

* The reference traverses hardware BVHs over instanced object-space geometry.
  Here the host scene (instances x geometry instances) is *flattened* into
  world-space "units": each (instance, geomInst) pair contributes a contiguous
  segment of world-space triangles. Per-frame animation re-transforms the
  vertex ranges (a batched matmul — cheap on TPU) and refits the BVH on
  device. This trades instancing memory for a single-level BVH, the right
  trade for wavefront traversal in round 1.

* Ragged per-geomInst structures (light CDFs over each unit's triangles) are
  stored as global flat arrays with per-unit (offset, count) windows and
  searched with windowed binary search (core/distributions.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from gfxexp_tpu.core.distributions import Continuous2D

# BSDF type enum — closed set, matches reference material models
# (reference: MaterialData union, common_shared.h:1144; BSDFs in
#  common_device.cuh — LambertBRDF:335, DiffuseAndSpecularBRDF:443,
#  SimplePBR_BRDF:767)
BSDF_LAMBERT = 0
BSDF_DIFFUSE_SPECULAR = 1
BSDF_SIMPLE_PBR = 2


@struct.dataclass
class MaterialTable:
    """Flat SoA material table, slot-indexed (reference max 1024 slots,
    common_host.h:862; here sized to the scene)."""

    bsdf_type: jnp.ndarray  # [M] int32
    diffuse_color: jnp.ndarray  # [M, 3] lambert/diffuse reflectance, or PBR base color
    specular_f0: jnp.ndarray  # [M, 3] specular reflectance at normal incidence
    roughness: jnp.ndarray  # [M] (reference stores smoothness; roughness = 1 - s)
    metallic: jnp.ndarray  # [M] (SimplePBR only)
    emittance: jnp.ndarray  # [M, 3] radiant emittance (W/m^2-ish, as reference)
    # texture slots, -1 = use the constant above (round 1: constants; atlas later)
    diffuse_tex: jnp.ndarray  # [M] int32
    emittance_tex: jnp.ndarray  # [M] int32
    normal_tex: jnp.ndarray  # [M] int32
    # normal reader per material (reference: the three readModifiedNormal*
    # callables, common_device.cuh:205-240): 0 = 3-channel normal map,
    # 1 = 2-channel (z reconstructed), 2 = height map (central differences)
    normal_map_kind: Optional[jnp.ndarray] = None  # [M] int32


@struct.dataclass
class TriangleSoA:
    """World-space flattened triangles, the traversal + shading ground truth.

    Positions are duplicated per-triangle (p0/e1/e2 precomputed) for fast
    watertight-enough Möller–Trumbore; shading attributes are per-corner.
    """

    p0: jnp.ndarray  # [T, 3]
    e1: jnp.ndarray  # [T, 3] = p1 - p0
    e2: jnp.ndarray  # [T, 3] = p2 - p0
    n0: jnp.ndarray  # [T, 3] shading normals (world space, unit)
    n1: jnp.ndarray  # [T, 3]
    n2: jnp.ndarray  # [T, 3]
    uv0: jnp.ndarray  # [T, 2]
    uv1: jnp.ndarray  # [T, 2]
    uv2: jnp.ndarray  # [T, 2]
    unit_id: jnp.ndarray  # [T] int32 -> flattened unit (instance x geomInst)

    @property
    def count(self):
        return self.p0.shape[0]


@struct.dataclass
class UnitTable:
    """Flattened (instance, geomInst) pairs — the shading/light granularity.

    reference: GeometryInstanceData (common_shared.h:1179) joined with its
    owning InstanceData (:1243)."""

    material: jnp.ndarray  # [U] int32 material slot
    instance: jnp.ndarray  # [U] int32 owning instance slot
    tri_offset: jnp.ndarray  # [U] int32 segment into light-order arrays below
    tri_count: jnp.ndarray  # [U] int32
    # Per-unit emissive light distribution over its triangles. The CDF lives
    # in "light order" (units contiguous) windowed by (tri_offset, tri_count);
    # BVH construction permutes TriangleSoA into leaf order, so
    # light_tri_index maps light-order positions -> traversal triangle ids.
    light_tri_cdf: jnp.ndarray  # [T] segment CDF, cdf[offset] = 0, exclusive prefix
    light_tri_index: jnp.ndarray  # [T] int32 light-order -> traversal order
    light_tri_pmf: jnp.ndarray  # [T] pmf within its unit, indexed by TRAVERSAL id
    emissive_importance: jnp.ndarray  # [U] sum of per-tri importances (area x luminance)
    # Segmented Walker alias tables over each unit's triangles (reference:
    # USE_WALKER_ALIAS_METHOD, common_shared.h:22) — O(1) selection vs the
    # O(log n) windowed binary search, which costs ~20 sequential per-lane
    # gathers per NEE on TPU. Present after host compile; None after a
    # device-side light rebuild (scene/animation.py), which falls back to
    # the CDF path.
    light_tri_alias_prob: Optional[jnp.ndarray] = None  # [T] keep probability
    light_tri_alias_local: Optional[jnp.ndarray] = None  # [T] local alias idx


@struct.dataclass
class InstanceTable:
    """Per-instance transforms, double-buffered for motion vectors
    (reference: InstanceData.curToPrevTransform usage in G-buffer kernels)."""

    transform: jnp.ndarray  # [I, 3, 4] object->world
    inv_transform: jnp.ndarray  # [I, 3, 4] world->object
    prev_transform: jnp.ndarray  # [I, 3, 4] previous frame object->world
    uniform_scale: jnp.ndarray  # [I] approximate uniform scale (light importance)


@struct.dataclass
class EnvLight:
    """Lat-long environment light (reference: loadEnvironmentalTexture,
    common_host.cpp:2658; sampling in path_tracing_shared.h sampleLight)."""

    radiance: jnp.ndarray  # [H, W, 3] linear radiance
    importance: Continuous2D  # importance over (u, v)
    power_coeff: jnp.ndarray  # [] scalar multiplier
    rotation: jnp.ndarray  # [] longitude rotation (radians)
    enabled: jnp.ndarray  # [] bool


@struct.dataclass
class ObjectTriangles:
    """Object-space copy of the triangle data, kept for animation: per-frame
    world geometry = instance transform applied to these (a batched matmul),
    then the BVH is refit on device (reference rebuilds its AS per frame,
    common_host.h Scene::updateASs:1027)."""

    p0: jnp.ndarray  # [T, 3]
    e1: jnp.ndarray
    e2: jnp.ndarray
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    instance: jnp.ndarray  # [T] int32 owning instance


@struct.dataclass
class SceneData:
    """Everything the device kernels need for one frame. A pure pytree —
    donate/carry through jit, shard or replicate freely."""

    materials: MaterialTable
    triangles: TriangleSoA
    units: UnitTable
    instances: InstanceTable
    # scene-level light distribution over units (emissive importance), stored
    # flat: cdf [U+1], pmf [U]
    light_unit_cdf: jnp.ndarray
    light_unit_pmf: jnp.ndarray
    total_emissive_importance: jnp.ndarray  # []
    env: Optional[EnvLight] = None
    object_triangles: Optional[ObjectTriangles] = None
    textures: Optional[object] = None  # scene/textures.py TextureAtlas
    # scene-level alias table over units — O(1) unit selection (see the
    # UnitTable alias note); None after device-side light rebuilds
    light_unit_alias_prob: Optional[jnp.ndarray] = None
    light_unit_alias_idx: Optional[jnp.ndarray] = None
    # hierarchical mip-descent alternative for unit selection (reference:
    # USE_PROBABILITY_TEXTURE, common_shared.h:19 + ProbabilityTexture:406);
    # built when compile_scene(use_probability_texture=True). Units are laid
    # row-major into the S x S texel grid.
    light_unit_probtex: Optional[object] = None
    # ---- two-level (instanced) mode (compile_scene(traversal="instanced"),
    # the TPU analogue of the reference's GAS/IAS split, common_host.h:1027).
    # When set: `triangles` holds OBJECT-space BLAS triangles shared by all
    # instances (unit_id = LOCAL geometry index within the owning BLAS
    # group), hits carry an instance id, and shading/light code transforms
    # through InstanceTable. Unit enumeration is instance-major in group
    # order, so unit = inst_unit_base[inst] + triangles.unit_id[tri].
    inst_unit_base: Optional[jnp.ndarray] = None  # [I] int32
    # light-order position of (unit u, traversal tri t) =
    #   units.tri_offset[u] + tri_light_local[t] - unit_tri_base[u]
    # where tri_light_local maps a (BVH-permuted) global BLAS triangle to
    # its blas-wide GEOMETRY-order index, and unit_tri_base is the
    # geometry-order base of the unit's geom within its BLAS.
    unit_tri_base: Optional[jnp.ndarray] = None  # [U] int32
    tri_light_local: Optional[jnp.ndarray] = None  # [T] int32
    # displaced geometries (techniques.tfdm.TFDMGeometry /
    # techniques.nrtdsm.NRTDSMGeometry pytrees) rendered as first-class
    # primitives by the path tracer (render/pathtrace._displaced_closest);
    # the reference registers them as custom-IS primitives in the GAS
    # (createTFDMGeometryInstance, common_host.cpp:1907)
    displaced: Optional[tuple] = None

    @property
    def is_instanced(self):
        return self.inst_unit_base is not None

    @property
    def num_triangles(self):
        return self.triangles.count

    @property
    def num_units(self):
        return self.units.material.shape[0]

    @property
    def has_emissive(self):
        return self.total_emissive_importance > 0.0
