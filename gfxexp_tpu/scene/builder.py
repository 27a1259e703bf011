"""Host-side scene construction -> device SceneData.

Mirrors the reference's host scene framework (reference: common_host.h —
Material:621, GeometryInstance:717, GeometryGroup:752, Mesh:769, Instance:777,
Scene:859; factories createLambertMaterial / createDiffuseAndSpecularMaterial /
createSimplePBRMaterial common_host.cpp:1454/1556/1689, createTriangleMeshes
:2178, createRectangleLight :2431, createSphereLight :2478) but compiles the
instance graph down to flat world-space SoA tables (scene/types.py) instead of
building OptiX acceleration structures.

All heavy math here is numpy (host, once per scene edit); per-frame animation
re-uses the compiled index structure and only re-transforms on device
(scene/animation.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.core.distributions import build_continuous_2d, vose_alias_arrays
from gfxexp_tpu.core.math import np_normalize
from gfxexp_tpu.scene.types import (
    BSDF_DIFFUSE_SPECULAR,
    BSDF_LAMBERT,
    BSDF_SIMPLE_PBR,
    EnvLight,
    InstanceTable,
    MaterialTable,
    ObjectTriangles,
    SceneData,
    TriangleSoA,
    UnitTable,
)

_LUMA = np.array([0.2126729, 0.7151522, 0.0721750])


@dataclasses.dataclass
class HostMaterial:
    bsdf_type: int = BSDF_LAMBERT
    diffuse_color: Tuple[float, float, float] = (0.8, 0.8, 0.8)
    specular_f0: Tuple[float, float, float] = (0.04, 0.04, 0.04)
    roughness: float = 0.3
    metallic: float = 0.0
    emittance: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    diffuse_tex: int = -1
    emittance_tex: int = -1
    normal_tex: int = -1
    # 0 = 3ch normal map, 1 = 2ch, 2 = height map (common_device.cuh:205-240)
    normal_map_kind: int = 0
    name: str = ""


@dataclasses.dataclass
class HostGeometry:
    """One geometry instance: triangle mesh with a single material slot
    (reference: GeometryInstance, common_host.h:717)."""

    positions: np.ndarray  # [V, 3] float32, object space
    normals: np.ndarray  # [V, 3]
    texcoords: np.ndarray  # [V, 2]
    indices: np.ndarray  # [F, 3] int32
    material: int  # material slot


@dataclasses.dataclass
class HostInstance:
    """Placement of a list of geometries (a 'group'/mesh) in the world
    (reference: Instance, common_host.h:777)."""

    geometries: List[int]  # indices into SceneBuilder.geometries
    transform: np.ndarray  # [3, 4] object->world
    controller: Optional[object] = None  # scene/animation.py InstanceController


def affine(rotation=None, translation=None, scale=None) -> np.ndarray:
    r = np.eye(3) if rotation is None else np.asarray(rotation, np.float64)
    if scale is not None:
        s = np.broadcast_to(np.atleast_1d(np.asarray(scale, np.float64)), (3,))
        r = r * s[None, :]
    t = np.zeros(3) if translation is None else np.asarray(translation, np.float64)
    return np.concatenate([r, t[:, None]], axis=1).astype(np.float32)


class SceneBuilder:
    """Accumulates materials / geometries / instances, then `compile()`s to a
    device SceneData pytree."""

    def __init__(self, texture_mips: bool = False):
        from gfxexp_tpu.scene.textures import AtlasBuilder

        self.materials: List[HostMaterial] = []
        self.geometries: List[HostGeometry] = []
        self.instances: List[HostInstance] = []
        self.env_radiance: Optional[np.ndarray] = None  # [H, W, 3]
        self.env_power: float = 1.0
        self.env_rotation: float = 0.0
        # texture_mips=True builds per-layer mip chains so the integrator
        # can sample trilinearly with a per-lane LOD (PTConfig.texture_lod)
        self.atlas = AtlasBuilder(mips=texture_mips)
        self._texture_cache: dict = {}
        self.displaced_geoms: List[tuple] = []

    def add_texture(self, image: np.ndarray) -> int:
        """Register a texture image ([H,W,C] float linear); returns id."""
        return self.atlas.add(image)

    def load_texture(self, path: str, to_linear: bool = True) -> int:
        """Load + cache a texture file (PNG/JPG via PIL, DDS via the BC
        decoder) — reference: loadTexture cache, common_host.cpp:992."""
        key = (path, to_linear)
        if key in self._texture_cache:
            return self._texture_cache[key]
        if path.lower().endswith(".dds"):
            from gfxexp_tpu.scene.textures import load_dds

            img = load_dds(path)
        else:
            from gfxexp_tpu.utils.image_io import load_png

            img = load_png(path, to_linear=to_linear)
        tid = self.add_texture(img)
        self._texture_cache[key] = tid
        return tid

    # -- materials ---------------------------------------------------------

    def add_material(self, mat: HostMaterial) -> int:
        self.materials.append(mat)
        return len(self.materials) - 1

    def add_lambert_material(self, reflectance, emittance=(0, 0, 0), name="") -> int:
        return self.add_material(
            HostMaterial(
                bsdf_type=BSDF_LAMBERT,
                diffuse_color=tuple(reflectance),
                emittance=tuple(emittance),
                name=name,
            )
        )

    def add_diffuse_specular_material(
        self, diffuse, specular_f0, smoothness, emittance=(0, 0, 0), name=""
    ) -> int:
        return self.add_material(
            HostMaterial(
                bsdf_type=BSDF_DIFFUSE_SPECULAR,
                diffuse_color=tuple(diffuse),
                specular_f0=tuple(specular_f0),
                roughness=float(1.0 - smoothness),
                emittance=tuple(emittance),
                name=name,
            )
        )

    def add_simple_pbr_material(
        self, base_color, roughness, metallic, emittance=(0, 0, 0), name=""
    ) -> int:
        base = np.asarray(base_color, np.float64)
        m = float(metallic)
        return self.add_material(
            HostMaterial(
                bsdf_type=BSDF_SIMPLE_PBR,
                # SimplePBR maps onto the diffuse+specular parameterization
                # (reference: SimplePBR_BRDF::setup, common_device.cuh:767)
                diffuse_color=tuple(base * (1.0 - m)),
                specular_f0=tuple(0.04 * (1.0 - m) + base * m),
                roughness=float(roughness),
                metallic=m,
                emittance=tuple(emittance),
                name=name,
            )
        )

    # -- geometry ----------------------------------------------------------

    def add_geometry(
        self, positions, indices, material, normals=None, texcoords=None
    ) -> int:
        positions = np.asarray(positions, np.float32).reshape(-1, 3)
        indices = np.asarray(indices, np.int32).reshape(-1, 3)
        if normals is None:
            normals = compute_smooth_normals(positions, indices)
        else:
            normals = np.asarray(normals, np.float32).reshape(-1, 3)
        if texcoords is None:
            texcoords = np.zeros((positions.shape[0], 2), np.float32)
        else:
            texcoords = np.asarray(texcoords, np.float32).reshape(-1, 2)
        self.geometries.append(
            HostGeometry(positions, normals, texcoords, indices, int(material))
        )
        return len(self.geometries) - 1

    def add_rectangle(self, dim_x, dim_z, material) -> int:
        """XZ-plane rectangle centered at origin, +Y normal
        (reference: createRectangleLight, common_host.cpp:2431)."""
        hx, hz = dim_x * 0.5, dim_z * 0.5
        positions = np.array(
            [[-hx, 0, -hz], [hx, 0, -hz], [hx, 0, hz], [-hx, 0, hz]], np.float32
        )
        normals = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
        texcoords = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
        # winding chosen so cross(e1, e2) == +Y == the shading normal
        indices = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
        self.geometries.append(
            HostGeometry(positions, normals, texcoords, indices, int(material))
        )
        return len(self.geometries) - 1

    def add_sphere(self, radius, material, n_theta=32, n_phi=64) -> int:
        """UV sphere (reference: createSphereLight, common_host.cpp:2478)."""
        th = np.linspace(0, np.pi, n_theta + 1)
        ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
        tt, pp = np.meshgrid(th, ph, indexing="ij")
        x = np.sin(tt) * np.cos(pp)
        y = np.cos(tt)
        z = np.sin(tt) * np.sin(pp)
        pos = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float32)
        nrm = pos.copy()
        uv = np.stack([pp / (2 * np.pi), 1.0 - tt / np.pi], axis=-1).reshape(-1, 2)
        idx = []
        for i in range(n_theta):
            for j in range(n_phi):
                a = i * n_phi + j
                b = i * n_phi + (j + 1) % n_phi
                c = (i + 1) * n_phi + j
                d = (i + 1) * n_phi + (j + 1) % n_phi
                if i > 0:
                    idx.append([a, b, c])
                if i < n_theta - 1:
                    idx.append([b, d, c])
        self.geometries.append(
            HostGeometry(
                pos * radius,
                nrm.astype(np.float32),
                uv.astype(np.float32),
                np.asarray(idx, np.int32),
                int(material),
            )
        )
        return len(self.geometries) - 1

    def add_curve(self, control_points, radii, material,
                  curve_type: str = "cubic_bspline",
                  n_axial: int = 8, n_radial: int = 8,
                  direct: bool = False) -> int:
        """Swept-sphere curve (reference:
        createLinearSegmentsGeometryInstance + curve primitive support,
        common_host.cpp:1999 / curve_evaluator.h; exact evaluators in
        core/curves.py).

        direct=True traces the curve exactly in the pipeline: linear
        curves as round-linear cone-sphere segments, higher-order bases
        (quadratic/cubic B-spline, Catmull-Rom, Bezier) as EXACT canal-
        surface spans (multi-seeded Newton on the swept-sphere envelope,
        core/curves.py intersect_swept_sphere_span — the counterpart of
        OptiX's built-in curve intersectors). direct=False (default)
        tessellates to a triangle tube. Direct curves live beside the
        displaced primitives, so the returned id is NOT a triangle
        geometry id (it cannot be instanced/transformed)."""
        if direct:
            self.displaced_geoms.append(
                ("curve", np.asarray(control_points, np.float32),
                 None, None, np.asarray(radii, np.float32),
                 curve_type, int(material), None))
            return len(self.displaced_geoms) - 1
        from gfxexp_tpu.core.curves import tessellate_curve

        v, n, f = tessellate_curve(
            curve_type, np.asarray(control_points, np.float32),
            np.asarray(radii, np.float32), n_axial=n_axial, n_radial=n_radial)
        return self.add_geometry(v, f, material, normals=n)

    # -- instances ---------------------------------------------------------

    def add_instance(
        self, geometries, transform=None, controller=None
    ) -> int:
        if isinstance(geometries, int):
            geometries = [geometries]
        if transform is None:
            transform = affine()
        self.instances.append(
            HostInstance(list(geometries), np.asarray(transform, np.float32), controller)
        )
        return len(self.instances) - 1

    def add_displaced(self, positions, indices, uvs, height, params=None,
                      material: int = 0, kind: str = "tfdm",
                      normals=None) -> int:
        """Displaced base mesh rendered as a first-class scene primitive
        (reference: createTFDMGeometryInstance /
        createNRTDSMGeometryInstance, common_host.cpp:1907/1953).
        kind: "tfdm" (tangent-space texel walk) or "nrtdsm" (exact
        nonlinear shell intersection)."""
        self.displaced_geoms.append(
            (kind, np.asarray(positions, np.float32),
             np.asarray(indices, np.int32), np.asarray(uvs, np.float32),
             np.asarray(height, np.float32), params, int(material), normals))
        return len(self.displaced_geoms) - 1

    def add_shell(self, positions, indices, uvs, shell_positions,
                  shell_indices, params=None, material: int = 0,
                  normals=None, shell_materials=None) -> int:
        """Shell-mapped base mesh: arbitrary texture-space contents
        instanced inside each prism (reference: nrtdsm_main.cpp:772-875
        shell BVH; nrtdsm_intersection_kernels.h:1632 forShellMapping)."""
        self.displaced_geoms.append(
            ("shell", np.asarray(positions, np.float32),
             np.asarray(indices, np.int32), np.asarray(uvs, np.float32),
             (np.asarray(shell_positions, np.float32),
              np.asarray(shell_indices, np.int32), shell_materials),
             params, int(material), normals))
        return len(self.displaced_geoms) - 1

    def _build_displaced(self):
        if not self.displaced_geoms:
            return None
        out = []
        for (kind, pos, idx, uvs, height, params, mat,
             normals) in self.displaced_geoms:
            if kind == "curve":
                from gfxexp_tpu.core.curves import (
                    CURVE_LINEAR,
                    build_curve_segments,
                    build_curve_spans,
                )

                if params == CURVE_LINEAR:
                    out.append(build_curve_segments(
                        pos, height, material=mat, curve_type=params))
                else:
                    out.append(build_curve_spans(
                        pos, height, material=mat, curve_type=params))
            elif kind == "shell":
                from gfxexp_tpu.techniques.shell import build_shell_geometry

                spos, sidx, smats = height
                out.append(build_shell_geometry(
                    pos, idx, uvs, spos, sidx, params=params, material=mat,
                    normals=normals, shell_materials=smats))
            elif kind == "tfdm":
                from gfxexp_tpu.techniques.tfdm import build_tfdm_geometry

                out.append(build_tfdm_geometry(
                    pos, idx, uvs, height, params=params, material=mat,
                    normals=normals))
            else:
                from gfxexp_tpu.techniques.nrtdsm import build_nrtdsm_geometry

                out.append(build_nrtdsm_geometry(
                    pos, idx, uvs, height, params=params, material=mat,
                    normals=normals))
        return tuple(out)

    # -- environment -------------------------------------------------------

    def set_environment(self, radiance_hw3, power_coeff=1.0, rotation=0.0):
        self.env_radiance = np.asarray(radiance_hw3, np.float32)
        self.env_power = float(power_coeff)
        self.env_rotation = float(rotation)

    # -- compile -----------------------------------------------------------

    def _materials_table(self, mats) -> MaterialTable:
        return MaterialTable(
            bsdf_type=np.asarray([m.bsdf_type for m in mats], np.int32),
            diffuse_color=np.asarray([m.diffuse_color for m in mats], np.float32),
            specular_f0=np.asarray([m.specular_f0 for m in mats], np.float32),
            roughness=np.asarray([m.roughness for m in mats], np.float32),
            metallic=np.asarray([m.metallic for m in mats], np.float32),
            emittance=np.asarray([m.emittance for m in mats], np.float32),
            diffuse_tex=np.asarray([m.diffuse_tex for m in mats], np.int32),
            emittance_tex=np.asarray([m.emittance_tex for m in mats], np.int32),
            normal_tex=np.asarray([m.normal_tex for m in mats], np.int32),
            normal_map_kind=np.asarray(
                [m.normal_map_kind for m in mats], np.int32),
        )

    def _env_light(self):
        if self.env_radiance is None:
            return None
        # importance = luminance x sin(theta) (lat-long solid-angle factor,
        # reference: loadEnvironmentalTexture, common_host.cpp:2658)
        h, w = self.env_radiance.shape[:2]
        lum = self.env_radiance @ _LUMA
        sin_t = np.sin(np.pi * (np.arange(h) + 0.5) / h)
        return EnvLight(
            radiance=np.asarray(self.env_radiance),
            importance=build_continuous_2d(lum * sin_t[:, None]),
            power_coeff=np.float32(self.env_power),
            rotation=np.float32(self.env_rotation),
            enabled=np.asarray(True),
        )

    def compile(self, use_probability_texture: bool = False) -> SceneData:
        """Flatten instance graph to world-space SoA tables + light CDFs.

        use_probability_texture additionally builds the hierarchical
        mip-descent unit selector (reference: USE_PROBABILITY_TEXTURE,
        common_shared.h:19)."""
        if not self.instances:
            raise ValueError("scene has no instances")
        mats = self.materials or [HostMaterial()]

        tri_chunks = {k: [] for k in (
            "p0", "e1", "e2", "n0", "n1", "n2", "uv0", "uv1", "uv2", "unit",
            "op0", "oe1", "oe2", "on0", "on1", "on2", "inst")}
        unit_material, unit_instance = [], []
        unit_tri_offset, unit_tri_count = [], []
        unit_importance = []
        tri_pmf_chunks, tri_cdf_chunks = [], []
        tri_aprob_chunks, tri_aidx_chunks = [], []
        inst_transform, inst_scale = [], []

        tri_cursor = 0
        unit_cursor = 0
        for inst_id, inst in enumerate(self.instances):
            m = inst.transform.astype(np.float64)
            rot = m[:, :3]
            inst_transform.append(inst.transform)
            # approximate uniform scale as cbrt |det| (reference assumes
            # uniform scaling for light importance, common_host.h Instance)
            inst_scale.append(float(np.cbrt(max(abs(np.linalg.det(rot)), 1e-30))))
            nrm_mat = np.linalg.inv(rot).T
            for geom_id in inst.geometries:
                g = self.geometries[geom_id]
                v = g.positions @ rot.T + m[:, 3]
                n = np_normalize(g.normals @ nrm_mat.T)
                i0, i1, i2 = g.indices[:, 0], g.indices[:, 1], g.indices[:, 2]
                p0, p1, p2 = v[i0], v[i1], v[i2]
                tri_chunks["p0"].append(p0)
                tri_chunks["e1"].append(p1 - p0)
                tri_chunks["e2"].append(p2 - p0)
                tri_chunks["n0"].append(n[i0])
                tri_chunks["n1"].append(n[i1])
                tri_chunks["n2"].append(n[i2])
                tri_chunks["uv0"].append(g.texcoords[i0])
                tri_chunks["uv1"].append(g.texcoords[i1])
                tri_chunks["uv2"].append(g.texcoords[i2])
                nt = len(g.indices)
                tri_chunks["unit"].append(np.full(nt, unit_cursor, np.int32))
                # object-space copies for animation (types.ObjectTriangles)
                ov = g.positions
                onrm = g.normals
                op0, op1, op2 = ov[i0], ov[i1], ov[i2]
                tri_chunks["op0"].append(op0)
                tri_chunks["oe1"].append(op1 - op0)
                tri_chunks["oe2"].append(op2 - op0)
                tri_chunks["on0"].append(onrm[i0])
                tri_chunks["on1"].append(onrm[i1])
                tri_chunks["on2"].append(onrm[i2])
                tri_chunks["inst"].append(np.full(nt, inst_id, np.int32))

                # per-triangle emissive importance = world area x emittance
                # luminance (reference: computeTriangleProbBuffer,
                # gpu_kernels/compute_light_probs.cu)
                area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1)
                emit_lum = float(np.dot(_LUMA, mats[g.material].emittance))
                w = area * emit_lum
                total = w.sum()
                if total > 0:
                    pmf = w / total
                else:
                    pmf = np.zeros(nt)
                cdf = np.concatenate([[0.0], np.cumsum(pmf)[:-1]])
                tri_pmf_chunks.append(pmf.astype(np.float32))
                tri_cdf_chunks.append(cdf.astype(np.float32))
                # O(1) Walker alias selection (reference:
                # USE_WALKER_ALIAS_METHOD, common_shared.h:22); local indices
                _, a_prob, a_idx, _ = vose_alias_arrays(w)
                tri_aprob_chunks.append(a_prob.astype(np.float32))
                tri_aidx_chunks.append(a_idx.astype(np.int32))

                unit_material.append(g.material)
                unit_instance.append(inst_id)
                unit_tri_offset.append(tri_cursor)
                unit_tri_count.append(nt)
                unit_importance.append(float(total))
                tri_cursor += nt
                unit_cursor += 1

        def cat(key):
            return np.asarray(np.concatenate(tri_chunks[key]).astype(
                np.int32 if key in ("unit", "inst") else np.float32))

        triangles = TriangleSoA(
            p0=cat("p0"), e1=cat("e1"), e2=cat("e2"),
            n0=cat("n0"), n1=cat("n1"), n2=cat("n2"),
            uv0=cat("uv0"), uv1=cat("uv1"), uv2=cat("uv2"),
            unit_id=cat("unit"),
        )

        unit_importance = np.asarray(unit_importance, np.float64)
        total_imp = unit_importance.sum()
        unit_pmf = unit_importance / total_imp if total_imp > 0 else np.zeros_like(unit_importance)
        unit_cdf = np.concatenate([[0.0], np.cumsum(unit_pmf)])
        _, unit_aprob, unit_aidx, _ = vose_alias_arrays(unit_importance)
        unit_probtex = None
        if use_probability_texture:
            from gfxexp_tpu.core.distributions import build_probability_texture

            n_u = len(unit_importance)
            side = 1
            while side * side < n_u:
                side *= 2
            grid = np.zeros((side, side), np.float64)
            grid.flat[:n_u] = unit_importance
            unit_probtex = build_probability_texture(grid)

        n_total_tris = tri_cursor
        units = UnitTable(
            material=np.asarray(unit_material, np.int32),
            instance=np.asarray(unit_instance, np.int32),
            tri_offset=np.asarray(unit_tri_offset, np.int32),
            tri_count=np.asarray(unit_tri_count, np.int32),
            light_tri_cdf=np.asarray(np.concatenate(tri_cdf_chunks), np.float32),
            light_tri_index=np.arange(n_total_tris, dtype=np.int32),
            light_tri_pmf=np.asarray(np.concatenate(tri_pmf_chunks), np.float32),
            emissive_importance=np.asarray(unit_importance, np.float32),
            light_tri_alias_prob=np.asarray(
                np.concatenate(tri_aprob_chunks), np.float32),
            light_tri_alias_local=np.asarray(
                np.concatenate(tri_aidx_chunks), np.int32),
        )

        transforms = np.stack(inst_transform).astype(np.float32)
        inv = np.zeros_like(transforms)
        for i, t in enumerate(transforms):
            r_inv = np.linalg.inv(t[:, :3].astype(np.float64))
            inv[i, :, :3] = r_inv
            inv[i, :, 3] = -r_inv @ t[:, 3].astype(np.float64)
        instances = InstanceTable(
            transform=np.asarray(transforms),
            inv_transform=np.asarray(inv),
            prev_transform=np.asarray(transforms),
            uniform_scale=np.asarray(inst_scale, np.float32),
        )

        materials = self._materials_table(mats)
        env = self._env_light()

        object_triangles = ObjectTriangles(
            p0=cat("op0"), e1=cat("oe1"), e2=cat("oe2"),
            n0=cat("on0"), n1=cat("on1"), n2=cat("on2"),
            instance=cat("inst"),
        )

        return SceneData(
            materials=materials,
            triangles=triangles,
            units=units,
            instances=instances,
            light_unit_cdf=np.asarray(unit_cdf, np.float32),
            light_unit_pmf=np.asarray(unit_pmf, np.float32),
            light_unit_alias_prob=np.asarray(unit_aprob, np.float32),
            light_unit_alias_idx=np.asarray(unit_aidx, np.int32),
            light_unit_probtex=unit_probtex,
            total_emissive_importance=np.float32(total_imp),
            env=env,
            object_triangles=object_triangles,
            textures=self.atlas.build() if self.atlas.images else None,
            displaced=self._build_displaced(),
        )


    def compile_instanced(self, arity: int = 4, max_leaf: int = 4,
                          node_format: str = "widerow",
                          rebraid: float = 0.0):
        """Two-level compile: per-group BLAS tables shared by instances
        (the reference's GAS/IAS split, common_host.h:1027 updateASs).

        Returns (SceneData, accel.InstancedAccel). SceneData.triangles hold
        OBJECT-space BLAS triangles (unit_id = local geometry index within
        the group); light-order arrays are per-UNIT (instance x geom) with
        world-space importances, and light_tri_index maps light-order
        positions to global BLAS triangle ids. N instances of a group share
        one triangle table — memory no longer scales with instance count.

        node_format must be "widerow": the quantized ("qrow") instanced
        variant was removed in r5 (TPU-worker Mosaic crash + lost its A/B,
        perf/RESULTS_r4.md:101-104)."""
        from gfxexp_tpu.accel.pallas_widestack import build_instanced

        if node_format != "widerow":
            raise ValueError(
                f"unsupported instanced node_format {node_format!r}; the "
                "qrow instanced variant was removed in r5 "
                "(perf/RESULTS_r4.md)")

        if not self.instances:
            raise ValueError("scene has no instances")
        mats = self.materials or [HostMaterial()]

        # ---- dedupe geometry groups -> BLAS ids ----
        group_key_to_blas = {}
        blas_groups = []  # list of geometry-id tuples
        inst_blas = []
        for inst in self.instances:
            key = tuple(inst.geometries)
            if key not in group_key_to_blas:
                group_key_to_blas[key] = len(blas_groups)
                blas_groups.append(key)
            inst_blas.append(group_key_to_blas[key])

        # ---- per-BLAS object-space triangle arrays (pre-permutation) ----
        blas_raw = []  # per blas: dict of SoA chunks + geom local bases
        blas_tri_base = []  # global base of each blas in concatenated order
        cursor = 0
        for group in blas_groups:
            chunks = {k: [] for k in ("p0", "e1", "e2", "n0", "n1", "n2",
                                      "uv0", "uv1", "uv2", "unit")}
            geom_base, geom_count = [], []
            local = 0
            for k, geom_id in enumerate(group):
                g = self.geometries[geom_id]
                i0, i1, i2 = g.indices[:, 0], g.indices[:, 1], g.indices[:, 2]
                p0, p1, p2 = g.positions[i0], g.positions[i1], g.positions[i2]
                chunks["p0"].append(p0)
                chunks["e1"].append(p1 - p0)
                chunks["e2"].append(p2 - p0)
                chunks["n0"].append(g.normals[i0])
                chunks["n1"].append(g.normals[i1])
                chunks["n2"].append(g.normals[i2])
                chunks["uv0"].append(g.texcoords[i0])
                chunks["uv1"].append(g.texcoords[i1])
                chunks["uv2"].append(g.texcoords[i2])
                nt = len(g.indices)
                chunks["unit"].append(np.full(nt, k, np.int32))
                geom_base.append(local)
                geom_count.append(nt)
                local += nt
            cat = {k: np.concatenate(v).astype(
                np.int32 if k == "unit" else np.float32)
                for k, v in chunks.items()}
            blas_raw.append((cat, geom_base, geom_count))
            blas_tri_base.append(cursor)
            cursor += local

        # ---- build BLAS BVHs (permutes each blas's triangles) ----
        acc, perms = build_instanced(
            [(b[0]["p0"], b[0]["e1"], b[0]["e2"]) for b in blas_raw],
            [(inst_blas[i], self.instances[i].transform)
             for i in range(len(self.instances))],
            arity=arity, max_leaf=max_leaf, rebraid=rebraid)
        # apply per-blas permutations; track old->new local index for the
        # light-order mapping (light order stays GEOMETRY order)
        blas_cat = {k: [] for k in blas_raw[0][0]}
        inv_perms = []
        for b, (cat, _, _) in enumerate(blas_raw):
            p = perms[b]
            inv = np.empty_like(p)
            inv[p] = np.arange(len(p), dtype=p.dtype)
            inv_perms.append(inv)
            for k in blas_cat:
                blas_cat[k].append(np.asarray(cat[k])[p])
        triangles = TriangleSoA(
            **{("unit_id" if k == "unit" else k):
               np.concatenate(blas_cat[k]) for k in blas_cat})
        # ---- units: instance-major, group order ----
        unit_material, unit_instance = [], []
        unit_tri_offset, unit_tri_count, unit_tri_base = [], [], []
        unit_importance = []
        tri_pmf_chunks, tri_cdf_chunks, tri_idx_chunks = [], [], []
        tri_aprob_chunks, tri_aidx_chunks = [], []
        inst_transform, inst_scale, inst_unit_base = [], [], []
        light_cursor = 0
        unit_cursor = 0
        for inst_id, inst in enumerate(self.instances):
            b = inst_blas[inst_id]
            cat, geom_base, geom_count = blas_raw[b]
            m = inst.transform.astype(np.float64)
            rot = m[:, :3]
            inst_transform.append(inst.transform)
            inst_scale.append(
                float(np.cbrt(max(abs(np.linalg.det(rot)), 1e-30))))
            inst_unit_base.append(unit_cursor)
            for k, geom_id in enumerate(blas_groups[b]):
                g = self.geometries[geom_id]
                nt = geom_count[k]
                lo = geom_base[k]
                emit_lum = float(np.dot(_LUMA, mats[g.material].emittance))
                # only EMISSIVE units get light-order segments: the light
                # arrays scale with emissive tris, not scene tris (a 514-
                # instance city would otherwise carry 4.1M light rows and
                # pack_light_rows would OOM gathering [T,3,4] transforms).
                # Non-emissive units keep (offset=cursor, count=0): unit_pmf
                # is 0 so they are never sampled, and surface_light_pdf's
                # light_pos gather for their hits is multiplied by 0.
                if emit_lum > 0.0:
                    # world-space emissive importance under THIS instance
                    e1w = cat["e1"][lo:lo + nt] @ rot.T
                    e2w = cat["e2"][lo:lo + nt] @ rot.T
                    area = 0.5 * np.linalg.norm(np.cross(e1w, e2w), axis=-1)
                    w = area * emit_lum
                    total = w.sum()
                    pmf = w / total if total > 0 else np.zeros(nt)
                    cdf = np.concatenate([[0.0], np.cumsum(pmf)[:-1]])
                    tri_pmf_chunks.append(pmf.astype(np.float32))
                    tri_cdf_chunks.append(cdf.astype(np.float32))
                    _, a_prob, a_idx, _ = vose_alias_arrays(w)
                    tri_aprob_chunks.append(a_prob.astype(np.float32))
                    tri_aidx_chunks.append(a_idx.astype(np.int32))
                    # light-order position -> GLOBAL blas triangle id
                    glob = blas_tri_base[b] + inv_perms[b][lo:lo + nt]
                    tri_idx_chunks.append(glob.astype(np.int32))
                    nt_light = nt
                else:
                    total = 0.0
                    nt_light = 0

                unit_material.append(g.material)
                unit_instance.append(inst_id)
                unit_tri_offset.append(light_cursor)
                unit_tri_count.append(nt_light)
                unit_tri_base.append(lo)  # geometry-order base within blas
                unit_importance.append(float(total))
                light_cursor += nt_light
                unit_cursor += 1

        unit_importance = np.asarray(unit_importance, np.float64)
        total_imp = unit_importance.sum()
        unit_pmf = (unit_importance / total_imp if total_imp > 0
                    else np.zeros_like(unit_importance))
        unit_cdf = np.concatenate([[0.0], np.cumsum(unit_pmf)])
        _, unit_aprob, unit_aidx, _ = vose_alias_arrays(unit_importance)

        def _cat(chunks, dtype):
            # no emissive unit anywhere: keep 1-element zero arrays so
            # device gathers stay well-formed (never sampled: pmf = 0)
            if not chunks:
                return np.zeros(1, dtype)
            return np.concatenate(chunks).astype(dtype)

        units = UnitTable(
            material=np.asarray(unit_material, np.int32),
            instance=np.asarray(unit_instance, np.int32),
            tri_offset=np.asarray(unit_tri_offset, np.int32),
            tri_count=np.asarray(unit_tri_count, np.int32),
            light_tri_cdf=_cat(tri_cdf_chunks, np.float32),
            light_tri_index=_cat(tri_idx_chunks, np.int32),
            # LIGHT-ORDER pmf (instanced mode; see lights.py light_tri_pmf_at)
            light_tri_pmf=_cat(tri_pmf_chunks, np.float32),
            emissive_importance=np.asarray(unit_importance, np.float32),
            light_tri_alias_prob=_cat(tri_aprob_chunks, np.float32),
            light_tri_alias_local=_cat(tri_aidx_chunks, np.int32),
        )

        transforms = np.stack(inst_transform).astype(np.float32)
        inv = np.zeros_like(transforms)
        for i, t in enumerate(transforms):
            r_inv = np.linalg.inv(t[:, :3].astype(np.float64))
            inv[i, :, :3] = r_inv
            inv[i, :, 3] = -r_inv @ t[:, 3].astype(np.float64)
        instances = InstanceTable(
            transform=np.asarray(transforms),
            inv_transform=np.asarray(inv),
            prev_transform=np.asarray(transforms),
            uniform_scale=np.asarray(inst_scale, np.float32),
        )

        # traversal (BVH-permuted) global tri -> blas-wide geometry-order
        # index (see types.SceneData.tri_light_local)
        n_blas_tris = cursor
        tri_light_local = np.empty(n_blas_tris, np.int32)
        for b in range(len(blas_groups)):
            lo = blas_tri_base[b]
            n = len(perms[b])
            tri_light_local[lo:lo + n] = perms[b].astype(np.int32)

        scene = SceneData(
            materials=self._materials_table(mats),
            triangles=triangles,
            units=units,
            instances=instances,
            light_unit_cdf=np.asarray(unit_cdf, np.float32),
            light_unit_pmf=np.asarray(unit_pmf, np.float32),
            light_unit_alias_prob=np.asarray(unit_aprob, np.float32),
            light_unit_alias_idx=np.asarray(unit_aidx, np.int32),
            total_emissive_importance=np.float32(total_imp),
            env=self._env_light(),
            object_triangles=None,
            textures=self.atlas.build() if self.atlas.images else None,
            inst_unit_base=np.asarray(inst_unit_base, np.int32),
            unit_tri_base=np.asarray(unit_tri_base, np.int32),
            tri_light_local=tri_light_local,
        )
        return scene, acc


def compute_smooth_normals(positions: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (reference computes normals on load when the
    model lacks them via assimp postprocess)."""
    n = np.zeros_like(positions, dtype=np.float64)
    p0 = positions[indices[:, 0]]
    p1 = positions[indices[:, 1]]
    p2 = positions[indices[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    for k in range(3):
        np.add.at(n, indices[:, k], fn)
    return np_normalize(n).astype(np.float32)
