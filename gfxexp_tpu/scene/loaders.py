"""Asset loading: Wavefront OBJ/MTL meshes.

The reference loads models through assimp (reference: common_host.cpp —
createTriangleMeshes:2178, computeFlattenedMesh:2080,
loadTriangleMeshGeometriesOnCPU:2150) with two material conventions:
"traditional" (diffuse+specular from Kd/Ks/Ns) and "simple_pbr" (base
color/roughness/metallic). assimp isn't available here, so we parse OBJ/MTL
directly (covers the reference's bundled test assets data/*.obj) and apply the
same two conventions.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from gfxexp_tpu.scene.builder import HostMaterial, SceneBuilder, compute_smooth_normals
from gfxexp_tpu.scene.types import BSDF_DIFFUSE_SPECULAR, BSDF_SIMPLE_PBR


def parse_mtl(path: str) -> Dict[str, dict]:
    """Parse a .mtl file into raw property dicts."""
    mats: Dict[str, dict] = {}
    cur: Optional[dict] = None
    if not os.path.exists(path):
        return mats
    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                cur = {}
                mats[" ".join(parts[1:])] = cur
            elif cur is not None:
                if key in ("Kd", "Ks", "Ke", "Ka"):
                    cur[key] = [float(x) for x in parts[1:4]]
                elif key in ("Ns", "d", "Ni", "Pr", "Pm"):
                    cur[key] = float(parts[1])
                elif key.startswith("map_"):
                    cur[key] = parts[-1]
    return mats


def _mtl_to_material(props: dict, convention: str, builder=None,
                     base_dir: str = "") -> HostMaterial:
    kd = props.get("Kd", [0.8, 0.8, 0.8])
    ks = props.get("Ks", [0.0, 0.0, 0.0])
    ke = props.get("Ke", [0.0, 0.0, 0.0])
    ns = props.get("Ns", 10.0)
    diffuse_tex = -1
    normal_tex = -1
    if builder is not None:
        if "map_Kd" in props:
            p = os.path.join(base_dir, props["map_Kd"])
            if os.path.exists(p):
                diffuse_tex = builder.load_texture(p, to_linear=True)
        for key in ("map_Bump", "map_bump", "bump", "norm"):
            if key in props:
                p = os.path.join(base_dir, props[key])
                if os.path.exists(p):
                    normal_tex = builder.load_texture(p, to_linear=False)
                break
    if convention == "simple_pbr":
        # reference: createTriangleMeshes "simple_pbr" path reads base color +
        # roughness/metallic (common_host.cpp:2178 material branch)
        rough = props.get("Pr", 0.5)
        metal = props.get("Pm", 0.0)
        base = np.asarray(kd, np.float64)
        return HostMaterial(
            bsdf_type=BSDF_SIMPLE_PBR,
            diffuse_color=tuple(base * (1.0 - metal)),
            specular_f0=tuple(0.04 * (1.0 - metal) + base * metal),
            roughness=float(rough),
            metallic=float(metal),
            emittance=tuple(ke),
            diffuse_tex=diffuse_tex,
            normal_tex=normal_tex,
        )
    # traditional: Ns (Phong exponent) -> smoothness as the reference does for
    # assimp shininess (createDiffuseAndSpecularMaterial, common_host.cpp:1556)
    smoothness = float(np.clip(np.sqrt(max(ns, 0.0) / 1000.0), 0.0, 1.0))
    return HostMaterial(
        bsdf_type=BSDF_DIFFUSE_SPECULAR,
        diffuse_color=tuple(kd),
        specular_f0=tuple(ks),
        roughness=1.0 - smoothness,
        emittance=tuple(ke),
        diffuse_tex=diffuse_tex,
        normal_tex=normal_tex,
    )


def load_obj(
    path: str,
    builder: SceneBuilder,
    material_convention: str = "trad",
    default_material: Optional[int] = None,
) -> List[int]:
    """Parse an OBJ file, add its materials + geometry (one HostGeometry per
    used material) to `builder`. Returns geometry ids (a 'group' to instance).
    """
    positions: List[Tuple[float, float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    texcoords: List[Tuple[float, float]] = []
    mtl_defs: Dict[str, dict] = {}
    mat_slot: Dict[str, int] = {}
    # per-material face buckets: list of (vi, ti, ni) triples
    buckets: Dict[str, List[List[Tuple[int, int, int]]]] = {}
    cur_mat = "__default__"

    base_dir = os.path.dirname(os.path.abspath(path))

    def parse_index(token: str) -> Tuple[int, int, int]:
        comps = token.split("/")
        vi = int(comps[0])
        ti = int(comps[1]) if len(comps) > 1 and comps[1] else 0
        ni = int(comps[2]) if len(comps) > 2 and comps[2] else 0
        return vi, ti, ni

    with open(path, "r", errors="replace") as f:
        for line in f:
            parts = line.strip().split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                positions.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vt":
                texcoords.append((float(parts[1]), float(parts[2]) if len(parts) > 2 else 0.0))
            elif key == "mtllib":
                mtl_defs.update(parse_mtl(os.path.join(base_dir, " ".join(parts[1:]))))
            elif key == "usemtl":
                cur_mat = " ".join(parts[1:])
            elif key == "f":
                corners = [parse_index(t) for t in parts[1:]]
                bucket = buckets.setdefault(cur_mat, [])
                for k in range(1, len(corners) - 1):  # fan triangulation
                    bucket.append([corners[0], corners[k], corners[k + 1]])

    pos_arr = np.asarray(positions, np.float32)
    nrm_arr = np.asarray(normals, np.float32) if normals else None
    uv_arr = np.asarray(texcoords, np.float32) if texcoords else None

    geom_ids: List[int] = []
    for mat_name, faces in buckets.items():
        if mat_name not in mat_slot:
            if mat_name in mtl_defs:
                mat_slot[mat_name] = builder.add_material(
                    _mtl_to_material(mtl_defs[mat_name], material_convention,
                                     builder=builder, base_dir=base_dir)
                )
            elif default_material is not None:
                mat_slot[mat_name] = default_material
            else:
                mat_slot[mat_name] = builder.add_material(HostMaterial(name=mat_name))

        # re-index: unique (v, vt, vn) corners -> compact vertex buffer
        faces_arr = np.asarray(faces, np.int64)  # [F, 3, 3] 1-based, 0 = absent
        flat = faces_arr.reshape(-1, 3)
        # resolve negative indices (relative addressing)
        for col, count in ((0, len(positions)), (1, len(texcoords)), (2, len(normals))):
            neg = flat[:, col] < 0
            flat[neg, col] += count + 1
        uniq, inv = np.unique(flat, axis=0, return_inverse=True)
        v = pos_arr[uniq[:, 0] - 1]
        uv = (
            uv_arr[np.clip(uniq[:, 1] - 1, 0, None)]
            if uv_arr is not None
            else np.zeros((len(uniq), 2), np.float32)
        )
        if uv_arr is not None:
            uv[uniq[:, 1] == 0] = 0.0
        idx = inv.reshape(-1, 3).astype(np.int32)
        if nrm_arr is not None and np.all(uniq[:, 2] > 0):
            n = nrm_arr[uniq[:, 2] - 1]
        else:
            n = compute_smooth_normals(v, idx)
        geom_ids.append(
            builder.add_geometry(v, idx, mat_slot[mat_name], normals=n, texcoords=uv)
        )
    return geom_ids


def load_ply(path: str, builder: SceneBuilder,
             material: Optional[int] = None) -> List[int]:
    """Parse a PLY mesh (ascii or binary_little_endian) and add it to
    `builder`. Supports vertex properties x/y/z [nx/ny/nz] [u/v | s/t] and
    triangle/polygon faces (fan-triangulated). One step toward the
    reference's assimp multi-format import (common_host.cpp:2150)."""
    import struct as _struct

    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(type, prop), ...])
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            parts = line.decode("ascii", "replace").strip().split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3],
                                            parts[4]))
                else:
                    elements[-1][2].append(("scalar", parts[1], parts[2]))
            elif parts[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"unsupported PLY format {fmt}")

        _SIZES = {"char": "b", "uchar": "B", "int8": "b", "uint8": "B",
                  "short": "h", "ushort": "H", "int16": "h", "uint16": "H",
                  "int": "i", "uint": "I", "int32": "i", "uint32": "I",
                  "float": "f", "float32": "f", "double": "d",
                  "float64": "d"}

        verts = None
        vert_props = None
        faces = []
        for name, count, props in elements:
            if fmt == "ascii":
                rows = []
                for _ in range(count):
                    rows.append(f.readline().decode().split())
                if name == "vertex":
                    vert_props = [p[1] if p[0] == "scalar" else None
                                  for p in props]
                    verts = np.asarray([[float(x) for x in r] for r in rows],
                                       np.float64)
                    vert_props = [p[2] for p in props if p[0] == "scalar"]
                elif name == "face":
                    for r in rows:
                        k = int(r[0])
                        idxs = [int(x) for x in r[1:1 + k]]
                        for j in range(1, k - 1):
                            faces.append([idxs[0], idxs[j], idxs[j + 1]])
            else:
                if name == "vertex":
                    assert all(p[0] == "scalar" for p in props), \
                        "list property on vertices unsupported"
                    fmt_str = "<" + "".join(_SIZES[p[1]] for p in props)
                    sz = _struct.calcsize(fmt_str)
                    buf = f.read(sz * count)
                    verts = np.asarray(
                        [_struct.unpack_from(fmt_str, buf, i * sz)
                         for i in range(count)], np.float64)
                    vert_props = [p[2] for p in props]
                elif name == "face":
                    _, cnt_t, idx_t, _name = [
                        p for p in props if p[0] == "list"][0]
                    cfmt = "<" + _SIZES[cnt_t]
                    ifmt_c = _SIZES[idx_t]
                    csz = _struct.calcsize(cfmt)
                    isz = _struct.calcsize("<" + ifmt_c)
                    for _ in range(count):
                        (k,) = _struct.unpack(cfmt, f.read(csz))
                        idxs = _struct.unpack("<" + ifmt_c * k,
                                              f.read(isz * k))
                        for j in range(1, k - 1):
                            faces.append([idxs[0], idxs[j], idxs[j + 1]])
                else:
                    # skip unknown fixed-size elements
                    fmt_str = "<" + "".join(
                        _SIZES[p[1]] for p in props if p[0] == "scalar")
                    f.read(_struct.calcsize(fmt_str) * count)

    if verts is None or not faces:
        raise ValueError(f"{path}: no vertex/face data")
    names = vert_props
    def col(*cands):
        for c in cands:
            if c in names:
                return verts[:, names.index(c)]
        return None

    pos = np.stack([col("x"), col("y"), col("z")], -1).astype(np.float32)
    idx = np.asarray(faces, np.int32)
    nx = col("nx")
    normals = (np.stack([nx, col("ny"), col("nz")], -1).astype(np.float32)
               if nx is not None else None)
    u = col("u", "s", "texture_u")
    uv = (np.stack([u, col("v", "t", "texture_v")], -1).astype(np.float32)
          if u is not None else None)
    if material is None:
        material = builder.add_material(HostMaterial(name=os.path.basename(path)))
    return [builder.add_geometry(pos, idx, material, normals=normals,
                                 texcoords=uv)]


def load_mesh(path: str, builder: SceneBuilder, **kw) -> List[int]:
    """Extension-dispatched mesh import (OBJ / PLY)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return load_obj(path, builder, **kw)
    if ext == ".ply":
        return load_ply(path, builder, **kw)
    raise ValueError(f"unsupported mesh format: {ext}")
