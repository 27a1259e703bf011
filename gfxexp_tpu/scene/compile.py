"""Scene compilation: SceneBuilder -> (SceneData in traversal order, BVH).

The counterpart of the reference's acceleration-structure build + slot-table
upload (reference: common_host.h Scene::updateASs:1027 + buffer setup), done
once on host. The BVH permutes triangles into leaf order; all per-triangle
SoA arrays are permuted to match and the light tables keep an indirection
(scene/types.py UnitTable docstring).
"""

from __future__ import annotations

import numpy as np

from gfxexp_tpu.accel.bvh_build import BVH, build_bvh
from gfxexp_tpu.scene.builder import SceneBuilder
from gfxexp_tpu.scene.types import SceneData


def apply_triangle_permutation(scene: SceneData, perm: np.ndarray) -> SceneData:
    """Reorder TriangleSoA by `perm` (new[i] = old[perm[i]]) and update the
    light-order indirection accordingly.

    Pure numpy on purpose: scene compilation must not dispatch device ops
    (in the TPU process every tiny op pays a remote-compile round trip)."""
    p = np.asarray(perm)
    inv = np.empty_like(p, dtype=np.int32)
    inv[p] = np.arange(p.shape[0], dtype=np.int32)
    tris = scene.triangles
    ga = lambda x: np.asarray(x)
    return scene.replace(
        triangles=tris.replace(
            p0=ga(tris.p0)[p], e1=ga(tris.e1)[p], e2=ga(tris.e2)[p],
            n0=ga(tris.n0)[p], n1=ga(tris.n1)[p], n2=ga(tris.n2)[p],
            uv0=ga(tris.uv0)[p], uv1=ga(tris.uv1)[p], uv2=ga(tris.uv2)[p],
            unit_id=ga(tris.unit_id)[p],
        ),
        units=scene.units.replace(
            light_tri_index=inv[ga(scene.units.light_tri_index)],
            light_tri_pmf=ga(scene.units.light_tri_pmf)[p],
        ),
        object_triangles=None if scene.object_triangles is None else
        scene.object_triangles.replace(
            p0=ga(scene.object_triangles.p0)[p],
            e1=ga(scene.object_triangles.e1)[p],
            e2=ga(scene.object_triangles.e2)[p],
            n0=ga(scene.object_triangles.n0)[p],
            n1=ga(scene.object_triangles.n1)[p],
            n2=ga(scene.object_triangles.n2)[p],
            instance=ga(scene.object_triangles.instance)[p],
        ),
    )


def compile_scene(
    builder: SceneBuilder, arity: int = 4, max_leaf: int = 4,
    traversal: str = "skip", use_probability_texture: bool = False,
    spatial_splits: bool = False, rebraid: float = 0.0,
):
    """traversal="skip" (default) produces the stackless SkipBVH;
    traversal="widerow" produces the packed row table for the ordered-stack
    Pallas kernel (accel/pallas_widestack.py — the fast TPU path);
    traversal="wide" produces the stack-based wide BVH.

    spatial_splits=True builds with SBVH spatial splits (reference:
    bvh_builder.cpp:313): straddling triangles are clipped into multiple
    leaves; the permuted triangle arrays then carry duplicates (hits may
    report either copy — identical shading attributes)."""
    if traversal == "instanced":
        # two-level BLAS/instance mode (GAS/IAS analogue): the builder
        # produces object-space shared tables + the InstancedAccel directly
        return builder.compile_instanced(
            arity=arity, max_leaf=max_leaf, rebraid=rebraid)
    scene = builder.compile(
        use_probability_texture=use_probability_texture)
    if traversal == "widerow":
        from gfxexp_tpu.accel.pallas_widestack import build_widerow

        wrow, perm = build_widerow(
            np.asarray(scene.triangles.p0),
            np.asarray(scene.triangles.e1),
            np.asarray(scene.triangles.e2),
            arity=arity, max_leaf=max_leaf,
            spatial_splits=spatial_splits,
        )
        return apply_triangle_permutation(scene, perm), wrow
    if traversal == "qrow":
        # quantized compressed rows (reference: CompressedInternalNode_T,
        # common_shared.h:757): the scene's triangle soup is replaced by
        # the DEQUANTIZED vertices so shading sees exactly the traced
        # geometry (shift bounded by the 16-bit leaf quantum)
        from gfxexp_tpu.accel.pallas_qrow import build_qrow

        qb, perm, (dq0, dqe1, dqe2) = build_qrow(
            np.asarray(scene.triangles.p0),
            np.asarray(scene.triangles.e1),
            np.asarray(scene.triangles.e2),
            spatial_splits=spatial_splits,
        )
        scene = apply_triangle_permutation(scene, perm)
        scene = scene.replace(triangles=scene.triangles.replace(
            p0=dq0, e1=dqe1, e2=dqe2))
        return scene, qb
    bvh, perm = build_bvh(
        np.asarray(scene.triangles.p0),
        np.asarray(scene.triangles.e1),
        np.asarray(scene.triangles.e2),
        arity=arity,
        max_leaf=max_leaf,
    )
    scene = apply_triangle_permutation(scene, perm)
    if traversal == "skip":
        from gfxexp_tpu.accel.skiplink import build_skip_links

        skip = build_skip_links(
            np.asarray(bvh.child_min), np.asarray(bvh.child_max),
            np.asarray(bvh.child_idx), np.asarray(bvh.child_count),
            max_leaf=max_leaf,
        )
        return scene, skip
    return scene, bvh
