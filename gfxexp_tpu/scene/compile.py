"""Scene compilation: SceneBuilder -> (SceneData in traversal order, BVH).

The counterpart of the reference's acceleration-structure build + slot-table
upload (reference: common_host.h Scene::updateASs:1027 + buffer setup), done
once on host. The BVH permutes triangles into leaf order; all per-triangle
SoA arrays are permuted to match and the light tables keep an indirection
(scene/types.py UnitTable docstring).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gfxexp_tpu.accel.bvh_build import BVH, build_bvh
from gfxexp_tpu.scene.builder import SceneBuilder
from gfxexp_tpu.scene.types import SceneData


def apply_triangle_permutation(scene: SceneData, perm: np.ndarray) -> SceneData:
    """Reorder TriangleSoA by `perm` (new[i] = old[perm[i]]) and update the
    light-order indirection accordingly."""
    p = jnp.asarray(perm, jnp.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    inv = jnp.asarray(inv, jnp.int32)
    tris = scene.triangles
    return scene.replace(
        triangles=tris.replace(
            p0=tris.p0[p], e1=tris.e1[p], e2=tris.e2[p],
            n0=tris.n0[p], n1=tris.n1[p], n2=tris.n2[p],
            uv0=tris.uv0[p], uv1=tris.uv1[p], uv2=tris.uv2[p],
            unit_id=tris.unit_id[p],
        ),
        units=scene.units.replace(
            light_tri_index=inv[scene.units.light_tri_index],
            light_tri_pmf=scene.units.light_tri_pmf[p],
        ),
    )


def compile_scene(
    builder: SceneBuilder, arity: int = 4, max_leaf: int = 4
) -> Tuple[SceneData, BVH]:
    scene = builder.compile()
    bvh, perm = build_bvh(
        np.asarray(scene.triangles.p0),
        np.asarray(scene.triangles.e1),
        np.asarray(scene.triangles.e2),
        arity=arity,
        max_leaf=max_leaf,
    )
    return apply_triangle_permutation(scene, perm), bvh
