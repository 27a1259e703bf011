from gfxexp_tpu.accel.bvh_build import BVH, build_bvh  # noqa: F401
from gfxexp_tpu.accel.traverse import (  # noqa: F401
    intersect_closest,
    intersect_any,
    intersect_closest_brute,
)
