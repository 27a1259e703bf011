"""Shell mapping — arbitrary geometry instanced inside displacement shells
(reference: nrtdsm/nrtdsm_main.cpp:772-875 builds a CPU BVH8 of an OBJ's
contents per shell, uploaded as GeometryBVH_T<8> with up to 8 material
slots, common_shared.h:1228-1241; traversal
nrtdsm_intersection_kernels.h:1632 displacedSurface_generic<...,
forShellMapping> walks it with the curved texture-space ray).

TPU re-architecture: the shell interior is parameterized by (u, v, hn)
with hn in [0, 1]; a world ray maps to a CURVE q(t) in shell space through
the exact nonlinear height solve (techniques.nrtdsm.find_height — the
reference's findHeight cubic). Instead of curved-ray-vs-AABB/triangle
tests with polynomial root finding, the curve is approximated PIECEWISE
LINEARLY over a bounded number of segments and each segment is traced
against the shell-content BVH with the standard batched traversal
(accel/traverse.intersect_closest). For straight shells (untilted vertex
normals) the texture-space curve IS a line, so the scheme is exact there —
which the oracle test exploits by comparing against the world-space-mapped
mesh. Curved shells converge with the segment count.

Shell contents carry a per-triangle material id (the reference's
multi-material shells, matSlots in common_shared.h:1236)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gfxexp_tpu.techniques.nrtdsm import find_height
from gfxexp_tpu.techniques.tfdm import DisplacementParameters, _uv_transform


@struct.dataclass
class ShellGeometry:
    """A base mesh whose prisms each instance the same texture-space
    contents (reference: ShellBVH shared per TFDM/NRTDSM geometry,
    common_host.h:674)."""

    # base mesh (world space)
    p0: jnp.ndarray  # [B, 3]
    p1: jnp.ndarray
    p2: jnp.ndarray
    n0: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # [B, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    # shell contents: triangles in (u, v, hn) space, hn in [0, 1]
    shell_tris: object  # scene.types.TriangleSoA (texture space)
    shell_bvh: object  # accel structure for shell_tris
    shell_mat: jnp.ndarray  # [M] int32 material slot per shell triangle
    h_lo: float = struct.field(pytree_node=False, default=0.0)
    h_hi: float = struct.field(pytree_node=False, default=1.0)
    material: int = struct.field(pytree_node=False, default=0)
    params: DisplacementParameters = struct.field(
        pytree_node=False, default=DisplacementParameters())
    # curvature-adaptive segment count chosen at build time
    # (_estimate_shell_segments): 1 for straight shells (exact), growing
    # with measured normal tilt. Used when intersect_shell gets
    # n_segments=None.
    auto_segments: int = struct.field(pytree_node=False, default=16)
    # skip-walk box BVH over prism AABBs for large base meshes
    prism_bvh: object = None


def build_shell_geometry(positions, indices, uvs, shell_positions,
                         shell_indices, params=None, material: int = 0,
                         normals=None, shell_materials=None,
                         arity: int = 8, max_leaf: int = 4) -> ShellGeometry:
    """Host build. shell_positions are in (u, v, hn) with hn in [0, 1]
    (callers normalize their OBJ into the unit shell box); the shell BVH is
    built by the CPU wide-BVH builder at arity 8 like the reference
    (bvh::buildGeometryBVH<8>, nrtdsm_main.cpp:818)."""
    from gfxexp_tpu.accel.bvh_build import build_bvh
    from gfxexp_tpu.accel.skiplink import build_skip_links
    from gfxexp_tpu.scene.builder import compute_smooth_normals
    from gfxexp_tpu.scene.types import TriangleSoA

    params = params or DisplacementParameters()
    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    uvs = np.asarray(uvs, np.float32)
    if normals is None:
        normals = compute_smooth_normals(positions, indices)
    i0, i1, i2 = indices[:, 0], indices[:, 1], indices[:, 2]

    sp = np.asarray(shell_positions, np.float32)
    si = np.asarray(shell_indices, np.int32)
    s0, s1, s2 = sp[si[:, 0]], sp[si[:, 1]], sp[si[:, 2]]
    snrm = compute_smooth_normals(sp, si)
    bvh, perm = build_bvh(s0, s1 - s0, s2 - s0, arity=arity,
                          max_leaf=max_leaf)
    skip = build_skip_links(
        np.asarray(bvh.child_min), np.asarray(bvh.child_max),
        np.asarray(bvh.child_idx), np.asarray(bvh.child_count),
        max_leaf=max_leaf)
    s0, s1, s2 = s0[perm], s1[perm], s2[perm]
    n_s = s0.shape[0]
    zeros2 = np.zeros((n_s, 2), np.float32)
    shell_tris = TriangleSoA(
        p0=jnp.asarray(s0), e1=jnp.asarray(s1 - s0), e2=jnp.asarray(s2 - s0),
        n0=jnp.asarray(snrm[si[:, 0]][perm]),
        n1=jnp.asarray(snrm[si[:, 1]][perm]),
        n2=jnp.asarray(snrm[si[:, 2]][perm]),
        uv0=jnp.asarray(zeros2), uv1=jnp.asarray(zeros2),
        uv2=jnp.asarray(zeros2),
        unit_id=jnp.zeros((n_s,), jnp.int32),
    )
    if shell_materials is None:
        shell_mat = np.full(n_s, material, np.int32)
    else:
        shell_mat = np.asarray(shell_materials, np.int32)[perm]

    p = params
    d_lo = p.h_offset + p.h_scale * (0.0 - p.h_bias)
    d_hi = p.h_offset + p.h_scale * (1.0 - p.h_bias)
    h_lo_w = float(min(d_lo, d_hi))
    h_hi_w = float(max(d_lo, d_hi))
    prism_bvh = None
    if len(i0) >= 2048:
        from gfxexp_tpu.techniques.tfdm import build_prism_bvh

        corners = np.stack([
            positions[i0] + h_lo_w * normals[i0],
            positions[i1] + h_lo_w * normals[i1],
            positions[i2] + h_lo_w * normals[i2],
            positions[i0] + h_hi_w * normals[i0],
            positions[i1] + h_hi_w * normals[i1],
            positions[i2] + h_hi_w * normals[i2],
        ], axis=1)
        prism_bvh = build_prism_bvh(corners.min(axis=1) - 1e-5,
                                    corners.max(axis=1) + 1e-5)
    auto_segments = _estimate_shell_segments(
        np.stack([positions[i0], positions[i1], positions[i2]], axis=1),
        np.stack([normals[i0], normals[i1], normals[i2]], axis=1),
        np.stack([uvs[i0], uvs[i1], uvs[i2]], axis=1),
        float(min(d_lo, d_hi)), float(max(d_lo, d_hi)))
    return ShellGeometry(
        p0=jnp.asarray(positions[i0]), p1=jnp.asarray(positions[i1]),
        p2=jnp.asarray(positions[i2]),
        n0=jnp.asarray(normals[i0]), n1=jnp.asarray(normals[i1]),
        n2=jnp.asarray(normals[i2]),
        uv0=jnp.asarray(uvs[i0]), uv1=jnp.asarray(uvs[i1]),
        uv2=jnp.asarray(uvs[i2]),
        shell_tris=shell_tris, shell_bvh=skip,
        shell_mat=jnp.asarray(shell_mat),
        h_lo=float(min(d_lo, d_hi)), h_hi=float(max(d_lo, d_hi)),
        material=material, params=params, auto_segments=auto_segments,
        prism_bvh=prism_bvh,
    )


def _estimate_shell_segments(P, N, UV, h_lo, h_hi, eps: float = 2e-3,
                             max_segments: int = 48):
    """Curvature-driven segment count (host numpy; reference direction:
    nrtdsm_intersection_kernels.h:1632 intersects the exact degree-2
    rational texture-space curve — here the piecewise-linear trace gets an
    error-bounded segment count instead of a fixed 16).

    For every base triangle, world chords between prism corners
    (bottom_i -> top_j, i != j — the vertex-normal verticals map exactly)
    are inverted at their midpoint by Newton on the shell map
    S(b1, b2, h) = base + h n. The midpoint's texture-space deviation from
    the endpoint average IS the 1-segment chord error; since chord error
    is second order in segment length, n = ceil(sqrt(dev / eps)) bounds
    the per-segment deviation by eps (in normalized (u, v, hn) units).
    Straight shells measure dev = 0 -> n = 1, where the linear trace is
    exact."""
    P = np.asarray(P, np.float64)  # [B, 3, 3] vertices
    N = np.asarray(N, np.float64)
    UV = np.asarray(UV, np.float64)  # [B, 3, 2]
    h_span = max(h_hi - h_lo, 1e-12)
    dev_max = 0.0
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            xa = P[:, i] + h_lo * N[:, i]
            xb = P[:, j] + h_hi * N[:, j]
            xm = 0.5 * (xa + xb)
            # texture coords of the endpoints are exact corner coords
            qa = np.concatenate([UV[:, i], np.zeros((P.shape[0], 1))], 1)
            qb = np.concatenate([UV[:, j], np.ones((P.shape[0], 1))], 1)
            # Newton-invert S at the world midpoint, start at param midpoint
            b1 = np.full(P.shape[0], 1.0 / 3)
            b2 = np.full(P.shape[0], 1.0 / 3)
            h = np.full(P.shape[0], 0.5 * (h_lo + h_hi))
            e1p = P[:, 1] - P[:, 0]
            e2p = P[:, 2] - P[:, 0]
            e1n = N[:, 1] - N[:, 0]
            e2n = N[:, 2] - N[:, 0]
            ok = np.ones(P.shape[0], bool)
            for _ in range(12):
                nb = (N[:, 0] + b1[:, None] * e1n + b2[:, None] * e2n)
                S = (P[:, 0] + b1[:, None] * e1p + b2[:, None] * e2p
                     + h[:, None] * nb)
                J = np.stack([e1p + h[:, None] * e1n,
                              e2p + h[:, None] * e2n, nb], axis=-1)
                det = np.linalg.det(J)
                ok = ok & (np.abs(det) > 1e-18)
                Js = np.where(ok[:, None, None], J, np.eye(3))
                step = np.linalg.solve(Js, (xm - S)[..., None])[..., 0]
                b1 = b1 + np.where(ok, step[:, 0], 0.0)
                b2 = b2 + np.where(ok, step[:, 1], 0.0)
                h = h + np.where(ok, step[:, 2], 0.0)
            # converged only counts: residual must be tiny
            nb = (N[:, 0] + b1[:, None] * e1n + b2[:, None] * e2n)
            S = (P[:, 0] + b1[:, None] * e1p + b2[:, None] * e2p
                 + h[:, None] * nb)
            scale = np.linalg.norm(xb - xa, axis=-1) + 1e-12
            ok = ok & (np.linalg.norm(S - xm, axis=-1) < 1e-6 * scale)
            uvm = (UV[:, 0] + b1[:, None] * (UV[:, 1] - UV[:, 0])
                   + b2[:, None] * (UV[:, 2] - UV[:, 0]))
            qm = np.concatenate(
                [uvm, ((h - h_lo) / h_span)[:, None]], axis=1)
            dev = np.linalg.norm(qm - 0.5 * (qa + qb), axis=-1)
            dev = np.where(ok, dev, 0.0)
            if dev.size:
                dev_max = max(dev_max, float(dev.max()))
    n = int(np.ceil(np.sqrt(dev_max / eps))) if dev_max > 0 else 1
    return int(np.clip(n, 1, max_segments))


@struct.dataclass
class ShellHit:
    t: jnp.ndarray  # [R]
    hit: jnp.ndarray
    position: jnp.ndarray  # [R, 3]
    normal: jnp.ndarray
    uv: jnp.ndarray
    prim: jnp.ndarray  # base-triangle index
    mat: jnp.ndarray  # [R] material slot (multi-material shells)
    steps: jnp.ndarray


def intersect_shell(geom: ShellGeometry, o, d, t_min=1e-4, t_max=1e30,
                    k_candidates: int = 2,
                    n_segments: int | None = None) -> ShellHit:
    """Closest shell-content hit. Candidate prisms stream nearest-first
    until the next prism AABB is farther than the best hit
    (techniques.tfdm.iterate_candidates — no silent top-k cap), then per
    candidate the texture-space curve is traced as linear segments
    against the shell BVH. n_segments=None uses the geometry's
    curvature-adaptive count (_estimate_shell_segments: 1 — exact — for
    straight shells, more for tilted-normal shells, bounded chord
    error)."""
    from gfxexp_tpu.accel.traverse import intersect_closest
    from gfxexp_tpu.techniques.tfdm import iterate_candidates

    if n_segments is None:
        n_segments = geom.auto_segments

    n_rays = o.shape[0]
    corners = jnp.stack([
        geom.p0 + geom.h_lo * geom.n0, geom.p1 + geom.h_lo * geom.n1,
        geom.p2 + geom.h_lo * geom.n2, geom.p0 + geom.h_hi * geom.n0,
        geom.p1 + geom.h_hi * geom.n1, geom.p2 + geom.h_hi * geom.n2,
    ], axis=1)
    lo = jnp.min(corners, axis=1) - 1e-5
    hi = jnp.max(corners, axis=1) + 1e-5

    p = geom.params
    t_min_v = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n_rays,))
    h_span = max(geom.h_hi - geom.h_lo, 1e-9)
    state0 = (
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n_rays,)),
        jnp.full((n_rays,), -1, jnp.int32),       # best_prim
        jnp.zeros((n_rays, 2), jnp.float32),      # best_uv
        jnp.zeros((n_rays, 3), jnp.float32),      # best_nrm
        jnp.full((n_rays,), geom.material, jnp.int32),  # best_mat
        jnp.zeros((n_rays,), jnp.int32),          # steps_total
    )

    def process(state, cid, near, far):
        best_t, best_prim, best_uv, best_nrm, best_mat, steps_total = state
        b = jnp.maximum(cid, 0)
        far = jnp.minimum(far, best_t)
        active = (cid >= 0) & (near < far)

        p_a, p_b, p_c = geom.p0[b], geom.p1[b], geom.p2[b]
        n_a, n_b, n_c = geom.n0[b], geom.n1[b], geom.n2[b]
        uv_a, uv_b, uv_c = geom.uv0[b], geom.uv1[b], geom.uv2[b]
        # the height solve gets an epsilon-widened interval: sample points
        # at the prism AABB entry/exit sit EXACTLY on h_lo/h_hi and float
        # error otherwise flickers their validity (a 1-segment straight-
        # shell trace then loses both endpoints); hn is clamped back to
        # the unit shell afterwards
        h_pad = 1e-3 * h_span
        h_lo_v = jnp.full((n_rays,), geom.h_lo - h_pad)
        h_hi_v = jnp.full((n_rays,), geom.h_hi + h_pad)

        def tex_point(t):
            """World ray point -> (u, v, hn) shell coordinates + validity."""
            x = o + t[:, None] * d
            h, b1, b2, ok = find_height(p_a, p_b, p_c, n_a, n_b, n_c, x,
                                        h_lo_v, h_hi_v)
            w = 1.0 - b1 - b2
            uv = (w[:, None] * uv_a + b1[:, None] * uv_b
                  + b2[:, None] * uv_c)
            uv = _uv_transform(p, uv)
            hn = jnp.clip((h - geom.h_lo) / h_span, 0.0, 1.0)
            inside = (ok & (b1 >= -1e-3) & (b2 >= -1e-3)
                      & (w >= -1e-3))
            return jnp.concatenate([uv, hn[:, None]], axis=-1), inside

        # sample the curve; trace each linear segment against the shell BVH
        ts = [near + (far - near) * (i / n_segments)
              for i in range(n_segments + 1)]
        q_prev, in_prev = tex_point(ts[0])
        found = jnp.zeros((n_rays,), bool)
        seg_t = jnp.zeros((n_rays,), jnp.float32)
        seg_tri = jnp.zeros((n_rays,), jnp.int32)
        seg_u = jnp.zeros((n_rays,), jnp.float32)
        seg_v = jnp.zeros((n_rays,), jnp.float32)
        seg_q = jnp.zeros((n_rays, 3), jnp.float32)
        for i in range(1, n_segments + 1):
            q_cur, in_cur = tex_point(ts[i])
            seg_vec = q_cur - q_prev
            seg_len = jnp.linalg.norm(seg_vec, axis=-1)
            ok = active & ~found & in_prev & in_cur & (seg_len > 1e-9)
            sdir = seg_vec / jnp.maximum(seg_len[:, None], 1e-12)
            tmax_seg = jnp.where(ok, seg_len, -1.0)
            sh = intersect_closest(geom.shell_bvh, geom.shell_tris,
                                   q_prev, sdir, t_min=0.0, t_max=tmax_seg)
            take = ok & sh.hit
            frac = sh.t / jnp.maximum(seg_len, 1e-12)
            t_world = ts[i - 1] + (ts[i] - ts[i - 1]) * frac
            seg_t = jnp.where(take, t_world, seg_t)
            seg_tri = jnp.where(take, sh.tri, seg_tri)
            seg_u = jnp.where(take, sh.u, seg_u)
            seg_v = jnp.where(take, sh.v, seg_v)
            seg_q = jnp.where(take[:, None],
                              q_prev + sh.t[:, None] * sdir, seg_q)
            found = found | take
            q_prev, in_prev = q_cur, in_cur
        steps_total = steps_total + jnp.where(active, n_segments, 0)

        take = found & (seg_t > t_min_v) & (seg_t < best_t)

        # world-space normal: transform the shell triangle's texture-space
        # geometric normal by the inverse-transpose Jacobian of the forward
        # shell map S(u, v, hn), evaluated by finite differences
        tri = jnp.maximum(seg_tri, 0)
        e1s = geom.shell_tris.e1[tri]
        e2s = geom.shell_tris.e2[tri]
        n_tex = jnp.cross(e1s, e2s)
        n_tex = n_tex / jnp.maximum(
            jnp.linalg.norm(n_tex, axis=-1, keepdims=True), 1e-20)

        # forward map at the hit: (u,v,hn) -> world
        duv1 = uv_b - uv_a
        duv2 = uv_c - uv_a
        det_uv = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
        safe = jnp.where(jnp.abs(det_uv) > 1e-12, det_uv, 1.0)

        def world_of(q):
            uvq = q[:, :2]
            # invert the (affine) uv map to barycentrics
            rel = uvq - uv_a
            b1 = (rel[:, 0] * duv2[:, 1] - rel[:, 1] * duv2[:, 0]) / safe
            b2 = (duv1[:, 0] * rel[:, 1] - duv1[:, 1] * rel[:, 0]) / safe
            w = 1.0 - b1 - b2
            base = (w[:, None] * p_a + b1[:, None] * p_b + b2[:, None] * p_c)
            nsh = (w[:, None] * n_a + b1[:, None] * n_b + b2[:, None] * n_c)
            hw = geom.h_lo + q[:, 2] * h_span
            return base + hw[:, None] * nsh

        eps = 1e-3
        s0 = world_of(seg_q)
        ju = (world_of(seg_q + jnp.asarray([eps, 0, 0])) - s0) / eps
        jv = (world_of(seg_q + jnp.asarray([0, eps, 0])) - s0) / eps
        jh = (world_of(seg_q + jnp.asarray([0, 0, eps])) - s0) / eps
        # inverse-transpose action: n_world ~ cross-products of the Jacobian
        # columns weighted by texture-normal components
        nw = (n_tex[:, 0:1] * jnp.cross(jv, jh)
              + n_tex[:, 1:2] * jnp.cross(jh, ju)
              + n_tex[:, 2:3] * jnp.cross(ju, jv))
        nw = nw / jnp.maximum(jnp.linalg.norm(nw, axis=-1, keepdims=True),
                              1e-20)
        nw = nw * jnp.sign(-jnp.sum(nw * d, axis=-1, keepdims=True) + 1e-12)

        best_prim = jnp.where(take, cid, best_prim)
        best_uv = jnp.where(take[:, None], seg_q[:, :2], best_uv)
        best_nrm = jnp.where(take[:, None], nw, best_nrm)
        best_mat = jnp.where(take, geom.shell_mat[tri], best_mat)
        best_t = jnp.where(take, seg_t, best_t)
        return (best_t, best_prim, best_uv, best_nrm, best_mat, steps_total)

    best_t, best_prim, best_uv, best_nrm, best_mat, steps_total = (
        iterate_candidates(lo, hi, o, d, t_min, t_max, k_candidates, state0,
                           process, lambda st: st[0],
                           prism_bvh=getattr(geom, "prism_bvh", None)))

    return ShellHit(
        t=best_t, hit=best_prim >= 0,
        position=o + best_t[:, None] * d,
        normal=best_nrm, uv=best_uv, prim=best_prim, mat=best_mat,
        steps=steps_total,
    )
