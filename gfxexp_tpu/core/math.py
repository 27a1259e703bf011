"""Vector / matrix / sampling math for the renderer.

TPU-first counterpart of the reference's header math library
(reference: common/basic_types.h — Vector3D_T, Matrix4x4_T, Quaternion_T, AABB_T,
RGB_T) and of the device shading utilities
(reference: common/common_device.cuh — ReferenceFrame, offsetRayOrigin,
concentricSampleDisk, cosineSampleHemisphere, encodeNormal).

Everything operates on batched `[..., 3]` (etc.) jnp arrays — SoA-style, no scalar
classes. All functions are jit-safe and shape-polymorphic over leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# ---------------------------------------------------------------------------
# basic vector ops over [..., 3]
# ---------------------------------------------------------------------------


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(v, keepdims=False):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def sq_length(v, keepdims=False):
    return dot(v, v, keepdims=keepdims)


def normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v, keepdims=True), eps))


def reflect(v, n):
    """Reflect direction `v` about normal `n` (both pointing away from surface)."""
    return 2.0 * dot(v, n, keepdims=True) * n - v


def luminance(rgb):
    """Rec.709 luminance (reference: RGB_T::luminance, basic_types.h:5145)."""
    w = jnp.asarray([0.2126729, 0.7151522, 0.0721750], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def safe_divide(a, b, eps=0.0):
    return jnp.where(b != 0.0, a / jnp.where(b == 0.0, 1.0, b), eps)


# ---------------------------------------------------------------------------
# orthonormal frame (reference: ReferenceFrame, common_device.cuh:149)
# ---------------------------------------------------------------------------


def make_frame(n):
    """Branchless orthonormal basis from unit normal (Duff et al. 2017).

    Returns (tangent, bitangent) each [..., 3] such that (t, b, n) is
    right-handed orthonormal.
    """
    nz = n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_local(t, b, n, v):
    """World direction -> frame-local (z = normal)."""
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(t, b, n, v):
    return (
        v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n
    )


# ---------------------------------------------------------------------------
# octahedral normal encoding (reference: encodeNormal, common_device.cuh:51)
# ---------------------------------------------------------------------------


def octahedral_encode(n):
    """Unit vector [...,3] -> octahedral [...,2] in [-1,1]."""
    denom = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    p = n[..., :2] / jnp.maximum(denom, 1e-20)
    flip = (1.0 - jnp.abs(p[..., ::-1])) * jnp.where(p >= 0.0, 1.0, -1.0)
    return jnp.where(n[..., 2:3] < 0.0, flip, p)


def octahedral_decode(e):
    """Octahedral [...,2] -> unit vector [...,3]."""
    z = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    t = jnp.maximum(-z, 0.0)
    xy = e - jnp.where(e >= 0.0, 1.0, -1.0) * t[..., None]
    return normalize(jnp.stack([xy[..., 0], xy[..., 1], z], axis=-1))


# ---------------------------------------------------------------------------
# affine transforms: represented as [..., 3, 4] (rotation|translation)
# (reference: Matrix4x4_T, basic_types.h:4446; Quaternion_T :4922)
# ---------------------------------------------------------------------------


# Small 3x3 geometry contractions must NOT run at DEFAULT matmul precision:
# XLA lowers f32 dots to bf16 at DEFAULT (TPU MXU semantics), which is ~1e-2
# relative error — catastrophic for transforms. These contractions are tiny
# (no MXU win), so force full f32.
_HI = jax.lax.Precision.HIGHEST


def identity_transform():
    return jnp.concatenate([jnp.eye(3, dtype=F32), jnp.zeros((3, 1), F32)], axis=-1)


def make_transform(rotation=None, translation=None, scale=None):
    """Compose scale -> rotation -> translation into a [3,4] affine."""
    r = jnp.eye(3, dtype=F32) if rotation is None else jnp.asarray(rotation, F32)
    if scale is not None:
        s = jnp.asarray(scale, F32)
        s = jnp.broadcast_to(jnp.atleast_1d(s), (3,))
        r = r * s[None, :]
    t = jnp.zeros((3,), F32) if translation is None else jnp.asarray(translation, F32)
    return jnp.concatenate([r, t[:, None]], axis=-1)


def transform_point(m, p):
    """m: [..., 3, 4], p: [..., 3] -> [..., 3]."""
    return jnp.einsum("...ij,...j->...i", m[..., :3], p, precision=_HI) + m[..., 3]


def transform_vector(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3], v, precision=_HI)


def transform_normal(m_inv, n):
    """Transform a normal by the *inverse* transform (uses transpose)."""
    return jnp.einsum("...ji,...j->...i", m_inv[..., :3], n, precision=_HI)


def invert_transform(m):
    """Inverse of a [..., 3, 4] affine (general 3x3 inverse + translation)."""
    r = m[..., :3]
    r_inv = jnp.linalg.inv(r)
    t = -jnp.einsum("...ij,...j->...i", r_inv, m[..., 3], precision=_HI)
    return jnp.concatenate([r_inv, t[..., None]], axis=-1)


def compose_transforms(a, b):
    """Returns transform equivalent to applying b first, then a."""
    r = jnp.einsum("...ij,...jk->...ik", a[..., :3], b[..., :3], precision=_HI)
    t = jnp.einsum("...ij,...j->...i", a[..., :3], b[..., 3], precision=_HI) + a[..., 3]
    return jnp.concatenate([r, t[..., None]], axis=-1)


def quaternion_to_matrix(q):
    """Quaternion [..., 4] (x, y, z, w) -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def axis_angle_quaternion(axis, angle):
    axis = normalize(jnp.asarray(axis, F32))
    half = jnp.asarray(angle, F32) * 0.5
    s = jnp.sin(half)
    return jnp.concatenate([axis * s[..., None], jnp.cos(half)[..., None]], axis=-1)


def slerp(q0, q1, t):
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0.0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def look_at(position, target, up):
    """Camera orientation matrix [3,3] whose columns are (right, up, -forward…)

    Matches the reference convention: camera looks down -z in view space with
    x right, y up (reference apps build `camera.orientation` this way via
    qRotateY etc.; we construct directly from look-at).
    Returns camera-to-world rotation [3, 3].
    """
    position = jnp.asarray(position, F32)
    target = jnp.asarray(target, F32)
    up = jnp.asarray(up, F32)
    fwd = normalize(target - position)
    right = normalize(jnp.cross(fwd, up))
    true_up = jnp.cross(right, fwd)
    # columns: x -> right, y -> up, z -> -forward (view dir = -z)
    return jnp.stack([right, true_up, -fwd], axis=-1)


# ---------------------------------------------------------------------------
# AABB helpers (reference: AABB_T, basic_types.h:3358)
# ---------------------------------------------------------------------------


def aabb_union(mins_a, maxs_a, mins_b, maxs_b):
    return jnp.minimum(mins_a, mins_b), jnp.maximum(maxs_a, maxs_b)


def aabb_surface_area(mins, maxs):
    d = jnp.maximum(maxs - mins, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def ray_aabb_intersect(o, inv_d, t_min, t_max, box_min, box_max):
    """Slab test. o/inv_d: [..., 3]; box_min/max broadcastable to [..., 3].

    Returns (hit [...], t_near [...]) — t_near clamped to t_min.
    """
    t0 = (box_min - o) * inv_d
    t1 = (box_max - o) * inv_d
    t_lo = jnp.minimum(t0, t1)
    t_hi = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(t_lo, axis=-1), t_min)
    far = jnp.minimum(jnp.min(t_hi, axis=-1), t_max)
    return near <= far, near


# ---------------------------------------------------------------------------
# ray origin offsetting (reference: offsetRayOrigin, common_device.cuh:112 —
# the RT Gems integer-ulp method; we use the same structure in float math)
# ---------------------------------------------------------------------------

_RAY_ORG_INT_SCALE = 256.0
_RAY_ORG_FLOAT_SCALE = 1.0 / 65536.0
_RAY_ORG_ORIGIN = 1.0 / 32.0


def offset_ray_origin(p, n):
    """Offset point `p` along geometric normal `n` robustly vs self-intersection."""
    int_off = n * _RAY_ORG_INT_SCALE
    pi = jax.lax.bitcast_convert_type(p, jnp.int32)
    pi_off = pi + jnp.where(p < 0.0, -int_off, int_off).astype(jnp.int32)
    p_int = jax.lax.bitcast_convert_type(pi_off, jnp.float32)
    p_float = p + _RAY_ORG_FLOAT_SCALE * n
    return jnp.where(jnp.abs(p) < _RAY_ORG_ORIGIN, p_float, p_int)


# ---------------------------------------------------------------------------
# sampling (reference: concentricSampleDisk common_device.cuh:285,
# cosineSampleHemisphere :320) and MIS heuristics
# (reference: pow2Heuristic, optix_pathtracing_kernels.cu:50-67)
# ---------------------------------------------------------------------------


def concentric_sample_disk(u0, u1):
    r0 = 2.0 * u0 - 1.0
    r1 = 2.0 * u1 - 1.0
    use_r0 = jnp.abs(r0) > jnp.abs(r1)
    r = jnp.where(use_r0, r0, r1)
    safe = jnp.where(r == 0.0, 1.0, r)
    theta = jnp.where(
        use_r0,
        (jnp.pi / 4.0) * (r1 / safe),
        (jnp.pi / 2.0) - (jnp.pi / 4.0) * (r0 / safe),
    )
    theta = jnp.where(r == 0.0, 0.0, theta)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_sample_hemisphere(u0, u1):
    """Returns local direction [..., 3] with z >= 0, pdf = z / pi."""
    x, y = concentric_sample_disk(u0, u1)
    z = jnp.sqrt(jnp.maximum(1.0 - x * x - y * y, 0.0))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_sphere(u0, u1):
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u1
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def power_heuristic(pdf_a, pdf_b):
    """Power heuristic (beta=2) MIS weight for strategy a."""
    a2 = pdf_a * pdf_a
    b2 = pdf_b * pdf_b
    return safe_divide(a2, a2 + b2)


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------


def srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, jnp.power((c + 0.055) / 1.055, 2.4))


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def simple_tonemap(c):
    """Reinhard-ish tonemap used for SDR output (reference blits with a simple
    scale + sRGB OETF in shaders/drawOptiXResult.frag)."""
    return c / (1.0 + luminance(c))[..., None]


# ---------------------------------------------------------------------------
# misc host helpers
# ---------------------------------------------------------------------------


def np_normalize(v):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-20)
