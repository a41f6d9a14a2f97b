"""Differentiable SE(3)/SO(3) operations on quaternion 7-vectors.

TPU-native replacement for the reference's CUDA Lie libraries (lietorch,
pypose) used at models/star__.py:187-199 and train_online__.py:66-135 in the
reference. Everything here is pure jax.numpy: it fuses into the render graph
under jit and differentiates with jax.grad, so photometric loss gradients flow
through the pose warp into per-frame pose parameters.

Conventions (matching pypose, so checkpoints/poses interop numerically):
  pose7    = [tx, ty, tz, qx, qy, qz, qw]   (translation, then xyzw quaternion)
  tangent6 = [rho_x, rho_y, rho_z, phi_x, phi_y, phi_z]  (translation part
             first, then so(3) rotation vector)

All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

# Below this squared-angle threshold, use Taylor expansions (f32-safe).
_SMALL = 1e-8


def _safe_norm(v, axis=-1, keepdims=False):
    """sqrt(sum(v^2)) with a gradient-safe zero (d/dv at 0 is 0, not NaN)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    safe = jnp.where(sq < _SMALL, 1.0, sq)
    return jnp.where(sq < _SMALL, jnp.sqrt(sq + 1e-30), jnp.sqrt(safe))


# --------------------------------------------------------------------------
# Quaternions (xyzw)
# --------------------------------------------------------------------------


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def quat_conjugate(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_multiply(a, b):
    """Hamilton product a*b for xyzw quaternions."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v by unit quaternions q (broadcasting)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # v + 2*qw*(qv x v) + 2*(qv x (qv x v))
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q):
    """Unit quaternion (xyzw) -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
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
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """3x3 rotation matrix -> unit quaternion (xyzw), branchless.

    Computes all four Shepperd candidates and selects the best-conditioned
    one; safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate 4*|component|^2 values
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def s(t):
        return jnp.sqrt(jnp.maximum(t, 1e-12)) * 2.0

    sw, sx, sy, sz = s(tw), s(tx), s(ty), s(tz)
    qw = jnp.stack([(m21 - m12) / sx, (m02 - m20) / sy, (m10 - m01) / sz, sw / 4.0], -1)
    qx = jnp.stack([sx / 4.0, (m01 + m10) / sy, (m02 + m20) / sz, (m21 - m12) / sw], -1)
    qy = jnp.stack([(m01 + m10) / sx, sy / 4.0, (m12 + m21) / sz, (m02 - m20) / sw], -1)
    qz = jnp.stack([(m02 + m20) / sx, (m12 + m21) / sy, sz / 4.0, (m10 - m01) / sw], -1)

    cand = jnp.stack(
        [
            jnp.stack([qx[..., 0], qy[..., 0], qz[..., 0], qw[..., 0]], -1),
            jnp.stack([qx[..., 1], qy[..., 1], qz[..., 1], qw[..., 1]], -1),
            jnp.stack([qx[..., 2], qy[..., 2], qz[..., 2], qw[..., 2]], -1),
            jnp.stack([qx[..., 3], qy[..., 3], qz[..., 3], qw[..., 3]], -1),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]
    scores = jnp.stack([tx, ty, tz, tw], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    # canonical sign: qw >= 0
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return quat_normalize(q)


def so3_exp(phi):
    """so(3) rotation vector -> unit quaternion (xyzw)."""
    angle = _safe_norm(phi, keepdims=True)
    half = 0.5 * angle
    sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    # sin(a/2)/a with Taylor fallback: 1/2 - a^2/48
    small = sq < _SMALL
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    return jnp.concatenate([phi * k, w], axis=-1)


def so3_log(q):
    """Unit quaternion (xyzw) -> so(3) rotation vector."""
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)  # shortest arc
    qv = q[..., :3]
    qw = q[..., 3:4].clip(-1.0, 1.0)
    sin_half = _safe_norm(qv, keepdims=True)
    half = jnp.arctan2(sin_half, qw)
    sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = sq < _SMALL
    # 2*half/sin_half; for small angles sin_half ~ half so k -> 2/qw ~ 2 + |qv|^2
    k = jnp.where(small, 2.0 / qw.clip(1e-6), 2.0 * half / jnp.where(small, 1.0, sin_half))
    return qv * k


def so3_act(q, v):
    """Rotate v by quaternion q (alias matching pypose SO3.Act)."""
    return quat_rotate(q, v)


# --------------------------------------------------------------------------
# SE(3) on 7-vectors
# --------------------------------------------------------------------------


def se3_identity(*batch_shape, dtype=jnp.float32):
    pose = jnp.zeros(batch_shape + (7,), dtype=dtype)
    return pose.at[..., 6].set(1.0)


def se3_act(pose7, pts):
    """Apply SE(3) to points: R(q) @ p + t.

    pose7: [..., 7], pts: [..., 3] (broadcast leading dims)."""
    assert pose7.shape[-1] == 7, f"pose7 last dim must be 7, got {pose7.shape}"
    assert pts.shape[-1] == 3, f"pts last dim must be 3, got {pts.shape}"
    return quat_rotate(pose7[..., 3:7], pts) + pose7[..., :3]


def se3_inverse(pose7):
    qinv = quat_conjugate(pose7[..., 3:7])
    t = -quat_rotate(qinv, pose7[..., :3])
    return jnp.concatenate([t, qinv], axis=-1)


def se3_multiply(a, b):
    """Composition a∘b: (a*b).act(p) == a.act(b.act(p))."""
    q = quat_multiply(a[..., 3:7], b[..., 3:7])
    t = quat_rotate(a[..., 3:7], b[..., :3]) + a[..., :3]
    return jnp.concatenate([t, quat_normalize(q)], axis=-1)


def _so3_left_jacobian(phi):
    """V(phi) such that t = V @ rho in se(3) exp."""
    sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.where(sq < _SMALL, 1.0, sq))
    small = sq < _SMALL

    px, py, pz = phi[..., 0], phi[..., 1], phi[..., 2]
    zeros = jnp.zeros_like(px)
    K = jnp.stack(
        [zeros, -pz, py, pz, zeros, -px, -py, px, zeros], axis=-1
    ).reshape(phi.shape[:-1] + (3, 3))
    K2 = K @ K
    eye = jnp.eye(3, dtype=phi.dtype)

    a = jnp.where(small, 0.5 - sq / 24.0, (1.0 - jnp.cos(angle)) / jnp.where(small, 1.0, sq))
    b = jnp.where(
        small, 1.0 / 6.0 - sq / 120.0, (angle - jnp.sin(angle)) / jnp.where(small, 1.0, sq * angle)
    )
    return eye + a * K + b * K2


def se3_exp(tangent6):
    """se(3) tangent [rho, phi] -> pose 7-vec [t, q]."""
    rho = tangent6[..., :3]
    phi = tangent6[..., 3:6]
    q = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(pose7):
    """pose 7-vec -> se(3) tangent [rho, phi]."""
    phi = so3_log(pose7[..., 3:7])
    V = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(V, pose7[..., :3][..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_to_matrix(pose7):
    R = quat_to_matrix(pose7[..., 3:7])
    t = pose7[..., :3]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose7.dtype), pose7.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_se3(T):
    """4x4 (or 3x4) homogeneous transform -> pose 7-vec.

    Equivalent of the reference's pp.mat2SE3 (utils/dataset.py:91)."""
    q = matrix_to_quat(T[..., :3, :3])
    t = T[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def rotation_metric(R1, R2):
    """Deviation-from-identity rotation distance ||I - R1 R2^T||_F.

    Mirrors the reference utils/dataset.py:138-142."""
    eye = jnp.eye(3, dtype=R1.dtype)
    d = eye - R1 @ jnp.swapaxes(R2, -1, -2)
    return jnp.sqrt(jnp.sum(d * d, axis=(-2, -1)))
