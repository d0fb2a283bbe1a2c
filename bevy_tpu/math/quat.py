"""Batched quaternion ops (reference twin: glam Quat via bevy_math).

Layout: `(..., 4)` arrays as `[x, y, z, w]` (glam convention). All ops are
vectorized over leading batch dims — a column of N entity rotations is a
`(N, 4)` array and every op here is one fused VPU pass over it.
"""

import jax.numpy as jnp

from bevy_tpu.math import ops


def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 3].set(1.0)


def quat_normalize(q):
    return ops.safe_normalize(q)


def quat_conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_mul(a, b):
    """Hamilton product a*b (apply b's rotation, then a's)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_from_axis_angle(axis, angle):
    """axis: (..., 3) unit vectors; angle: (...) radians."""
    angle = jnp.asarray(angle, jnp.float32)
    s, c = ops.sin_cos(angle * 0.5)
    return jnp.concatenate([axis * s[..., None], c[..., None]], axis=-1)


def quat_from_rotation_z(angle):
    angle = jnp.asarray(angle, jnp.float32)
    s, c = ops.sin_cos(angle * 0.5)
    zeros = jnp.zeros_like(s)
    return jnp.stack([zeros, zeros, s, c], axis=-1)


def quat_from_euler(yaw, pitch, roll):
    """YXZ order (ref: glam EulerRot::YXZ used by bevy cameras)."""
    yaw = jnp.asarray(yaw, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)
    sy, cy = ops.sin_cos(yaw * 0.5)
    sp, cp = ops.sin_cos(pitch * 0.5)
    sr, cr = ops.sin_cos(roll * 0.5)
    # q = Ry(yaw) * Rx(pitch) * Rz(roll)
    return jnp.stack(
        [
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * cp * cr + sy * sp * sr,
        ],
        axis=-1,
    )


def quat_rotate_vec3(q, v):
    """Rotate (..., 3) vectors by (..., 4) quaternions."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat3(q):
    """(..., 4) -> (..., 3, 3) rotation matrices (column-convention R @ v)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    m = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_mat3(m):
    """(..., 3, 3) -> (..., 4). Shepperd's method, branch-free via where."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def cand(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    # Four candidate quaternions, each numerically stable in one regime.
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    q0 = cand((m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    q1 = cand(0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    q2 = cand((m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    q3 = cand((m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3)

    use0 = tr > 0.0
    use1 = (~use0) & (m00 > m11) & (m00 > m22)
    use2 = (~use0) & (~use1) & (m11 > m22)
    q = jnp.where(use0[..., None], q0,
                  jnp.where(use1[..., None], q1,
                            jnp.where(use2[..., None], q2, q3)))
    return quat_normalize(q)


def quat_dot(a, b):
    return jnp.sum(a * b, axis=-1)


def quat_nlerp(a, b, t):
    """Normalized lerp with hemisphere correction — the fast path the
    reference's animation blending uses for small angles."""
    d = quat_dot(a, b)
    b = jnp.where(d[..., None] < 0.0, -b, b)
    return quat_normalize(a + (b - a) * jnp.asarray(t, a.dtype))


def quat_slerp(a, b, t):
    """Spherical lerp, falling back to nlerp when nearly parallel
    (ref: glam slerp DOT_THRESHOLD)."""
    t = jnp.asarray(t, jnp.float32)
    d = quat_dot(a, b)
    b = jnp.where(d[..., None] < 0.0, -b, b)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    near = d > 0.9995
    # slerp weights; guard sin_theta=0 with near-branch select
    safe_sin = jnp.where(near, 1.0, sin_theta)
    wa = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / safe_sin)
    wb = jnp.where(near, t, jnp.sin(t * theta) / safe_sin)
    out = a * wa[..., None] + b * wb[..., None]
    return quat_normalize(out)
