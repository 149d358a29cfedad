"""Vector/quaternion/matrix math used by both the host compiler (numpy) and
the jitted runtime (jax.numpy).

Every function takes an `xp` module-agnostic approach: it only uses ops that
exist identically in numpy and jax.numpy, so callers can pass either array
type. Quaternions are stored (x, y, z, w) like Jolt's JPH_Quat; matrices are
row-major 4x4 applied as `m @ column_vector`.

Replaces the reference's cglm + joltc math layer (SURVEY.md §2.9); the
camera/projection math mirrors engine/src/graphics/vulkan/VulkanHelpers.c:140-171.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# scalar helpers (reference: engine/include/engine/helpers/MathEx.h:10-88)
# ---------------------------------------------------------------------------


def clamp(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def lerp(a, b, t):
    return a + (b - a) * t


def remap(x, in_lo, in_hi, out_lo, out_hi):
    return out_lo + (x - in_lo) * (out_hi - out_lo) / (in_hi - in_lo)


# ---------------------------------------------------------------------------
# vec3
# ---------------------------------------------------------------------------


def normalize(v, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def safe_normalize(v, axis=-1, eps=1e-12):
    """Returns zero vector for (near-)zero input instead of NaN."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return jnp.where(n > eps, v / jnp.maximum(n, eps), jnp.zeros_like(v))


def cross(a, b):
    return jnp.cross(a, b)


def dot(a, b, axis=-1):
    return jnp.sum(a * b, axis=axis)


# ---------------------------------------------------------------------------
# quaternion (x, y, z, w)
# ---------------------------------------------------------------------------

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_from_axis_angle(axis, angle):
    """Unit quaternion for rotation of `angle` radians about unit `axis`.
    Broadcasts: axis [..., 3], angle [...]."""
    axis = jnp.asarray(axis, dtype=jnp.float32)
    angle = jnp.asarray(angle, dtype=jnp.float32)[..., None]
    xyz = axis * jnp.sin(angle * 0.5)
    w = jnp.broadcast_to(jnp.cos(angle * 0.5), xyz.shape[:-1] + (1,))
    return jnp.concatenate([xyz, w], axis=-1)


def quat_mul(a, b):
    """Hamilton product a*b (apply b's rotation first, then a's)."""
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


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q, v):
    """Rotate vec3 v by unit quaternion q (v' = q v q*)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_from_euler(euler):
    """ZYX-composed euler (x=pitch, y=yaw, z=roll) to quaternion, matching
    Jolt's Quat::sEulerAngles (applied as rotate-X then Y then Z about world
    axes, i.e. q = qz * qy * qx). Used by joltc's JPH_Quat_FromEulerAngles
    (reference call site: engine/src/structs/ActorWall.c:56-71)."""
    ex, ey, ez = euler[..., 0] * 0.5, euler[..., 1] * 0.5, euler[..., 2] * 0.5
    cx, sx = jnp.cos(ex), jnp.sin(ex)
    cy, sy = jnp.cos(ey), jnp.sin(ey)
    cz, sz = jnp.cos(ez), jnp.sin(ez)
    return jnp.stack(
        [
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
            cx * cy * cz + sx * sy * sz,
        ],
        axis=-1,
    )


def quat_lerp(a, b, t):
    """Component-wise lerp (JPH_Quat_Lerp semantics; caller normalizes)."""
    return a + (b - a) * t


def quat_twist_angle(q, axis):
    """Signed rotation angle of q about unit `axis` (swing-twist
    decomposition), matching JPH_Quat's GetRotationAngle(axis): the twist
    component's angle. Used for yaw extraction (PlayerPhysics.c:266-270)."""
    proj = dot(q[..., :3], axis)
    w = q[..., 3]
    return 2.0 * jnp.arctan2(proj, w)


def quat_from_yaw_pitch(yaw, pitch):
    """Camera/player orientation as yaw-about-Y then pitch-about-X
    (q = q_yaw * q_pitch), the composition UpdatePlayerCamera maintains
    (PlayerPhysics.c:503-517). pitch here is radians, 0 = level, +down per
    the reference's clamp convention [0, pi] offset by pi/2 (we keep
    pitch in [-pi/2, pi/2], 0 = level)."""
    hy = yaw * 0.5
    hp = pitch * 0.5
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cp, sp = jnp.cos(hp), jnp.sin(hp)
    # q_yaw = (0, sy, 0, cy); q_pitch = (sp, 0, 0, cp); q = q_yaw * q_pitch
    return jnp.stack([cy * sp, sy * cp, -sy * sp, cy * cp], axis=-1)


# ---------------------------------------------------------------------------
# matrices (camera path; reference VulkanHelpers.c:140-171)
# ---------------------------------------------------------------------------


def perspective_lh_zo(fov_y_rad, aspect, near, far):
    """Left-handed, zero-to-one depth perspective matrix, same convention as
    cglm's glm_perspective_lh_zo (VulkanHelpers.c:142-147: fov, w/h,
    NEAR_Z=0.01, FAR_Z=2000)."""
    f = 1.0 / jnp.tan(fov_y_rad * 0.5)
    m = jnp.zeros((4, 4), dtype=jnp.float32)
    m = m.at[0, 0].set(f / aspect)
    m = m.at[1, 1].set(f)
    m = m.at[2, 2].set(far / (far - near))
    m = m.at[2, 3].set(-(far * near) / (far - near))
    m = m.at[3, 2].set(1.0)
    return m


def quat_look(position, q):
    """View matrix for a camera at `position` with orientation quaternion
    `q`, same convention as cglm's glm_quat_look (rotation inverse then
    translate). The reference pre-multiplies the camera quat by a pi
    rotation about X (VulkanHelpers.c:150-153) before calling this."""
    rot = quat_to_mat3(quat_conj(quat_normalize(q)))
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    # elementwise mul+sum, NOT `rot @ position`: TPU matmuls default to
    # bf16 inputs, which corrupts the view translation (PARITY.md #19)
    m = m.at[:3, 3].set(-(rot * position[None, :]).sum(-1))
    return m


def quat_to_mat3(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
