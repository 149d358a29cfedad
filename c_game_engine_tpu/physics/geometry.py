"""Branchless collision geometry primitives (single env; vmapped upstream).

Replaces the used subset of Jolt's narrowphase (GJK/EPA over box/capsule/
convex-hull/trimesh, SURVEY.md §2.9) with closed-form tests specialized to
the shapes the game actually uses: capsules (player, npc), boxes (props,
doors, sensors), triangles (static world). All functions broadcast over
leading axes and are differentiable-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from c_game_engine_tpu.utils.mathx import quat_conj, quat_rotate


def closest_point_on_triangle(p, a, b, c):
    """Closest point on triangle (a,b,c) to point p. Shapes: [..., 3]."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_abc = jnp.maximum(va + vb + vc, 1e-30)
    v_face = vb / denom_abc
    w_face = vc / denom_abc
    face = a + ab * v_face[..., None] + ac * w_face[..., None]

    # edge AB
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    on_ab = a + ab * t_ab[..., None]
    # edge AC
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    on_ac = a + ac * t_ac[..., None]
    # edge BC
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)
    on_bc = b + (c - b) * t_bc[..., None]

    out = face
    # region tests, applied in reverse priority so earlier (vertex) regions win
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], on_ab, out)
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], on_ac, out)
    out = jnp.where(((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[..., None], on_bc, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, out)
    return out


def closest_point_on_segment(p, s0, s1):
    d = s1 - s0
    t = jnp.sum((p - s0) * d, -1) / jnp.maximum(jnp.sum(d * d, -1), 1e-30)
    t = jnp.clip(t, 0.0, 1.0)
    return s0 + d * t[..., None]


def capsule_triangle_closest(s0, s1, a, b, c, iters: int = 2):
    """Approximate closest points between segment [s0,s1] and triangle
    (a,b,c) by alternating projections. Returns (point_on_segment,
    point_on_triangle). Converges exactly for the face case and is within
    epsilon for edge cases at iters>=3."""
    q = closest_point_on_triangle((s0 + s1) * 0.5, a, b, c)
    for _ in range(iters):
        p = closest_point_on_segment(q, s0, s1)
        q = closest_point_on_triangle(p, a, b, c)
    return p, q


def point_in_obb(p, center, quat, halfext):
    lp = quat_rotate(quat_conj(quat), p - center)
    return jnp.all(jnp.abs(lp) <= halfext, axis=-1)


def closest_point_on_obb(p, center, quat, halfext):
    lp = quat_rotate(quat_conj(quat), p - center)
    clamped = jnp.clip(lp, -halfext, halfext)
    return quat_rotate(quat, clamped) + center


def sphere_obb_penetration(p, radius, center, quat, halfext):
    """Penetration of a sphere into an OBB. Returns (depth, normal) where
    normal pushes the sphere out of the box; depth <= 0 means no contact.
    Handles the center-inside case by pushing along the smallest local axis."""
    lp = quat_rotate(quat_conj(quat), p - center)
    clamped = jnp.clip(lp, -halfext, halfext)
    delta = lp - clamped
    dist = jnp.linalg.norm(delta, axis=-1)
    outside = dist > 1e-9
    n_out = delta / jnp.maximum(dist, 1e-9)[..., None]
    # inside: push along axis with least distance to a face
    face_dist = halfext - jnp.abs(lp)
    axis = jnp.argmin(face_dist, axis=-1)
    sign = jnp.sign(jnp.take_along_axis(lp, axis[..., None], -1))[..., 0]
    sign = jnp.where(sign == 0, 1.0, sign)
    n_in = jnp.zeros_like(lp)
    onehot = jax_one_hot(axis, 3)
    n_in = onehot * sign[..., None]
    depth_out = radius - dist
    depth_in = radius + jnp.take_along_axis(face_dist, axis[..., None], -1)[..., 0]
    depth = jnp.where(outside, depth_out, depth_in)
    n_local = jnp.where(outside[..., None], n_out, n_in)
    normal = quat_rotate(quat, n_local)
    return depth, normal


def jax_one_hot(idx, n):
    return (idx[..., None] == jnp.arange(n)).astype(jnp.float32)


def ray_triangle(origin, direction, a, b, c, max_t):
    """Möller–Trumbore. Returns (hit bool, t). Two-sided (Jolt mesh raycasts
    hit back faces by default for the game's usage)."""
    e1 = b - a
    e2 = c - a
    h = jnp.cross(direction, e2)
    det = jnp.sum(e1 * h, -1)
    valid = jnp.abs(det) > 1e-9
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    s = origin - a
    u = jnp.sum(s * h, -1) * inv_det
    q = jnp.cross(s, e1)
    v = jnp.sum(direction * q, -1) * inv_det
    t = jnp.sum(e2 * q, -1) * inv_det
    hit = valid & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-5) & (t <= max_t)
    return hit, jnp.where(hit, t, jnp.inf)


def ray_obb(origin, direction, center, quat, halfext, max_t):
    """Slab test in the box frame. Returns (hit, t)."""
    lo = quat_rotate(quat_conj(quat), origin - center)
    ld = quat_rotate(quat_conj(quat), direction)
    safe_ld = jnp.where(jnp.abs(ld) < 1e-9, 1e-9, ld)
    t1 = (-halfext - lo) / safe_ld
    t2 = (halfext - lo) / safe_ld
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin <= max_t)
    t = jnp.where(tmin > 0, tmin, 0.0)
    return hit & (t <= max_t), jnp.where(hit, t, jnp.inf)


def obb_corners(center, quat, halfext):
    """8 corners of an OBB: [..., 8, 3]."""
    signs = jnp.array(
        [
            [-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1],
        ],
        jnp.float32,
    )
    local = signs * halfext[..., None, :]
    return quat_rotate(quat[..., None, :], local) + center[..., None, :]
