"""Batched rigid-body dynamics: integration, contact generation, impulse
solve.

Replaces the used subset of Jolt's PhysicsSystem::Update (sequential-impulse
islands solver, 2 collision substeps, MapPhysics.c:105-108) with a
fixed-shape projected-Jacobi impulse solver over dense masked contact lanes:

  - dynamic boxes vs static world triangles (support-point contacts, top-K
    manifold per body)
  - dynamic boxes vs solid actor OBBs and each other (support-sphere approx)
  - dynamic boxes vs the player capsule (the character pushes bodies; bodies
    with CAN_PUSH_PLAYER push the character inside character.py instead)

Friction: Coulomb clamp; map static friction 4.25 (MapLoader.c:263), body
default 0.2, combined as sqrt(f1*f2) (Jolt's default combine mode).
Restitution defaults to 0. Gravity (0,-9.81,0) (Physics.h:34).

Approximations vs Jolt, for later rounds: box-box uses support-sphere
contacts instead of SAT manifolds; no sleeping; Jacobi (with 0.7
under-relaxation) instead of Gauss-Seidel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import Layer, Motion, Shape
from c_game_engine_tpu.physics.character import (
    CAPSULE_HALF_HEIGHT,
    CAPSULE_RADIUS,
    CHARACTER_MASS,
)
from c_game_engine_tpu.physics.geometry import (
    closest_point_on_segment,
    closest_point_on_triangle,
)
from c_game_engine_tpu.utils.mathx import (
    quat_mul,
    quat_normalize,
    quat_to_mat3,
    safe_normalize,
)

GRAVITY = jnp.array([0.0, -9.81, 0.0])
MAP_FRICTION = 4.25  # MapLoader.c:263
SOLVER_ITERS = 8
BAUMGARTE = 0.2
PENETRATION_SLOP = 0.005
RELAX = 0.7  # Jacobi under-relaxation
MANIFOLD_K = 4  # triangle contacts kept per body per substep


def _support_radius(quat, halfext, n):
    """Box support extent along unit direction n: sum_i |halfext_i (R_i.n)|.
    Broadcasts over leading axes."""
    rot = quat_to_mat3(quat)  # columns = local axes in world space
    ax = jnp.abs(jnp.einsum("...ij,...i->...j", rot, n))
    return jnp.sum(ax * halfext, axis=-1)


def _apply_inv_inertia(rot, inv_I, torque):
    """world I^-1 @ torque = R diag(inv_I) R^T torque.
    rot: [N,3,3]; inv_I: [N,3]; torque: [N,K,3]."""
    local = jnp.einsum("nji,nkj->nki", rot, torque)
    local = local * inv_I[:, None, :]
    return jnp.einsum("nij,nkj->nki", rot, local)


def step_bodies(cmap, actors, player_pos, player_vel, dt, n_substeps: int = 2):
    """Advance actor bodies by dt with n_substeps collision substeps.
    Returns (pos, quat, vel, omega)."""
    pos, quat, vel, omega = actors.pos, actors.quat, actors.vel, actors.omega
    n = cmap.num_actors
    dynamic = actors.active & (cmap.motion == int(Motion.DYNAMIC))
    kinematic = actors.active & (cmap.motion == int(Motion.KINEMATIC))
    moving = dynamic | kinematic
    solid = (
        actors.active
        & (cmap.shape != int(Shape.EMPTY))
        & (cmap.motion != int(Motion.NONE))
        & (cmap.layer != int(Layer.SENSOR))
    )

    h = dt / n_substeps
    inv_m = cmap.inv_mass
    inv_I = cmap.inv_inertia

    def substep(carry, _):
        pos, quat, vel, omega = carry
        vel = jnp.where(dynamic[:, None], vel + GRAVITY * h, vel)
        pos = jnp.where(moving[:, None], pos + vel * h, pos)
        dq = 0.5 * h * quat_mul(jnp.concatenate([omega, jnp.zeros((n, 1))], -1), quat)
        quat = jnp.where(dynamic[:, None], quat_normalize(quat + dq), quat)
        out = _substep_contacts(
            cmap, pos, quat, vel, omega, dynamic, solid, inv_m, inv_I,
            player_pos, player_vel,
        )
        return out, None

    (pos, quat, vel, omega), _ = jax.lax.scan(
        substep, (pos, quat, vel, omega), None, length=n_substeps
    )
    return pos, quat, vel, omega


def _substep_contacts(cmap, pos, quat, vel, omega, dynamic, solid, inv_m, inv_I, player_pos, player_vel):
    from c_game_engine_tpu.utils.mathx import quat_rotate

    n = pos.shape[0]
    rot = quat_to_mat3(quat)
    # collision-box center (= COM for our box approximation); hull shapes are
    # not centered on the body origin (convex hull points keep their offsets)
    ctr = pos + quat_rotate(quat, cmap.shape_center)

    # ------------------------------------------------------ vs static tris
    a, b, c = cmap.tris[:, 0], cmap.tris[:, 1], cmap.tris[:, 2]
    q_tri = closest_point_on_triangle(
        ctr[:, None, :], a[None, :, :], b[None, :, :], c[None, :, :]
    )  # [N, T, 3]
    delta = ctr[:, None, :] - q_tri
    dist = jnp.linalg.norm(delta, axis=-1)
    nrm = safe_normalize(delta)
    r_sup = _support_radius(quat[:, None, :], cmap.halfext[:, None, :], nrm)
    depth = jnp.where(dynamic[:, None] & cmap.tri_valid[None, :], r_sup - dist, -jnp.inf)

    top_depth, top_idx = jax.lax.top_k(depth, MANIFOLD_K)  # [N, K]
    c_n = jnp.take_along_axis(nrm, top_idx[..., None], axis=1)
    c_p = jnp.take_along_axis(q_tri, top_idx[..., None], axis=1)
    c_d = top_depth
    active = c_d > 0.0
    mu = jnp.sqrt(cmap.friction * MAP_FRICTION)  # per body vs map

    def solver_iter(_, vo):
        vel, omega = vo
        r = c_p - ctr[:, None, :]
        v_pt = vel[:, None, :] + jnp.cross(omega[:, None, :], r)
        vn = jnp.sum(v_pt * c_n, -1)
        rxn = jnp.cross(r, c_n)
        ang = _apply_inv_inertia(rot, inv_I, rxn)
        k_n = inv_m[:, None] + jnp.sum(jnp.cross(ang, r) * c_n, -1)
        jn = jnp.where(active & (vn < 0), -vn / jnp.maximum(k_n, 1e-9), 0.0) * RELAX
        imp = c_n * jn[..., None]
        vel = vel + jnp.sum(imp, 1) * inv_m[:, None]
        omega = omega + jnp.sum(_apply_inv_inertia(rot, inv_I, jnp.cross(r, imp)), 1)

        # Coulomb friction against the accumulated normal impulse this round
        v_pt = vel[:, None, :] + jnp.cross(omega[:, None, :], r)
        vt = v_pt - c_n * jnp.sum(v_pt * c_n, -1, keepdims=True)
        vt_mag = jnp.linalg.norm(vt, axis=-1)
        t_dir = safe_normalize(vt)
        k_t = inv_m[:, None] + jnp.sum(
            jnp.cross(_apply_inv_inertia(rot, inv_I, jnp.cross(r, t_dir)), r) * t_dir, -1
        )
        jt_needed = vt_mag / jnp.maximum(k_t, 1e-9)
        jt = jnp.where(active, jnp.minimum(jt_needed, mu[:, None] * jnp.maximum(jn, 0.0)), 0.0)
        f_imp = -t_dir * (jt * RELAX)[..., None]
        vel = vel + jnp.sum(f_imp, 1) * inv_m[:, None]
        omega = omega + jnp.sum(_apply_inv_inertia(rot, inv_I, jnp.cross(r, f_imp)), 1)
        return vel, omega

    vel, omega = jax.lax.fori_loop(0, SOLVER_ITERS, solver_iter, (vel, omega))

    # positional correction
    corr = jnp.sum(
        jnp.where(
            (c_d > PENETRATION_SLOP)[..., None],
            c_n * (BAUMGARTE * (c_d - PENETRATION_SLOP))[..., None],
            0.0,
        ),
        axis=1,
    )
    pos = jnp.where(dynamic[:, None], pos + corr, pos)

    # --------------------------------------------------------- vs bodies
    dvec = ctr[:, None, :] - ctr[None, :, :]
    pdist = jnp.linalg.norm(dvec, axis=-1)
    pn = safe_normalize(dvec)  # [N, N, 3] pushes i away from j
    r_i = _support_radius(quat[:, None, :], cmap.halfext[:, None, :], pn)
    r_j = _support_radius(quat[None, :, :], cmap.halfext[None, :, :], -pn)
    pair_ok = (
        dynamic[:, None] & solid[None, :]
        & (jnp.arange(n)[:, None] != jnp.arange(n)[None, :])
    )
    # support-sphere overestimates corner clearance; scale toward inscribed
    pdepth = jnp.where(pair_ok, 0.8 * (r_i + r_j) - pdist, -jnp.inf)
    pactive = pdepth > 0.0
    inv_m_j = jnp.where(dynamic, inv_m, 0.0)

    def pair_iter(_, vel):
        rel_vn = jnp.sum((vel[:, None, :] - vel[None, :, :]) * pn, -1)
        k = inv_m[:, None] + inv_m_j[None, :]
        jn = jnp.where(pactive & (rel_vn < 0), -rel_vn / jnp.maximum(k, 1e-9), 0.0) * 0.5
        vel = vel + jnp.sum(pn * jn[..., None], 1) * inv_m[:, None]
        vel = vel - jnp.sum(pn * jn[..., None], 0) * inv_m_j[:, None]
        return vel

    vel = jax.lax.fori_loop(0, 4, pair_iter, vel)
    push = jnp.sum(
        jnp.where(pactive[..., None], pn * (0.3 * pdepth)[..., None], 0.0), axis=1
    )
    pos = jnp.where(dynamic[:, None], pos + push, pos)

    # -------------------------------------------------------- vs player
    s0 = player_pos - jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0])
    s1 = player_pos + jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0])
    qp = closest_point_on_segment(ctr, jnp.broadcast_to(s0, ctr.shape), jnp.broadcast_to(s1, ctr.shape))
    pdelta = ctr - qp
    pd = jnp.linalg.norm(pdelta, axis=-1)
    pnrm = safe_normalize(pdelta)
    rs = _support_radius(quat, cmap.halfext, pnrm)
    cdepth = jnp.where(dynamic, 0.9 * rs + CAPSULE_RADIUS - pd, -jnp.inf)
    inv_m_player = 1.0 / CHARACTER_MASS
    rel_v = jnp.sum((vel - player_vel[None, :]) * pnrm, axis=-1)
    jn = jnp.where((cdepth > 0) & (rel_v < 0), -rel_v / (inv_m + inv_m_player + 1e-9), 0.0)
    vel = vel + pnrm * (jn * inv_m)[:, None]
    pos = jnp.where(
        ((cdepth > PENETRATION_SLOP) & dynamic)[:, None],
        pos + pnrm * (0.5 * (cdepth - PENETRATION_SLOP))[:, None],
        pos,
    )

    return pos, quat, vel, omega
