"""Batched rigid-body dynamics: integration, contact generation, impulse
solve.

Replaces the used subset of Jolt's PhysicsSystem::Update (sequential-impulse
islands solver, 2 collision substeps, MapPhysics.c:105-108) with a
fixed-shape projected-Jacobi impulse solver. Work is restricted to the
compile-time compact set of DYNAMIC actors (cmap.dyn_slots, typically 2-8
per map) and the static world is pruned through the uniform grid
(compiler/broadphase.py), so per-substep cost is D x L closest-point tests
instead of N x T:

  - dynamic boxes vs static triangles (support-point contacts, iterative
    top-K manifold per body)
  - dynamic boxes vs solid actor OBBs and each other (support-sphere approx)
  - dynamic boxes vs the player capsule (the character pushes bodies; bodies
    with CAN_PUSH_PLAYER push the character inside character.py instead)

Friction: Coulomb clamp; map static friction 4.25 (MapLoader.c:263), body
default 0.2, combined sqrt(f1*f2) (Jolt's default). Restitution 0. Gravity
(0,-9.81,0) (Physics.h:34). Kinematic actors (doors, solid sprites)
integrate velocity on the full lanes and act as one-way obstacles.

Approximations vs Jolt, for later rounds: box-box uses support-sphere
contacts instead of SAT manifolds; no sleeping; Jacobi (0.7 relaxation)
instead of Gauss-Seidel.
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
from c_game_engine_tpu.physics.grid import query_cell
from c_game_engine_tpu.utils.mathx import (
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat3,
    safe_normalize,
)

GRAVITY = jnp.array([0.0, -9.81, 0.0])
MAP_FRICTION = 4.25  # MapLoader.c:263
SOLVER_ITERS = 8
BAUMGARTE = 0.2
PENETRATION_SLOP = 0.005
RELAX = 0.7
MANIFOLD_K = 4


def _support_radius(quat, halfext, n):
    """Box support extent along unit direction n: sum_i |halfext_i (R_i.n)|."""
    rot = quat_to_mat3(quat)
    ax = jnp.abs(jnp.einsum("...ij,...i->...j", rot, n))
    return jnp.sum(ax * halfext, axis=-1)


def _apply_inv_inertia(rot, inv_I, torque):
    """world I^-1 @ torque; rot [D,3,3], inv_I [D,3], torque [D,K,3]."""
    local = jnp.einsum("nji,nkj->nki", rot, torque)
    local = local * inv_I[:, None, :]
    return jnp.einsum("nij,nkj->nki", rot, local)


def _top_k_iterative(depth, k):
    """k deepest lanes via repeated argmax (cheaper than lax.top_k's sort on
    TPU for small k). depth: [D, L]. Returns (vals [D,k], idx [D,k])."""
    vals, idxs = [], []
    d = depth
    for _ in range(k):
        i = jnp.argmax(d, axis=-1)
        v = jnp.take_along_axis(d, i[:, None], axis=-1)[:, 0]
        vals.append(v)
        idxs.append(i)
        d = d.at[jnp.arange(d.shape[0]), i].set(-jnp.inf)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def step_bodies(cmap, actors, player_pos, player_vel, dt, n_substeps: int = 2):
    """Advance actor bodies by dt with n_substeps collision substeps.
    Returns (pos, quat, vel, omega) full-lane arrays."""
    n = cmap.num_actors
    sl = cmap.dyn_slots
    slc = jnp.clip(sl, 0, n - 1)
    d_on = (sl >= 0) & actors.active[slc]

    kinematic = actors.active & (cmap.motion == int(Motion.KINEMATIC))
    solid = (
        actors.active
        & (cmap.shape != int(Shape.EMPTY))
        & (cmap.motion != int(Motion.NONE))
        & (cmap.layer != int(Layer.SENSOR))
    )

    h = dt / n_substeps

    # gathered dynamic lanes
    dpos = actors.pos[slc]
    dquat = actors.quat[slc]
    dvel = actors.vel[slc]
    domega = actors.omega[slc]
    d_inv_m = cmap.inv_mass[slc]
    d_inv_I = cmap.inv_inertia[slc]
    d_halfext = cmap.halfext[slc]
    d_center = cmap.shape_center[slc]
    d_mu = jnp.sqrt(cmap.friction[slc] * MAP_FRICTION)

    # full-lane kinematic state (integrated per substep below, no contacts)
    k_pos = actors.pos
    k_vel = actors.vel

    # other-actor tables for pair contacts (kinematic/static actors move at
    # most once per substep; use start-of-tick poses)
    o_solid = solid
    o_inv_m = jnp.where(actors.active & (cmap.motion == int(Motion.DYNAMIC)), cmap.inv_mass, 0.0)
    o_ctr_static = actors.pos + quat_rotate(actors.quat, cmap.shape_center)
    o_quat = actors.quat
    o_halfext = cmap.halfext
    a2d = cmap.actor_to_dyn  # [N] -> dynamic lane or -1

    def substep(carry, _):
        dpos, dquat, dvel, domega, k_pos = carry
        dvel = jnp.where(d_on[:, None], dvel + GRAVITY * h, dvel)
        dpos = jnp.where(d_on[:, None], dpos + dvel * h, dpos)
        dq = 0.5 * h * quat_mul(jnp.concatenate([domega, jnp.zeros((sl.shape[0], 1))], -1), dquat)
        dquat = jnp.where(d_on[:, None], quat_normalize(dquat + dq), dquat)
        k_pos = jnp.where(kinematic[:, None], k_pos + k_vel * h, k_pos)

        rot = quat_to_mat3(dquat)
        ctr = dpos + quat_rotate(dquat, d_center)

        # ------------------------------------------- vs static tris (grid)
        cand = query_cell(cmap, ctr)  # [D, L]
        candc = jnp.clip(cand, 0, None)
        tri3 = cmap.tris[candc]  # [D, L, 3, 3]
        cand_ok = (cand >= 0) & cmap.tri_valid[candc] & d_on[:, None]
        a, b, c = tri3[:, :, 0], tri3[:, :, 1], tri3[:, :, 2]
        q_tri = closest_point_on_triangle(ctr[:, None, :], a, b, c)
        delta = ctr[:, None, :] - q_tri
        dist = jnp.linalg.norm(delta, axis=-1)
        nrm = safe_normalize(delta)
        # deep-penetration orientation fix (same as character.py)
        face_n = cmap.tri_normal[candc]
        side = jnp.sign(jnp.sum((ctr[:, None, :] - a) * face_n, -1))
        side = jnp.where(side == 0, 1.0, side)
        flip = jnp.sign(jnp.sum(nrm * face_n, -1)) * side
        flip = jnp.where(flip == 0, 1.0, flip)
        nrm = nrm * flip[..., None]
        nrm = jnp.where(dist[..., None] > 1e-6, nrm, face_n * side[..., None])
        signed = jnp.sum(delta * nrm, -1)
        r_sup = _support_radius(dquat[:, None, :], d_halfext[:, None, :], nrm)
        depth = jnp.where(cand_ok, r_sup - signed, -jnp.inf)

        c_d, top_idx = _top_k_iterative(depth, MANIFOLD_K)
        c_n = jnp.take_along_axis(nrm, top_idx[..., None], axis=1)
        c_p = jnp.take_along_axis(q_tri, top_idx[..., None], axis=1)
        active = c_d > 0.0

        def solver_iter(_, vo):
            vel, omega = vo
            r = c_p - ctr[:, None, :]
            v_pt = vel[:, None, :] + jnp.cross(omega[:, None, :], r)
            vn = jnp.sum(v_pt * c_n, -1)
            rxn = jnp.cross(r, c_n)
            ang = _apply_inv_inertia(rot, d_inv_I, rxn)
            k_n = d_inv_m[:, None] + jnp.sum(jnp.cross(ang, r) * c_n, -1)
            jn = jnp.where(active & (vn < 0), -vn / jnp.maximum(k_n, 1e-9), 0.0) * RELAX
            imp = c_n * jn[..., None]
            vel = vel + jnp.sum(imp, 1) * d_inv_m[:, None]
            omega = omega + jnp.sum(_apply_inv_inertia(rot, d_inv_I, jnp.cross(r, imp)), 1)

            v_pt = vel[:, None, :] + jnp.cross(omega[:, None, :], r)
            vt = v_pt - c_n * jnp.sum(v_pt * c_n, -1, keepdims=True)
            vt_mag = jnp.linalg.norm(vt, axis=-1)
            t_dir = safe_normalize(vt)
            k_t = d_inv_m[:, None] + jnp.sum(
                jnp.cross(_apply_inv_inertia(rot, d_inv_I, jnp.cross(r, t_dir)), r) * t_dir, -1
            )
            jt_needed = vt_mag / jnp.maximum(k_t, 1e-9)
            jt = jnp.where(active, jnp.minimum(jt_needed, d_mu[:, None] * jnp.maximum(jn, 0.0)), 0.0)
            f_imp = -t_dir * (jt * RELAX)[..., None]
            vel = vel + jnp.sum(f_imp, 1) * d_inv_m[:, None]
            omega = omega + jnp.sum(_apply_inv_inertia(rot, d_inv_I, jnp.cross(r, f_imp)), 1)
            return vel, omega

        dvel, domega = jax.lax.fori_loop(0, SOLVER_ITERS, solver_iter, (dvel, domega))

        corr = jnp.sum(
            jnp.where(
                (c_d > PENETRATION_SLOP)[..., None],
                c_n * (BAUMGARTE * (c_d - PENETRATION_SLOP))[..., None],
                0.0,
            ),
            axis=1,
        )
        dpos = jnp.where(d_on[:, None], dpos + corr, dpos)

        # ------------------------------------------------ vs other actors
        # other positions: kinematics move, use k_pos for them
        o_pos = jnp.where(kinematic[:, None], k_pos, actors.pos)
        o_ctr = o_pos + quat_rotate(o_quat, cmap.shape_center)
        dvec = ctr[:, None, :] - o_ctr[None, :, :]  # [D, N, 3]
        pdist = jnp.linalg.norm(dvec, axis=-1)
        pn = safe_normalize(dvec)
        r_i = _support_radius(dquat[:, None, :], d_halfext[:, None, :], pn)
        r_j = _support_radius(o_quat[None, :, :], o_halfext[None, :, :], -pn)
        not_self = sl[:, None] != jnp.arange(n)[None, :]
        pair_ok = d_on[:, None] & o_solid[None, :] & not_self
        pdepth = jnp.where(pair_ok, 0.8 * (r_i + r_j) - pdist, -jnp.inf)
        pactive = pdepth > 0.0

        def pair_iter(_, dvel):
            other_vel = jnp.where(
                (a2d >= 0)[:, None], dvel[jnp.clip(a2d, 0, None)], actors.vel
            )
            rel_vn = jnp.sum((dvel[:, None, :] - other_vel[None, :, :]) * pn, -1)
            k = d_inv_m[:, None] + o_inv_m[None, :]
            jn = jnp.where(pactive & (rel_vn < 0), -rel_vn / jnp.maximum(k, 1e-9), 0.0) * 0.5
            dvel = dvel + jnp.sum(pn * jn[..., None], 1) * d_inv_m[:, None]
            # reaction on dynamic targets
            reaction = -jnp.sum(pn * jn[..., None], 0)  # [N, 3] per target actor
            dvel = dvel + reaction[slc] * d_inv_m[:, None] * (a2d[slc] >= 0)[:, None]
            return dvel

        dvel = jax.lax.fori_loop(0, 2, pair_iter, dvel)
        push = jnp.sum(
            jnp.where(pactive[..., None], pn * (0.3 * pdepth)[..., None], 0.0), axis=1
        )
        dpos = jnp.where(d_on[:, None], dpos + push, dpos)

        # -------------------------------------------------- vs player
        s0 = player_pos - jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0])
        s1 = player_pos + jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0])
        ctr2 = dpos + quat_rotate(dquat, d_center)
        qp = closest_point_on_segment(ctr2, jnp.broadcast_to(s0, ctr2.shape), jnp.broadcast_to(s1, ctr2.shape))
        pdelta = ctr2 - qp
        pd = jnp.linalg.norm(pdelta, axis=-1)
        pnrm = safe_normalize(pdelta)
        rs = _support_radius(dquat, d_halfext, pnrm)
        cdepth = jnp.where(d_on, 0.9 * rs + CAPSULE_RADIUS - pd, -jnp.inf)
        inv_m_player = 1.0 / CHARACTER_MASS
        rel_v = jnp.sum((dvel - player_vel[None, :]) * pnrm, axis=-1)
        jn = jnp.where((cdepth > 0) & (rel_v < 0), -rel_v / (d_inv_m + inv_m_player + 1e-9), 0.0)
        dvel = dvel + pnrm * (jn * d_inv_m)[:, None]
        dpos = jnp.where(
            ((cdepth > PENETRATION_SLOP) & d_on)[:, None],
            dpos + pnrm * (0.5 * (cdepth - PENETRATION_SLOP))[:, None],
            dpos,
        )

        return (dpos, dquat, dvel, domega, k_pos), None

    (dpos, dquat, dvel, domega, k_pos), _ = jax.lax.scan(
        substep, (dpos, dquat, dvel, domega, k_pos), None, length=n_substeps
    )

    # scatter dynamic lanes back into full arrays; kinematics keep k_pos
    sl_w = jnp.where(d_on, slc, n)  # out-of-bounds drop for pad/inactive lanes
    pos = k_pos.at[sl_w].set(dpos, mode="drop")
    quat = actors.quat.at[sl_w].set(dquat, mode="drop")
    vel = actors.vel.at[sl_w].set(dvel, mode="drop")
    omega = actors.omega.at[sl_w].set(domega, mode="drop")
    return pos, quat, vel, omega
