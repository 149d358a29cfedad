"""Virtual character controller: capsule collide-and-slide vs the static
world + actor colliders.

Reproduces the behavior of Jolt's CharacterVirtual as configured by the
reference (engine/src/physics/PlayerPhysics.c:173-194): capsule r=0.2,
cylinder half-height 0.25, mass 10, max slope 50°, supporting volume at
-0.25; ExtendedUpdate with stick-to-floor 0.25 and stair step-up 0.25
(PlayerPhysics.c:439-453). Instead of Jolt's swept shape casts we run an
iterative penetration-resolution loop (4 rounds) at 60 Hz, which converges
to the same resting/sliding behavior for the game's speeds (6 m/s, i.e.
0.1 m per tick << capsule radius).
"""

from __future__ import annotations

import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import Layer, Motion, Shape
from c_game_engine_tpu.physics.geometry import (
    capsule_triangle_closest,
    closest_point_on_obb,
    closest_point_on_segment,
)
from c_game_engine_tpu.utils.mathx import safe_normalize

CAPSULE_RADIUS = 0.2  # PlayerPhysics.c:176 (JPH_CapsuleShape_Create(0.2, 0.25))
CAPSULE_HALF_HEIGHT = 0.25
MAX_SLOPE_COS = 0.6427876097  # cos(50°), PlayerPhysics.c:42 MAX_WALKABLE_SLOPE
STEP_UP = 0.25  # walkStairsStepUp (PlayerPhysics.c:442)
STICK_DOWN = 0.25  # stickToFloorStepDown (PlayerPhysics.c:441)
CHARACTER_MASS = 10.0  # PlayerPhysics.c:184


def _capsule_segment(pos):
    off = jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0], jnp.float32)
    return pos - off, pos + off


def _collect_contacts(cmap, actors, pos, exclude_actor):
    """Deepest-contact query of the player capsule against static triangles
    and solid actor OBBs. Returns (depth [K], normal [K,3]) for the combined
    contact set (one lane per triangle + one per actor)."""
    s0, s1 = _capsule_segment(pos)

    # --- static triangles (grid-pruned candidate set) ---
    from c_game_engine_tpu.physics.grid import query_cell

    cand = query_cell(cmap, pos)  # [L]
    candc = jnp.clip(cand, 0, None)
    tri3 = cmap.tris[candc]
    a, b, c = tri3[:, 0], tri3[:, 1], tri3[:, 2]
    cand_ok = (cand >= 0) & cmap.tri_valid[candc]
    p_seg, q_tri = capsule_triangle_closest(
        jnp.broadcast_to(s0, a.shape), jnp.broadcast_to(s1, a.shape), a, b, c
    )
    delta = p_seg - q_tri
    dist = jnp.linalg.norm(delta, axis=-1)
    raw_n = safe_normalize(delta)
    # Orient contacts to push toward the capsule-center side of the face:
    # in deep penetration the closest segment point crosses the plane and
    # raw delta points *into* the triangle (classic closest-point failure),
    # which would eject the capsule sideways/downwards.
    face_n = cmap.tri_normal[candc]
    side = jnp.sign(jnp.sum((pos - a) * face_n, -1))
    side = jnp.where(side == 0, 1.0, side)
    flip = jnp.sign(jnp.sum(raw_n * face_n, -1)) * side
    flip = jnp.where(flip == 0, 1.0, flip)
    tri_normal = raw_n * flip[..., None]
    tri_normal = jnp.where(dist[..., None] > 1e-6, tri_normal, face_n * side[..., None])
    # penetration measured along the oriented normal (signed; covers the
    # crossed-plane case where dist alone underestimates)
    signed = jnp.sum(delta * tri_normal, -1)
    tri_depth = jnp.where(cand_ok, CAPSULE_RADIUS - signed, -jnp.inf)

    # --- solid actor boxes (doors, props, dynamic bodies) ---
    solid = (
        actors.active
        & (cmap.shape != int(Shape.EMPTY))
        & (cmap.motion != int(Motion.NONE))
        & (cmap.layer != int(Layer.SENSOR))
        & (jnp.arange(cmap.num_actors) != exclude_actor)
    )
    # closest point between capsule segment and OBB (alternating projection)
    from c_game_engine_tpu.utils.mathx import quat_rotate

    box_ctr = actors.pos + quat_rotate(actors.quat, cmap.shape_center)
    q = closest_point_on_obb(pos, box_ctr, actors.quat, cmap.halfext)
    for _ in range(2):
        p = closest_point_on_segment(q, jnp.broadcast_to(s0, q.shape), jnp.broadcast_to(s1, q.shape))
        q = closest_point_on_obb(p, box_ctr, actors.quat, cmap.halfext)
    bdelta = p - q
    bdist = jnp.linalg.norm(bdelta, axis=-1)
    box_depth = jnp.where(solid, CAPSULE_RADIUS - bdist, -jnp.inf)
    box_normal = safe_normalize(bdelta)

    depth = jnp.concatenate([tri_depth, box_depth], axis=0)
    normal = jnp.concatenate([tri_normal, box_normal], axis=0)
    return depth, normal


def resolve_capsule(cmap, actors, pos, vel, exclude_actor=-1, iters: int = 4):
    """Iterative penetration resolution + velocity clipping.

    Returns (pos, vel, on_ground, ground_normal)."""
    import jax

    def body(_, carry):
        pos, vel, on_ground, ground_n = carry
        depth, normal = _collect_contacts(cmap, actors, pos, exclude_actor)
        worst = jnp.argmax(depth)
        d = depth[worst]
        n = normal[worst]
        # contact tolerance: a contact within 1 cm separation still counts
        # for grounding/velocity clipping (Jolt's collision tolerance), but
        # only actual penetration moves the capsule
        hit = d > -0.01
        pos = jnp.where(hit, pos + n * jnp.maximum(d, 0.0), pos)
        # clip velocity against the contact plane (slide)
        vn = jnp.sum(vel * n)
        vel = jnp.where(hit & (vn < 0), vel - n * vn, vel)
        is_walkable = n[1] >= MAX_SLOPE_COS
        on_ground = on_ground | (hit & is_walkable)
        ground_n = jnp.where(hit & is_walkable, n, ground_n)
        return pos, vel, on_ground, ground_n

    init = (pos, vel, jnp.array(False), jnp.array([0.0, 1.0, 0.0], jnp.float32))
    return jax.lax.fori_loop(0, iters, body, init)


def update_character(cmap, actors, pos, vel, dt, was_on_ground, jumping, noclip):
    """One CharacterVirtual_ExtendedUpdate-equivalent step.

    Integrates the velocity, resolves collisions, applies stair step-up and
    stick-to-floor. `noclip` skips all collision (OnContactValidate returns
    false while noclip is active, PlayerPhysics.c:98-101)."""
    new_pos = pos + vel * dt

    def noclip_result():
        return new_pos, vel, jnp.array(False), jnp.array([0.0, 1.0, 0.0], jnp.float32)

    def collide_result():
        p, v, grounded, gn = resolve_capsule(cmap, actors, new_pos, vel)

        # stair step-up: if horizontal motion was blocked (horizontal velocity
        # got clipped) try resolving from a lifted position
        h_in = jnp.linalg.norm(vel * jnp.array([1.0, 0.0, 1.0]))
        h_out = jnp.linalg.norm(v * jnp.array([1.0, 0.0, 1.0]))
        blocked = (h_in > 1e-4) & (h_out < 0.9 * h_in)
        lifted = new_pos + jnp.array([0.0, STEP_UP, 0.0], jnp.float32)
        p2, v2, grounded2, gn2 = resolve_capsule(cmap, actors, lifted, vel)
        h2 = jnp.linalg.norm(v2 * jnp.array([1.0, 0.0, 1.0]))
        # accept the step only if it preserved horizontal motion and lands on
        # walkable ground after snapping back down
        use_step = blocked & (h2 > h_out + 1e-4)
        p = jnp.where(use_step, p2, p)
        v = jnp.where(use_step, v2, v)
        grounded = jnp.where(use_step, grounded2, grounded)
        gn = jnp.where(use_step, gn2, gn)

        # stick-to-floor: when grounded last tick and not moving up, snap down
        # by up to STICK_DOWN so walking down slopes/stairs keeps contact
        want_stick = was_on_ground & jnp.logical_not(jumping) & (v[1] <= 1e-4) & jnp.logical_not(grounded)
        dropped = p + jnp.array([0.0, -STICK_DOWN, 0.0], jnp.float32)
        p3, v3, grounded3, gn3 = resolve_capsule(cmap, actors, dropped, v)
        stick_ok = want_stick & grounded3
        p = jnp.where(stick_ok, p3, p)
        v = jnp.where(stick_ok, v3, v)
        grounded = grounded | stick_ok
        gn = jnp.where(stick_ok, gn3, gn)
        return p, v, grounded, gn

    # both branches are cheap enough to evaluate; select (avoids lax.cond
    # retracing and keeps everything vectorizable under vmap)
    cp, cv, cg, cgn = collide_result()
    np_, nv, ng, ngn = noclip_result()
    pos_out = jnp.where(noclip, np_, cp)
    vel_out = jnp.where(noclip, nv, cv)
    grounded_out = jnp.where(noclip, ng, cg)
    gn_out = jnp.where(noclip, ngn, cgn)
    return pos_out, vel_out, grounded_out, gn_out
