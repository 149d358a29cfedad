"""The fixed-timestep tick: one pure function `step(cmap, state, actions)`.

Replaces the reference's physics-thread tick (PhysicsThreadMain ->
MapFixedUpdate, engine/src/subsystem/threads/PhysicsThread.c:59-112 and
engine/src/physics/MapPhysics.c:58-119) plus the render-thread camera update
(UpdatePlayerCamera, PlayerPhysics.c:461-529). Stage order matches the
reference tick; sensor-contact callbacks fire right after the character
update (they fire *during* it in Jolt) and signal chains propagate in
bounded rounds (see actors/signals.py).

delta is fixed at 1.0 tick (60 TPS); dt = 1/60 s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_game_engine_tpu.actors import behaviors, handlers, signals
from c_game_engine_tpu.actors.defs import ActorClass, ActorFlags, Input, Output
from c_game_engine_tpu.assets.kvlist import ParamType
from c_game_engine_tpu.core.actions import Actions, Button
from c_game_engine_tpu.core.state import EVENT_CAPACITY, Crosshair, EnvState
from c_game_engine_tpu.physics import bodies, character
from c_game_engine_tpu.physics.raycast import cast_ray, forward_vector
from c_game_engine_tpu.utils.mathx import (
    clamp,
    quat_from_axis_angle,
    quat_lerp,
    quat_normalize,
    remap,
)

TPS = 60.0
DT = 1.0 / TPS
MOVE_SPEED = 6.0  # PlayerPhysics.c:40
SLOW_MOVE_SPEED = 0.6  # PlayerPhysics.c:41
JUMP_SPEED = 4.25  # PlayerPhysics.c:43
GRAVITY = -9.81  # Physics.h:34
ACTOR_RAYCAST_MAX_DISTANCE = 10.0  # PlayerPhysics.c:44
HELD_OFFSET = 1.0  # PlayerPhysics.c:45
HELD_SMOOTH = 17.5  # PlayerPhysics.c:47
HELD_MAX_DIST_SQ = 6.0  # PlayerPhysics.c:48


def _push_event(events, do_push, target, input_id, ptype=int(ParamType.NONE)):
    """Append one event to the queue under a boolean flag."""
    slot = jnp.clip(events.count, 0, EVENT_CAPACITY - 1)
    ok = do_push & (events.count < EVENT_CAPACITY)
    return events.replace(
        target=events.target.at[slot].set(jnp.where(ok, target, events.target[slot])),
        input=events.input.at[slot].set(jnp.where(ok, input_id, events.input[slot])),
        ptype=events.ptype.at[slot].set(jnp.where(ok, ptype, events.ptype[slot])),
        count=events.count + ok.astype(jnp.int32),
        dropped=events.dropped + (do_push & ~ok).astype(jnp.int32),
    )


def step(cmap, state: EnvState, actions: Actions) -> EnvState:
    n = cmap.num_actors
    delta = 1.0
    p = state.player
    btn = actions.buttons
    fired, fired_pi = signals.empty_fired(n)

    # --------------------------------------------------- toggles (UpdatePlayer)
    freecam = jnp.logical_xor(p.freecam, btn[Button.FREECAM] & ~p.noclip)
    noclip = jnp.logical_xor(p.noclip, btn[Button.NOCLIP] & ~freecam)
    allow = state.camera_actor < 0  # MapFixedUpdate allowMovement

    # ------------------------------------------- camera look (UpdatePlayerCamera)
    yaw = p.yaw + jnp.where(allow, actions.look[0], 0.0)
    pitch = clamp(p.pitch + jnp.where(allow, actions.look[1], 0.0), -jnp.pi / 2, jnp.pi / 2)

    # --------------------------------------------------- MovePlayer velocity
    move = actions.move * jnp.where(allow, 1.0, 0.0)
    mlen = jnp.linalg.norm(move)
    mdir = jnp.where(mlen > 1e-6, move / jnp.maximum(mlen, 1e-6), 0.0)
    speed = jnp.where(
        btn[Button.SLOW] & allow,
        SLOW_MOVE_SPEED,
        jnp.where((freecam | noclip) & btn[Button.SPRINT], MOVE_SPEED * 2, MOVE_SPEED),
    )
    has_move = mlen > 1e-6
    # rotate move vec: yaw-only normally; full look in freecam/noclip
    # (PlayerPhysics.c:254-272)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    flat = jnp.stack(
        [mdir[0] * cy - mdir[1] * sy, 0.0, mdir[0] * sy + mdir[1] * cy]
    )
    look_fwd = forward_vector(yaw, pitch)
    look_right = jnp.stack([cy, 0.0, sy])
    look_up_comp = jnp.cross(look_fwd, -look_right)  # camera-frame vertical
    full = look_right * mdir[0] + (-look_fwd) * mdir[1]
    move_vec = jnp.where(freecam | noclip, full, flat) * speed * has_move

    airborne = ~(noclip | p.on_ground)
    vel_y = jnp.where(
        airborne,
        move_vec[1] + p.vel[1] + GRAVITY * (delta / TPS),
        jnp.where(btn[Button.JUMP] & allow & ~freecam, JUMP_SPEED, move_vec[1]),
    )
    vel = jnp.stack([move_vec[0], vel_y, move_vec[2]])

    # freecam: move the detached camera instead (PlayerPhysics.c:274-279)
    freecam_pos = jnp.where(
        freecam, p.freecam_pos + move_vec * (delta / TPS), p.pos + jnp.array([0.0, 0.25, 0.0])
    )

    # ------------------------------------- interaction raycast (UpdatePlayer)
    cam_pos = p.pos + jnp.array([0.0, 0.25, 0.0])  # camera y offset (PlayerPhysics.c:524)
    ray_dir = forward_vector(yaw, pitch)
    hit, frac, hit_actor = cast_ray(
        cmap, state.actors, cam_pos, ray_dir, ACTOR_RAYCAST_MAX_DISTANCE
    )
    targeted = jnp.where(hit & (hit_actor >= 0) & ~freecam, hit_actor, -1)
    close_enough = frac * ACTOR_RAYCAST_MAX_DISTANCE < 1.0

    interact_pressed = btn[Button.INTERACT] & allow & ~freecam
    has_held = p.held_actor >= 0
    tgt_flags = jnp.where(targeted >= 0, cmap.flags[jnp.clip(targeted, 0, n - 1)], 0)
    tgt_cls = jnp.where(targeted >= 0, cmap.cls[jnp.clip(targeted, 0, n - 1)], -1)
    can_hold = (tgt_flags & int(ActorFlags.CAN_BE_HELD)) != 0
    can_interact = (tgt_flags & int(ActorFlags.INTERACTABLE)) != 0
    is_enemy = (tgt_flags & int(ActorFlags.ENEMY)) != 0

    # ---- items (EraserItem.c / LaserStopperItem.c FixedUpdate) ----
    cur_item = state.save.current_item
    fire_pressed = btn[Button.FIRE] & allow & ~freecam & ~has_held
    altfire_pressed = btn[Button.ALT_FIRE] & allow & ~freecam & ~has_held
    eraser_use = (cur_item == 0) & is_enemy & (targeted >= 0)
    erase_now = eraser_use & fire_pressed
    stopper_target = (cur_item == 1) & (tgt_cls == int(ActorClass.LASER_EMITTER))
    events = state.events
    events = _push_event(
        events, stopper_target & fire_pressed, targeted, int(Input.TURN_OFF)
    )
    events = _push_event(
        events, stopper_target & altfire_pressed, targeted, int(Input.TURN_ON)
    )
    state = state.replace(events=events)
    item_target = eraser_use | stopper_target

    # erase the targeted actor (EraserItem.c: RemoveActor on fire)
    erase_mask = (jnp.arange(n) == targeted) & erase_now & state.actors.active
    state, fired, fired_pi = handlers.remove_actors(state, fired, fired_pi, erase_mask)

    # ---- pick up / interact (PlayerPhysics.c:396-431) ----
    pickup = interact_pressed & ~has_held & ~item_target & can_hold & close_enough & (targeted >= 0)
    do_interact = (
        interact_pressed & ~has_held & ~item_target & ~can_hold & can_interact & close_enough & (targeted >= 0)
    )

    # button Interact (Button.c:ButtonInteract)
    actors = state.actors
    bmask = (jnp.arange(n) == targeted) & do_interact & (cmap.cls == int(ActorClass.BUTTON)) & actors.active
    b_pressed = actors.idata[:, 0] != 0
    toggle = cmap.siparams[:, 2] != 0
    effective = bmask & (~b_pressed | toggle)
    new_pressed = jnp.where(effective, ~b_pressed, b_pressed)
    actors = actors.replace(
        idata=actors.idata.at[:, 0].set(
            jnp.where(effective, new_pressed.astype(jnp.int32), actors.idata[:, 0])
        ),
        skin=jnp.where(
            effective,
            jnp.where(new_pressed, cmap.siparams[:, 1], cmap.siparams[:, 0]),
            actors.skin,
        ),
        fdata=actors.fdata.at[:, 0].set(
            jnp.where(effective, state.tick.astype(jnp.float32), actors.fdata[:, 0])
        ),
    )
    fired, fired_pi = signals.fire(fired, fired_pi, effective & new_pressed, Output.PRESSED)
    fired, fired_pi = signals.fire(fired, fired_pi, effective & ~new_pressed, Output.UNPRESSED)

    # item_eraser Interact = pickup (ItemEraser.c:ItemEraserInteracted)
    emask = (jnp.arange(n) == targeted) & do_interact & (cmap.cls == int(ActorClass.ITEM_ERASER)) & actors.active
    state = state.replace(actors=actors)
    any_e = jnp.any(emask)
    state = state.replace(
        save=state.save.replace(
            item_mask=jnp.where(any_e, state.save.item_mask | 1, state.save.item_mask),
            current_item=jnp.where(any_e, 0, state.save.current_item),
        )
    )
    state, fired, fired_pi = handlers.remove_actors(state, fired, fired_pi, emask)
    actors = state.actors

    # ---- held actor spring (PlayerPhysics.c:344-386) ----
    held_idx = jnp.clip(p.held_actor, 0, n - 1)
    held_alive = has_held & actors.active[held_idx]
    held_pos = actors.pos[held_idx]
    held_off = held_pos - p.pos
    too_far = jnp.sum(held_off * held_off) > HELD_MAX_DIST_SQ
    drop = has_held & (interact_pressed | too_far | ~held_alive)
    keep_held = held_alive & ~drop
    yaw_fwd = jnp.stack([-sy, 0.0, -cy])  # player-forward (yaw only), -Z at yaw 0
    target_pt = yaw_fwd * HELD_OFFSET
    spring_vel = (target_pt - held_off) * HELD_SMOOTH
    target_quat = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
    new_quat = quat_normalize(quat_lerp(actors.quat[held_idx], target_quat, 0.2))
    held_onehot = (jnp.arange(n) == held_idx) & keep_held
    actors = actors.replace(
        vel=jnp.where(held_onehot[:, None], spring_vel, actors.vel),
        omega=jnp.where(held_onehot[:, None], 0.0, actors.omega),
        quat=jnp.where(held_onehot[:, None], new_quat, actors.quat),
    )
    held_actor = jnp.where(drop | ~held_alive, -1, p.held_actor)
    held_actor = jnp.where(pickup & (held_actor < 0), targeted, held_actor)
    state = state.replace(actors=actors)

    crosshair = jnp.where(
        (targeted >= 0) & (item_target | ((can_hold | can_interact) & close_enough)),
        Crosshair.INTERACTABLE,
        Crosshair.NORMAL,
    )
    crosshair = jnp.where(held_actor >= 0, Crosshair.INVISIBLE, crosshair)

    # --------------------------------------- character update (ExtendedUpdate)
    old_xz = p.pos[jnp.array([0, 2])]
    new_pos, new_vel, on_ground, _ = character.update_character(
        cmap,
        state.actors,
        p.pos,
        vel,
        delta / TPS,
        p.on_ground,
        btn[Button.JUMP] & allow,
        noclip,
    )
    new_pos = jnp.where(freecam, p.pos, new_pos)
    new_vel = jnp.where(freecam, p.vel, new_vel)

    # ---------------------------------------------- view bob (MapPhysics.c:76-84)
    dist = jnp.linalg.norm(new_pos[jnp.array([0, 2])] - old_xz)
    bob_h = remap(dist, 0.0, MOVE_SPEED / TPS, 0.0, 0.1)
    view_bob = 0.1 + jnp.sin(
        jnp.mod(state.tick.astype(jnp.float32) / 7.0, 2.0 * jnp.pi)
    ) * bob_h

    state = state.replace(
        player=p.replace(
            pos=new_pos,
            vel=new_vel,
            yaw=yaw,
            pitch=pitch,
            on_ground=on_ground,
            noclip=noclip,
            freecam=freecam,
            freecam_pos=freecam_pos,
            held_actor=held_actor.astype(jnp.int32),
            targeted_actor=targeted.astype(jnp.int32),
            targeted_fraction=frac,
            can_drop_held=jnp.array(True),
            view_bob=view_bob,
            crosshair=crosshair.astype(jnp.int32),
        )
    )

    # ------------------------------------------------ sensor contact callbacks
    state, fired, fired_pi = behaviors.contact_phase(cmap, state, fired, fired_pi)

    # --------------------------------------------------------- actor updates
    camera_pos = jnp.where(freecam, freecam_pos, new_pos + jnp.array([0.0, 0.25, 0.0]))
    state, fired, fired_pi = behaviors.update_actors(
        cmap, state, fired, fired_pi, delta, camera_pos
    )

    # ------------------------------------------------------ signal propagation
    state = signals.process_signals(cmap, state, fired, fired_pi, rounds=4)

    # ---------------------------------------------- physics (2 substeps)
    bpos, bquat, bvel, bomega = bodies.step_bodies(
        cmap, state.actors, state.player.pos, state.player.vel, delta / TPS, n_substeps=2
    )
    state = state.replace(
        actors=state.actors.replace(pos=bpos, quat=bquat, vel=bvel, omega=bomega)
    )

    # --------------------------------------------- save clamps (MapUpdate)
    save = state.save.replace(
        coins=jnp.minimum(state.save.coins, 9999),
        blue_coins=jnp.minimum(state.save.blue_coins, 5),
    )
    return state.replace(save=save, tick=state.tick + 1)
