"""The fixed-timestep tick: `step_batch(cmap, state, actions)` over [B] envs.

Replaces the reference's physics-thread tick (PhysicsThreadMain ->
MapFixedUpdate, engine/src/subsystem/threads/PhysicsThread.c:59-112 and
engine/src/physics/MapPhysics.c:58-119) plus the render-thread camera update
(UpdatePlayerCamera, PlayerPhysics.c:461-529). Stage order matches the
reference tick; sensor-contact callbacks fire right after the character
update (they fire *during* it in Jolt) and signal chains propagate in
bounded rounds (see actors/signals.py).

The hot physics stages (interaction raycast, character controller, rigid
bodies) run through the hand-batched lanes-major kernels in
physics/batched.py; the cheap per-env gameplay logic (contacts, actor
updates, signal rounds) is vmapped.

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
from c_game_engine_tpu.physics import batched
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
    """Append one event (per env) to the queue under a boolean flag.
    Works on single-env ([Q]) and batched ([B, Q]) queues. Dense slot
    placement (one-hot over the queue axis) instead of a dynamic scatter —
    per-env scatters compile to unfused kernels on TPU."""
    slot = jnp.clip(events.count, 0, EVENT_CAPACITY - 1)
    ok = do_push & (events.count < EVENT_CAPACITY)
    hot = ok[..., None] & (jnp.arange(EVENT_CAPACITY) == slot[..., None])  # [..., Q]
    put = lambda buf, new: jnp.where(hot, new[..., None], buf)
    return events.replace(
        target=put(events.target, jnp.asarray(target)),
        input=put(events.input, jnp.asarray(input_id)),
        ptype=put(events.ptype, jnp.asarray(ptype)),
        count=events.count + ok.astype(jnp.int32),
        dropped=events.dropped + (do_push & ~ok).astype(jnp.int32),
    )


def _forward_xyz(yaw, pitch):
    """Player/camera forward (-Z at yaw 0), batched [B]."""
    cp = jnp.cos(pitch)
    return jnp.stack([-jnp.sin(yaw) * cp, jnp.sin(pitch), -jnp.cos(yaw) * cp], -1)


def step_batch(cmap, state: EnvState, actions: Actions) -> EnvState:
    n = cmap.num_actors
    B = state.tick.shape[0]
    delta = 1.0
    p = state.player
    btn = actions.buttons  # [B, K]
    fired, fired_pi = signals.empty_fired(n)
    fired = jnp.broadcast_to(fired, (B, *fired.shape))
    fired_pi = jnp.broadcast_to(fired_pi, (B, *fired_pi.shape))

    # ------------------------------------------------- toggles (UpdatePlayer)
    freecam = jnp.logical_xor(p.freecam, btn[:, Button.FREECAM] & ~p.noclip)
    noclip = jnp.logical_xor(p.noclip, btn[:, Button.NOCLIP] & ~freecam)
    allow = state.camera_actor < 0  # MapFixedUpdate allowMovement

    # ---------------------------------------- camera look (UpdatePlayerCamera)
    yaw = p.yaw + jnp.where(allow, actions.look[:, 0], 0.0)
    pitch = clamp(p.pitch + jnp.where(allow, actions.look[:, 1], 0.0), -jnp.pi / 2, jnp.pi / 2)

    # ------------------------------------------------- MovePlayer velocity
    move = actions.move * jnp.where(allow, 1.0, 0.0)[:, None]
    mlen = jnp.linalg.norm(move, axis=-1)
    mdir = jnp.where((mlen > 1e-6)[:, None], move / jnp.maximum(mlen, 1e-6)[:, None], 0.0)
    speed = jnp.where(
        btn[:, Button.SLOW] & allow,
        SLOW_MOVE_SPEED,
        jnp.where((freecam | noclip) & btn[:, Button.SPRINT], MOVE_SPEED * 2, MOVE_SPEED),
    )
    has_move = mlen > 1e-6
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # world move = R_y(yaw) @ (mx, 0, mz) — the reference rotates moveVec by
    # the Y-axis quat of the player rotation (PlayerPhysics.c:268-273):
    # x' = mx cos + mz sin, z' = -mx sin + mz cos. W (mz=-1) then walks along
    # the camera forward (-sin, -cos) for every yaw.
    flat = jnp.stack(
        [mdir[:, 0] * cy + mdir[:, 1] * sy, jnp.zeros(B), -mdir[:, 0] * sy + mdir[:, 1] * cy], -1
    )
    look_fwd = _forward_xyz(yaw, pitch)
    look_right = jnp.stack([cy, jnp.zeros(B), -sy], -1)
    full = look_right * mdir[:, 0:1] + (-look_fwd) * mdir[:, 1:2]
    move_vec = jnp.where((freecam | noclip)[:, None], full, flat) * (speed * has_move)[:, None]

    airborne = ~(noclip | p.on_ground)
    vel_y = jnp.where(
        airborne,
        move_vec[:, 1] + p.vel[:, 1] + GRAVITY * (delta / TPS),
        jnp.where(btn[:, Button.JUMP] & allow & ~freecam, JUMP_SPEED, move_vec[:, 1]),
    )
    vel = jnp.stack([move_vec[:, 0], vel_y, move_vec[:, 2]], -1)

    # freecam: move the detached camera instead (PlayerPhysics.c:274-279)
    freecam_pos = jnp.where(
        freecam[:, None],
        p.freecam_pos + move_vec * (delta / TPS),
        p.pos + jnp.array([0.0, 0.25, 0.0]),
    )

    # ------------------- interaction raycast (UpdatePlayer) + laser beams
    # The player's interact ray (PlayerPhysics.c:297-315) and every laser's
    # hitscan (Laser.c:127-158) share ONE kernel launch: per-ray max_dist /
    # exclude / require_flags make the set heterogeneous. Laser occluders
    # (CAN_BLOCK_LASERS) are never touched by the contact phase that sits
    # between here and where the beam lengths are consumed, so casting them
    # early is behavior-preserving.
    import numpy as np

    from c_game_engine_tpu.utils.mathx import quat_rotate

    cam_pos = p.pos + jnp.array([0.0, 0.25, 0.0])  # camera y offset
    ray_dir = _forward_xyz(yaw, pitch)
    laser_rows = np.where(np.asarray(cmap.cls) == int(ActorClass.LASER))[0]
    L = len(laser_rows)
    laser_hit_rays = laser_frac_rays = l_of = None
    if L:
        l_of = jnp.asarray(laser_rows.astype(np.int32))
        lorig = state.actors.pos[:, l_of]  # [B, L, 3]
        lquat = state.actors.quat[:, l_of].reshape(B * L, 4)
        ldirs = quat_rotate(
            lquat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (B * L, 3))
        ).reshape(B, L, 3)
        # kind-major ray layout (all interact rays, then each laser's rays):
        # a laser sits at the same spot in every env, so each 128-ray kernel
        # block gets a tight chunk list (ops/chunk_compact.py); interleaving
        # would smear every block's AABB across all ray kinds
        origins = jnp.concatenate(
            [cam_pos, lorig.transpose(1, 0, 2).reshape(L * B, 3)], 0
        )
        dirs = jnp.concatenate(
            [ray_dir, ldirs.transpose(1, 0, 2).reshape(L * B, 3)], 0
        )
        by_kind = lambda head, rest: jnp.concatenate(
            [jnp.broadcast_to(head, (B,) + head.shape[1:]), jnp.repeat(rest, B, 0)]
        )
        maxd = by_kind(jnp.array([ACTOR_RAYCAST_MAX_DISTANCE]), jnp.full((L,), 50.0))
        excl = by_kind(jnp.array([-1], jnp.int32), cmap.siparams[l_of, 1].astype(jnp.int32))
        rfl = by_kind(
            jnp.array([0], jnp.int32),
            jnp.full((L,), int(ActorFlags.CAN_BLOCK_LASERS), jnp.int32),
        )
        # triple lasers hit only the static world (Laser.c:64-72 restricts
        # them to BROAD_PHASE_LAYER_STATIC; normal lasers also hit dynamic
        # bodies that pass the CAN_BLOCK_LASERS body filter)
        from c_game_engine_tpu.actors.defs import LaserHeight

        trip = cmap.siparams[l_of, 0] == int(LaserHeight.TRIPLE)
        stat = by_kind(jnp.array([False]), trip)
        mhit, mfrac, mact = batched.cast_rays_batched(
            cmap, state.actors, origins, dirs, maxd, exclude=excl, require_flags=rfl,
            B_env=B, static_only=stat, layout="kind_major",
        )
        mhit, mfrac, mact = (x.reshape(L + 1, B).T for x in (mhit, mfrac, mact))
        hit, frac, hit_actor = mhit[:, 0], mfrac[:, 0], mact[:, 0]
        laser_hit_rays, laser_frac_rays = mhit[:, 1:], mfrac[:, 1:]
    else:
        hit, frac, hit_actor = batched.cast_rays_batched(
            cmap, state.actors, cam_pos, ray_dir, ACTOR_RAYCAST_MAX_DISTANCE, B_env=B
        )
    targeted = jnp.where(hit & (hit_actor >= 0) & ~freecam, hit_actor, -1)
    close_enough = frac * ACTOR_RAYCAST_MAX_DISTANCE < 1.0

    interact_pressed = btn[:, Button.INTERACT] & allow & ~freecam
    has_held = p.held_actor >= 0
    tgt_c = jnp.clip(targeted, 0, n - 1)
    # one-hot row picks instead of [B]-indexed gathers (gather kernels
    # don't fuse on TPU; N is tiny so the dense contraction is free)
    tgt_oh = jnp.arange(n)[None, :] == tgt_c[:, None]  # [B, N]
    tgt_flags = jnp.where(targeted >= 0, jnp.sum(jnp.where(tgt_oh, cmap.flags[None, :], 0), 1), 0)
    tgt_cls = jnp.where(targeted >= 0, jnp.sum(jnp.where(tgt_oh, cmap.cls[None, :], 0), 1), -1)
    can_hold = (tgt_flags & int(ActorFlags.CAN_BE_HELD)) != 0
    can_interact = (tgt_flags & int(ActorFlags.INTERACTABLE)) != 0
    is_enemy = (tgt_flags & int(ActorFlags.ENEMY)) != 0

    # ---- item scroll switching (MapFixedUpdate, MapPhysics.c:92-99) ----
    NUM_ITEMS = 2  # eraser, laser stopper
    owned = state.save.item_mask
    cur0 = state.save.current_item

    def cycle(cur, direction):
        c = cur
        for off in range(1, NUM_ITEMS + 1):
            cand = jnp.mod(cur + direction * off, NUM_ITEMS)
            has = (owned >> cand) & 1
            c = jnp.where((c == cur) & (has == 1), cand, c)
        return c

    want_next = btn[:, Button.ITEM_NEXT] & allow
    want_prev = btn[:, Button.ITEM_PREV] & allow
    cur_item = jnp.where(
        want_next & (cur0 >= 0), cycle(cur0, 1),
        jnp.where(want_prev & (cur0 >= 0), cycle(cur0, -1), cur0),
    )
    state = state.replace(save=state.save.replace(current_item=cur_item))

    # ---- items (EraserItem.c / LaserStopperItem.c FixedUpdate) ----
    fire_pressed = btn[:, Button.FIRE] & allow & ~freecam & ~has_held
    altfire_pressed = btn[:, Button.ALT_FIRE] & allow & ~freecam & ~has_held
    eraser_use = (cur_item == 0) & is_enemy & (targeted >= 0)
    erase_now = eraser_use & fire_pressed
    stopper_target = (cur_item == 1) & (tgt_cls == int(ActorClass.LASER_EMITTER))
    events = state.events
    events = _push_event(events, stopper_target & fire_pressed, targeted, int(Input.TURN_OFF))
    events = _push_event(events, stopper_target & altfire_pressed, targeted, int(Input.TURN_ON))
    state = state.replace(events=events)
    item_target = eraser_use | stopper_target

    onehot_t = jnp.arange(n)[None, :] == targeted[:, None]  # [B, N]
    erase_mask = onehot_t & erase_now[:, None] & state.actors.active
    state, fired, fired_pi = _remove_actors_b(state, fired, fired_pi, erase_mask)

    # ---- pick up / interact (PlayerPhysics.c:396-431) ----
    pickup = interact_pressed & ~has_held & ~item_target & can_hold & close_enough & (targeted >= 0)
    do_interact = (
        interact_pressed & ~has_held & ~item_target & ~can_hold & can_interact & close_enough & (targeted >= 0)
    )

    # button Interact (Button.c:ButtonInteract)
    actors = state.actors
    bmask = onehot_t & do_interact[:, None] & (cmap.cls == int(ActorClass.BUTTON))[None, :] & actors.active
    b_pressed = actors.idata[..., 0] != 0
    toggle = (cmap.siparams[:, 2] != 0)[None, :]
    effective = bmask & (~b_pressed | toggle)
    new_pressed = jnp.where(effective, ~b_pressed, b_pressed)
    actors = actors.replace(
        idata=actors.idata.at[..., 0].set(
            jnp.where(effective, new_pressed.astype(jnp.int32), actors.idata[..., 0])
        ),
        skin=jnp.where(
            effective,
            jnp.where(new_pressed, cmap.siparams[None, :, 1], cmap.siparams[None, :, 0]),
            actors.skin,
        ),
        fdata=actors.fdata.at[..., 0].set(
            jnp.where(effective, state.tick.astype(jnp.float32)[:, None], actors.fdata[..., 0])
        ),
    )
    fired, fired_pi = signals.fire(fired, fired_pi, effective & new_pressed, Output.PRESSED)
    fired, fired_pi = signals.fire(fired, fired_pi, effective & ~new_pressed, Output.UNPRESSED)

    # item_eraser Interact = pickup (ItemEraser.c:ItemEraserInteracted)
    emask = onehot_t & do_interact[:, None] & (cmap.cls == int(ActorClass.ITEM_ERASER))[None, :] & actors.active
    state = state.replace(actors=actors)
    any_e = jnp.any(emask, axis=1)
    state = state.replace(
        save=state.save.replace(
            item_mask=jnp.where(any_e, state.save.item_mask | 1, state.save.item_mask),
            current_item=jnp.where(any_e, 0, state.save.current_item),
        )
    )
    state, fired, fired_pi = _remove_actors_b(state, fired, fired_pi, emask)
    actors = state.actors

    # ---- held actor spring (PlayerPhysics.c:344-386) ----
    held_idx = jnp.clip(p.held_actor, 0, n - 1)
    held_oh = jnp.arange(n)[None, :] == held_idx[:, None]  # [B, N] one-hot
    held_alive = has_held & jnp.any(held_oh & actors.active, 1)
    held_pos = jnp.sum(jnp.where(held_oh[..., None], actors.pos, 0.0), 1)
    held_off = held_pos - p.pos
    too_far = jnp.sum(held_off * held_off, -1) > HELD_MAX_DIST_SQ
    # E only drops when the character wasn't contacting the held body last
    # tick (canDropHeldActor veto, PlayerPhysics.c:95-101,338-339)
    drop = has_held & ((interact_pressed & p.can_drop_held) | too_far | ~held_alive)
    keep_held = held_alive & ~drop
    yaw_fwd = jnp.stack([-sy, jnp.zeros(B), -cy], -1)
    target_pt = yaw_fwd * HELD_OFFSET
    spring_vel = (target_pt - held_off) * HELD_SMOOTH
    target_quat = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
    held_quat = jnp.sum(jnp.where(held_oh[..., None], actors.quat, 0.0), 1)
    new_quat = quat_normalize(quat_lerp(held_quat, target_quat, 0.2))
    held_onehot = held_oh & keep_held[:, None]
    actors = actors.replace(
        vel=jnp.where(held_onehot[..., None], spring_vel[:, None, :], actors.vel),
        omega=jnp.where(held_onehot[..., None], 0.0, actors.omega),
        quat=jnp.where(held_onehot[..., None], new_quat[:, None, :], actors.quat),
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

    # ------------------------------------ character update (ExtendedUpdate)
    old_xz = p.pos[:, jnp.array([0, 2])]
    held_i32 = held_actor.astype(jnp.int32)
    new_pos, new_vel, on_ground = batched.update_character_batched(
        cmap,
        state.actors,
        p.pos,
        vel,
        delta / TPS,
        p.on_ground,
        btn[:, Button.JUMP] & allow,
        noclip,
        exclude_idx=held_i32,
    )
    new_pos = jnp.where(freecam[:, None], p.pos, new_pos)
    new_vel = jnp.where(freecam[:, None], p.vel, new_vel)

    # canDropHeldActor for NEXT tick (PlayerPhysics.c:95-101): a candidate
    # contact between the character and the held body this tick vetoes the
    # next E-drop. Single-box capsule overlap test at the post-update pose.
    from c_game_engine_tpu.physics import geometry_soa as gsoa
    from c_game_engine_tpu.physics.character import (
        CAPSULE_HALF_HEIGHT,
        CAPSULE_RADIUS,
    )

    held_next_oh = (jnp.arange(n)[None, :] == jnp.clip(held_i32, 0, n - 1)[:, None]) & (
        held_i32 >= 0
    )[:, None]
    hb_pos = jnp.sum(jnp.where(held_next_oh[..., None], state.actors.pos, 0.0), 1)
    hb_quat = jnp.sum(jnp.where(held_next_oh[..., None], state.actors.quat, 0.0), 1)
    pick_row = lambda a: jnp.sum(jnp.where(held_next_oh, a[None, :], 0.0), 1)
    hqx, hqy, hqz, hqw = (hb_quat[:, k] for k in range(4))
    scx, scy, scz = (pick_row(cmap.shape_center[:, k]) for k in range(3))
    rx_, ry_, rz_ = gsoa.quat_rotate_soa(hqx, hqy, hqz, hqw, scx, scy, scz)
    hox, hoy, hoz = hb_pos[:, 0] + rx_, hb_pos[:, 1] + ry_, hb_pos[:, 2] + rz_
    hhx, hhy, hhz = (pick_row(cmap.halfext[:, k]) for k in range(3))
    cpx, cpy, cpz = new_pos[:, 0], new_pos[:, 1], new_pos[:, 2]
    sy0c, sy1c = cpy - CAPSULE_HALF_HEIGHT, cpy + CAPSULE_HALF_HEIGHT
    wx, wy, wz = gsoa.closest_point_on_obb_soa(
        cpx, cpy, cpz, hox, hoy, hoz, hqx, hqy, hqz, hqw, hhx, hhy, hhz
    )
    for _ in range(2):
        spx, spy, spz = gsoa.closest_point_on_vseg_soa(wx, wy, wz, cpx, sy0c, sy1c, cpz)
        wx, wy, wz = gsoa.closest_point_on_obb_soa(
            spx, spy, spz, hox, hoy, hoz, hqx, hqy, hqz, hqw, hhx, hhy, hhz
        )
    spx, spy, spz = gsoa.closest_point_on_vseg_soa(wx, wy, wz, cpx, sy0c, sy1c, cpz)
    hdist = jnp.sqrt((spx - wx) ** 2 + (spy - wy) ** 2 + (spz - wz) ** 2)
    # Jolt CharacterVirtual collects candidate contacts within its 0.02
    # character padding
    touching = (held_i32 >= 0) & (hdist - CAPSULE_RADIUS < 0.02)
    can_drop_next = allow & ~touching

    # -------------------------------------------- view bob (MapPhysics.c:76-84)
    dist = jnp.linalg.norm(new_pos[:, jnp.array([0, 2])] - old_xz, axis=-1)
    bob_h = remap(dist, 0.0, MOVE_SPEED / TPS, 0.0, 0.1)
    # phase runs on the engine-uptime physicsFrame (MapPhysics.c:84), not
    # the per-map tick, so it is continuous across map changes
    view_bob = 0.1 + jnp.sin(jnp.mod(state.frame.astype(jnp.float32) / 7.0, 2.0 * jnp.pi)) * bob_h

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
            held_actor=held_i32,
            targeted_actor=targeted.astype(jnp.int32),
            targeted_fraction=frac,
            can_drop_held=can_drop_next,
            view_bob=view_bob,
            crosshair=crosshair.astype(jnp.int32),
        )
    )

    # ---------------------------------------- sensor contact callbacks (vmap)
    state, fired, fired_pi = jax.vmap(
        lambda s, f, fp: behaviors.contact_phase(cmap, s, f, fp)
    )(state, fired, fired_pi)

    # -------- laser beam lengths (rays already cast in the merged launch)
    laser_hit = jnp.zeros((B, n), bool)
    laser_len = jnp.zeros((B, n), jnp.float32)
    if L:
        laser_hit = laser_hit.at[:, l_of].set(laser_hit_rays)
        laser_len = laser_len.at[:, l_of].set(50.0 * laser_frac_rays)

    # ------------------------------------------------- actor updates (vmap)
    camera_pos = jnp.where(freecam[:, None], freecam_pos, new_pos + jnp.array([0.0, 0.25, 0.0]))
    state, fired, fired_pi = jax.vmap(
        lambda s, f, fp, cp, lh, ll: behaviors.update_actors(cmap, s, f, fp, delta, cp, lh, ll)
    )(state, fired, fired_pi, camera_pos, laser_hit, laser_len)

    # ---------------------------------------------- signal propagation (vmap)
    rounds = cmap.aux.get("signal_rounds", 4) if cmap.aux else 4
    state = jax.vmap(lambda s, f, fp: signals.process_signals(cmap, s, f, fp, rounds=rounds))(
        state, fired, fired_pi
    )

    # --------------------------------------------- physics (2 substeps)
    (bpos, bquat, bvel, bomega, bsleep,
     bwarm_n, bwarm_pair, bwarm_pair_idx) = batched.step_bodies_batched(
        cmap, state.actors, state.player.pos, state.player.vel, delta / TPS, n_substeps=2
    )
    state = state.replace(
        actors=state.actors.replace(
            pos=bpos, quat=bquat, vel=bvel, omega=bomega, sleep=bsleep,
            warm_n=bwarm_n, warm_pair=bwarm_pair, warm_pair_idx=bwarm_pair_idx
        )
    )

    # --------------------------------- audio channel bookkeeping (one tick)
    # Both stages are gated batch-globally so silent workloads pay one
    # reduction each: sound-op drain (events queued by handlers/coins) and
    # per-channel advance (only while something is playing).
    ops_any = jnp.any(state.sound_ops != 0)
    state = jax.lax.cond(ops_any, lambda s: _apply_sound_ops(cmap, s), lambda s: s, state)

    live_any = jnp.any(state.audio.snd >= 0)
    state = jax.lax.cond(
        live_any, lambda s: _advance_audio_tick(cmap, s), lambda s: s, state
    )

    # ------------------------------------------- save clamps (MapUpdate)
    save = state.save.replace(
        coins=jnp.minimum(state.save.coins, 9999),
        blue_coins=jnp.minimum(state.save.blue_coins, 5),
    )
    return state.replace(save=save, tick=state.tick + 1, frame=state.frame + 1)


def _apply_sound_ops(cmap, state: EnvState) -> EnvState:
    """Drain the per-actor sound-op bits into channel-table operations
    (SoundPlayer Play/Pause/Resume/Stop handlers + Coin.c:83 coincling).

    Op collapse note: bits accumulate across signal rounds, so a stop fired
    in an earlier round than a play on the SAME actor applies to the old
    channel (stop/pause/resume act on pre-play handles, then plays
    allocate). Game content never stacks ops on one actor in one tick.
    """
    from c_game_engine_tpu.audio.mixer import alloc_channels, set_paused, stop_channels

    names = (cmap.aux or {}).get("sound_names", ())
    cling = (
        names.index("sound/sfx/coincling.gsnd")
        if "sound/sfx/coincling.gsnd" in names
        else -1
    )

    def one_env(state):
        ops = state.sound_ops
        actors = state.actors
        play = (ops & 1) != 0
        pause = (ops & 2) != 0
        stop = (ops & 4) != 0
        resume = (ops & 8) != 0
        cling_m = (ops & 16) != 0
        audio = state.audio
        n_ch = audio.snd.shape[0]
        ch_ids = jnp.arange(n_ch, dtype=jnp.int32)[None, :]
        handles = actors.idata[:, 1]

        def ch_mask_of(actor_mask):
            return jnp.any(actor_mask[:, None] & (handles[:, None] == ch_ids), axis=0)

        audio = set_paused(audio, ch_mask_of(pause), True)
        audio = set_paused(audio, ch_mask_of(resume), False)
        audio = stop_channels(audio, ch_mask_of(stop))
        # plays allocate fresh channels; the new handle replaces the
        # actor's (PlaySoundEx replaces data->effect — the prior channel
        # keeps playing, unreferenced)
        audio, handle = alloc_channels(
            audio,
            play,
            cmap.siparams[:, 0],       # sound id (build_sound_player)
            cmap.sfparams[:, 0],       # volume
            cmap.siparams[:, 1],       # category
            cmap.siparams[:, 2],       # loops
            cmap.siparams[:, 3] != 0,  # positional
            actors.pos,
        )
        n = play.shape[0]
        audio, _ = alloc_channels(
            audio,
            cling_m,
            jnp.full((n,), cling, jnp.int32),
            jnp.ones((n,), jnp.float32),
            jnp.full((n,), 1, jnp.int32),  # SOUND_CATEGORY_SFX
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), bool),
            actors.pos,
        )
        handles = jnp.where(play, handle, jnp.where(stop, -1, handles))
        actors = actors.replace(idata=actors.idata.at[:, 1].set(handles))
        return state.replace(
            actors=actors, audio=audio, sound_ops=jnp.zeros_like(ops)
        )

    return jax.vmap(one_env)(state)


def _advance_audio_tick(cmap, state: EnvState) -> EnvState:
    """One tick of channel clock: loop/finish bookkeeping; finished channels
    null the owning actor's handle (SoundPlayerSoundDone)."""
    from c_game_engine_tpu.audio.mixer import tick_advance

    def one_env(audio, handles):
        audio, fin = tick_advance(audio, cmap.sound_len)
        nch = audio.snd.shape[0]
        hit = (handles[:, None] == jnp.arange(nch, dtype=jnp.int32)[None, :]) & fin[None, :]
        return audio, jnp.where(jnp.any(hit, axis=1), -1, handles)

    audio, handles = jax.vmap(one_env)(state.audio, state.actors.idata[:, :, 1])
    return state.replace(
        audio=audio,
        actors=state.actors.replace(idata=state.actors.idata.at[:, :, 1].set(handles)),
    )


def step(cmap, state: EnvState, actions: Actions) -> EnvState:
    """Single-env tick (batch-of-1 wrapper around step_batch)."""
    b_state = jax.tree.map(lambda x: x[None], state)
    b_actions = jax.tree.map(lambda x: x[None], actions)
    out = step_batch(cmap, b_state, b_actions)
    return jax.tree.map(lambda x: x[0], out)


def _remove_actors_b(state, fired, fired_pi, mask):
    """Batched RemoveActor (mask [B, N])."""
    fired, fired_pi = signals.fire(fired, fired_pi, mask, Output.KILLED)
    actors = state.actors.replace(
        active=state.actors.active & ~mask,
        visible=state.actors.visible & ~mask,
    )
    B, n = mask.shape
    p = state.player
    rows = jnp.arange(n)[None, :]
    tgt_killed = (p.targeted_actor >= 0) & jnp.any(mask & (rows == p.targeted_actor[:, None]), 1)
    held_killed = (p.held_actor >= 0) & jnp.any(mask & (rows == p.held_actor[:, None]), 1)
    p = p.replace(
        targeted_actor=jnp.where(tgt_killed, -1, p.targeted_actor),
        held_actor=jnp.where(held_killed, -1, p.held_actor),
    )
    return state.replace(actors=actors, player=p), fired, fired_pi
