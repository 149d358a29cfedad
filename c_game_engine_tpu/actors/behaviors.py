"""Per-tick vectorized actor behavior: sensor contact phase + per-class
Update() phase.

Replaces the reference's per-actor Update dispatch loop
(MapPhysics.c:86-90) and the CharacterVirtual contact-listener callbacks
(PlayerPhysics.c:103-152) with masked SoA updates. Per-class citations
inline.
"""

from __future__ import annotations

import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import (
    ActorClass,
    ActorFlags,
    DoorState,
    LaserHeight,
    Output,
)
from c_game_engine_tpu.actors.handlers import door_set_state, remove_actors
from c_game_engine_tpu.actors.signals import fire
from c_game_engine_tpu.physics.raycast import cast_ray
from c_game_engine_tpu.physics.sensors import sensor_overlap
from c_game_engine_tpu.utils.mathx import lerp, quat_from_axis_angle, quat_rotate

TPS = 60.0


def compute_laser_rays(cmap, actors):
    """Laser hitscan for one env (fallback path when update_actors is called
    outside step_batch; the batched path uses
    physics.batched.cast_rays_batched). Returns (hit [N], len [N])."""
    import jax

    n = cmap.num_actors
    from c_game_engine_tpu.physics.batched import cast_rays_batched

    is_laser = cmap.cls == int(ActorClass.LASER)
    fwd = quat_rotate(actors.quat, jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (n, 3)))
    b_actors = jax.tree.map(lambda x: x[None], actors)
    hit, frac, _ = cast_rays_batched(
        cmap,
        b_actors,
        actors.pos,
        fwd,
        50.0,
        exclude=cmap.siparams[:, 1],
        require_flags=int(ActorFlags.CAN_BLOCK_LASERS),
        B_env=1,
    )
    return hit & is_laser, 50.0 * frac


# ---------------------------------------------------------------------------
# contact phase (player capsule vs sensors)
# ---------------------------------------------------------------------------


def contact_phase(cmap, state, fired, fired_pi):
    """Compute sensor overlap edges and run the contact handlers of the
    owning actors (door/trigger/coin/goal/item_eraser)."""
    actors = state.actors
    n = cmap.num_actors
    overlap = sensor_overlap(cmap, actors, state.player.pos)
    prev = state.sensor_inside
    added_s = overlap & ~prev
    persisted_s = overlap & prev
    removed_s = ~overlap & prev

    # per-actor masks (dense sensor->owner one-hot; scatters are slow on TPU)
    owner_mat = cmap.sensor_owner[:, None] == jnp.arange(n)[None, :]  # [S, N]

    def to_actor(mask_s):
        return jnp.any(owner_mat & mask_s[:, None], axis=0)

    added = to_actor(added_s) & actors.active
    persisted = to_actor(persisted_s) & actors.active
    removed = to_actor(removed_s) & actors.active
    cls = cmap.cls

    # ---- coin (Coin.c:CoinOnPlayerContactAdded) ----
    coin_hit = added & (cls == int(ActorClass.COIN))
    is_blue = cmap.siparams[:, 0] != 0
    got_blue = jnp.sum((coin_hit & is_blue).astype(jnp.int32))
    got_norm = jnp.sum((coin_hit & ~is_blue).astype(jnp.int32))
    save = state.save.replace(
        coins=state.save.coins + got_norm + 5 * got_blue,
        blue_coins=state.save.blue_coins + got_blue,
    )
    # PlaySound(SOUND("sfx/coincling"), SOUND_CATEGORY_SFX) per pickup
    # (Coin.c:83): queue the one-shot cling bit, drained with the other
    # sound ops once per tick (core/step.py _apply_sound_ops)
    state = state.replace(
        save=save,
        sound_ops=state.sound_ops | (coin_hit.astype(jnp.int32) << 4),
        sound_plays=state.sound_plays + got_blue + got_norm,
    )
    fired, fired_pi = fire(fired, fired_pi, coin_hit, Output.COLLECTED)
    state, fired, fired_pi = remove_actors(state, fired, fired_pi, coin_hit)

    # ---- goal (Goal.c:GoalOnPlayerContactAdded) ----
    goal_hit = added & (cls == int(ActorClass.GOAL)) & (state.actors.idata[:, 0] != 0)
    save = state.save.replace(coins=state.save.coins + 10 * jnp.sum(goal_hit.astype(jnp.int32)))
    state = state.replace(save=save)
    fired, fired_pi = fire(fired, fired_pi, goal_hit, Output.COLLECTED)
    state, fired, fired_pi = remove_actors(state, fired, fired_pi, goal_hit)

    # ---- trigger (Trigger.c:70-100) ----
    actors = state.actors
    enabled = actors.idata[:, 0] != 0
    one_shot = cmap.siparams[:, 0] != 0
    trig = cls == int(ActorClass.TRIGGER)
    t_added = added & trig & enabled
    t_pers = persisted & trig & enabled & ~one_shot
    t_removed = removed & trig & enabled
    fired, fired_pi = fire(fired, fired_pi, t_added, Output.ENTERED)
    fired, fired_pi = fire(fired, fired_pi, t_added | t_pers, Output.TRIGGERED)
    fired, fired_pi = fire(fired, fired_pi, t_removed, Output.EXITED)
    state, fired, fired_pi = remove_actors(
        state, fired, fired_pi, t_removed & one_shot
    )

    # ---- door (Door.c:243-316) ----
    actors = state.actors
    door = cls == int(ActorClass.DOOR)
    dstate = actors.idata[:, 0]
    anim = actors.fdata[:, 0]
    width = cmap.sfparams[:, 0]
    stay_open = cmap.siparams[:, 0] != 0

    # OnPlayerContactAdded: CLOSED->OPENING(0), CLOSING->OPENING(width-anim);
    # also clears shouldClose
    d_added = added & door
    go_open0 = d_added & (dstate == int(DoorState.CLOSED))
    go_open_rev = d_added & (dstate == int(DoorState.CLOSING))
    # OnPlayerContactPersisted: OPENING with anim done -> OPEN
    d_pers = persisted & door
    pers_done = d_pers & (dstate == int(DoorState.OPENING)) & (anim >= width)
    # OnPlayerContactRemoved
    d_rem = removed & door
    rem_close_now = (
        d_rem & (dstate == int(DoorState.OPEN)) & ~stay_open & (anim >= width)
    )
    rem_should_close = (
        d_rem
        & (
            ((dstate == int(DoorState.OPEN)) & ~(~stay_open & (anim >= width)))
            | (dstate == int(DoorState.OPENING))
        )
        & ~stay_open
    )

    should_close = actors.idata[:, 1]
    should_close = jnp.where(d_added, 0, should_close)
    should_close = jnp.where(rem_should_close, 1, should_close)
    actors = actors.replace(idata=actors.idata.at[:, 1].set(should_close))

    mask = go_open0 | go_open_rev | pers_done | rem_close_now
    new_state = jnp.where(
        go_open0 | go_open_rev,
        int(DoorState.OPENING),
        jnp.where(pers_done, int(DoorState.OPEN), int(DoorState.CLOSING)),
    )
    new_anim = jnp.where(go_open_rev, width - anim, 0.0)
    actors, fired, fired_pi = door_set_state(
        cmap, actors, fired, fired_pi, mask, new_state, new_anim
    )
    state = state.replace(actors=actors)

    # ---- item_eraser pickup on touch (ItemEraser.c:OnPlayerContactAdded) ----
    eraser_hit = added & (cls == int(ActorClass.ITEM_ERASER))
    has_eraser = (state.save.item_mask & 1) != 0
    always_give = False  # per-actor param unused in shipped maps
    give = eraser_hit & (~has_eraser | always_give)
    switch_only = eraser_hit & has_eraser
    any_give = jnp.any(give)
    save = state.save.replace(
        item_mask=jnp.where(any_give, state.save.item_mask | 1, state.save.item_mask),
        current_item=jnp.where(any_give | jnp.any(switch_only), 0, state.save.current_item),
    )
    state = state.replace(save=save)
    state, fired, fired_pi = remove_actors(state, fired, fired_pi, give)

    state = state.replace(sensor_inside=overlap)
    return state, fired, fired_pi


# ---------------------------------------------------------------------------
# update phase (per-class Update(), MapPhysics.c:86-90)
# ---------------------------------------------------------------------------


def update_actors(cmap, state, fired, fired_pi, delta, camera_pos, laser_hit=None, laser_len=None):
    if laser_hit is None:
        laser_hit, laser_len = compute_laser_rays(cmap, state.actors)
    actors = state.actors
    n = cmap.num_actors
    cls = cmap.cls
    active = actors.active
    tick = state.tick

    # ---- io_proxy first tick (IoProxy.c:IoProxyUpdate) ----
    first = active & (cls == int(ActorClass.IO_PROXY)) & (tick == 0)
    fired, fired_pi = fire(fired, fired_pi, first, Output.FIRST_TICK)

    # ---- coin animation (Coin.c:CoinUpdate): every 8th physicsFrame
    # (engine uptime, NOT the per-map tick — Coin.c:60 reads
    # GetState()->physicsFrame, so the phase persists across map changes)
    # advance the 4-frame uv animation ----
    coin = active & (cls == int(ActorClass.COIN))
    advance = coin & (state.frame % 8 == 0)
    frame = jnp.where(advance, (actors.idata[:, 0] + 1) % 4, actors.idata[:, 0])
    actors = actors.replace(idata=actors.idata.at[:, 0].set(jnp.where(coin, frame, actors.idata[:, 0])))
    # uv offset x = 0.25 * frame is derived in the renderer from idata[0]

    # ---- Y-billboarding (ActorWall.c:56-71; coin/goal/npc_john callers) ----
    bb = active & cmap.billboard
    yaw = jnp.arctan2(
        camera_pos[0] - actors.pos[:, 0], camera_pos[2] - actors.pos[:, 2]
    )
    yaw = yaw + jnp.where(cmap.wall_axis == 1, jnp.pi / 2, 0.0)
    bb_quat = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
    actors = actors.replace(quat=jnp.where(bb[:, None], bb_quat, actors.quat))

    # ---- door FSM timeouts (Door.c:DoorUpdate) ----
    door = active & (cls == int(ActorClass.DOOR))
    dstate = actors.idata[:, 0]
    anim = actors.fdata[:, 0]
    width = cmap.sfparams[:, 0]
    stay_time = cmap.sfparams[:, 1]
    should_close = actors.idata[:, 1] != 0
    opening_done = door & (dstate == int(DoorState.OPENING)) & (anim >= width)
    open_close = door & (dstate == int(DoorState.OPEN)) & (anim >= stay_time) & should_close
    closing_done = door & (dstate == int(DoorState.CLOSING)) & (anim >= width)
    mask = opening_done | open_close | closing_done
    new_state = jnp.where(
        opening_done,
        int(DoorState.OPEN),
        jnp.where(open_close, int(DoorState.CLOSING), int(DoorState.CLOSED)),
    )
    actors, fired, fired_pi = door_set_state(
        cmap, actors, fired, fired_pi, mask, new_state, jnp.zeros(n)
    )
    # shouldClose clears when consumed (open_close) or when fully closed
    sc = actors.idata[:, 1]
    sc = jnp.where(open_close | closing_done, 0, sc)
    actors = actors.replace(idata=actors.idata.at[:, 1].set(sc))
    # animationTime += delta / TPS (Door.c:203) — anim is in seconds
    actors = actors.replace(
        fdata=actors.fdata.at[:, 0].set(
            jnp.where(door, actors.fdata[:, 0] + delta / TPS, actors.fdata[:, 0])
        )
    )

    # ---- button auto-reset (Button.c:ButtonUpdate) ----
    button = active & (cls == int(ActorClass.BUTTON))
    pressed = actors.idata[:, 0] != 0
    reset_ticks = cmap.siparams[:, 3]
    expired = (
        button
        & pressed
        & (reset_ticks >= 0)
        & ((tick.astype(jnp.float32) - actors.fdata[:, 0]) >= reset_ticks)
    )
    actors = actors.replace(
        idata=actors.idata.at[:, 0].set(jnp.where(expired, 0, actors.idata[:, 0])),
        skin=jnp.where(expired, cmap.siparams[:, 0], actors.skin),
    )
    fired, fired_pi = fire(fired, fired_pi, expired, Output.UNPRESSED)

    # ---- laser beam + uv scroll (Laser.c:LaserUpdate) ----
    # the actual raycasts run in the batched kernel (physics/batched.py,
    # called from core/step.py); laser_hit/laser_len [N] carry the results
    laser_on = active & (cls == int(ActorClass.LASER)) & (actors.idata[:, 0] != 0)
    # on a miss the beam extends to its max length (Laser.c: fraction=1.0
    # when CastRay reports no hit), not the stale previous length
    beam_len = jnp.where(laser_hit, laser_len, 50.0)
    new_uv = jnp.mod(actors.fdata[:, 1] + delta / 8.0, 1.0)
    actors = actors.replace(
        fdata=actors.fdata.at[:, 0]
        .set(jnp.where(laser_on, beam_len, actors.fdata[:, 0]))
        .at[:, 1]
        .set(jnp.where(laser_on, new_uv, actors.fdata[:, 1]))
    )

    # ---- env interpolators (GlobalLight/Fog/Tonemap Update) ----
    # TPU note: all row selections below are dense one-hot contractions over
    # the tiny N axis instead of argmax+gather — vmapped gathers compile to
    # standalone gather kernels that dominate this (launch-bound) block.
    env = state.env
    # start_on: first Update applies the configured value instantly
    for klass in (ActorClass.GLOBAL_LIGHT, ActorClass.GLOBAL_FOG, ActorClass.TONEMAP_CONTROLLER):
        pending = active & (cls == int(klass)) & (actors.idata[:, 0] != 0)
        anyp = jnp.any(pending)
        # first pending row only (argmax semantics) as a dense mask
        sel = pending & (jnp.cumsum(pending.astype(jnp.int32)) == 1)
        pick_vec = lambda a, b: jnp.sum(jnp.where(sel[:, None], cmap.sfparams[:, a:b], 0.0), 0)
        pick_s = lambda c: jnp.sum(jnp.where(sel, cmap.sfparams[:, c], 0.0))
        if klass == ActorClass.GLOBAL_LIGHT:
            env = env.replace(
                light_color=jnp.where(anyp, pick_vec(0, 4), env.light_color)
            )
        elif klass == ActorClass.GLOBAL_FOG:
            env = env.replace(
                fog_color=jnp.where(anyp, pick_vec(0, 4), env.fog_color),
                fog_start=jnp.where(anyp, pick_s(4), env.fog_start),
                fog_end=jnp.where(anyp, pick_s(5), env.fog_end),
            )
        else:
            env = env.replace(
                exposure=jnp.where(anyp, pick_s(0), env.exposure)
            )
        actors = actors.replace(
            idata=actors.idata.at[:, 0].set(
                jnp.where(pending, 0, actors.idata[:, 0])
            )
        )

    # active interpolation channels (one-hot row picks, no gathers)
    def interp_chan(chan_actor, chan_start):
        oh = jnp.arange(n) == chan_actor  # [N], all-false when actor = -1
        total = jnp.maximum(
            jnp.sum(jnp.where(oh, cmap.siparams[:, 0].astype(jnp.float32), 0.0)), 1.0
        )
        ticks_into = (tick - chan_start).astype(jnp.float32)
        on = chan_actor >= 0
        f = jnp.clip(ticks_into / total, 0.0, 1.0)
        done = on & (ticks_into >= total)
        pick_vec = lambda a, b: jnp.sum(jnp.where(oh[:, None], cmap.sfparams[:, a:b], 0.0), 0)
        pick_s = lambda c: jnp.sum(jnp.where(oh, cmap.sfparams[:, c], 0.0))
        return on, f, done, pick_vec, pick_s

    on, f, done, pick_vec, pick_s = interp_chan(env.light_interp_actor, env.light_interp_start)
    env = env.replace(
        light_color=jnp.where(on, lerp(env.light_interp_prev, pick_vec(0, 4), f), env.light_color),
        light_interp_actor=jnp.where(done, -1, env.light_interp_actor),
    )
    on, f, done, pick_vec, pick_s = interp_chan(env.fog_interp_actor, env.fog_interp_start)
    env = env.replace(
        fog_color=jnp.where(on, lerp(env.fog_interp_prev[0:4], pick_vec(0, 4), f), env.fog_color),
        fog_start=jnp.where(on, lerp(env.fog_interp_prev[4], pick_s(4), f), env.fog_start),
        fog_end=jnp.where(on, lerp(env.fog_interp_prev[5], pick_s(5), f), env.fog_end),
        fog_interp_actor=jnp.where(done, -1, env.fog_interp_actor),
    )
    on, f, done, pick_vec, pick_s = interp_chan(env.tonemap_interp_actor, env.tonemap_interp_start)
    env = env.replace(
        exposure=jnp.where(on, lerp(env.tonemap_interp_prev, pick_s(0), f), env.exposure),
        tonemap_interp_actor=jnp.where(done, -1, env.tonemap_interp_actor),
    )

    state = state.replace(actors=actors, env=env)
    return state, fired, fired_pi
