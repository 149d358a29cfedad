"""Signal input handlers, vectorized as masked updates.

Each handler reproduces one RegisterActorInput callback from the reference
(citations inline). apply_round() consumes the whole event queue in one
vectorized pass: events are scattered into per-actor (input, param) lanes,
then every handler applies behind its mask.

Divergence from the reference's strictly sequential dispatch
(ActorTriggerInput, Actor.c:52-64): two events hitting the SAME actor with
the SAME input in the SAME round collapse (last event's param wins), except
counter add/subtract which accumulate. Distinct targets and distinct inputs
are exact. Game content never stacks same-input events in one tick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import (
    ActorClass,
    DecimalOp,
    DoorState,
    Input,
    LogicOp,
    Output,
)
from c_game_engine_tpu.actors.signals import fire
from c_game_engine_tpu.assets.kvlist import ParamType
from c_game_engine_tpu.utils.mathx import quat_rotate


def door_forward(actors_quat):
    """Door travel direction: +Z rotated by the door's quat
    (JPH_Quat_RotateAxisZ, Door.c:53-71)."""
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), actors_quat.shape[:-1] + (3,))
    return quat_rotate(actors_quat, z)


def door_set_state(cmap, actors, fired, fired_pi, mask, new_state, anim):
    """Vectorized DoorSetState (Door.c:73-105). mask: [N]; new_state/anim:
    [N] arrays (per-actor targets). Fires the transition outputs."""
    is_door = mask & (cmap.cls == int(ActorClass.DOOR))
    fwd = door_forward(actors.quat)
    closed_pos = cmap.init_pos
    open_pos = cmap.sfparams[:, 2:5]

    to_closed = is_door & (new_state == int(DoorState.CLOSED))
    to_opening = is_door & (new_state == int(DoorState.OPENING))
    to_open = is_door & (new_state == int(DoorState.OPEN))
    to_closing = is_door & (new_state == int(DoorState.CLOSING))

    vel = actors.vel
    pos = actors.pos
    vel = jnp.where((to_closed | to_open)[:, None], 0.0, vel)
    vel = jnp.where(to_opening[:, None], fwd, vel)
    vel = jnp.where(to_closing[:, None], -fwd, vel)
    pos = jnp.where(to_closed[:, None], closed_pos, pos)
    pos = jnp.where(to_open[:, None], open_pos, pos)

    idata = actors.idata.at[:, 0].set(jnp.where(is_door, new_state, actors.idata[:, 0]))
    fdata = actors.fdata.at[:, 0].set(jnp.where(is_door, anim, actors.fdata[:, 0]))

    fired, fired_pi = fire(fired, fired_pi, to_closed, Output.FULLY_CLOSED)
    fired, fired_pi = fire(fired, fired_pi, to_opening, Output.OPENING)
    fired, fired_pi = fire(fired, fired_pi, to_open, Output.FULLY_OPENED)
    fired, fired_pi = fire(fired, fired_pi, to_closing, Output.CLOSING)

    actors = actors.replace(vel=vel, pos=pos, idata=idata, fdata=fdata)
    return actors, fired, fired_pi


def remove_actors(state, fired, fired_pi, mask):
    """RemoveActor (Map.c:130-160): fire `killed`, deactivate, clear the
    player's targeted/held references."""
    fired, fired_pi = fire(fired, fired_pi, mask, Output.KILLED)
    actors = state.actors.replace(
        active=state.actors.active & ~mask,
        visible=state.actors.visible & ~mask,
    )
    idx = jnp.arange(mask.shape[0])
    p = state.player
    tgt_killed = (p.targeted_actor >= 0) & jnp.any(mask & (idx == p.targeted_actor))
    held_killed = (p.held_actor >= 0) & jnp.any(mask & (idx == p.held_actor))
    p = p.replace(
        targeted_actor=jnp.where(tgt_killed, -1, p.targeted_actor),
        held_actor=jnp.where(held_killed, -1, p.held_actor),
    )
    return state.replace(actors=actors, player=p), fired, fired_pi


def apply_round(cmap, state, fired, fired_pi, queue):
    """Apply every queued event in one vectorized pass."""
    n = cmap.num_actors
    actors = state.actors
    cls = cmap.cls
    q = queue

    live = jnp.arange(q.target.shape[0]) < q.count
    tgt = jnp.where(live, q.target, -1)

    # Dense event->actor one-hot [Q, N] (scatters are slow on TPU; this is
    # reused by every recv below). Game content never queues two events with
    # the same (target, input) in one round, so "sum over events" ==
    # "the event's value".
    onehot = (tgt[:, None] == jnp.arange(n)[None, :]) & live[:, None]  # [Q, N]

    def recv(input_id):
        ev = q.input == int(input_id)
        m = jnp.any(onehot & ev[:, None], axis=0)
        return m & actors.active

    def recv_param(input_id, want_types=()):
        ev = q.input == int(input_id)
        if want_types:
            tok = jnp.zeros_like(ev)
            for wt in want_types:
                tok = tok | (q.ptype == int(wt))
            ev = ev & tok
        sel = onehot & ev[:, None]  # [Q, N]
        m = jnp.any(sel, axis=0)
        self_f = sel.astype(jnp.float32)
        pf = jnp.einsum("qn,qk->nk", self_f, q.pf,
                        precision=jax.lax.Precision.HIGHEST)
        pi = jnp.sum(sel * q.pi[:, None], axis=0).astype(jnp.int32)
        return m & actors.active, pf, pi

    def m_cls(mask, *classes):
        ok = jnp.zeros_like(mask)
        for c in classes:
            ok = ok | (cls == int(c))
        return mask & ok

    # ---- kill (ActorDefinition.c:73-77; unregistered on io_proxy) ----
    kill_m = recv(Input.KILL) & (cls != int(ActorClass.IO_PROXY))
    state, fired, fired_pi = remove_actors(state, fired, fired_pi, kill_m)
    actors = state.actors

    # ---- door open/close (Door.c:214-240) ----
    dstate = actors.idata[:, 0]
    anim = actors.fdata[:, 0]
    width = cmap.sfparams[:, 0]
    open_m = m_cls(recv(Input.OPEN), ActorClass.DOOR)
    close_m = m_cls(recv(Input.CLOSE), ActorClass.DOOR)
    go_opening = open_m & (dstate == int(DoorState.CLOSED))
    go_opening_rev = open_m & (dstate == int(DoorState.CLOSING))
    go_closing = close_m & (dstate == int(DoorState.OPEN))
    go_closing_rev = close_m & (dstate == int(DoorState.OPENING))
    door_mask = go_opening | go_opening_rev | go_closing | go_closing_rev
    new_state = jnp.where(
        go_opening | go_opening_rev, int(DoorState.OPENING), int(DoorState.CLOSING)
    )
    new_anim = jnp.where(go_opening | go_closing, 0.0, width - anim)
    actors, fired, fired_pi = door_set_state(
        cmap, actors, fired, fired_pi, door_mask, new_state, new_anim
    )

    # ---- laser / emitter turn_on & turn_off (Laser.c:163-177,
    # LaserEmitter.c:152-166) ----
    on_m = recv(Input.TURN_ON)
    off_m = recv(Input.TURN_OFF)
    laser_on = m_cls(on_m, ActorClass.LASER)
    laser_off = m_cls(off_m, ActorClass.LASER)
    em_on = m_cls(on_m, ActorClass.LASER_EMITTER)
    em_off = m_cls(off_m, ActorClass.LASER_EMITTER)
    child = cmap.siparams[:, 2]  # emitter -> laser slot
    child_mat = child[:, None] == jnp.arange(n)[None, :]  # [N, N], static-ish
    child_on = jnp.any(child_mat & em_on[:, None], axis=0)
    child_off = jnp.any(child_mat & em_off[:, None], axis=0)
    turn_on = laser_on | (child_on & (cls == int(ActorClass.LASER)))
    turn_off = laser_off | (child_off & (cls == int(ActorClass.LASER)))
    actors = actors.replace(
        idata=actors.idata.at[:, 0].set(
            jnp.where(turn_on, 1, jnp.where(turn_off, 0, actors.idata[:, 0]))
        ),
        visible=jnp.where(turn_on, True, jnp.where(turn_off, False, actors.visible)),
        skin=jnp.where(
            em_on, cmap.siparams[:, 0] + 1, jnp.where(em_off, 0, actors.skin)
        ),
    )

    # ---- env set / set_instant (GlobalLight/Fog/TonemapController) ----
    env = state.env
    tick = state.tick
    interp_ticks = cmap.siparams[:, 0]
    set_all = recv(Input.SET)
    seti_all = recv(Input.SET_INSTANT)

    for klass in (ActorClass.GLOBAL_LIGHT, ActorClass.GLOBAL_FOG, ActorClass.TONEMAP_CONTROLLER):
        set_m = m_cls(set_all, klass)
        set_i = m_cls(seti_all, klass)
        any_set = jnp.any(set_m)
        any_set_i = jnp.any(set_i)
        # dense one-hot row pick (argmax-first semantics) — vmapped gathers
        # compile to unfused gather kernels on TPU, and this runs per round
        both = set_m | set_i
        sel = both & (jnp.cumsum(both.astype(jnp.int32)) == 1)
        t_row = jnp.sum(jnp.where(sel, jnp.arange(n), 0)).astype(jnp.int32)
        row_ticks = jnp.sum(jnp.where(sel, interp_ticks, 0))
        pick_vec = lambda a, b: jnp.sum(jnp.where(sel[:, None], cmap.sfparams[:, a:b], 0.0), 0)
        pick_s = lambda c: jnp.sum(jnp.where(sel, cmap.sfparams[:, c], 0.0))
        instant = any_set_i | (any_set & (row_ticks == 0))
        start_interp = any_set & (row_ticks != 0)
        if klass == ActorClass.GLOBAL_LIGHT:
            target_val = pick_vec(0, 4)
            env = env.replace(
                light_color=jnp.where(instant, target_val, env.light_color),
                light_interp_actor=jnp.where(
                    start_interp, t_row, jnp.where(instant, -1, env.light_interp_actor)
                ).astype(jnp.int32),
                light_interp_start=jnp.where(start_interp, tick, env.light_interp_start),
                light_interp_prev=jnp.where(start_interp, env.light_color, env.light_interp_prev),
            )
        elif klass == ActorClass.GLOBAL_FOG:
            target_c = pick_vec(0, 4)
            target_se = pick_vec(4, 6)
            cur = jnp.concatenate([env.fog_color, jnp.stack([env.fog_start, env.fog_end])])
            env = env.replace(
                fog_color=jnp.where(instant, target_c, env.fog_color),
                fog_start=jnp.where(instant, target_se[0], env.fog_start),
                fog_end=jnp.where(instant, target_se[1], env.fog_end),
                fog_interp_actor=jnp.where(
                    start_interp, t_row, jnp.where(instant, -1, env.fog_interp_actor)
                ).astype(jnp.int32),
                fog_interp_start=jnp.where(start_interp, tick, env.fog_interp_start),
                fog_interp_prev=jnp.where(start_interp, cur, env.fog_interp_prev),
            )
        else:
            target_e = pick_s(0)
            env = env.replace(
                exposure=jnp.where(instant, target_e, env.exposure),
                tonemap_interp_actor=jnp.where(
                    start_interp, t_row, jnp.where(instant, -1, env.tonemap_interp_actor)
                ).astype(jnp.int32),
                tonemap_interp_start=jnp.where(start_interp, tick, env.tonemap_interp_start),
                tonemap_interp_prev=jnp.where(start_interp, env.exposure, env.tonemap_interp_prev),
            )

    # ---- trigger/goal enable/disable + force (Trigger.c:53-67, Goal.c) ----
    en = m_cls(recv(Input.ENABLE), ActorClass.TRIGGER, ActorClass.GOAL)
    dis = m_cls(recv(Input.DISABLE), ActorClass.TRIGGER, ActorClass.GOAL)
    actors = actors.replace(
        idata=actors.idata.at[:, 0].set(
            jnp.where(en, 1, jnp.where(dis, 0, actors.idata[:, 0]))
        )
    )
    force = m_cls(recv(Input.FORCE_TRIGGER), ActorClass.TRIGGER)
    fired, fired_pi = fire(fired, fired_pi, force, Output.TRIGGERED)

    # ---- camera enable/disable (Camera.c:23-77) ----
    cam_en = m_cls(recv(Input.ENABLE), ActorClass.CAMERA)
    cam_dis = m_cls(recv(Input.DISABLE), ActorClass.CAMERA)
    cam = state.camera_actor
    first_en = cam_en & (jnp.cumsum(cam_en.astype(jnp.int32)) == 1)
    cam = jnp.where(jnp.any(cam_en), jnp.sum(jnp.where(first_en, jnp.arange(n), 0)), cam)
    cam_hit = jnp.any(cam_dis & (jnp.arange(n) == cam))
    cam = jnp.where(cam_hit & (cam >= 0), -1, cam)
    state = state.replace(camera_actor=cam.astype(jnp.int32))

    # ---- logic binary / decimal operands + execute ----
    opa_m, opa_pf, opa_pi = recv_param(Input.OPERAND_A, (ParamType.BOOL, ParamType.FLOAT))
    opb_m, opb_pf, opb_pi = recv_param(Input.OPERAND_B, (ParamType.BOOL, ParamType.FLOAT))
    is_lb = cls == int(ActorClass.LOGIC_BINARY)
    is_ld = cls == int(ActorClass.LOGIC_DECIMAL)
    actors = actors.replace(
        idata=actors.idata.at[:, 0]
        .set(jnp.where(opa_m & is_lb, opa_pi, actors.idata[:, 0]))
        .at[:, 1]
        .set(jnp.where(opb_m & is_lb, opb_pi, actors.idata[:, 1])),
        fdata=actors.fdata.at[:, 0]
        .set(jnp.where(opa_m & is_ld, opa_pf[:, 0], actors.fdata[:, 0]))
        .at[:, 1]
        .set(jnp.where(opb_m & is_ld, opb_pf[:, 0], actors.fdata[:, 1])),
    )

    exe_all = recv(Input.EXECUTE)
    exe_b = exe_all & is_lb
    exe_d = exe_all & is_ld
    a_v = actors.idata[:, 0] != 0
    b_v = actors.idata[:, 1] != 0
    op = cmap.siparams[:, 0]
    res_b = jnp.where(
        op == int(LogicOp.AND), a_v & b_v, jnp.where(op == int(LogicOp.OR), a_v | b_v, ~a_v)
    )
    fa, fb = actors.fdata[:, 0], actors.fdata[:, 1]
    res_d = jnp.select(
        [
            op == int(DecimalOp.EQUAL),
            op == int(DecimalOp.GREATER_THAN),
            op == int(DecimalOp.GREATER_THAN_OR_EQUAL),
            op == int(DecimalOp.LESS_THAN),
            op == int(DecimalOp.LESS_THAN_OR_EQUAL),
        ],
        [fa == fb, fa > fb, fa >= fb, fa < fb, fa <= fb],
        default=False,
    )
    exe = exe_b | exe_d
    res = jnp.where(exe_b, res_b, res_d)
    fired, fired_pi = fire(fired, fired_pi, exe & res, Output.ON_TRUE)
    fired, fired_pi = fire(fired, fired_pi, exe & ~res, Output.ON_FALSE)
    fired, fired_pi = fire(
        fired, fired_pi, exe, Output.EXECUTION_RESULT, pi=res.astype(jnp.int32)
    )

    # ---- logic counter (LogicCounter.c:36-121; add/subtract accumulate) ----
    is_cnt = cls == int(ActorClass.LOGIC_COUNTER)
    ev_add = live & (q.input == int(Input.ADD)) & (q.ptype == int(ParamType.INTEGER))
    ev_sub = live & (q.input == int(Input.SUBTRACT)) & (q.ptype == int(ParamType.INTEGER))
    ev_inc = live & (q.input == int(Input.INCREMENT))
    ev_dec = live & (q.input == int(Input.DECREMENT))
    # NOTE: the reference's decrement handler adds +1 (an upstream bug in
    # LogicCounter.c); we implement the documented -1.
    delta_ev = (
        jnp.where(ev_add, q.pi, 0)
        - jnp.where(ev_sub, q.pi, 0)
        + jnp.where(ev_inc, 1, 0)
        - jnp.where(ev_dec, 1, 0)
    )
    ev_any = ev_add | ev_sub | ev_inc | ev_dec
    change = jnp.sum(onehot * jnp.where(ev_any, delta_ev, 0)[:, None], axis=0).astype(jnp.int32)
    touched = jnp.any(onehot & ev_any[:, None], axis=0)
    counter_m = touched & is_cnt & actors.active
    prev = actors.idata[:, 0]
    cmin, cmax = cmap.siparams[:, 0], cmap.siparams[:, 1]
    clamp_min, clamp_max = cmap.siparams[:, 2] != 0, cmap.siparams[:, 3] != 0
    newv = prev + change
    newv = jnp.where(clamp_max, jnp.minimum(newv, cmax), newv)
    newv = jnp.where(clamp_min, jnp.maximum(newv, cmin), newv)
    actors = actors.replace(
        idata=actors.idata.at[:, 0].set(jnp.where(counter_m, newv, prev))
    )
    hit_max = counter_m & clamp_max & (prev < cmax) & (newv == cmax)
    left_max = counter_m & clamp_max & (prev == cmax) & (newv < cmax)
    hit_min = counter_m & clamp_min & (prev > cmin) & (newv == cmin)
    left_min = counter_m & clamp_min & (prev == cmin) & (newv > cmin)
    changed = counter_m & (prev != newv)
    fired, fired_pi = fire(fired, fired_pi, hit_max, Output.HIT_MAX)
    fired, fired_pi = fire(fired, fired_pi, left_max, Output.LEFT_MAX)
    fired, fired_pi = fire(fired, fired_pi, hit_min, Output.HIT_MIN)
    fired, fired_pi = fire(fired, fired_pi, left_min, Output.LEFT_MIN)
    fired, fired_pi = fire(fired, fired_pi, changed, Output.COUNTER_CHANGED, pi=newv)

    # ---- physics model set_color/set_skin (PhysicsModel.c:86-113) ----
    setc_m, setc_pf, _ = recv_param(Input.SET_COLOR, (ParamType.COLOR,))
    setc = setc_m & (cls == int(ActorClass.PHYSICS_MODEL))
    actors = actors.replace(mod_color=jnp.where(setc[:, None], setc_pf, actors.mod_color))
    sets_m, _, sets_pi = recv_param(
        Input.SET_SKIN, (ParamType.BYTE, ParamType.INTEGER, ParamType.UINT_64)
    )
    sets = sets_m & (cls == int(ActorClass.PHYSICS_MODEL))
    actors = actors.replace(skin=jnp.where(sets, sets_pi, actors.skin))

    # ---- sound player (SoundPlayer.c:50-121) ----
    # Channel-table work is deferred: accumulate op bits here (cheap masked
    # ORs inside the per-round vmap) and drain them ONCE per tick behind a
    # batch-global cond in core/step.py::_apply_sound_ops, so ticks with no
    # sound events pay nothing (same gating pattern as the pair narrowphase).
    play = m_cls(recv(Input.PLAY), ActorClass.SOUND_PLAYER) & actors.active
    pause = m_cls(recv(Input.PAUSE), ActorClass.SOUND_PLAYER)
    stop = m_cls(recv(Input.STOP), ActorClass.SOUND_PLAYER)
    resume = m_cls(recv(Input.RESUME), ActorClass.SOUND_PLAYER)
    actors = actors.replace(
        idata=actors.idata.at[:, 0].set(
            jnp.where(play | resume, 1, jnp.where(stop | pause, 0, actors.idata[:, 0]))
        )
    )
    ops = (
        play.astype(jnp.int32)
        | (pause.astype(jnp.int32) << 1)
        | (stop.astype(jnp.int32) << 2)
        | (resume.astype(jnp.int32) << 3)
    )
    state = state.replace(
        sound_ops=state.sound_ops | ops,
        sound_plays=state.sound_plays + jnp.sum(play.astype(jnp.int32)),
    )

    state = state.replace(actors=actors, env=env)
    return state, fired, fired_pi
