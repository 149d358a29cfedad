"""CompiledMap (static per-map device arrays) and EnvState (per-env mutable
state) pytrees.

The reference keeps the world as heap objects behind mutexes
(engine/include/engine/structs/GlobalState.h:38-71, Map.h, Actor.h); here the
whole world is fixed-shape SoA arrays so 4096 envs step in lockstep under
vmap. Dynamic actor lists become fixed-capacity slots with `active` masks
(spawn/kill = mask flips).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

# Fixed width of the per-env pair warm-start cache. Must cover
# physics/batched.py P_CAP (asserted there); kept here so the state
# schema has no import-time dependency on the solver module.
PAIR_WARM_CAP = 16

# Event queue capacity per tick (signal system). The reference's recursive
# synchronous ActorFireOutput (Actor.c:80-122) is replaced by bounded rounds
# over this queue.
EVENT_CAPACITY = 16
SIGNAL_ROUNDS = 4


class Crosshair:
    # engine/src/physics/PlayerPhysics.c crosshairColor states
    NORMAL = 0
    INTERACTABLE = 1
    INVISIBLE = 2


@struct.dataclass
class CompiledMap:
    # --- static collision ---
    tris: jnp.ndarray  # [T, 3, 3] world-space triangles (padded; pad = degenerate far below)
    tri_normal: jnp.ndarray  # [T, 3] unit normals (ccw winding)
    tri_valid: jnp.ndarray  # [T] bool
    tri_soa: jnp.ndarray  # [12, T] component-major: ax..cz + normal xyz (geometry_soa)
    tri_edge_active: jnp.ndarray  # [T, 3] f32 active-edge flags (compiler/edges.py)
    chunk_bounds: jnp.ndarray  # [T/T_CHUNK, 4] per-kernel-chunk XZ AABB (minx minz maxx maxz)
    # uniform XZ broadphase grid (compiler/broadphase.py)
    grid_lo: jnp.ndarray  # [2]
    grid_inv_cell: jnp.ndarray  # []
    grid_cells: jnp.ndarray  # [GX*GZ, L] i32 tri indices (-1 pad)
    # compact index of dynamic actors (Motion.DYNAMIC), -1 padded
    dyn_slots: jnp.ndarray  # [D] i32
    actor_to_dyn: jnp.ndarray  # [N] i32 inverse map (-1 = not dynamic)

    # --- actor init tables ---
    cls: jnp.ndarray  # [N] i32 ActorClass
    init_active: jnp.ndarray  # [N] bool
    init_pos: jnp.ndarray  # [N, 3]
    init_quat: jnp.ndarray  # [N, 4]
    init_visible: jnp.ndarray  # [N] bool
    init_skin: jnp.ndarray  # [N] i32
    init_mod_color: jnp.ndarray  # [N, 4]
    init_fdata: jnp.ndarray  # [N, FD]
    init_idata: jnp.ndarray  # [N, ID]
    flags: jnp.ndarray  # [N] i32 ActorFlags
    sfparams: jnp.ndarray  # [N, SF]
    siparams: jnp.ndarray  # [N, SI]

    # --- actor physics ---
    motion: jnp.ndarray  # [N] i32 Motion
    shape: jnp.ndarray  # [N] i32 Shape
    halfext: jnp.ndarray  # [N, 3]
    hull_verts: jnp.ndarray  # [N, V, 3] support vert cloud rel. to shape_center
    shape_center: jnp.ndarray  # [N, 3] collision-box center in the body frame
    layer: jnp.ndarray  # [N] i32 Layer
    mass: jnp.ndarray  # [N]
    inv_mass: jnp.ndarray  # [N] (0 for non-dynamic)
    inv_inertia: jnp.ndarray  # [N, 3] local-frame diagonal inverse inertia (0 = locked)
    friction: jnp.ndarray  # [N]
    restitution: jnp.ndarray  # [N]

    # --- sensors (static box overlap volumes owned by actors) ---
    sensor_owner: jnp.ndarray  # [S] i32 actor index (-1 pad)
    sensor_pos: jnp.ndarray  # [S, 3]
    sensor_quat: jnp.ndarray  # [S, 4]
    sensor_halfext: jnp.ndarray  # [S, 3]
    sensor_follow: jnp.ndarray  # [S] bool: pose tracks the owner's body

    # --- signal graph (compiled ActorConnection lists) ---
    edge_src: jnp.ndarray  # [E] i32 source actor (-1 pad)
    edge_out: jnp.ndarray  # [E] i32 Output id
    edge_dst: jnp.ndarray  # [E] i32 target actor
    edge_in: jnp.ndarray  # [E] i32 Input id
    edge_ptype: jnp.ndarray  # [E] i32 ParamType override (NONE = use fired param)
    edge_pf: jnp.ndarray  # [E, 4] f32 override payload
    edge_pi: jnp.ndarray  # [E] i32 override payload (int-typed params)

    # --- initial signal events (spawned-at-load outputs, Actor.c:49) ---
    init_ev_target: jnp.ndarray  # [Q] i32
    init_ev_input: jnp.ndarray  # [Q] i32
    init_ev_ptype: jnp.ndarray  # [Q] i32
    init_ev_pf: jnp.ndarray  # [Q, 4]
    init_ev_pi: jnp.ndarray  # [Q] i32
    init_ev_count: jnp.ndarray  # [] i32

    # --- wall (billboard/quad) render params ---
    wall_axis: jnp.ndarray  # [N] i32 (-1 none, 0 X, 1 Z)
    wall_size: jnp.ndarray  # [N, 2] length, height
    wall_center: jnp.ndarray  # [N, 2]
    wall_uv_scale: jnp.ndarray  # [N, 2]
    wall_uv_offset: jnp.ndarray  # [N, 2]
    wall_tex: jnp.ndarray  # [N] i32 texture id (-1 none)
    wall_unshaded: jnp.ndarray  # [N] bool
    model_id: jnp.ndarray  # [N] i32 (-1 none)
    billboard: jnp.ndarray  # [N] bool (Y-billboard each tick)

    # --- player spawn ---
    spawn_pos: jnp.ndarray  # [3]
    spawn_yaw: jnp.ndarray  # []
    spawn_pitch: jnp.ndarray  # []

    # --- env render defaults (Map.c:37-47) ---
    default_light: jnp.ndarray  # [4]
    default_fog_color: jnp.ndarray  # [4]
    default_fog_start: jnp.ndarray  # []
    default_fog_end: jnp.ndarray  # []
    default_exposure: jnp.ndarray  # []

    # --- audio (SoundBank id space; PCM lives in audio/bank.py) ---
    sound_len: jnp.ndarray  # [NS] i32 resampled frame count per sound

    # --- render geometry (filled by the render compiler; may be empty) ---
    map_verts: jnp.ndarray  # [V, 7] pos/uv/lightmapUv
    map_indices: jnp.ndarray  # [I] i32
    map_vert_tex: jnp.ndarray  # [V] i32 texture id
    map_vert_shaded: jnp.ndarray  # [V] bool
    lightmap: jnp.ndarray  # [LH, LW, 4]
    point_lights: jnp.ndarray  # [L, 9]

    # --- static host-side metadata (not traced) ---
    aux: Any = struct.field(pytree_node=False, default=None)

    @property
    def num_actors(self) -> int:
        return self.cls.shape[0]

    @property
    def num_sensors(self) -> int:
        return self.sensor_owner.shape[0]


@struct.dataclass
class PlayerState:
    pos: jnp.ndarray  # [3] capsule center position (character origin)
    vel: jnp.ndarray  # [3]
    yaw: jnp.ndarray  # [] radians; player faces -Z at yaw 0
    pitch: jnp.ndarray  # [] radians in [-pi/2, pi/2]; 0 = level
    on_ground: jnp.ndarray  # [] bool
    noclip: jnp.ndarray  # [] bool
    freecam: jnp.ndarray  # [] bool
    freecam_pos: jnp.ndarray  # [3]
    held_actor: jnp.ndarray  # [] i32 (-1 none)
    targeted_actor: jnp.ndarray  # [] i32 (-1 none)
    targeted_fraction: jnp.ndarray  # [] f32 (hit fraction of the 10u ray)
    can_drop_held: jnp.ndarray  # [] bool (PlayerPhysics.c canDropHeldActor)
    view_bob: jnp.ndarray  # [] f32
    crosshair: jnp.ndarray  # [] i32


@struct.dataclass
class ActorsState:
    active: jnp.ndarray  # [N] bool
    pos: jnp.ndarray  # [N, 3]
    quat: jnp.ndarray  # [N, 4]
    vel: jnp.ndarray  # [N, 3]
    omega: jnp.ndarray  # [N, 3]
    visible: jnp.ndarray  # [N] bool
    skin: jnp.ndarray  # [N] i32
    mod_color: jnp.ndarray  # [N, 4]
    fdata: jnp.ndarray  # [N, FD]
    idata: jnp.ndarray  # [N, ID]
    # consecutive ticks below the sleep velocity threshold; >= SLEEP_AFTER
    # (physics/batched.py) = body asleep, frozen until contacted/moved
    # (Jolt's 0.5 s time-before-sleep island sleeping)
    sleep: jnp.ndarray  # [N] i32
    # warm-start cache: accumulated centroid normal impulses carried
    # across ticks (Jolt's ContactConstraintManager warm starting — the
    # mechanism that lets its sequential solver hold deep stacks;
    # engine/src/physics/Physics.c:89-100 system setup). Applying last
    # tick's solution before the fixed-sweep Jacobi iterations makes
    # convergence accumulate ACROSS ticks, so resting stacks deeper than
    # the per-tick iteration budget stay rigid (a cold 4-box stack needs
    # ~16 Jacobi sweeps/substep; warm-started it holds at 6).
    warm_n: jnp.ndarray  # [N] f32 — body-vs-world manifold impulse
    warm_pair: jnp.ndarray  # [PAIR_WARM_CAP] f32 — pair manifold impulse
    warm_pair_idx: jnp.ndarray  # [PAIR_WARM_CAP] i32 flat pair key, -1 empty


@struct.dataclass
class EnvGlobals:
    light_color: jnp.ndarray  # [4]
    fog_color: jnp.ndarray  # [4]
    fog_start: jnp.ndarray  # []
    fog_end: jnp.ndarray  # []
    exposure: jnp.ndarray  # []
    # interpolation channels (GlobalLight.c/GlobalFog.c/TonemapController.c)
    light_interp_actor: jnp.ndarray  # [] i32 (-1 inactive)
    light_interp_start: jnp.ndarray  # [] i32 start tick
    light_interp_prev: jnp.ndarray  # [4]
    fog_interp_actor: jnp.ndarray  # [] i32
    fog_interp_start: jnp.ndarray  # [] i32
    fog_interp_prev: jnp.ndarray  # [6] color(4), start, end
    tonemap_interp_actor: jnp.ndarray  # [] i32
    tonemap_interp_start: jnp.ndarray  # [] i32
    tonemap_interp_prev: jnp.ndarray  # []


@struct.dataclass
class SaveData:
    # reference: engine/include/engine/structs/GlobalState.h:23-35
    coins: jnp.ndarray  # [] i32 (clamped to 9999)
    blue_coins: jnp.ndarray  # [] i32 (clamped to 5)
    hp: jnp.ndarray  # [] i32
    item_mask: jnp.ndarray  # [] i32 bitmask of held item ids
    current_item: jnp.ndarray  # [] i32 (-1 none)


@struct.dataclass
class EventQueue:
    target: jnp.ndarray  # [Q] i32
    input: jnp.ndarray  # [Q] i32
    ptype: jnp.ndarray  # [Q] i32
    pf: jnp.ndarray  # [Q, 4]
    pi: jnp.ndarray  # [Q] i32
    count: jnp.ndarray  # [] i32
    dropped: jnp.ndarray  # [] i32 (overflow diagnostics)


@struct.dataclass
class EnvState:
    player: PlayerState
    actors: ActorsState
    env: EnvGlobals
    save: SaveData
    events: EventQueue
    sensor_inside: jnp.ndarray  # [S] bool — player overlap last tick
    camera_actor: jnp.ndarray  # [] i32 (-1 = player camera)
    sound_plays: jnp.ndarray  # [] i32 — cumulative play events (SoundSystem observable)
    audio: Any  # AudioState — 32-channel table (audio/mixer.py)
    # per-actor sound-op bits accumulated across signal rounds, drained once
    # per tick behind a batch-global cond (core/step.py _apply_sound_ops):
    # 1 play, 2 pause, 4 stop, 8 resume, 16 one-shot coincling
    sound_ops: jnp.ndarray  # [N] i32
    tick: jnp.ndarray  # [] i32
    # engine-uptime physics frame: increments every tick and is CARRIED
    # ACROSS MAP CHANGES, unlike `tick` which resets per map — the split
    # the reference keeps between GlobalState.physicsFrame (uptime,
    # PhysicsThread.c:101) and per-map state. Animation phases driven by
    # physicsFrame in the reference (coin 4-frame uv cycle Coin.c:60,
    # view-bob MapPhysics.c:84) read this field (PARITY.md #15).
    frame: jnp.ndarray  # [] i32


def empty_events() -> EventQueue:
    q = EVENT_CAPACITY
    return EventQueue(
        target=jnp.full((q,), -1, jnp.int32),
        input=jnp.zeros((q,), jnp.int32),
        ptype=jnp.full((q,), 5, jnp.int32),  # ParamType.NONE
        pf=jnp.zeros((q, 4), jnp.float32),
        pi=jnp.zeros((q,), jnp.int32),
        count=jnp.zeros((), jnp.int32),
        dropped=jnp.zeros((), jnp.int32),
    )


def reset(cmap: CompiledMap) -> EnvState:
    """Fresh single-env state from the compiled map (vmap/broadcast for a
    batch)."""
    n = cmap.num_actors
    player = PlayerState(
        pos=cmap.spawn_pos,
        vel=jnp.zeros(3, jnp.float32),
        yaw=cmap.spawn_yaw,
        pitch=cmap.spawn_pitch,
        on_ground=jnp.array(False),
        noclip=jnp.array(False),
        freecam=jnp.array(False),
        freecam_pos=cmap.spawn_pos,
        held_actor=jnp.array(-1, jnp.int32),
        targeted_actor=jnp.array(-1, jnp.int32),
        targeted_fraction=jnp.array(1.0, jnp.float32),
        can_drop_held=jnp.array(True),
        view_bob=jnp.array(0.0, jnp.float32),
        crosshair=jnp.array(Crosshair.NORMAL, jnp.int32),
    )
    actors = ActorsState(
        active=cmap.init_active,
        pos=cmap.init_pos,
        quat=cmap.init_quat,
        vel=jnp.zeros((n, 3), jnp.float32),
        omega=jnp.zeros((n, 3), jnp.float32),
        visible=cmap.init_visible,
        skin=cmap.init_skin,
        mod_color=cmap.init_mod_color,
        fdata=cmap.init_fdata,
        idata=cmap.init_idata,
        sleep=jnp.zeros(n, jnp.int32),
        warm_n=jnp.zeros(n, jnp.float32),
        warm_pair=jnp.zeros(PAIR_WARM_CAP, jnp.float32),
        warm_pair_idx=jnp.full(PAIR_WARM_CAP, -1, jnp.int32),
    )
    env = EnvGlobals(
        light_color=cmap.default_light,
        fog_color=cmap.default_fog_color,
        fog_start=cmap.default_fog_start,
        fog_end=cmap.default_fog_end,
        exposure=cmap.default_exposure,
        light_interp_actor=jnp.array(-1, jnp.int32),
        light_interp_start=jnp.zeros((), jnp.int32),
        light_interp_prev=jnp.zeros(4, jnp.float32),
        fog_interp_actor=jnp.array(-1, jnp.int32),
        fog_interp_start=jnp.zeros((), jnp.int32),
        fog_interp_prev=jnp.zeros(6, jnp.float32),
        tonemap_interp_actor=jnp.array(-1, jnp.int32),
        tonemap_interp_start=jnp.zeros((), jnp.int32),
        tonemap_interp_prev=jnp.zeros((), jnp.float32),
    )
    save = SaveData(
        coins=jnp.zeros((), jnp.int32),
        blue_coins=jnp.zeros((), jnp.int32),
        hp=jnp.full((), 100, jnp.int32),
        item_mask=jnp.zeros((), jnp.int32),
        current_item=jnp.array(-1, jnp.int32),
    )
    events = EventQueue(
        target=cmap.init_ev_target,
        input=cmap.init_ev_input,
        ptype=cmap.init_ev_ptype,
        pf=cmap.init_ev_pf,
        pi=cmap.init_ev_pi,
        count=cmap.init_ev_count,
        dropped=jnp.zeros((), jnp.int32),
    )
    return EnvState(
        player=player,
        actors=actors,
        env=env,
        save=save,
        events=events,
        sensor_inside=jnp.zeros((cmap.num_sensors,), bool),
        camera_actor=jnp.array(-1, jnp.int32),
        sound_plays=jnp.zeros((), jnp.int32),
        audio=_empty_audio(),
        sound_ops=jnp.zeros((n,), jnp.int32),
        tick=jnp.zeros((), jnp.int32),
        frame=jnp.zeros((), jnp.int32),
    )


def _empty_audio():
    from c_game_engine_tpu.audio.mixer import empty_audio

    return empty_audio()
