"""Batch-wide physics kernels in lanes-major/batch-minor layout.

These are the hot paths of the tick, hand-batched over the env axis instead
of vmapped, so every large intermediate has its two minor dimensions dense
on the TPU's (8, 128) tiles (see geometry_soa.py for why). Semantics match
physics/character.py and physics/bodies.py, which remain the single-env
reference implementations.

Shapes (B = env batch, L = grid candidate lanes, N = actor slots,
D = dynamic-body slots, K = contact manifold size):

  capsule/triangle contacts      [L, B]
  capsule/actor-box contacts     [N, B]
  body/triangle contacts         [D, L, B]
  body/body pair contacts        [D, N, B]
  rays vs triangles              [T, R]   (R = flattened ray count)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import Layer, Motion, Shape
from c_game_engine_tpu.physics import geometry_soa as g
from c_game_engine_tpu.physics.character import (
    CAPSULE_HALF_HEIGHT,
    CAPSULE_RADIUS,
    CHARACTER_MASS,
    MAX_SLOPE_COS,
    STEP_UP,
    STICK_DOWN,
)

def _use_pallas() -> bool:
    """Pallas kernels on TPU; CGE_FORCE_XLA=1 forces the XLA fallback even
    there (used by tests/test_tpu_parity.py to cross-validate the paths)."""
    import os

    return jax.default_backend() == "tpu" and not os.environ.get("CGE_FORCE_XLA")


GRAVITY_Y = -9.81
MAP_FRICTION = 4.25
SOLVER_ITERS = 8
PAIR_ITERS = 2
# island sleeping (Jolt PhysicsSettings: pointVelocitySleepThreshold 0.03
# m/s, timeBeforeSleep 0.5 s = 30 ticks)
SLEEP_SPEED2 = 0.03 * 0.03
SLEEP_AFTER = 30
BAUMGARTE = 0.2
PENETRATION_SLOP = 0.005
RELAX = 0.7
MANIFOLD_K = 4


def _grid_cells_at(cmap, px, pz):
    """[B] positions -> candidate triangle lists [L, B]."""
    gx, gz = cmap.aux["grid_shape"]
    cx = jnp.clip(((px - cmap.grid_lo[0]) * cmap.grid_inv_cell).astype(jnp.int32), 0, gx - 1)
    cz = jnp.clip(((pz - cmap.grid_lo[1]) * cmap.grid_inv_cell).astype(jnp.int32), 0, gz - 1)
    return cmap.grid_cells[cx * gz + cz].T  # [L, B]


def _tri_comps(cmap, cand):
    """Gather the 12 per-triangle components for candidate index array
    `cand` (any shape). Returns list of 12 arrays shaped like cand."""
    candc = jnp.clip(cand, 0, None)
    return [jnp.take(cmap.tri_soa[k], candc) for k in range(12)]


def _solid_actor_soa(cmap, actors, B):
    """Per-actor solid-collider comps, [N, B] each (broadcast from [B, N])."""
    solid = (
        actors.active
        & (cmap.shape != int(Shape.EMPTY))[None, :]
        & (cmap.motion != int(Motion.NONE))[None, :]
        & (cmap.layer != int(Layer.SENSOR))[None, :]
    )  # [B, N]
    # box center = pos + R(quat) shape_center
    qx, qy, qz, qw = (actors.quat[..., k].T for k in range(4))  # [N, B]
    scx, scy, scz = (cmap.shape_center[:, k][:, None] for k in range(3))
    ox, oy, oz = g.quat_rotate_soa(qx, qy, qz, qw, scx, scy, scz)
    ox = ox + actors.pos[..., 0].T
    oy = oy + actors.pos[..., 1].T
    oz = oz + actors.pos[..., 2].T
    hx, hy, hz = (cmap.halfext[:, k][:, None] for k in range(3))
    return solid.T, (ox, oy, oz), (qx, qy, qz, qw), (hx, hy, hz)


def _capsule_contacts(cmap, pos, solid_t, box_o, box_q, box_h, exclude=None):
    """All capsule contacts at positions pos [B, 3].
    Returns (depth [L+N, B], normal comps [L+N, B] x3)."""
    B = pos.shape[0]
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    sy0, sy1 = py - CAPSULE_HALF_HEIGHT, py + CAPSULE_HALF_HEIGHT

    # ---- static triangles ----
    cand = _grid_cells_at(cmap, px, pz)  # [L, B]
    c = _tri_comps(cmap, cand)
    cand_ok = (cand >= 0) & jnp.take(cmap.tri_valid, jnp.clip(cand, 0, None))
    signed, nx, ny, nz = g.capsule_tri_contact_soa(
        px[None], sy0[None], sy1[None], pz[None],
        c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7], c[8], c[9], c[10], c[11],
        CAPSULE_RADIUS,
    )
    tri_depth = jnp.where(cand_ok, CAPSULE_RADIUS - signed, -jnp.inf)

    # ---- solid actor boxes ----
    ox, oy, oz = box_o
    qx, qy, qz, qw = box_q
    hx, hy, hz = box_h
    wx, wy, wz = g.closest_point_on_obb_soa(px[None], py[None], pz[None], ox, oy, oz, qx, qy, qz, qw, hx, hy, hz)
    for _ in range(2):
        spx, spy, spz = g.closest_point_on_vseg_soa(wx, wy, wz, px[None], sy0[None], sy1[None], pz[None])
        wx, wy, wz = g.closest_point_on_obb_soa(spx, spy, spz, ox, oy, oz, qx, qy, qz, qw, hx, hy, hz)
    dx, dy, dz = spx - wx, spy - wy, spz - wz
    bnx, bny, bnz, bdist = g.normalize3(dx, dy, dz)
    bmask = solid_t
    if exclude is not None:
        bmask = bmask & (jnp.arange(cmap.num_actors)[:, None] != exclude[None, :])
    box_depth = jnp.where(bmask, CAPSULE_RADIUS - bdist, -jnp.inf)

    depth = jnp.concatenate([tri_depth, box_depth], axis=0)
    nxa = jnp.concatenate([nx, bnx], axis=0)
    nya = jnp.concatenate([ny, bny], axis=0)
    nza = jnp.concatenate([nz, bnz], axis=0)
    return depth, nxa, nya, nza


def resolve_capsule_batched(cmap, pos, vel, solid_ctx, iters=4):
    """Batched penetration resolution. pos/vel [B,3].
    Returns (pos, vel, grounded [B])."""
    solid_t, box_o, box_q, box_h = solid_ctx

    def body(_, carry):
        pos, vel, grounded = carry
        depth, nx, ny, nz = _capsule_contacts(cmap, pos, solid_t, box_o, box_q, box_h)
        worst = jnp.argmax(depth, axis=0)  # [B]
        take = lambda a: jnp.take_along_axis(a, worst[None], axis=0)[0]
        d = take(depth)
        wnx, wny, wnz = take(nx), take(ny), take(nz)
        hit = d > -0.01
        push = jnp.maximum(d, 0.0) * hit
        pos = pos + jnp.stack([wnx, wny, wnz], -1) * push[:, None]
        vn = vel[:, 0] * wnx + vel[:, 1] * wny + vel[:, 2] * wnz
        clip = hit & (vn < 0)
        vel = vel - jnp.stack([wnx, wny, wnz], -1) * jnp.where(clip, vn, 0.0)[:, None]
        grounded = grounded | (hit & (wny >= MAX_SLOPE_COS))
        return pos, vel, grounded

    init = (pos, vel, jnp.zeros(pos.shape[0], bool))
    return jax.lax.fori_loop(0, iters, body, init)


def _resolve_dispatch(cmap, pos, vel, solid_ctx, pallas_ctx):
    """Pallas kernel on TPU, XLA fallback elsewhere."""
    if pallas_ctx is None:
        return resolve_capsule_batched(cmap, pos, vel, solid_ctx)
    from c_game_engine_tpu.ops.capsule_resolve import BLK, resolve_capsule_pallas

    tri16, cb, box8, boxh = pallas_ctx
    B = pos.shape[0]
    pad = (-B) % BLK
    if pad:
        pos = jnp.concatenate([pos, jnp.zeros((pad, 3))], 0)
        vel = jnp.concatenate([vel, jnp.zeros((pad, 3))], 0)
        box8 = jnp.concatenate([box8, jnp.zeros((*box8.shape[:2], pad))], -1)
        boxh = jnp.concatenate([boxh, jnp.zeros((*boxh.shape[:2], pad))], -1)
    p, v, g = resolve_capsule_pallas(tri16, cb, box8, boxh, pos, vel)
    if pad:
        p, v, g = p[:B], v[:B], g[:B]
    return p, v, g


def _make_pallas_ctx(cmap, solid_ctx):
    """Precompute the kernel inputs: [T,16] tri table + [8/4, N, B] box
    component stacks."""
    solid_t, box_o, box_q, box_h = solid_ctx
    N, B = solid_t.shape
    from c_game_engine_tpu.ops.capsule_resolve import T_CHUNK

    T = cmap.tri_soa.shape[1]
    tri16 = jnp.concatenate(
        [
            cmap.tri_soa.T,
            cmap.tri_valid[:, None].astype(jnp.float32),
            jnp.zeros((T, 3), jnp.float32),
        ],
        axis=1,
    )
    t_pad = (-T) % T_CHUNK
    if t_pad:
        tri16 = jnp.concatenate([tri16, jnp.zeros((t_pad, 16), jnp.float32)], 0)
    bcast = lambda a: jnp.broadcast_to(a, (N, B))
    cb = cmap.chunk_bounds
    box8 = jnp.stack(
        [
            bcast(box_o[0]), bcast(box_o[1]), bcast(box_o[2]),
            bcast(box_q[0]), bcast(box_q[1]), bcast(box_q[2]), bcast(box_q[3]),
            solid_t.astype(jnp.float32),
        ]
    )
    boxh = jnp.stack(
        [bcast(box_h[0]), bcast(box_h[1]), bcast(box_h[2]), jnp.zeros((N, B))]
    )
    return tri16, cb, box8, boxh


def update_character_batched(
    cmap, actors, pos, vel, dt, was_on_ground, jumping, noclip, exclude_idx=None
):
    """Batched CharacterVirtual step (semantics of
    character.update_character). pos/vel [B,3], flags [B]. exclude_idx [B]
    removes one actor's collider per env (the held body — the reference's
    OnContactValidate rejects contacts with it, PlayerPhysics.c:95-101)."""
    B = pos.shape[0]
    solid_t, box_o, box_q, box_h = _solid_actor_soa(cmap, actors, B)
    if exclude_idx is not None:
        solid_t = solid_t & (
            jnp.arange(cmap.num_actors)[:, None] != exclude_idx[None, :]
        )
    solid_ctx = (solid_t, box_o, box_q, box_h)
    pallas_ctx = (
        _make_pallas_ctx(cmap, solid_ctx) if _use_pallas() else None
    )
    new_pos = pos + vel * dt
    lifted = new_pos + jnp.array([0.0, STEP_UP, 0.0])

    if pallas_ctx is not None:
        # main + step-up resolves fused into one double-batch kernel call
        tri16, cb2, box8, boxh = pallas_ctx
        ctx2 = (tri16, cb2, jnp.tile(box8, (1, 1, 2)), jnp.tile(boxh, (1, 1, 2)))
        p12, v12, g12 = _resolve_dispatch(
            cmap,
            jnp.concatenate([new_pos, lifted], 0),
            jnp.concatenate([vel, vel], 0),
            solid_ctx,
            ctx2,
        )
        p, v, grounded = p12[:B], v12[:B], g12[:B]
        p2, v2, g2 = p12[B:], v12[B:], g12[B:]
    else:
        p, v, grounded = _resolve_dispatch(cmap, new_pos, vel, solid_ctx, None)
        p2, v2, g2 = _resolve_dispatch(cmap, lifted, vel, solid_ctx, None)

    # stair step-up
    horiz = jnp.array([1.0, 0.0, 1.0])
    h_in = jnp.linalg.norm(vel * horiz, axis=-1)
    h_out = jnp.linalg.norm(v * horiz, axis=-1)
    blocked = (h_in > 1e-4) & (h_out < 0.9 * h_in)
    h2 = jnp.linalg.norm(v2 * horiz, axis=-1)
    use_step = blocked & (h2 > h_out + 1e-4)
    p = jnp.where(use_step[:, None], p2, p)
    v = jnp.where(use_step[:, None], v2, v)
    grounded = jnp.where(use_step, g2, grounded)

    # stick-to-floor — a full resolve launch, but only consumed by lanes
    # that just left the ground; skipped batch-globally when nobody needs
    # it (the common case: everyone stays grounded or airborne)
    want_stick = was_on_ground & (~jumping) & (v[:, 1] <= 1e-4) & (~grounded)

    def _stick(args):
        p_, v_ = args
        return _resolve_dispatch(
            cmap, p_ + jnp.array([0.0, -STICK_DOWN, 0.0]), v_, solid_ctx, pallas_ctx
        )

    p3, v3, g3 = jax.lax.cond(
        jnp.any(want_stick), _stick, lambda a: (a[0], a[1], jnp.zeros(B, bool)), (p, v)
    )
    stick = want_stick & g3
    p = jnp.where(stick[:, None], p3, p)
    v = jnp.where(stick[:, None], v3, v)
    grounded = grounded | stick

    pos_out = jnp.where(noclip[:, None], new_pos, p)
    vel_out = jnp.where(noclip[:, None], vel, v)
    grounded_out = jnp.where(noclip, False, grounded)
    return pos_out, vel_out, grounded_out


def cast_rays_batched(
    cmap,
    actors,
    origin,
    direction,
    max_dist,
    exclude=None,
    require_flags=0,
    B_env=None,
    static_only=None,
    layout="interleaved",
):
    """Batched hitscan. origin/direction [R, 3] (R rays, flattened over the
    batch); `actors` arrays are [B, N, ...] with R = B * K — pass B_env=B so
    per-env actor state indexes correctly; exclude [R] actor ids.
    max_dist and require_flags may be scalars or per-ray [R] arrays, so
    heterogeneous ray sets (interact + lasers) share one kernel launch.
    static_only [R] bool restricts a ray to the static world (the triple
    laser's broadphase filter, Laser.c:64-72: BROAD_PHASE_LAYER_STATIC only).
    layout: how the K rays of each env are flattened — "interleaved" = env-
    major [e0k0, e0k1, ...], "kind_major" = [k0 for all envs, k1 ...] (the
    latter keeps kernel blocks spatially coherent).

    Returns (hit [R], fraction [R], actor_idx [R] with -1 = static world)."""
    R = origin.shape[0]
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]

    # ---- static triangles ----
    if _use_pallas():
        from c_game_engine_tpu.ops.capsule_resolve import T_CHUNK
        from c_game_engine_tpu.ops.ray_tris import ray_tris_pallas

        T = cmap.tri_soa.shape[1]
        tri16 = jnp.concatenate(
            [cmap.tri_soa.T, cmap.tri_valid[:, None].astype(jnp.float32), jnp.zeros((T, 3), jnp.float32)],
            axis=1,
        )
        t_pad = (-T) % T_CHUNK
        if t_pad:
            tri16 = jnp.concatenate([tri16, jnp.zeros((t_pad, 16), jnp.float32)], 0)
        t_static = ray_tris_pallas(tri16, cmap.chunk_bounds, origin, direction, max_dist)
        t_static = jnp.where(t_static > 1e29, jnp.inf, t_static)
    else:
        ts = cmap.tri_soa
        col = lambda k: ts[k][:, None]
        hit_t, t_t = g.ray_tri_soa(
            ox[None], oy[None], oz[None], dx[None], dy[None], dz[None],
            col(0), col(1), col(2), col(3), col(4), col(5), col(6), col(7), col(8),
            max_dist,
        )
        t_t = jnp.where(cmap.tri_valid[:, None], t_t, jnp.inf)
        t_static = jnp.min(t_t, axis=0)  # [R]

    # ---- actor boxes: [N, R] ----
    B = B_env if B_env is not None else R
    K = R // B
    n = cmap.num_actors

    def actor_comp(a):  # [B, N] -> [N, R]
        if K == 1:
            return a.T
        return jnp.tile(a.T, (1, K)) if layout == "kind_major" else jnp.repeat(a.T, K, axis=1)

    qx, qy, qz, qw = (actor_comp(actors.quat[..., k]) for k in range(4))
    scx, scy, scz = (cmap.shape_center[:, k][:, None] for k in range(3))
    cx_, cy_, cz_ = g.quat_rotate_soa(qx, qy, qz, qw, scx, scy, scz)
    cx_ = cx_ + actor_comp(actors.pos[..., 0])
    cy_ = cy_ + actor_comp(actors.pos[..., 1])
    cz_ = cz_ + actor_comp(actors.pos[..., 2])
    hx, hy, hz = (cmap.halfext[:, k][:, None] for k in range(3))
    bhit, bt = g.ray_obb_soa(
        ox[None], oy[None], oz[None], dx[None], dy[None], dz[None],
        cx_, cy_, cz_, qx, qy, qz, qw, hx, hy, hz, max_dist,
    )
    solid = (
        actor_comp(actors.active)
        & (cmap.shape != int(Shape.EMPTY))[:, None]
        & (cmap.motion != int(Motion.NONE))[:, None]
        & (cmap.layer != int(Layer.SENSOR))[:, None]
    )
    if isinstance(require_flags, jnp.ndarray):
        req = require_flags[None, :]  # [1, R]
        solid = solid & ((cmap.flags[:, None] & req) == req)
    elif require_flags:
        solid = solid & ((cmap.flags & require_flags) == require_flags)[:, None]
    if exclude is not None:
        solid = solid & (jnp.arange(n)[:, None] != exclude[None, :])
    if static_only is not None:
        solid = solid & ~static_only[None, :]
    bt = jnp.where(solid & bhit, bt, jnp.inf)
    k_best = jnp.argmin(bt, axis=0)  # [R]
    t_act = jnp.take_along_axis(bt, k_best[None], axis=0)[0]

    t_best = jnp.minimum(t_static, t_act)
    idx = jnp.where(t_act < t_static, k_best.astype(jnp.int32), -1)
    hit_any = jnp.isfinite(t_best)
    frac = jnp.where(hit_any, t_best / max_dist, 1.0).astype(jnp.float32)
    return hit_any, frac, idx


def step_bodies_batched(cmap, actors, player_pos, player_vel, dt, n_substeps: int = 2):
    """Batched rigid-body update (semantics of bodies.step_bodies).
    actors arrays [B, N, ...]; player [B, 3]. Returns full-lane
    (pos, quat, vel, omega)."""
    B, n = actors.pos.shape[0], cmap.num_actors
    sl = cmap.dyn_slots
    D = sl.shape[0]
    slc = jnp.clip(sl, 0, n - 1)
    d_on = (sl >= 0)[None, :] & actors.active[:, slc]  # [B, D]
    d_on_t = d_on.T  # [D, B]

    kinematic = actors.active & (cmap.motion == int(Motion.KINEMATIC))[None, :]
    solid_full = (
        actors.active
        & (cmap.shape != int(Shape.EMPTY))[None, :]
        & (cmap.motion != int(Motion.NONE))[None, :]
        & (cmap.layer != int(Layer.SENSOR))[None, :]
    )  # [B, N]

    h = dt / n_substeps

    # gathered dynamic lanes, component layout [D, B]
    def gcomp(a, k):  # a [B, N, C]
        return a[:, slc, k].T

    dpx, dpy, dpz = (gcomp(actors.pos, k) for k in range(3))
    dqx, dqy, dqz, dqw = (gcomp(actors.quat, k) for k in range(4))
    dvx, dvy, dvz = (gcomp(actors.vel, k) for k in range(3))
    dwx, dwy, dwz = (gcomp(actors.omega, k) for k in range(3))
    d_inv_m = cmap.inv_mass[slc][:, None]  # [D, 1]
    iIx, iIy, iIz = (cmap.inv_inertia[slc, k][:, None] for k in range(3))
    dhx, dhy, dhz = (cmap.halfext[slc, k][:, None] for k in range(3))
    dcx, dcy, dcz = (cmap.shape_center[slc, k][:, None] for k in range(3))
    d_mu = jnp.sqrt(cmap.friction[slc] * MAP_FRICTION)[:, None]

    # kinematic motion on full lanes (cheap)
    k_pos = actors.pos + jnp.where(
        kinematic[..., None], actors.vel * dt, 0.0
    )

    # other-actor tables for pair contacts, [N, B] comps (kinematics at
    # their end-of-tick pose)
    o_pos = jnp.where(kinematic[..., None], k_pos, actors.pos)
    oqx, oqy, oqz, oqw = (actors.quat[..., k].T for k in range(4))
    oscx, oscy, oscz = (cmap.shape_center[:, k][:, None] for k in range(3))
    rx, ry, rz = g.quat_rotate_soa(oqx, oqy, oqz, oqw, oscx, oscy, oscz)
    o_cx = rx + o_pos[..., 0].T
    o_cy = ry + o_pos[..., 1].T
    o_cz = rz + o_pos[..., 2].T
    ohx, ohy, ohz = (cmap.halfext[:, k][:, None] for k in range(3))
    o_solid = solid_full.T  # [N, B]
    o_inv_m = jnp.where(
        (cmap.motion == int(Motion.DYNAMIC))[None, :] & actors.active, cmap.inv_mass[None, :], 0.0
    ).T  # [N, B]
    ovx, ovy, ovz = (actors.vel[..., k].T for k in range(3))
    a2d = cmap.actor_to_dyn

    ppx, ppy, ppz = player_pos[:, 0], player_pos[:, 1], player_pos[:, 2]
    pvx, pvy, pvz = player_vel[:, 0], player_vel[:, 1], player_vel[:, 2]

    use_pallas = _use_pallas()
    if use_pallas:
        from c_game_engine_tpu.ops.capsule_resolve import T_CHUNK

        T = cmap.tri_soa.shape[1]
        tri16 = jnp.concatenate(
            [cmap.tri_soa.T, cmap.tri_valid[:, None].astype(jnp.float32), jnp.zeros((T, 3), jnp.float32)],
            axis=1,
        )
        t_pad = (-T) % T_CHUNK
        if t_pad:
            tri16 = jnp.concatenate([tri16, jnp.zeros((t_pad, 16), jnp.float32)], 0)
    else:
        tri16 = None

    def rot_inv_apply(qx, qy, qz, qw, iIx, iIy, iIz, tx, ty, tz):
        """world I^-1 @ t for diagonal local inertia."""
        lx, ly, lz = g.quat_rotate_inv_soa(qx, qy, qz, qw, tx, ty, tz)
        lx, ly, lz = lx * iIx, ly * iIy, lz * iIz
        return g.quat_rotate_soa(qx, qy, qz, qw, lx, ly, lz)

    # ---------------- persistent tri-contact manifold (once per tick) ----
    # Contact POINTS/NORMALS are generated at pre-integration poses; depths
    # are recomputed each substep from the live pose (persistent-manifold
    # scheme; Jolt regenerates per collision step — PARITY.md #4).
    ccx0, ccy0, ccz0 = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
    ccx0, ccy0, ccz0 = ccx0 + dpx, ccy0 + dpy, ccz0 + dpz
    # ---------------- persistent PAIR manifold (once per tick, same scheme):
    # normals + support radii at pre-integration poses; substeps only
    # re-project the live centers onto the cached normals. The per-substep
    # normalize + two box_support evaluations on [D, N, B] were the pair
    # phase's cost.
    e3g = lambda a: a[:, None, :]  # [D, B] -> [D, 1, B]
    og = lambda a: a[None, :, :]  # [N, B] -> [1, N, B]
    pvx0 = e3g(ccx0) - og(o_cx)
    pvy0 = e3g(ccy0) - og(o_cy)
    pvz0 = e3g(ccz0) - og(o_cz)
    pnx, pny, pnz, pdist0 = g.normalize3(pvx0, pvy0, pvz0)
    r_i0 = g.box_support_soa(
        e3g(dqx), e3g(dqy), e3g(dqz), e3g(dqw),
        e3g(jnp.broadcast_to(dhx, (D, B))), e3g(jnp.broadcast_to(dhy, (D, B))),
        e3g(jnp.broadcast_to(dhz, (D, B))), pnx, pny, pnz,
    )
    r_j0 = g.box_support_soa(
        og(oqx), og(oqy), og(oqz), og(oqw),
        og(jnp.broadcast_to(ohx, (n, B))), og(jnp.broadcast_to(ohy, (n, B))),
        og(jnp.broadcast_to(ohz, (n, B))), -pnx, -pny, -pnz,
    )
    p_rsum = 0.8 * (r_i0 + r_j0)
    not_self = (sl[:, None] != jnp.arange(n)[None, :])[:, :, None]
    pair_ok0 = e3g(d_on_t) & og(o_solid) & not_self
    pair_cand = pair_ok0 & (p_rsum - pdist0 > -0.3)

    # ------------------------------------------------------- body sleeping
    # A body below the velocity threshold for SLEEP_AFTER ticks freezes:
    # no gravity/integration, no triangle-contact generation (its compacted
    # chunk count drops to zero in the kernel). Wake on: own velocity
    # (reaction impulses / gameplay writes persist through the writeback),
    # a nearby moving solid (kinematic door sliding out from under it, an
    # awake body about to land on it), or the moving player capsule.
    # Divergence from Jolt: islands wake one contact-hop per tick instead
    # of instantly (PARITY.md).
    sleep_d = actors.sleep[:, slc].T  # [D, B]
    asleep0 = sleep_d >= SLEEP_AFTER
    self_moving = dvx * dvx + dvy * dvy + dvz * dvz > SLEEP_SPEED2
    near0 = pair_ok0 & (p_rsum - pdist0 > -0.05)
    o_speed2 = (ovx * ovx + ovy * ovy + ovz * ovz)  # [N, B]
    wake_pair = jnp.any(near0 & og(o_speed2 > SLEEP_SPEED2), axis=1)  # [D, B]
    # player proximity at the pre-integration pose
    sy0w = ppy - CAPSULE_HALF_HEIGHT
    sy1w = ppy + CAPSULE_HALF_HEIGHT
    qpx0, qpy0, qpz0 = g.closest_point_on_vseg_soa(
        ccx0, ccy0, ccz0, ppx[None], sy0w[None], sy1w[None], ppz[None]
    )
    dxw, dyw, dzw = ccx0 - qpx0, ccy0 - qpy0, ccz0 - qpz0
    pnxw, pnyw, pnzw, pdw = g.normalize3(dxw, dyw, dzw)
    rsw = g.box_support_soa(dqx, dqy, dqz, dqw, dhx * 1.0, dhy * 1.0, dhz * 1.0, pnxw, pnyw, pnzw)
    p_speed2 = jnp.sum(player_vel * player_vel, -1)[None]  # [1, B]
    wake_player = (0.9 * rsw + CAPSULE_RADIUS - pdw > -0.05) & (p_speed2 > SLEEP_SPEED2)
    awake = d_on_t & (~asleep0 | self_moving | wake_pair | wake_player)

    if use_pallas:
        from c_game_engine_tpu.ops.body_contacts import BLK as PBLK, body_contacts_pallas

        pad = (-B) % PBLK
        body11 = jnp.zeros((16, D, B + pad), jnp.float32)
        comps = [ccx0, ccy0, ccz0, dqx, dqy, dqz, dqw,
                 jnp.broadcast_to(dhx, (D, B)), jnp.broadcast_to(dhy, (D, B)),
                 jnp.broadcast_to(dhz, (D, B)), awake.astype(jnp.float32)]
        for k_, a_ in enumerate(comps):
            body11 = body11.at[k_, :, :B].set(a_)
        # per-body chunk margin: this body's support diagonal + candidate
        # slack (tighter than the map-wide aux['body_margin'] bound, which
        # still governs the grid fallback's inflation)
        margin_d = jnp.sqrt(dhx * dhx + dhy * dhy + dhz * dhz)[:, 0] + 0.35
        outc = body_contacts_pallas(
            tri16, cmap.chunk_bounds, body11, D, margin_d
        )[:, :, :B]
        gen_d = outc[0].reshape(D, MANIFOLD_K, B)
        c_nx = outc[1].reshape(D, MANIFOLD_K, B)
        c_ny = outc[2].reshape(D, MANIFOLD_K, B)
        c_nz = outc[3].reshape(D, MANIFOLD_K, B)
        c_px = outc[4].reshape(D, MANIFOLD_K, B)
        c_py = outc[5].reshape(D, MANIFOLD_K, B)
        c_pz = outc[6].reshape(D, MANIFOLD_K, B)
    else:
        cand = _grid_cells_at(cmap, ccx0.reshape(-1), ccz0.reshape(-1))  # [L, D*B]
        L = cand.shape[0]
        cand = cand.reshape(L, D, B).transpose(1, 0, 2)  # [D, L, B]
        c = _tri_comps(cmap, cand)
        cand_ok0 = (cand >= 0) & jnp.take(cmap.tri_valid, jnp.clip(cand, 0, None)) & awake[:, None, :]
        e = lambda a_: a_[:, None, :]
        qtx, qty, qtz = g.closest_point_on_triangle_soa(
            e(ccx0), e(ccy0), e(ccz0), c[0], c[1], c[2], c[3], c[4], c[5], c[6], c[7], c[8]
        )
        dx_, dy_, dz_ = e(ccx0) - qtx, e(ccy0) - qty, e(ccz0) - qtz
        rnx, rny, rnz, dist = g.normalize3(dx_, dy_, dz_)
        fnx, fny, fnz = c[9], c[10], c[11]
        side = jnp.sign(g.dot3(e(ccx0) - c[0], e(ccy0) - c[1], e(ccz0) - c[2], fnx, fny, fnz))
        side = jnp.where(side == 0, 1.0, side)
        flip = jnp.sign(g.dot3(rnx, rny, rnz, fnx, fny, fnz)) * side
        flip = jnp.where(flip == 0, 1.0, flip)
        cnx0 = jnp.where(dist > 1e-6, rnx * flip, fnx * side)
        cny0 = jnp.where(dist > 1e-6, rny * flip, fny * side)
        cnz0 = jnp.where(dist > 1e-6, rnz * flip, fnz * side)
        signed = g.dot3(dx_, dy_, dz_, cnx0, cny0, cnz0)
        r_sup0 = g.box_support_soa(e(dqx), e(dqy), e(dqz), e(dqw), e(dhx * 1.0), e(dhy * 1.0), e(dhz * 1.0), cnx0, cny0, cnz0)
        depth0 = jnp.where(cand_ok0, r_sup0 - signed, -jnp.inf)
        sel = [[] for _ in range(7)]
        dwork = depth0
        for _k in range(MANIFOLD_K):
            i = jnp.argmax(dwork, axis=1)
            tk = lambda a_: jnp.take_along_axis(a_, i[:, None, :], axis=1)[:, 0, :]
            for li, a_ in enumerate((dwork, cnx0, cny0, cnz0, qtx, qty, qtz)):
                sel[li].append(tk(a_))
            dwork = jnp.where(jnp.arange(L)[None, :, None] == i[:, None, :], -jnp.inf, dwork)
        gen_d, c_nx, c_ny, c_nz, c_px, c_py, c_pz = (jnp.stack(x, 1) for x in sel)
    # candidate set: contacts + near-contacts (catch mid-tick impacts)
    cand_live = gen_d > -0.3

    def substep(carry, _):
        dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz = carry
        on = awake  # sleeping lanes: frozen pose, no gravity/pushes
        dvy = jnp.where(on, dvy + GRAVITY_Y * h, dvy)
        dpx = jnp.where(on, dpx + dvx * h, dpx)
        dpy = jnp.where(on, dpy + dvy * h, dpy)
        dpz = jnp.where(on, dpz + dvz * h, dpz)
        # quaternion integration: q += 0.5*h*(omega_quat * q)
        ow = 0.0
        nqx = dqx + 0.5 * h * (dwx * dqw + dwy * dqz - dwz * dqy)
        nqy = dqy + 0.5 * h * (-dwx * dqz + dwy * dqw + dwz * dqx)
        nqz = dqz + 0.5 * h * (dwx * dqy - dwy * dqx + dwz * dqw)
        nqw = dqw + 0.5 * h * (-dwx * dqx - dwy * dqy - dwz * dqz)
        qn = jnp.sqrt(nqx * nqx + nqy * nqy + nqz * nqz + nqw * nqw)
        qn = jnp.maximum(qn, 1e-12)
        dqx = jnp.where(on, nqx / qn, dqx)
        dqy = jnp.where(on, nqy / qn, dqy)
        dqz = jnp.where(on, nqz / qn, dqz)
        dqw = jnp.where(on, nqw / qn, dqw)

        # box centers
        ccx, ccy, ccz = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
        ccx, ccy, ccz = ccx + dpx, ccy + dpy, ccz + dpz

        # ------------------- recompute manifold depths at the live pose
        e2m = lambda a_: a_[:, None, :]
        r_sup_k = g.box_support_soa(
            e2m(dqx), e2m(dqy), e2m(dqz), e2m(dqw),
            e2m(dhx * 1.0), e2m(dhy * 1.0), e2m(dhz * 1.0), c_nx, c_ny, c_nz,
        )
        signed_k = (
            (e2m(ccx) - c_px) * c_nx + (e2m(ccy) - c_py) * c_ny + (e2m(ccz) - c_pz) * c_nz
        )
        c_d = jnp.where(cand_live & e2m(on), r_sup_k - signed_k, -jnp.inf)
        active = c_d > 0.0

        def solver_iter(_, vo):
            dvx, dvy, dvz, dwx, dwy, dwz = vo
            e2 = lambda a: a[:, None, :]
            rx_ = c_px - e2(ccx)
            ry_ = c_py - e2(ccy)
            rz_ = c_pz - e2(ccz)
            # v_pt = v + w x r
            vptx = e2(dvx) + e2(dwy) * rz_ - e2(dwz) * ry_
            vpty = e2(dvy) + e2(dwz) * rx_ - e2(dwx) * rz_
            vptz = e2(dvz) + e2(dwx) * ry_ - e2(dwy) * rx_
            vn = g.dot3(vptx, vpty, vptz, c_nx, c_ny, c_nz)
            rxnx, rxny, rxnz = g.cross3(rx_, ry_, rz_, c_nx, c_ny, c_nz)
            ax_, ay_, az_ = rot_inv_apply(
                e2(dqx), e2(dqy), e2(dqz), e2(dqw), e2(iIx), e2(iIy), e2(iIz), rxnx, rxny, rxnz
            )
            axr_x, axr_y, axr_z = g.cross3(ax_, ay_, az_, rx_, ry_, rz_)
            k_n = d_inv_m[:, None, :] + g.dot3(axr_x, axr_y, axr_z, c_nx, c_ny, c_nz)
            jn = jnp.where(active & (vn < 0), -vn / jnp.maximum(k_n, 1e-9), 0.0) * RELAX
            impx, impy, impz = c_nx * jn, c_ny * jn, c_nz * jn
            dvx = dvx + jnp.sum(impx, 1) * d_inv_m
            dvy = dvy + jnp.sum(impy, 1) * d_inv_m
            dvz = dvz + jnp.sum(impz, 1) * d_inv_m
            tqx, tqy, tqz = g.cross3(rx_, ry_, rz_, impx, impy, impz)
            wx_, wy_, wz_ = rot_inv_apply(
                e2(dqx), e2(dqy), e2(dqz), e2(dqw), e2(iIx), e2(iIy), e2(iIz), tqx, tqy, tqz
            )
            dwx = dwx + jnp.sum(wx_, 1)
            dwy = dwy + jnp.sum(wy_, 1)
            dwz = dwz + jnp.sum(wz_, 1)

            # friction
            vptx = e2(dvx) + e2(dwy) * rz_ - e2(dwz) * ry_
            vpty = e2(dvy) + e2(dwz) * rx_ - e2(dwx) * rz_
            vptz = e2(dvz) + e2(dwx) * ry_ - e2(dwy) * rx_
            vn2 = g.dot3(vptx, vpty, vptz, c_nx, c_ny, c_nz)
            vtx = vptx - c_nx * vn2
            vty = vpty - c_ny * vn2
            vtz = vptz - c_nz * vn2
            tdx, tdy, tdz, vt_mag = g.normalize3(vtx, vty, vtz)
            rxtx, rxty, rxtz = g.cross3(rx_, ry_, rz_, tdx, tdy, tdz)
            at_x, at_y, at_z = rot_inv_apply(
                e2(dqx), e2(dqy), e2(dqz), e2(dqw), e2(iIx), e2(iIy), e2(iIz), rxtx, rxty, rxtz
            )
            atr_x, atr_y, atr_z = g.cross3(at_x, at_y, at_z, rx_, ry_, rz_)
            k_t = d_inv_m[:, None, :] + g.dot3(atr_x, atr_y, atr_z, tdx, tdy, tdz)
            jt_needed = vt_mag / jnp.maximum(k_t, 1e-9)
            jt = jnp.where(active, jnp.minimum(jt_needed, d_mu[:, None, :] * jnp.maximum(jn, 0.0)), 0.0)
            fx, fy, fz = -tdx * jt * RELAX, -tdy * jt * RELAX, -tdz * jt * RELAX
            dvx = dvx + jnp.sum(fx, 1) * d_inv_m
            dvy = dvy + jnp.sum(fy, 1) * d_inv_m
            dvz = dvz + jnp.sum(fz, 1) * d_inv_m
            tqx, tqy, tqz = g.cross3(rx_, ry_, rz_, fx, fy, fz)
            wx_, wy_, wz_ = rot_inv_apply(
                e2(dqx), e2(dqy), e2(dqz), e2(dqw), e2(iIx), e2(iIy), e2(iIz), tqx, tqy, tqz
            )
            dwx = dwx + jnp.sum(wx_, 1)
            dwy = dwy + jnp.sum(wy_, 1)
            dwz = dwz + jnp.sum(wz_, 1)
            return dvx, dvy, dvz, dwx, dwy, dwz

        # unrolled (not fori_loop): iterations are pure elementwise chains,
        # so XLA fuses across them instead of paying per-iteration launches
        _c = (dvx, dvy, dvz, dwx, dwy, dwz)
        for _i in range(SOLVER_ITERS):
            _c = solver_iter(_i, _c)
        dvx, dvy, dvz, dwx, dwy, dwz = _c

        over = jnp.maximum(c_d - PENETRATION_SLOP, 0.0) * BAUMGARTE
        dpx = dpx + jnp.sum(c_nx * over, 1)
        dpy = dpy + jnp.sum(c_ny * over, 1)
        dpz = dpz + jnp.sum(c_nz * over, 1)

        # ---------------------------------- vs other actors [D, N, B]
        # cached pair manifold: re-project live centers onto the fixed
        # normals (depth only; normals/supports generated once per tick)
        ccx2, ccy2, ccz2 = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
        ccx2, ccy2, ccz2 = ccx2 + dpx, ccy2 + dpy, ccz2 + dpz
        e3 = lambda a: a[:, None, :]  # [D, B] -> [D, 1, B]
        o = lambda a: a[None, :, :]  # [N, B] -> [1, N, B]
        signed_p = (
            (e3(ccx2) - o(o_cx)) * pnx
            + (e3(ccy2) - o(o_cy)) * pny
            + (e3(ccz2) - o(o_cz)) * pnz
        )
        pdepth = jnp.where(pair_cand, p_rsum - signed_p, -jnp.inf)
        pactive = pdepth > 0.0

        def pair_iter(_, dv):
            dvx, dvy, dvz = dv
            # target velocity: dynamic targets read their dyn lane, others 0
            tvx = jnp.where((a2d >= 0)[:, None], dvx[jnp.clip(a2d, 0, None)], ovx)
            tvy = jnp.where((a2d >= 0)[:, None], dvy[jnp.clip(a2d, 0, None)], ovy)
            tvz = jnp.where((a2d >= 0)[:, None], dvz[jnp.clip(a2d, 0, None)], ovz)
            rel = (
                (e3(dvx) - o(tvx)) * pnx
                + (e3(dvy) - o(tvy)) * pny
                + (e3(dvz) - o(tvz)) * pnz
            )
            k = d_inv_m[:, None, :] + o(o_inv_m)
            jn = jnp.where(pactive & (rel < 0), -rel / jnp.maximum(k, 1e-9), 0.0) * 0.5
            dvx = dvx + jnp.sum(pnx * jn, 1) * d_inv_m
            dvy = dvy + jnp.sum(pny * jn, 1) * d_inv_m
            dvz = dvz + jnp.sum(pnz * jn, 1) * d_inv_m
            # reaction onto dynamic targets
            rxs = -jnp.sum(pnx * jn, 0)  # [N, B]
            rys = -jnp.sum(pny * jn, 0)
            rzs = -jnp.sum(pnz * jn, 0)
            dvx = dvx + rxs[slc] * d_inv_m
            dvy = dvy + rys[slc] * d_inv_m
            dvz = dvz + rzs[slc] * d_inv_m
            return dvx, dvy, dvz

        _c = (dvx, dvy, dvz)
        for _i in range(PAIR_ITERS):  # unrolled for cross-iteration fusion
            _c = pair_iter(_i, _c)
        dvx, dvy, dvz = _c
        pushx = jnp.sum(jnp.where(pactive, pnx * 0.3 * pdepth, 0.0), 1)
        pushy = jnp.sum(jnp.where(pactive, pny * 0.3 * pdepth, 0.0), 1)
        pushz = jnp.sum(jnp.where(pactive, pnz * 0.3 * pdepth, 0.0), 1)
        dpx = jnp.where(on, dpx + pushx, dpx)
        dpy = jnp.where(on, dpy + pushy, dpy)
        dpz = jnp.where(on, dpz + pushz, dpz)

        # -------------------------------------------------- vs player [D, B]
        ccx3, ccy3, ccz3 = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
        ccx3, ccy3, ccz3 = ccx3 + dpx, ccy3 + dpy, ccz3 + dpz
        sy0 = ppy - CAPSULE_HALF_HEIGHT
        sy1 = ppy + CAPSULE_HALF_HEIGHT
        qpx, qpy, qpz = g.closest_point_on_vseg_soa(ccx3, ccy3, ccz3, ppx[None], sy0[None], sy1[None], ppz[None])
        dxp, dyp, dzp = ccx3 - qpx, ccy3 - qpy, ccz3 - qpz
        pnx2, pny2, pnz2, pd = g.normalize3(dxp, dyp, dzp)
        rs = g.box_support_soa(dqx, dqy, dqz, dqw, dhx * 1.0, dhy * 1.0, dhz * 1.0, pnx2, pny2, pnz2)
        cdepth = jnp.where(on, 0.9 * rs + CAPSULE_RADIUS - pd, -jnp.inf)
        inv_m_player = 1.0 / CHARACTER_MASS
        rel_v = (dvx - pvx[None]) * pnx2 + (dvy - pvy[None]) * pny2 + (dvz - pvz[None]) * pnz2
        jn = jnp.where((cdepth > 0) & (rel_v < 0), -rel_v / (d_inv_m + inv_m_player + 1e-9), 0.0)
        dvx = dvx + pnx2 * jn * d_inv_m
        dvy = dvy + pny2 * jn * d_inv_m
        dvz = dvz + pnz2 * jn * d_inv_m
        pp = jnp.maximum(cdepth - PENETRATION_SLOP, 0.0) * 0.5 * ((cdepth > PENETRATION_SLOP) & on)
        dpx = dpx + pnx2 * pp
        dpy = dpy + pny2 * pp
        dpz = dpz + pnz2 * pp

        return (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz), None

    carry = (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz)
    for _s in range(n_substeps):  # unrolled for cross-substep fusion
        carry, _ = substep(carry, None)
    (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz) = carry

    # sleep counter: consecutive ticks with point velocity (|v| + |w|*r
    # bound) under threshold; capped at SLEEP_AFTER
    diag2 = dhx * dhx + dhy * dhy + dhz * dhz  # [D, 1]
    final_speed2 = (
        dvx * dvx + dvy * dvy + dvz * dvz + (dwx * dwx + dwy * dwy + dwz * dwz) * diag2
    )
    slow = final_speed2 <= SLEEP_SPEED2
    sleep_new = jnp.where(
        d_on_t & slow, jnp.minimum(sleep_d + 1, SLEEP_AFTER), 0
    )  # [D, B]

    # write dynamic lanes back ([D, B] -> [B, N, .]) via a static one-hot
    # contraction over D (dyn_slots is compile-time; batched scatters
    # compile to standalone unfused kernels on TPU — memory playbook)
    d2n = ((sl[:, None] == jnp.arange(n)[None, :]) & (sl >= 0)[:, None]).astype(
        jnp.float32
    )  # [D, N] static
    expand = lambda comps: jnp.einsum(
        "cdb,dn->bnc", jnp.stack(comps), d2n, precision="float32"
    )
    dpos_new = expand([dpx, dpy, dpz])  # [B, N, 3]
    dquat_new = expand([dqx, dqy, dqz, dqw])
    dvel_new = expand([dvx, dvy, dvz])
    domega_new = expand([dwx, dwy, dwz])
    live = jnp.einsum("db,dn->bn", d_on_t.astype(jnp.float32), d2n) > 0.5  # [B, N]
    m3 = live[..., None]
    pos = jnp.where(m3, dpos_new, k_pos)
    quat = jnp.where(m3, dquat_new, actors.quat)
    vel = jnp.where(m3, dvel_new, actors.vel)
    omega = jnp.where(m3, domega_new, actors.omega)
    sleep_n = jnp.einsum("db,dn->bn", sleep_new.astype(jnp.float32), d2n).astype(jnp.int32)
    sleep = jnp.where(live, sleep_n, actors.sleep)
    return pos, quat, vel, omega, sleep
