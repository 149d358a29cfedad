"""Batch-wide physics kernels in lanes-major/batch-minor layout.

These are the hot paths of the tick, hand-batched over the env axis instead
of vmapped, so every large intermediate has its two minor dimensions dense
on the TPU's (8, 128) tiles (see geometry_soa.py for why). The character
path matches physics/character.py (the readable single-env reference,
cross-validated against the C++ double-precision oracle in
tests/test_native.py); the rigid-body path's behavioral contract lives in
tests/test_stacking.py and tests/test_hulls.py.

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

# Solver contractions ([P,B]x[P,D,B] contact-basis projections, one-hot
# writebacks). These run at DEFAULT matmul precision deliberately: XLA
# lowers these small/batched contractions exactly (measured CPU-vs-TPU
# trajectory agreement ~1e-6 over 85 ticks at default in rounds 2-5),
# and forcing Precision.HIGHEST measured -28% steps/s on the shapes
# config. The renderer's 4x4 projection products DO need HIGHEST
# (PARITY.md #19); the guard for THIS choice is the on-chip
# CPU-vs-TPU trajectory test (tests/test_tpu_parity.py), which fails if
# a compiler change ever starts rounding these through bf16.
def _einsum32(*args, **kw):
    return jnp.einsum(*args, **kw)


def _unroll_loops() -> bool:
    """Unroll solver/substep loops on TPU (cross-iteration fusion); rolled
    lax loops elsewhere keep XLA:CPU compile times sane for the test
    suite (identical per-iteration math either way)."""
    return jax.default_backend() == "tpu"


def _use_pallas() -> bool:
    """Pallas kernels on TPU; CGE_FORCE_XLA=1 forces the XLA fallback even
    there (used by tests/test_tpu_parity.py to cross-validate the paths)."""
    import os

    return jax.default_backend() == "tpu" and not os.environ.get("CGE_FORCE_XLA")


GRAVITY_Y = -9.81
MAP_FRICTION = 4.25
# combined constraint sweeps per substep: each iteration runs the triangle
# solve (centroid + per-point Jacobi) THEN the pair solve, so chain stacks
# (floor <- box <- box <- box) converge — separate loops never let the
# floor contact see the stack's transmitted weight within a tick
SOLVER_ITERS = 6
# island sleeping (Jolt PhysicsSettings: pointVelocitySleepThreshold 0.03
# m/s, timeBeforeSleep 0.5 s = 30 ticks)
SLEEP_SPEED2 = 0.03 * 0.03
SLEEP_AFTER = 30
BAUMGARTE = 0.2
PENETRATION_SLOP = 0.005
RELAX = 0.7
# per-tick velocity retention for slow flat-supported bodies (see the
# rest-bleed block at the end of _bodies_active)
REST_BLEED = 0.6
MANIFOLD_K = 4
# pair narrowphase: broadphase candidates compact to P_CAP slots per env
# (top_k over the [D, N] candidate mask), each carrying a K2-point SAT
# manifold. Overflowing candidates beyond P_CAP are dropped farthest-index
# first (the maps' simultaneous touching-pair counts stay well under this).
P_CAP = 16
K2 = 4
PAIR_CAND_SLACK = 0.3

from c_game_engine_tpu.core.state import PAIR_WARM_CAP as _PAIR_WARM_CAP  # noqa: E402

assert P_CAP <= _PAIR_WARM_CAP, "warm-start cache narrower than the pair table"


def _support_toward(qx, qy, qz, qw, hx, hy, hz, nx, ny, nz, verts=None, is_box=None):
    """Support extent of a dynamic body from its shape center along -n
    (toward the other object), where n is the WORLD-space contact normal
    pointing from the contact toward the center.

    verts=None -> closed-form box support (symmetric, so the sign doesn't
    matter); verts [D, V, 3] -> vert-cloud support max_v((R v) . -n),
    exactly the ConvexHullShape support the reference gets from Jolt
    (ModelLoader.c:323-351). The V loop is unrolled: peak memory stays at
    the lane shape instead of materializing [D, V, ...]. is_box (static
    per-row bools) selects the closed form row-wise so box bodies produce
    bit-identical values to the all-box fast path (and to the Pallas
    kernel, which specializes per body the same way)."""
    lx, ly, lz = g.quat_rotate_inv_soa(qx, qy, qz, qw, nx, ny, nz)
    box_sup = jnp.abs(lx) * hx + jnp.abs(ly) * hy + jnp.abs(lz) * hz
    if verts is None:
        return box_sup
    d, v_cnt, _ = verts.shape
    extra = (1,) * (lx.ndim - 1)
    # verts as a reduction axis right after D (XLA fuses the max into the
    # madd chain, so [D, V, ...] never materializes)
    vsh = (d, v_cnt) + extra
    vx = verts[:, :, 0].reshape(vsh)
    vy = verts[:, :, 1].reshape(vsh)
    vz = verts[:, :, 2].reshape(vsh)
    acc = jnp.max(
        -(vx * lx[:, None] + vy * ly[:, None] + vz * lz[:, None]), axis=1
    )
    if is_box is not None:
        import numpy as np

        sel = np.asarray(is_box, bool)[:d].reshape((d,) + extra)
        acc = jnp.where(jnp.asarray(sel), box_sup, acc)
    return acc


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
    # support vert clouds for the narrowphase (None on all-box maps keeps
    # the closed-form box support; see compile.py aux['hulls_are_boxes'])
    d_verts = None if cmap.aux["hulls_are_boxes"] else cmap.hull_verts[slc]
    # maps with zero dynamic actors skip the pair solve entirely (the
    # compacted pair GENERATION stays: its vars are cheap and keep one code
    # path)
    pairs_enabled = cmap.aux.get("num_dynamic", 1) > 0
    d_is_box = None if cmap.aux["hulls_are_boxes"] else cmap.aux["dyn_is_box"]

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
        # cols 13-15: active-edge flags (compiler/edges.py) for the
        # contact kernel's inactive-edge normal fix
        tri16 = jnp.concatenate(
            [cmap.tri_soa.T, cmap.tri_valid[:, None].astype(jnp.float32),
             cmap.tri_edge_active],
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
    # r_i0/r_j0/p_rsum/pnx.. are kept ONLY for the conservative wake tests
    # below (box supports bound the hull clouds). The contact path itself is
    # the compacted SAT narrowphase:
    #
    # ------------- compacted pair SAT narrowphase (once per tick) --------
    # Broadphase candidates ([D, N, B] center-axis support overlap — exact
    # for no convex pair can touch without projection overlap on the center
    # axis) compact to P_CAP pair slots per env via top_k, the TPU-idiomatic
    # replacement for Jolt's quadtree pair cache (Physics.c:89-100). Each
    # slot runs a 16-axis SAT (3+3 face axes, 9 edge cross products, center
    # axis) with vert-cloud supports (ModelLoader.c:323-351 ConvexHullShape
    # semantics; boxes use their 8 corners) and emits a K2-point manifold:
    # penetrating verts of either body clipped laterally by the other's box
    # bound, plus a support-midpoint candidate for edge-edge alignments.
    # Substeps re-project depths by center translation along the cached
    # normal (persistent-manifold scheme, same as the triangle path).
    pair_bp = pair_ok0 & ((r_i0 + r_j0) - pdist0 > -PAIR_CAND_SLACK)
    # mirrored dyn-dyn pairs collapse to one slot (solved bilaterally)
    keep_pair = (~(a2d >= 0))[None, :] | (sl[:, None] < jnp.arange(n)[None, :])
    DN = D * n
    P = min(P_CAP, DN)

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
    # island-synchronized sleep entry (Jolt sleeps whole islands
    # atomically — PhysicsSystem island manager): a body may only cross
    # the sleep threshold together with every body it touches, so gate on
    # the ISLAND-MINIMUM counter, min-propagated over touching pairs.
    # Without this, the member that settled first sleeps a few ticks
    # early, and the still-awake rest of the stack then reacts against an
    # unsupported frozen body (the warm-start reaction has nothing under
    # it) — a measured g*h downward kick that resets the whole island.
    # 4 hops covers islands of diameter 5 (tallest shipped/bench stack is
    # 3-4); taller chains still converge over ticks as counters advance.
    d2n = ((sl[:, None] == jnp.arange(n)[None, :]) & (sl >= 0)[:, None]).astype(
        jnp.float32
    )  # [D, N] static (also used by the final writeback)
    _touch = pair_ok0 & ((r_i0 + r_j0) - pdist0 > -0.05)  # [D, N, B]
    _BIGC = jnp.float32(1e6)
    cnt_n = jnp.where(o_inv_m > 0.0, actors.sleep.T.astype(jnp.float32), _BIGC)
    cnt_d = sleep_d.astype(jnp.float32)
    _has_lane = (a2d >= 0)[:, None]  # [N, 1]
    for _hop in range(4):
        pmin = jnp.min(jnp.where(_touch, cnt_n[None, :, :], _BIGC), axis=1)
        cnt_d = jnp.minimum(cnt_d, pmin)
        scat = _einsum32("db,dn->nb", cnt_d, d2n)
        cnt_n = jnp.where(_has_lane, jnp.minimum(cnt_n, scat), cnt_n)
    asleep0 = cnt_d >= SLEEP_AFTER
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
    rsw = _support_toward(dqx, dqy, dqz, dqw, dhx * 1.0, dhy * 1.0, dhz * 1.0,
                          pnxw, pnyw, pnzw, verts=d_verts, is_box=d_is_box)
    p_speed2 = jnp.sum(player_vel * player_vel, -1)[None]  # [1, B]
    wake_player = (0.9 * rsw + CAPSULE_RADIUS - pdw > -0.05) & (p_speed2 > SLEEP_SPEED2)
    awake = d_on_t & (~asleep0 | self_moving | wake_pair | wake_player)
    # batch-global pair-activity gate: the expensive SAT generation and the
    # in-substep pair solve run under lax.cond, so ticks where every
    # broadphase pair candidate is fully asleep (the common steady state —
    # resting stacks, settled props) skip them entirely. A candidate is
    # live when either side is awake; kinematic movers and the player wake
    # sleeping bodies through wake_pair/wake_player first, which flips this
    # gate the following tick.
    awake_nb = _einsum32("db,dn->nb", awake.astype(jnp.float32), d2n) > 0.5  # [N, B]
    pair_any = jnp.any(pair_bp & (awake[:, None, :] | awake_nb[None, :, :]))


    def _pair_gen(_):
        # top_k slot compaction lives INSIDE the gate: quiet ticks (all
        # candidates asleep) never pay for it.
        prio = jnp.where(
            (pair_bp & keep_pair[:, :, None]).reshape(DN, B),
            DN - jnp.arange(DN, dtype=jnp.int32)[:, None],
            0,
        )
        topv, _ = jax.lax.top_k(prio.T, P)  # [B, P]
        vals = topv.T  # [P, B]
        pr_on = vals > 0
        fidx = jnp.where(pr_on, DN - vals, 0)
        p_d = fidx // n  # [P, B] A-side dyn lane
        p_n = fidx % n  # [P, B] B-side actor slot
        a_act = slc[p_d]  # [P, B] A-side actor slot
        # warm-start keys: the flat (dyn lane, actor) index identifies a
        # pair across ticks (slot ORDER is already deterministic — prio is
        # index-ranked — but the slot a pair lands in shifts when
        # candidates appear/disappear, so matching is by key, not slot)
        fidx_keys = jnp.where(pr_on, fidx, -1).astype(jnp.int32)
        # PACKED gathers: TPU gathers are scalarized, so the ~30 separate
        # per-pair lookups this block used to make were most of the
        # generation cost. One static per-actor row gather per side + one
        # dynamic per-(actor, env) row gather + one dyn-lane row gather
        # replace them; vert clouds ride along in the static rows.
        use_hulls_pair = not cmap.aux["hulls_are_boxes"]
        stat_cols = [
            cmap.halfext,  # 0:3
            cmap.inv_mass[:, None],  # 3
            cmap.inv_inertia,  # 4:7
            cmap.friction[:, None],  # 7
        ]
        if use_hulls_pair:
            stat_cols.append(cmap.hull_verts.reshape(n, -1))  # 8:8+3V
        stat = jnp.concatenate(stat_cols, axis=1)  # [N, F]
        sa = stat[a_act]  # [P, B, F]
        sb = stat[p_n]
        hax, hay, haz = sa[..., 0], sa[..., 1], sa[..., 2]
        hbx, hby, hbz = sb[..., 0], sb[..., 1], sb[..., 2]
        a_invm = sa[..., 3]
        a_iIx, a_iIy, a_iIz = sa[..., 4], sa[..., 5], sa[..., 6]
        b_iIx, b_iIy, b_iIz = sb[..., 4], sb[..., 5], sb[..., 6]
        a_mu_p = jnp.sqrt(sa[..., 7] * sb[..., 7])  # geometric mean
        dynB = jnp.stack(
            [o_cx, o_cy, o_cz, oqx, oqy, oqz, oqw, ovx, ovy, ovz, o_inv_m], -1
        )  # [N, B, 11]
        db = jnp.take_along_axis(dynB, p_n[:, :, None], axis=0)  # [P, B, 11]
        pB_cx, pB_cy, pB_cz = db[..., 0], db[..., 1], db[..., 2]
        pB_qx, pB_qy, pB_qz, pB_qw = db[..., 3], db[..., 4], db[..., 5], db[..., 6]
        b_invm = db[..., 10]
        dynA = jnp.stack([ccx0, ccy0, ccz0, dqx, dqy, dqz, dqw], -1)  # [D, B, 7]
        da = jnp.take_along_axis(dynA, p_d[:, :, None], axis=0)
        pA_cx, pA_cy, pA_cz = da[..., 0], da[..., 1], da[..., 2]
        pA_qx, pA_qy, pA_qz, pA_qw = da[..., 3], da[..., 4], da[..., 5], da[..., 6]
        b_dyn = (a2d[p_n] >= 0) & pr_on
        b_dl = jnp.clip(a2d[p_n], 0, D - 1)
        b_dynf = b_dyn.astype(jnp.float32)
        b_iIx, b_iIy, b_iIz = b_iIx * b_dynf, b_iIy * b_dynf, b_iIz * b_dynf
        # kinematic/static B-side velocity contribution (doors push boxes)
        vkBx = db[..., 7] * (1.0 - b_dynf)
        vkBy = db[..., 8] * (1.0 - b_dynf)
        vkBz = db[..., 9] * (1.0 - b_dynf)
        tx_p = pA_cx - pB_cx
        ty_p = pA_cy - pB_cy
        tz_p = pA_cz - pB_cz

        # per-side support vert clouds [P, NV, B] (boxes synthesize their 8
        # signed corners from halfext — no gathers, exact)
        if use_hulls_pair:
            v_cnt = cmap.hull_verts.shape[1]
            hvA = sa[..., 8 : 8 + 3 * v_cnt].reshape(*sa.shape[:2], v_cnt, 3)
            hvB = sb[..., 8 : 8 + 3 * v_cnt].reshape(*sb.shape[:2], v_cnt, 3)
            vA_x = hvA[..., 0].transpose(0, 2, 1)  # [P, NV, B]
            vA_y = hvA[..., 1].transpose(0, 2, 1)
            vA_z = hvA[..., 2].transpose(0, 2, 1)
            vB_x = hvB[..., 0].transpose(0, 2, 1)
            vB_y = hvB[..., 1].transpose(0, 2, 1)
            vB_z = hvB[..., 2].transpose(0, 2, 1)
        else:
            import numpy as np

            _signs = np.array(
                [
                    (sx_, sy_, sz_)
                    for sx_ in (-1.0, 1.0)
                    for sy_ in (-1.0, 1.0)
                    for sz_ in (-1.0, 1.0)
                ],
                np.float32,
            )
            s_of = lambda k: jnp.asarray(_signs[:, k])[None, :, None]  # [1, 8, 1]
            vA_x, vA_y, vA_z = (s_of(k_) * h_[:, None, :] for k_, h_ in enumerate((hax, hay, haz)))
            vB_x, vB_y, vB_z = (s_of(k_) * h_[:, None, :] for k_, h_ in enumerate((hbx, hby, hbz)))
        NV = vA_x.shape[1]

        # ---- SAT: all 16 axes in one [P, 16, B] batch (3+3 face axes, 9
        # edge crosses, center axis). The per-axis Python loop was ~2000
        # tiny [P, B] ops — dispatch-bound on TPU. ----
        def rot_rows(qx_, qy_, qz_, qw_):
            xx, yy, zz = qx_ * qx_, qy_ * qy_, qz_ * qz_
            xy, xz, yz = qx_ * qy_, qx_ * qz_, qy_ * qz_
            wx, wy, wz = qw_ * qx_, qw_ * qy_, qw_ * qz_
            return (
                (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
                (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
                (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
            )

        RA = rot_rows(pA_qx, pA_qy, pA_qz, pA_qw)
        RB = rot_rows(pB_qx, pB_qy, pB_qz, pB_qw)
        axA = [(RA[0][c], RA[1][c], RA[2][c]) for c in range(3)]  # world cols
        axB = [(RB[0][c], RB[1][c], RB[2][c]) for c in range(3)]
        ax_list = axA + axB
        for ia in range(3):
            for ib in range(3):
                ax_list.append(g.cross3(*axA[ia], *axB[ib]))
        ax_list.append((tx_p, ty_p, tz_p))  # center axis (round hulls)
        AXS = jnp.stack([a_[0] for a_ in ax_list], 1)  # [P, 16, B]
        AYS = jnp.stack([a_[1] for a_ in ax_list], 1)
        AZS = jnp.stack([a_[2] for a_ in ax_list], 1)
        len2 = AXS * AXS + AYS * AYS + AZS * AZS
        axis_ok = len2 > 1e-12
        inv_l = jax.lax.rsqrt(jnp.maximum(len2, 1e-12))
        AXS, AYS, AZS = AXS * inv_l, AYS * inv_l, AZS * inv_l

        e5q = lambda q: q[:, None, :]  # [P, B] -> [P, 1, B]
        # axes in each body's local frame (R^T a)
        lAX = e5q(RA[0][0]) * AXS + e5q(RA[1][0]) * AYS + e5q(RA[2][0]) * AZS
        lAY = e5q(RA[0][1]) * AXS + e5q(RA[1][1]) * AYS + e5q(RA[2][1]) * AZS
        lAZ = e5q(RA[0][2]) * AXS + e5q(RA[1][2]) * AYS + e5q(RA[2][2]) * AZS
        lBX = e5q(RB[0][0]) * AXS + e5q(RB[1][0]) * AYS + e5q(RB[2][0]) * AZS
        lBY = e5q(RB[0][1]) * AXS + e5q(RB[1][1]) * AYS + e5q(RB[2][1]) * AZS
        lBZ = e5q(RB[0][2]) * AXS + e5q(RB[1][2]) * AYS + e5q(RB[2][2]) * AZS
        supAp = supAm = supBp = supBm = None
        for v in range(NV):
            sA = (
                e5q(vA_x[:, v]) * lAX + e5q(vA_y[:, v]) * lAY + e5q(vA_z[:, v]) * lAZ
            )
            sB = (
                e5q(vB_x[:, v]) * lBX + e5q(vB_y[:, v]) * lBY + e5q(vB_z[:, v]) * lBZ
            )
            if supAp is None:
                supAp, supAm, supBp, supBm = sA, -sA, sB, -sB
            else:
                supAp = jnp.maximum(supAp, sA)
                supAm = jnp.maximum(supAm, -sA)
                supBp = jnp.maximum(supBp, sB)
                supBm = jnp.maximum(supBm, -sB)
        tdot = e5q(tx_p) * AXS + e5q(ty_p) * AYS + e5q(tz_p) * AZS
        pen_p = supBp + supAm - tdot  # A toward +a side of B
        pen_m = supBm + supAp + tdot
        d_ax = jnp.where(axis_ok, jnp.minimum(pen_p, pen_m), jnp.inf)
        best_ax = jnp.argmin(d_ax, axis=1)[:, None, :]  # [P, 1, B]
        tk_ax = lambda a_: jnp.take_along_axis(a_, best_ax, 1)[:, 0, :]
        sat_d = tk_ax(d_ax)
        sgn = jnp.where(tk_ax(pen_p) <= tk_ax(pen_m), 1.0, -1.0)
        pn2_x = tk_ax(AXS) * sgn
        pn2_y = tk_ax(AYS) * sgn
        pn2_z = tk_ax(AZS) * sgn

        # ---- manifold candidates along the SAT normal (n points B -> A) ----
        lAx, lAy, lAz = g.quat_rotate_inv_soa(pA_qx, pA_qy, pA_qz, pA_qw, pn2_x, pn2_y, pn2_z)
        lBx, lBy, lBz = g.quat_rotate_inv_soa(pB_qx, pB_qy, pB_qz, pB_qw, pn2_x, pn2_y, pn2_z)
        tn_p = tx_p * pn2_x + ty_p * pn2_y + tz_p * pn2_z
        # relative rotations for lateral clipping (vert of one body in the
        # other's local box frame)
        qBAx, qBAy, qBAz, qBAw = g.quat_mul_soa(
            -pB_qx, -pB_qy, -pB_qz, pB_qw, pA_qx, pA_qy, pA_qz, pA_qw
        )
        qABx, qABy, qABz, qABw = g.quat_mul_soa(
            -pA_qx, -pA_qy, -pA_qz, pA_qw, pB_qx, pB_qy, pB_qz, pB_qw
        )
        tBx, tBy, tBz = g.quat_rotate_inv_soa(pB_qx, pB_qy, pB_qz, pB_qw, tx_p, ty_p, tz_p)
        tAx, tAy, tAz = g.quat_rotate_inv_soa(pA_qx, pA_qy, pA_qz, pA_qw, tx_p, ty_p, tz_p)

        # vert dots along n (per-vert, [P, NV, B]) + support points for the
        # edge-edge candidate
        e5 = lambda a: a[:, None, :]  # [P, B] -> [P, 1, B]
        dA_n = vA_x * e5(lAx) + vA_y * e5(lAy) + vA_z * e5(lAz)
        dB_n = vB_x * e5(lBx) + vB_y * e5(lBy) + vB_z * e5(lBz)
        supAm_n = jnp.max(-dA_n, axis=1)  # A's extent toward B (along -n)
        supBp_n = jnp.max(dB_n, axis=1)  # B's extent toward A (along +n)
        iA_ = jnp.argmin(dA_n, axis=1)[:, None, :]  # A's support vert along -n
        iB_ = jnp.argmax(dB_n, axis=1)[:, None, :]
        tk1 = lambda a, i_: jnp.take_along_axis(a, i_, axis=1)[:, 0, :]
        eA_x, eA_y, eA_z = tk1(vA_x, iA_), tk1(vA_y, iA_), tk1(vA_z, iA_)
        eB_x, eB_y, eB_z = tk1(vB_x, iB_), tk1(vB_y, iB_), tk1(vB_z, iB_)

        LAT_M = 0.05
        # A's verts into B: depth along n + lateral containment in B's box
        e5q = lambda q: q[:, None, :]
        dvA = e5(supBp_n - tn_p) - dA_n  # [P, NV, B]
        liAx, liAy, liAz = g.quat_rotate_soa(
            e5q(qBAx), e5q(qBAy), e5q(qBAz), e5q(qBAw), vA_x, vA_y, vA_z
        )
        latA = (
            (jnp.abs(liAx + e5(tBx)) <= e5(hbx) + LAT_M)
            & (jnp.abs(liAy + e5(tBy)) <= e5(hby) + LAT_M)
            & (jnp.abs(liAz + e5(tBz)) <= e5(hbz) + LAT_M)
        )
        wAx, wAy, wAz = g.quat_rotate_soa(
            e5q(pA_qx), e5q(pA_qy), e5q(pA_qz), e5q(pA_qw), vA_x, vA_y, vA_z
        )
        # B's verts into A
        dvB = e5(supAm_n - tn_p) + dB_n
        liBx, liBy, liBz = g.quat_rotate_soa(
            e5q(qABx), e5q(qABy), e5q(qABz), e5q(qABw), vB_x, vB_y, vB_z
        )
        latB = (
            (jnp.abs(liBx - e5(tAx)) <= e5(hax) + LAT_M)
            & (jnp.abs(liBy - e5(tAy)) <= e5(hay) + LAT_M)
            & (jnp.abs(liBz - e5(tAz)) <= e5(haz) + LAT_M)
        )
        wBx, wBy, wBz = g.quat_rotate_soa(
            e5q(pB_qx), e5q(pB_qy), e5q(pB_qz), e5q(pB_qw), vB_x, vB_y, vB_z
        )
        # edge-edge / deep-support fallback: midpoint of the two support points
        eAw = g.quat_rotate_soa(pA_qx, pA_qy, pA_qz, pA_qw, eA_x, eA_y, eA_z)
        eBw = g.quat_rotate_soa(pB_qx, pB_qy, pB_qz, pB_qw, eB_x, eB_y, eB_z)

        cat = lambda a_, b_, c_: jnp.concatenate([a_, b_, c_[:, None, :]], axis=1)
        sat_b = sat_d[:, None, :]
        dstack = cat(
            jnp.minimum(dvA, sat_b), jnp.minimum(dvB, sat_b), sat_d - 1e-4
        )  # [P, C, B]
        ok_stack = cat(latA, latB, jnp.ones_like(pr_on))
        pxs = cat(e5(pA_cx) + wAx, e5(pB_cx) + wBx, 0.5 * (pA_cx + eAw[0] + pB_cx + eBw[0]))
        pys = cat(e5(pA_cy) + wAy, e5(pB_cy) + wBy, 0.5 * (pA_cy + eAw[1] + pB_cy + eBw[1]))
        pzs = cat(e5(pA_cz) + wAz, e5(pB_cz) + wBz, 0.5 * (pA_cz + eAw[2] + pB_cz + eBw[2]))

        C = dstack.shape[1]
        live_gate = pr_on & (sat_d > -PAIR_CAND_SLACK)
        dstack = jnp.where(ok_stack & live_gate[:, None, :], dstack, -jnp.inf)
        selp = [[] for _ in range(4)]
        dwork_p = dstack
        for _k in range(K2):
            i_ = jnp.argmax(dwork_p, axis=1)  # [P, B]
            tkp = lambda a_: jnp.take_along_axis(a_, i_[:, None, :], axis=1)[:, 0, :]
            for li_, a_ in enumerate((dwork_p, pxs, pys, pzs)):
                selp[li_].append(tkp(a_))
            dwork_p = jnp.where(
                jnp.arange(C)[None, :, None] == i_[:, None, :], -jnp.inf, dwork_p
            )
        pd0 = jnp.stack(selp[0], 1)  # [P, K2, B] depth at generation
        pp_x = jnp.stack(selp[1], 1)
        pp_y = jnp.stack(selp[2], 1)
        pp_z = jnp.stack(selp[3], 1)
        pcand_live = pd0 > -PAIR_CAND_SLACK

        # one-hot scatter/gather maps for the solver (dynamic per-env pair ->
        # dyn-lane routing as MXU contractions, not batched scatters)
        ohA = (
            (p_d[:, None, :] == jnp.arange(D)[None, :, None]) & pr_on[:, None, :]
        ).astype(jnp.float32)  # [P, D, B]
        ohB = (
            (b_dl[:, None, :] == jnp.arange(D)[None, :, None]) & b_dyn[:, None, :]
        ).astype(jnp.float32)
        a_mu_p = jnp.sqrt(cmap.friction[a_act] * cmap.friction[p_n])  # geometric mean
        return (pd0, pp_x, pp_y, pp_z, pcand_live, pn2_x, pn2_y, pn2_z, ohA, ohB, a_mu_p, a_invm, b_invm, a_iIx, a_iIy, a_iIz, b_iIx, b_iIy, b_iIz, pA_qx, pA_qy, pA_qz, pA_qw, pB_qx, pB_qy, pB_qz, pB_qw, pA_cx, pA_cy, pA_cz, pB_cx, pB_cy, pB_cz, vkBx, vkBy, vkBz, b_dynf, fidx_keys)

    def _pair_zero(_):
        zpk = jnp.zeros((P, K2, B), jnp.float32)
        zp = jnp.zeros((P, B), jnp.float32)
        zpd = jnp.zeros((P, D, B), jnp.float32)
        return (
            zpk, zpk, zpk, zpk, jnp.zeros((P, K2, B), bool), zp, zp, zp,
            zpd, zpd,
            zp, zp, zp, zp, zp, zp, zp, zp, zp,
            zp, zp, zp, zp, zp, zp, zp, zp,
            zp, zp, zp, zp, zp, zp, zp, zp, zp, zp,
            jnp.full((P, B), -1, jnp.int32),
        )

    # ---------------- batch-global body-activity gate -----------------
    # Everything from pair/tri manifold generation through the substep
    # loop is identity when no dynamic lane in the batch is awake (all
    # impulses/pushes/integration mask on `awake`), so the steady state
    # (settled props, resting stacks, player away) skips it wholesale.
    # Wake tests above run unconditionally and flip this gate the tick
    # anything starts moving (player approach, kinematic mover, gameplay
    # velocity writes).
    # stored warm-start cache, solver layouts: tri impulses per dyn lane
    # [D, B], pair impulses/keys per slot [PAIR_WARM_CAP, B]
    wt_st = actors.warm_n[:, slc].T * (sl >= 0).astype(jnp.float32)[:, None]
    wvals_st = actors.warm_pair.T  # [PC, B]
    wkeys_st = actors.warm_pair_idx.T  # [PC, B] i32

    def _bodies_active(carry0):
        (dpx, dpy, dpz, dqx, dqy, dqz, dqw,
         dvx, dvy, dvz, dwx, dwy, dwz) = carry0
        (pd0, pp_x, pp_y, pp_z, pcand_live, pn2_x, pn2_y, pn2_z, ohA, ohB, a_mu_p, a_invm, b_invm, a_iIx, a_iIy, a_iIz, b_iIx, b_iIy, b_iIz, pA_qx, pA_qy, pA_qz, pA_qw, pB_qx, pB_qy, pB_qz, pB_qw, pA_cx, pA_cy, pA_cz, pB_cx, pB_cy, pB_cz, vkBx, vkBy, vkBz, b_dynf, fidx_keys) = jax.lax.cond(pair_any, _pair_gen, _pair_zero, 0)
        # warm-start lookup: re-key last tick's accumulated pair impulses
        # onto this tick's pair slots ([P, P] key match per env — P=16)
        match_w = (fidx_keys[:, None, :] == wkeys_st[None, :, :]) & (
            fidx_keys[:, None, :] >= 0
        )
        wp0 = jnp.sum(match_w.astype(jnp.float32) * wvals_st[None, :, :], axis=1)  # [P, B]
        if use_pallas:
            from c_game_engine_tpu.ops.body_contacts import BLK as PBLK, body_contacts_pallas

            pad = (-B) % PBLK
            body11 = jnp.zeros((16, D, B + pad), jnp.float32)
            # rows 11-13: body velocity, for the kernel's tangential-motion
            # gate on the active-edge normal fix
            comps = [ccx0, ccy0, ccz0, dqx, dqy, dqz, dqw,
                     jnp.broadcast_to(dhx, (D, B)), jnp.broadcast_to(dhy, (D, B)),
                     jnp.broadcast_to(dhz, (D, B)), awake.astype(jnp.float32),
                     dvx, dvy, dvz]
            for k_, a_ in enumerate(comps):
                body11 = body11.at[k_, :, :B].set(a_)
            # per-body chunk margin: this body's support diagonal + candidate
            # slack (tighter than the map-wide aux['body_margin'] bound, which
            # still governs the grid fallback's inflation)
            margin_d = jnp.sqrt(dhx * dhx + dhy * dhy + dhz * dhz)[:, 0] + 0.35
            outc = body_contacts_pallas(
                tri16, cmap.chunk_bounds, body11, D, margin_d,
                verts=cmap.hull_verts[slc],
                is_box=cmap.aux["dyn_is_box"],
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
            r_sup0 = _support_toward(
                e(dqx), e(dqy), e(dqz), e(dqw), e(dhx * 1.0), e(dhy * 1.0), e(dhz * 1.0),
                cnx0, cny0, cnz0, verts=d_verts, is_box=d_is_box,
            )
            depth0 = jnp.where(cand_ok0, r_sup0 - signed, -jnp.inf)
            # active-edge fix — same rule as the Pallas kernel: genuine
            # raw-normal contacts on INACTIVE features switch to the face
            # normal; DEPTH keeps the raw measure (the owning triangle's
            # interior contact carries the true face depth — see
            # ops/body_contacts.py)
            from c_game_engine_tpu.ops.body_contacts import _feature_active

            gf = lambda k_: jnp.take(
                cmap.tri_edge_active[:, k_], jnp.clip(cand, 0, None)
            )
            feat_act = _feature_active(
                qtx, qty, qtz, c[0], c[1], c[2], c[3], c[4], c[5],
                c[6], c[7], c[8], gf(0), gf(1), gf(2),
            )
            ffx, ffy, ffz = fnx * side, fny * side, fnz * side
            align = g.dot3(cnx0, cny0, cnz0, ffx, ffy, ffz)
            # tangential-motion gate (see ops/body_contacts.py): only
            # SLIDING bodies get the normal fix; resting bodies keep the
            # raw normals and their settled equilibrium
            vdf = g.dot3(e(dvx), e(dvy), e(dvz), ffx, ffy, ffz)
            vt2 = e(dvx * dvx + dvy * dvy + dvz * dvz) - vdf * vdf
            use_fix = (
                ~feat_act & (depth0 > -0.02) & (align > 0.7) & (vt2 > 0.05 * 0.05)
            )
            cnx0 = jnp.where(use_fix, ffx, cnx0)
            cny0 = jnp.where(use_fix, ffy, cny0)
            cnz0 = jnp.where(use_fix, ffz, cnz0)
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
            (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz,
             wt_c, wp_c) = carry
            on = awake  # sleeping lanes: frozen pose, no gravity/pushes
            # SYMPLECTIC (semi-implicit) Euler, Jolt's step order: gravity
            # -> velocity constraint solve -> THEN position integration
            # with the post-solve velocities (at the bottom of this
            # substep). Integrating positions before the solve leaks one
            # substep of unopposed tangential gravity into the pose every
            # substep — a measured ~g*h*sin(theta) = 0.04 m/s downhill
            # creep through static friction on a 30 deg slope
            # (tests/test_solver_oracle.py::test_friction_cone_holds_*).
            dvy = jnp.where(on, dvy + GRAVITY_Y * h, dvy)

            # ------------------------------------------ vs player [D, B]
            # BEFORE the contact solver, matching the reference's order
            # (MapPhysics.c:58-108: MovePlayer/UpdatePlayer run before
            # JPH_PhysicsSystem_Update) — so a push into the floor is
            # resolved by the triangle solver in the SAME substep instead
            # of accumulating until the body tunnels out of the world.
            ccx3, ccy3, ccz3 = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
            ccx3, ccy3, ccz3 = ccx3 + dpx, ccy3 + dpy, ccz3 + dpz
            sy0 = ppy - CAPSULE_HALF_HEIGHT
            sy1 = ppy + CAPSULE_HALF_HEIGHT
            qpx, qpy, qpz = g.closest_point_on_vseg_soa(ccx3, ccy3, ccz3, ppx[None], sy0[None], sy1[None], ppz[None])
            dxp, dyp, dzp = ccx3 - qpx, ccy3 - qpy, ccz3 - qpz
            pnx2, pny2, pnz2, pd = g.normalize3(dxp, dyp, dzp)
            rs = _support_toward(dqx, dqy, dqz, dqw, dhx * 1.0, dhy * 1.0, dhz * 1.0,
                                 pnx2, pny2, pnz2, verts=d_verts, is_box=d_is_box)
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

            # box centers
            ccx, ccy, ccz = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
            ccx, ccy, ccz = ccx + dpx, ccy + dpy, ccz + dpz

            # ------------------- recompute manifold depths at the live pose
            e2m = lambda a_: a_[:, None, :]
            r_sup_k = _support_toward(
                e2m(dqx), e2m(dqy), e2m(dqz), e2m(dqw),
                e2m(dhx * 1.0), e2m(dhy * 1.0), e2m(dhz * 1.0), c_nx, c_ny, c_nz,
                verts=d_verts, is_box=d_is_box,
            )
            signed_k = (
                (e2m(ccx) - c_px) * c_nx + (e2m(ccy) - c_py) * c_ny + (e2m(ccz) - c_pz) * c_nz
            )
            c_d = jnp.where(cand_live & e2m(on), r_sup_k - signed_k, -jnp.inf)
            active = c_d > 0.0
            # centroid of the active manifold (same argument as the pair
            # solver: the aggregate push of a coherent K-point manifold is
            # central, so per-point impulses with lever-arm effective masses
            # under-apply; a sequential centroid pre-pass takes the bulk and
            # leaves only rocking residuals to the per-point Jacobi sweeps)
            t_actf = active.astype(jnp.float32)
            t_nact = jnp.maximum(jnp.sum(t_actf, 1), 1.0)  # [D, B]
            t_any = jnp.any(active, 1)
            tc_px = jnp.sum(c_px * t_actf, 1) / t_nact
            tc_py = jnp.sum(c_py * t_actf, 1) / t_nact
            tc_pz = jnp.sum(c_pz * t_actf, 1) / t_nact
            tnx0 = jnp.sum(c_nx * t_actf, 1)
            tny0 = jnp.sum(c_ny * t_actf, 1)
            tnz0 = jnp.sum(c_nz * t_actf, 1)
            tnx, tny, tnz, tnl = g.normalize3(tnx0, tny0, tnz0)
            coherent = t_any & (tnl > 0.5 * t_nact)  # skip mixed-normal wedges
            tnx = jnp.where(coherent, tnx, 0.0)
            tny = jnp.where(coherent, tny, 1.0)
            tnz = jnp.where(coherent, tnz, 0.0)

            # ---- warm start, body-vs-world (Jolt's
            # ContactConstraintManager warm starting): apply last
            # substep's accumulated centroid normal impulse up front so
            # the fixed-sweep iterations only solve the residual. Gated on
            # an awake coherent manifold — sleeping lanes get no gravity,
            # so a warm kick would inject energy instead of cancelling it.
            wt_eff = jnp.where(coherent & on, wt_c, 0.0)  # [D, B]
            iwx, iwy, iwz = tnx * wt_eff, tny * wt_eff, tnz * wt_eff
            dvx = dvx + iwx * d_inv_m
            dvy = dvy + iwy * d_inv_m
            dvz = dvz + iwz * d_inv_m
            # application point: the ACTIVE-manifold centroid — the same
            # point the stored impulse was accumulated at, so re-applying
            # is the faithful inverse. (A candidate-point centroid was
            # tried and rejected: off-center near-contact points on
            # adjacent triangles bias it sideways, injecting a steady yaw
            # torque that walks yaw-free bodies across slopes.)
            rwx, rwy, rwz = tc_px - ccx, tc_py - ccy, tc_pz - ccz
            tqwx, tqwy, tqwz = g.cross3(rwx, rwy, rwz, iwx, iwy, iwz)
            awx_, awy_, awz_ = rot_inv_apply(
                dqx, dqy, dqz, dqw, iIx, iIy, iIz, tqwx, tqwy, tqwz
            )
            dwx, dwy, dwz = dwx + awx_, dwy + awy_, dwz + awz_

            def tri_centroid_pass(vo):
                dvx, dvy, dvz, dwx, dwy, dwz, acc = vo
                rx_ = tc_px - ccx
                ry_ = tc_py - ccy
                rz_ = tc_pz - ccz
                vptx = dvx + dwy * rz_ - dwz * ry_
                vpty = dvy + dwz * rx_ - dwx * rz_
                vptz = dvz + dwx * ry_ - dwy * rx_
                vn = vptx * tnx + vpty * tny + vptz * tnz
                rxn_x, rxn_y, rxn_z = g.cross3(rx_, ry_, rz_, tnx, tny, tnz)
                ia_x, ia_y, ia_z = rot_inv_apply(
                    dqx, dqy, dqz, dqw, iIx, iIy, iIz, rxn_x, rxn_y, rxn_z
                )
                ca_x, ca_y, ca_z = g.cross3(ia_x, ia_y, ia_z, rx_, ry_, rz_)
                k_n = d_inv_m + ca_x * tnx + ca_y * tny + ca_z * tnz
                # signed delta with accumulated clamp (sequential-impulse
                # bookkeeping): separating velocity RETURNS warm/earlier
                # impulse down to zero instead of being ignored
                jn_d = jnp.where(coherent, -vn / jnp.maximum(k_n, 1e-9), 0.0) * RELAX
                jn_tot = jnp.maximum(acc["tc_n"] + jn_d, 0.0)
                jn = jn_tot - acc["tc_n"]
                ix_, iy_, iz_ = tnx * jn, tny * jn, tnz * jn
                # friction at the centroid
                vtx = vptx - tnx * vn
                vty = vpty - tny * vn
                vtz = vptz - tnz * vn
                tdx, tdy, tdz, vt_mag = g.normalize3(vtx, vty, vtz)
                rxt_x, rxt_y, rxt_z = g.cross3(rx_, ry_, rz_, tdx, tdy, tdz)
                ft_x, ft_y, ft_z = rot_inv_apply(
                    dqx, dqy, dqz, dqw, iIx, iIy, iIz, rxt_x, rxt_y, rxt_z
                )
                ct_x, ct_y, ct_z = g.cross3(ft_x, ft_y, ft_z, rx_, ry_, rz_)
                k_t = d_inv_m + ct_x * tdx + ct_y * tdy + ct_z * tdz
                # Coulomb clamp vs the ACCUMULATED normal impulse (Jolt's
                # sequential-impulse bookkeeping). Clamping against the
                # per-iteration jn increment — which decays to ~0 once the
                # normal velocity is resolved — under-applies friction by
                # ~RELAX: measured mu_eff 0.65 of the real 0.922 in steady
                # sliding (tests/test_solver_oracle.py friction oracles).
                jt = jnp.where(
                    coherent,
                    jnp.clip(
                        vt_mag / jnp.maximum(k_t, 1e-9) * RELAX,
                        0.0,
                        jnp.maximum(d_mu * jn_tot - acc["tc_t"], 0.0),
                    ),
                    0.0,
                )
                acc = dict(acc, tc_n=jn_tot, tc_t=acc["tc_t"] + jt)
                ix_, iy_, iz_ = ix_ - tdx * jt, iy_ - tdy * jt, iz_ - tdz * jt
                dvx = dvx + ix_ * d_inv_m
                dvy = dvy + iy_ * d_inv_m
                dvz = dvz + iz_ * d_inv_m
                tqx, tqy, tqz = g.cross3(rx_, ry_, rz_, ix_, iy_, iz_)
                wx_, wy_, wz_ = rot_inv_apply(
                    dqx, dqy, dqz, dqw, iIx, iIy, iIz, tqx, tqy, tqz
                )
                return dvx + 0.0, dvy + 0.0, dvz + 0.0, dwx + wx_, dwy + wy_, dwz + wz_, acc

            def solver_iter(_, vo):
                dvx, dvy, dvz, dwx, dwy, dwz, acc = vo
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
                jn_d = jnp.where(active, -vn / jnp.maximum(k_n, 1e-9), 0.0) * RELAX
                tp_n = jnp.maximum(acc["tp_n"] + jn_d, 0.0)
                jn = tp_n - acc["tp_n"]
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
                # accumulated-impulse Coulomb clamp (see tri_centroid_pass)
                jt = jnp.where(
                    active,
                    jnp.clip(
                        vt_mag / jnp.maximum(k_t, 1e-9) * RELAX,
                        0.0,
                        jnp.maximum(d_mu[:, None, :] * tp_n - acc["tp_t"], 0.0),
                    ),
                    0.0,
                )
                acc = dict(acc, tp_n=tp_n, tp_t=acc["tp_t"] + jt)
                fx, fy, fz = -tdx * jt, -tdy * jt, -tdz * jt
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
                return dvx, dvy, dvz, dwx, dwy, dwz, acc

            def tri_iter(i_, vo):
                return solver_iter(i_, tri_centroid_pass(vo))

            # positional push averaged over the manifold (one contact patch;
            # summing over-pushed K-point face manifolds K-fold and bounced)
            over = jnp.maximum(c_d - PENETRATION_SLOP, 0.0) * BAUMGARTE
            dpx = dpx + jnp.sum(c_nx * over, 1) / t_nact
            dpy = dpy + jnp.sum(c_ny * over, 1) / t_nact
            dpz = dpz + jnp.sum(c_nz * over, 1) / t_nact

            def _tri_acc0():
                # per-contact accumulated normal/friction impulses for the
                # Coulomb clamp (tc_* = centroid pass, tp_* = per-point).
                # tc_n starts at the warm-start impulse already applied, so
                # the signed sweeps can return any part of it that this
                # substep doesn't need (accumulated clamp at >= 0).
                return {
                    "tc_n": wt_eff, "tc_t": jnp.zeros_like(tc_px),
                    "tp_n": jnp.zeros_like(c_d), "tp_t": jnp.zeros_like(c_d),
                }

            def loop_tri_only(c):
                # no live pair candidates this tick: pure fused triangle solve
                c = c + (_tri_acc0(),)
                if _unroll_loops():
                    for _i in range(SOLVER_ITERS):
                        c = tri_iter(_i, c)
                else:
                    c = jax.lax.fori_loop(0, SOLVER_ITERS, tri_iter, c)
                zz = jnp.zeros_like(dpx)
                wt_o = jnp.where(coherent, c[6]["tc_n"], 0.0)
                return c[:6] + (zz, zz, zz, wt_o, wp_c)

            def loop_with_pairs(c):
                # ------------------- pair contacts (compacted SAT manifolds) -----
                # Depths re-project by center translation along the cached normal;
                # the full two-body solve (normal + friction impulses with angular
                # terms on both sides) runs on the [P, K2, B] manifold, with
                # pair->dyn-lane routing as one-hot MXU contractions.
                ccx2, ccy2, ccz2 = g.quat_rotate_soa(dqx, dqy, dqz, dqw, dcx, dcy, dcz)
                ccx2, ccy2, ccz2 = ccx2 + dpx, ccy2 + dpy, ccz2 + dpz
                gAh = lambda a: _einsum32("db,pdb->pb", a, ohA)
                gBh = lambda a: _einsum32("db,pdb->pb", a, ohB)
                cA_tx, cA_ty, cA_tz = gAh(ccx2), gAh(ccy2), gAh(ccz2)
                nb_f = 1.0 - b_dynf
                cB_tx = gBh(ccx2) + pB_cx * nb_f
                cB_ty = gBh(ccy2) + pB_cy * nb_f
                cB_tz = gBh(ccz2) + pB_cz * nb_f
                shift_p = (
                    (cA_tx - pA_cx - (cB_tx - pB_cx)) * pn2_x
                    + (cA_ty - pA_cy - (cB_ty - pB_cy)) * pn2_y
                    + (cA_tz - pA_cz - (cB_tz - pB_cz)) * pn2_z
                )
                pd_k = pd0 - shift_p[:, None, :]
                pact = pcand_live & (pd_k > 0.0)
                e4 = lambda a: a[:, None, :]  # [P, B] -> [P, 1, B]
                rAx = pp_x - e4(cA_tx)
                rAy = pp_y - e4(cA_ty)
                rAz = pp_z - e4(cA_tz)
                rBx = pp_x - e4(cB_tx)
                rBy = pp_y - e4(cB_ty)
                rBz = pp_z - e4(cB_tz)
                nkx, nky, nkz = e4(pn2_x), e4(pn2_y), e4(pn2_z)
                # normal effective mass (constant over iterations)
                rxnAx, rxnAy, rxnAz = g.cross3(rAx, rAy, rAz, nkx, nky, nkz)
                iAx, iAy, iAz = rot_inv_apply(
                    e4(pA_qx), e4(pA_qy), e4(pA_qz), e4(pA_qw),
                    e4(a_iIx), e4(a_iIy), e4(a_iIz), rxnAx, rxnAy, rxnAz,
                )
                cAx_, cAy_, cAz_ = g.cross3(iAx, iAy, iAz, rAx, rAy, rAz)
                kA_n = g.dot3(cAx_, cAy_, cAz_, nkx, nky, nkz)
                rxnBx, rxnBy, rxnBz = g.cross3(rBx, rBy, rBz, nkx, nky, nkz)
                iBx, iBy, iBz = rot_inv_apply(
                    e4(pB_qx), e4(pB_qy), e4(pB_qz), e4(pB_qw),
                    e4(b_iIx), e4(b_iIy), e4(b_iIz), rxnBx, rxnBy, rxnBz,
                )
                cBx_, cBy_, cBz_ = g.cross3(iBx, iBy, iBz, rBx, rBy, rBz)
                kB_n = g.dot3(cBx_, cBy_, cBz_, nkx, nky, nkz)
                k_pair = e4(a_invm + b_invm) + kA_n + kB_n

                n_act = jnp.maximum(jnp.sum(pact, axis=1, keepdims=True).astype(jnp.float32), 1.0)
                actf = pact.astype(jnp.float32)
                # manifold centroid: the aggregate push of a symmetric K-point face
                # manifold is CENTRAL (per-corner angular terms cancel), so solving
                # per-corner with k = invM + angular under-applies ~4x (springy
                # stacks that eventually explode). A centroid pre-pass takes the
                # bulk of the normal velocity with the correct central effective
                # mass; the per-point Gauss-Seidel pass after it only handles the
                # small rocking/torque residuals (so its lever-arm asymmetry stays
                # harmless). This mirrors Jolt's many-iteration sequential solver
                # at a fixed, TPU-friendly op count.
                anyact = jnp.any(pact, axis=1)  # [P, B]
                cen_x = jnp.sum(pp_x * actf, 1) / n_act[:, 0, :]
                cen_y = jnp.sum(pp_y * actf, 1) / n_act[:, 0, :]
                cen_z = jnp.sum(pp_z * actf, 1) / n_act[:, 0, :]

                # ---- warm start, pair contacts: re-apply last substep's
                # accumulated centroid impulse (key-matched across ticks)
                # before the sweeps, so a stack's support chain starts at
                # its settled solution and the per-substep iterations only
                # solve the residual — deep stacks converge ACROSS ticks.
                # Awake-side pairs only: a fully sleeping pair integrated
                # no gravity, so a warm kick would pop it apart.
                # BOTH dynamic sides must be awake (a kinematic/static B
                # side counts): warm-kicking a sleeping partner injects an
                # unopposed reaction — island-synchronized sleep makes the
                # mixed case rare, this gate makes it harmless.
                aw_f = awake.astype(jnp.float32)
                awA = _einsum32("db,pdb->pb", aw_f, ohA) > 0.5
                awB = _einsum32("db,pdb->pb", aw_f, ohB) > 0.5
                paw = awA & (awB | (b_dynf < 0.5))
                wp_eff = jnp.where(anyact & paw, wp_c, 0.0)  # [P, B]
                # application point: active-manifold centroid (where the
                # stored impulse was accumulated — see the tri warm block)
                cw_x, cw_y, cw_z = cen_x, cen_y, cen_z
                dvx_w, dvy_w, dvz_w, dwx_w, dwy_w, dwz_w = c
                pwx = pn2_x * wp_eff
                pwy = pn2_y * wp_eff
                pwz = pn2_z * wp_eff
                dvx_w = dvx_w + _einsum32("pb,pdb->db", pwx * a_invm, ohA)
                dvy_w = dvy_w + _einsum32("pb,pdb->db", pwy * a_invm, ohA)
                dvz_w = dvz_w + _einsum32("pb,pdb->db", pwz * a_invm, ohA)
                tqwx, tqwy, tqwz = g.cross3(
                    cw_x - cA_tx, cw_y - cA_ty, cw_z - cA_tz, pwx, pwy, pwz
                )
                awx_, awy_, awz_ = rot_inv_apply(
                    pA_qx, pA_qy, pA_qz, pA_qw, a_iIx, a_iIy, a_iIz, tqwx, tqwy, tqwz
                )
                dwx_w = dwx_w + _einsum32("pb,pdb->db", awx_, ohA)
                dwy_w = dwy_w + _einsum32("pb,pdb->db", awy_, ohA)
                dwz_w = dwz_w + _einsum32("pb,pdb->db", awz_, ohA)
                dvx_w = dvx_w - _einsum32("pb,pdb->db", pwx * b_invm, ohB)
                dvy_w = dvy_w - _einsum32("pb,pdb->db", pwy * b_invm, ohB)
                dvz_w = dvz_w - _einsum32("pb,pdb->db", pwz * b_invm, ohB)
                tqwx, tqwy, tqwz = g.cross3(
                    cw_x - cB_tx, cw_y - cB_ty, cw_z - cB_tz, -pwx, -pwy, -pwz
                )
                bwx_, bwy_, bwz_ = rot_inv_apply(
                    pB_qx, pB_qy, pB_qz, pB_qw, b_iIx, b_iIy, b_iIz, tqwx, tqwy, tqwz
                )
                dwx_w = dwx_w + _einsum32("pb,pdb->db", bwx_, ohB)
                dwy_w = dwy_w + _einsum32("pb,pdb->db", bwy_, ohB)
                dwz_w = dwz_w + _einsum32("pb,pdb->db", bwz_, ohB)
                c = (dvx_w, dvy_w, dvz_w, dwx_w, dwy_w, dwz_w)

                def pair_iter(_, carry):
                    dvx, dvy, dvz, dwx, dwy, dwz, acc = carry
                    vAx0, vAy0, vAz0 = gAh(dvx), gAh(dvy), gAh(dvz)
                    wAx0, wAy0, wAz0 = gAh(dwx), gAh(dwy), gAh(dwz)
                    vBx0 = gBh(dvx) + vkBx
                    vBy0 = gBh(dvy) + vkBy
                    vBz0 = gBh(dvz) + vkBz
                    wBx0, wBy0, wBz0 = gBh(dwx), gBh(dwy), gBh(dwz)
                    st_ = [vAx0, vAy0, vAz0, wAx0, wAy0, wAz0,
                           vBx0, vBy0, vBz0, wBx0, wBy0, wBz0]

                    def solve_point(st_, rax, ray, raz, rbx, rby, rbz, act_k, with_friction=True):
                        vAx, vAy, vAz, wAx, wAy, wAz, vBx, vBy, vBz, wBx, wBy, wBz = st_

                        def rel_at():
                            relx = vAx + wAy * raz - wAz * ray - (vBx + wBy * rbz - wBz * rby)
                            rely = vAy + wAz * rax - wAx * raz - (vBy + wBz * rbx - wBx * rbz)
                            relz = vAz + wAx * ray - wAy * rax - (vBz + wBx * rby - wBy * rbx)
                            return relx, rely, relz

                        def keff(dx_, dy_, dz_):
                            rxk, ryk, rzk = g.cross3(rax, ray, raz, dx_, dy_, dz_)
                            fx_, fy_, fz_ = rot_inv_apply(
                                pA_qx, pA_qy, pA_qz, pA_qw, a_iIx, a_iIy, a_iIz, rxk, ryk, rzk
                            )
                            fx_, fy_, fz_ = g.cross3(fx_, fy_, fz_, rax, ray, raz)
                            k_ = a_invm + b_invm + fx_ * dx_ + fy_ * dy_ + fz_ * dz_
                            rxk, ryk, rzk = g.cross3(rbx, rby, rbz, dx_, dy_, dz_)
                            fx_, fy_, fz_ = rot_inv_apply(
                                pB_qx, pB_qy, pB_qz, pB_qw, b_iIx, b_iIy, b_iIz, rxk, ryk, rzk
                            )
                            fx_, fy_, fz_ = g.cross3(fx_, fy_, fz_, rbx, rby, rbz)
                            return k_ + fx_ * dx_ + fy_ * dy_ + fz_ * dz_

                        def apply_(st_, ix_, iy_, iz_):
                            vAx, vAy, vAz, wAx, wAy, wAz, vBx, vBy, vBz, wBx, wBy, wBz = st_
                            vAx, vAy, vAz = vAx + ix_ * a_invm, vAy + iy_ * a_invm, vAz + iz_ * a_invm
                            tqx, tqy, tqz = g.cross3(rax, ray, raz, ix_, iy_, iz_)
                            ax_, ay_, az_ = rot_inv_apply(
                                pA_qx, pA_qy, pA_qz, pA_qw, a_iIx, a_iIy, a_iIz, tqx, tqy, tqz
                            )
                            wAx, wAy, wAz = wAx + ax_, wAy + ay_, wAz + az_
                            vBx, vBy, vBz = vBx - ix_ * b_invm, vBy - iy_ * b_invm, vBz - iz_ * b_invm
                            tqx, tqy, tqz = g.cross3(rbx, rby, rbz, -ix_, -iy_, -iz_)
                            bx_, by_, bz_ = rot_inv_apply(
                                pB_qx, pB_qy, pB_qz, pB_qw, b_iIx, b_iIy, b_iIz, tqx, tqy, tqz
                            )
                            return [vAx, vAy, vAz, wAx, wAy, wAz,
                                    vBx, vBy, vBz, wBx + bx_, wBy + by_, wBz + bz_]

                        relx, rely, relz = rel_at()
                        vn = relx * pn2_x + rely * pn2_y + relz * pn2_z
                        k_n = keff(pn2_x, pn2_y, pn2_z)
                        jn_d = jnp.where(act_k, -vn / jnp.maximum(k_n, 1e-9), 0.0) * RELAX
                        pc_n = jnp.maximum(acc["pc_n"] + jn_d, 0.0)
                        jn = pc_n - acc["pc_n"]
                        st_ = apply_(st_, pn2_x * jn, pn2_y * jn, pn2_z * jn)
                        if with_friction:
                            vAx, vAy, vAz, wAx, wAy, wAz, vBx, vBy, vBz, wBx, wBy, wBz = st_
                            relx, rely, relz = rel_at()
                            vn2 = relx * pn2_x + rely * pn2_y + relz * pn2_z
                            vtx = relx - pn2_x * vn2
                            vty = rely - pn2_y * vn2
                            vtz = relz - pn2_z * vn2
                            tdx, tdy, tdz, vt_mag = g.normalize3(vtx, vty, vtz)
                            k_t = keff(tdx, tdy, tdz)
                            # accumulated-impulse Coulomb clamp (see
                            # tri_centroid_pass)
                            jt = jnp.where(
                                act_k,
                                jnp.clip(
                                    vt_mag / jnp.maximum(k_t, 1e-9) * RELAX,
                                    0.0,
                                    jnp.maximum(a_mu_p * pc_n - acc["pc_t"], 0.0),
                                ),
                                0.0,
                            )
                            st_ = apply_(st_, -tdx * jt, -tdy * jt, -tdz * jt)
                        else:
                            jt = 0.0
                        return st_, dict(acc, pc_n=pc_n, pc_t=acc["pc_t"] + jt)

                    # centroid pre-pass (bulk of the normal impulse, central mass)
                    st_, acc = solve_point(
                        st_,
                        cen_x - cA_tx, cen_y - cA_ty, cen_z - cA_tz,
                        cen_x - cB_tx, cen_y - cB_ty, cen_z - cB_tz,
                        anyact,
                    )
                    # per-point JACOBI from the post-centroid state (rocking /
                    # torque residuals). All points see the same velocities, so a
                    # symmetric manifold at rest produces exactly equal impulses
                    # and ZERO net torque — a sequential order would bias a fixed
                    # torque direction every tick and steadily spin stacks up. The
                    # antisymmetric (rocking) components have opposite signs and
                    # don't compound; the symmetric residual is small because the
                    # centroid pass already took the mean normal velocity.
                    vAx, vAy, vAz, wAx, wAy, wAz, vBx, vBy, vBz, wBx, wBy, wBz = st_
                    relx = (
                        e4(vAx) + e4(wAy) * rAz - e4(wAz) * rAy
                        - (e4(vBx) + e4(wBy) * rBz - e4(wBz) * rBy)
                    )
                    rely = (
                        e4(vAy) + e4(wAz) * rAx - e4(wAx) * rAz
                        - (e4(vBy) + e4(wBz) * rBx - e4(wBx) * rBz)
                    )
                    relz = (
                        e4(vAz) + e4(wAx) * rAy - e4(wAy) * rAx
                        - (e4(vBz) + e4(wBx) * rBy - e4(wBy) * rBx)
                    )
                    vn = relx * nkx + rely * nky + relz * nkz
                    jn_d = jnp.where(pact, -vn / jnp.maximum(k_pair, 1e-9), 0.0) * RELAX
                    pp_n = jnp.maximum(acc["pp_n"] + jn_d, 0.0)
                    jn = pp_n - acc["pp_n"]
                    ix_, iy_, iz_ = nkx * jn, nky * jn, nkz * jn
                    # friction per point against the pre-impulse tangential motion
                    vtx = relx - nkx * vn
                    vty = rely - nky * vn
                    vtz = relz - nkz * vn
                    tdx, tdy, tdz, vt_mag = g.normalize3(vtx, vty, vtz)
                    rxk, ryk, rzk = g.cross3(rAx, rAy, rAz, tdx, tdy, tdz)
                    fx_, fy_, fz_ = rot_inv_apply(
                        e4(pA_qx), e4(pA_qy), e4(pA_qz), e4(pA_qw),
                        e4(a_iIx), e4(a_iIy), e4(a_iIz), rxk, ryk, rzk,
                    )
                    fx_, fy_, fz_ = g.cross3(fx_, fy_, fz_, rAx, rAy, rAz)
                    k_t = e4(a_invm + b_invm) + fx_ * tdx + fy_ * tdy + fz_ * tdz
                    rxk, ryk, rzk = g.cross3(rBx, rBy, rBz, tdx, tdy, tdz)
                    fx_, fy_, fz_ = rot_inv_apply(
                        e4(pB_qx), e4(pB_qy), e4(pB_qz), e4(pB_qw),
                        e4(b_iIx), e4(b_iIy), e4(b_iIz), rxk, ryk, rzk,
                    )
                    fx_, fy_, fz_ = g.cross3(fx_, fy_, fz_, rBx, rBy, rBz)
                    k_t = k_t + fx_ * tdx + fy_ * tdy + fz_ * tdz
                    # accumulated-impulse Coulomb clamp (see tri_centroid_pass)
                    jt = jnp.where(
                        pact,
                        jnp.clip(
                            vt_mag / jnp.maximum(k_t, 1e-9) * RELAX,
                            0.0,
                            jnp.maximum(e4(a_mu_p) * pp_n - acc["pp_t"], 0.0),
                        ),
                        0.0,
                    )
                    acc = dict(acc, pp_n=pp_n, pp_t=acc["pp_t"] + jt)
                    ix_, iy_, iz_ = ix_ - tdx * jt, iy_ - tdy * jt, iz_ - tdz * jt
                    # apply the summed point impulses to the pair-local state
                    sx_, sy_, sz_ = jnp.sum(ix_, 1), jnp.sum(iy_, 1), jnp.sum(iz_, 1)
                    vAx, vAy, vAz = vAx + sx_ * a_invm, vAy + sy_ * a_invm, vAz + sz_ * a_invm
                    tqx, tqy, tqz = g.cross3(rAx, rAy, rAz, ix_, iy_, iz_)
                    ax_, ay_, az_ = rot_inv_apply(
                        e4(pA_qx), e4(pA_qy), e4(pA_qz), e4(pA_qw),
                        e4(a_iIx), e4(a_iIy), e4(a_iIz), tqx, tqy, tqz,
                    )
                    wAx = wAx + jnp.sum(ax_, 1)
                    wAy = wAy + jnp.sum(ay_, 1)
                    wAz = wAz + jnp.sum(az_, 1)
                    vBx, vBy, vBz = vBx - sx_ * b_invm, vBy - sy_ * b_invm, vBz - sz_ * b_invm
                    tqx, tqy, tqz = g.cross3(rBx, rBy, rBz, -ix_, -iy_, -iz_)
                    bx_, by_, bz_ = rot_inv_apply(
                        e4(pB_qx), e4(pB_qy), e4(pB_qz), e4(pB_qw),
                        e4(b_iIx), e4(b_iIy), e4(b_iIz), tqx, tqy, tqz,
                    )
                    wBx = wBx + jnp.sum(bx_, 1)
                    wBy = wBy + jnp.sum(by_, 1)
                    wBz = wBz + jnp.sum(bz_, 1)
                    st_ = [vAx, vAy, vAz, wAx, wAy, wAz, vBx, vBy, vBz, wBx, wBy, wBz]

                    vAx, vAy, vAz, wAx, wAy, wAz, vBx, vBy, vBz, wBx, wBy, wBz = st_
                    dvx = dvx + _einsum32("pb,pdb->db", vAx - vAx0, ohA)
                    dvy = dvy + _einsum32("pb,pdb->db", vAy - vAy0, ohA)
                    dvz = dvz + _einsum32("pb,pdb->db", vAz - vAz0, ohA)
                    dwx = dwx + _einsum32("pb,pdb->db", wAx - wAx0, ohA)
                    dwy = dwy + _einsum32("pb,pdb->db", wAy - wAy0, ohA)
                    dwz = dwz + _einsum32("pb,pdb->db", wAz - wAz0, ohA)
                    dvx = dvx + _einsum32("pb,pdb->db", vBx - vBx0, ohB)
                    dvy = dvy + _einsum32("pb,pdb->db", vBy - vBy0, ohB)
                    dvz = dvz + _einsum32("pb,pdb->db", vBz - vBz0, ohB)
                    dwx = dwx + _einsum32("pb,pdb->db", wBx - wBx0, ohB)
                    dwy = dwy + _einsum32("pb,pdb->db", wBy - wBy0, ohB)
                    dwz = dwz + _einsum32("pb,pdb->db", wBz - wBz0, ohB)
                    return dvx, dvy, dvz, dwx, dwy, dwz, acc

                def all_iter(i_, vo):
                    vo = tri_iter(i_, vo)
                    if pairs_enabled:
                        vo = pair_iter(i_, vo)
                    return vo

                # On TPU: unrolled (not fori_loop) — iterations are pure elementwise
                # chains, so XLA fuses across them instead of paying per-iteration
                # launches. On CPU (the test backend) a rolled loop keeps the
                # module small enough to compile in seconds.
                _c = c + (dict(
                    _tri_acc0(),
                    pc_n=wp_eff, pc_t=jnp.zeros_like(cen_x),
                    pp_n=jnp.zeros_like(pd0), pp_t=jnp.zeros_like(pd0),
                ),)
                if _unroll_loops():
                    for _i in range(SOLVER_ITERS):
                        _c = all_iter(_i, _c)
                else:
                    _c = jax.lax.fori_loop(0, SOLVER_ITERS, all_iter, _c)
                c = _c[:6]
                dvx, dvy, dvz, dwx, dwy, dwz = c
                # positional correction, split by inverse mass. Averaged over the
                # active manifold points (a 4-point face manifold is ONE contact
                # patch — summing would over-push 4x and bounce the stack).
                over_p = jnp.where(
                    pact & pairs_enabled, jnp.maximum(pd_k - PENETRATION_SLOP, 0.0) * BAUMGARTE, 0.0
                )
                wsum_p = jnp.maximum(a_invm + b_invm, 1e-9)
                pux = jnp.sum(nkx * over_p, 1) / n_act[:, 0, :]  # [P, B]
                puy = jnp.sum(nky * over_p, 1) / n_act[:, 0, :]
                puz = jnp.sum(nkz * over_p, 1) / n_act[:, 0, :]
                shareA = a_invm / wsum_p
                shareB = b_invm / wsum_p
                pushdx = _einsum32("pb,pdb->db", pux * shareA, ohA) - _einsum32(
                    "pb,pdb->db", pux * shareB, ohB
                )
                pushdy = _einsum32("pb,pdb->db", puy * shareA, ohA) - _einsum32(
                    "pb,pdb->db", puy * shareB, ohB
                )
                pushdz = _einsum32("pb,pdb->db", puz * shareA, ohA) - _einsum32(
                    "pb,pdb->db", puz * shareB, ohB
                )
                acc_f = _c[6]
                wt_o = jnp.where(coherent, acc_f["tc_n"], 0.0)
                wp_o = jnp.where(anyact, acc_f["pc_n"], 0.0)
                return c + (pushdx, pushdy, pushdz, wt_o, wp_o)

            _c0 = (dvx, dvy, dvz, dwx, dwy, dwz)
            if pairs_enabled:
                outs = jax.lax.cond(pair_any, loop_with_pairs, loop_tri_only, _c0)
            else:
                outs = loop_tri_only(_c0)
            (dvx, dvy, dvz, dwx, dwy, dwz, pushdx, pushdy, pushdz,
             wt_new, wp_new) = outs
            # slew-rate-limited cache update: impact spikes must NOT enter
            # the warm cache. Re-applying a landing spike next substep is
            # only safe if the solve can fully return it; our fixed-sweep
            # Jacobi returns it from the world contact UP the chain and
            # runs out of iterations, leaving an upward velocity gradient
            # that launches the stack (measured 1:2:3 on a settling
            # 3-stack). Capping growth at doubling-plus-one-body-weight
            # per substep keeps spikes out while reaching any static
            # support level in log2(weight) substeps.
            # The stored value is also EMA-smoothed: the raw
            # apply-return-rebuild loop has enough gain to limit-cycle on
            # deep stacks (measured on a pre-placed 6-stack: the cache
            # oscillates 1.4<->4.7 with ~15-tick period, growing until
            # collapse); halving the update gain damps it to a fixpoint.
            seed_t = (h * -GRAVITY_Y) / jnp.maximum(d_inv_m, 1e-6)  # [D, 1]
            wt_new = jnp.minimum(0.5 * (wt_new + wt_c), wt_c * 2.0 + seed_t)
            seed_p = (h * -GRAVITY_Y) / jnp.maximum(a_invm, 1e-6)  # [P, B]
            wp_new = jnp.minimum(0.5 * (wp_new + wp_c), wp_c * 2.0 + seed_p)
            # position integration with the POST-solve velocities (see the
            # symplectic-order note at the top of the substep), plus the
            # Baumgarte penetration push
            dpx = jnp.where(on, dpx + dvx * h + pushdx, dpx)
            dpy = jnp.where(on, dpy + dvy * h + pushdy, dpy)
            dpz = jnp.where(on, dpz + dvz * h + pushdz, dpz)
            # quaternion integration: q += 0.5*h*(omega_quat * q)
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

            return (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz,
                    wt_new, wp_new), None

        carry = (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz,
                 wt_st, wp0)
        if _unroll_loops():  # unrolled for cross-substep fusion (TPU)
            for _s in range(n_substeps):
                carry, _ = substep(carry, None)
        else:
            carry, _ = jax.lax.scan(substep, carry, None, length=n_substeps)

        # ---- rest-bleed damping (round 5, PARITY #18): Jolt's sequential
        # solver + warm starting leaves resting stacks at true zero
        # velocity, so they reach timeBeforeSleep; our fixed-sweep Jacobi
        # solve leaves ~0.01-0.03 m/s of residual chatter on the TOP of a
        # stack — enough to keep resetting the sleep counter forever.
        # Bodies moving slower than 3x the sleep threshold while resting
        # on a NEAR-HORIZONTAL support (contact normal within ~18 deg of
        # up — excludes slopes, so Coulomb slide start-up can still crawl
        # through the band and escape) bleed the residual each tick.
        (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz,
         wt_fin, wp_fin) = carry
        flat_tri = jnp.any((gen_d > -0.05) & (c_ny > 0.95), axis=1)  # [D, B]
        # pair_bp (full support sum + slack), NOT near0: near0's 0.8-shrunk
        # sum misses genuinely stacked flush boxes
        flat_pair = jnp.any(pair_bp & (pny > 0.95), axis=1)
        diag2a = dhx * dhx + dhy * dhy + dhz * dhz
        spd2 = (
            dvx * dvx + dvy * dvy + dvz * dvz
            + (dwx * dwx + dwy * dwy + dwz * dwz) * diag2a
        )
        bleed = d_on_t & (flat_tri | flat_pair) & (spd2 <= 9.0 * SLEEP_SPEED2)
        damp = jnp.where(bleed, REST_BLEED, 1.0)
        dvx, dvy, dvz = dvx * damp, dvy * damp, dvz * damp
        dwx, dwy, dwz = dwx * damp, dwy * damp, dwz * damp

        # warm-cache writeback: sleeping lanes/pairs keep their stored
        # values (their manifolds weren't generated this tick, so the
        # solver outputs are zero — not "no contact"); ticks with no live
        # pair activity keep the stored keys wholesale.
        wt_act = jnp.where(awake, wt_fin, wt_st)
        aw_f2 = awake.astype(jnp.float32)
        paw2 = (
            _einsum32("db,pdb->pb", aw_f2, ohA)
            + _einsum32("db,pdb->pb", aw_f2, ohB)
        ) > 0.5
        wp_act = jnp.where(paw2, wp_fin, wp0)
        wp_act = jnp.where(pair_any, wp_act, wvals_st[:P])
        keys_act = jnp.where(pair_any, fidx_keys, wkeys_st[:P])
        return (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz,
                wt_act, wp_act, keys_act)

    carry0 = (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz)

    def _bodies_idle(c):
        # nothing awake: poses frozen, warm cache passes through untouched
        # (so a woken stack restarts from its settled impulse set)
        return c + (wt_st, wvals_st[:P], wkeys_st[:P])

    carry = jax.lax.cond(jnp.any(awake), _bodies_active, _bodies_idle, carry0)
    (dpx, dpy, dpz, dqx, dqy, dqz, dqw, dvx, dvy, dvz, dwx, dwy, dwz,
     wt_ret, wp_ret, wkeys_ret) = carry

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

    # write dynamic lanes back ([D, B] -> [B, N, .]) via the static one-hot
    # d2n contraction over D (dyn_slots is compile-time; batched scatters
    # compile to standalone unfused kernels on TPU — memory playbook)
    expand = lambda comps: _einsum32(
        "cdb,dn->bnc", jnp.stack(comps), d2n, precision="float32"
    )
    dpos_new = expand([dpx, dpy, dpz])  # [B, N, 3]
    dquat_new = expand([dqx, dqy, dqz, dqw])
    dvel_new = expand([dvx, dvy, dvz])
    domega_new = expand([dwx, dwy, dwz])
    live = _einsum32("db,dn->bn", d_on_t.astype(jnp.float32), d2n) > 0.5  # [B, N]
    m3 = live[..., None]
    pos = jnp.where(m3, dpos_new, k_pos)
    quat = jnp.where(m3, dquat_new, actors.quat)
    vel = jnp.where(m3, dvel_new, actors.vel)
    omega = jnp.where(m3, domega_new, actors.omega)
    sleep_n = _einsum32("db,dn->bn", sleep_new.astype(jnp.float32), d2n).astype(jnp.int32)
    sleep = jnp.where(live, sleep_n, actors.sleep)

    # warm-start cache writeback ([D, B]/[P, B] solver layouts -> state)
    warm_bn = _einsum32("db,dn->bn", wt_ret, d2n)
    warm_n_new = jnp.where(live, warm_bn, actors.warm_n)
    pc_pad = actors.warm_pair.shape[1] - P
    if pc_pad:
        wp_ret = jnp.concatenate([wp_ret, jnp.zeros((pc_pad, B), jnp.float32)], 0)
        wkeys_ret = jnp.concatenate(
            [wkeys_ret, jnp.full((pc_pad, B), -1, jnp.int32)], 0
        )
    return (pos, quat, vel, omega, sleep,
            warm_n_new, wp_ret.T, wkeys_ret.T)
