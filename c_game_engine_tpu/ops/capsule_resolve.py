"""Pallas TPU kernel: capsule penetration-resolve against the static
triangle soup + solid actor OBBs.

This is the hottest op of the tick (3 calls x 4 iterations per step). The
triangle soup of a map is tiny (typically < 100 KB), so the whole soup
lives in VMEM and every resolve iteration runs without touching HBM; the
XLA version of the same math was HBM-bound on its [T, B] intermediates.

Triangles are processed in chunks of T_CHUNK rows with a running deepest-
contact accumulator so live intermediates stay ~2 MB of VMEM regardless of
map size.

Layout: triangles as [T, 16] (components on lanes: ax ay az bx by bz cx cy
cz nx ny nz valid pad pad pad), T padded to a T_CHUNK multiple; env blocks
of BLK=128 on the lane axis for per-env arrays. Grid = (B // BLK,).

Semantics match physics/character.resolve_capsule (deepest-contact push +
velocity clip + walkable grounding per iteration, contact tolerance -0.01,
slope cos 50deg; first-deepest wins on ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c_game_engine_tpu.physics.character import (
    CAPSULE_HALF_HEIGHT,
    CAPSULE_RADIUS,
    MAX_SLOPE_COS,
)

BLK = 128
T_CHUNK = 32
ITERS = 4


def _closest_on_tri(px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz):
    """Ericson closest-point-on-triangle, component form."""
    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az
    apx, apy, apz = px - ax, py - ay, pz - az
    d1 = abx * apx + aby * apy + abz * apz
    d2 = acx * apx + acy * apy + acz * apz
    bpx, bpy, bpz = px - bx, py - by, pz - bz
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz
    cpx, cpy, cpz = px - cx, py - cy, pz - cz
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = jnp.maximum(va + vb + vc, 1e-30)
    v_f = vb / denom
    w_f = vc / denom
    qx = ax + abx * v_f + acx * w_f
    qy = ay + aby * v_f + acy * w_f
    qz = az + abz * v_f + acz * w_f
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)

    def sel(cond, x_, y_, z_, qx, qy, qz):
        return jnp.where(cond, x_, qx), jnp.where(cond, y_, qy), jnp.where(cond, z_, qz)

    qx, qy, qz = sel((vc <= 0) & (d1 >= 0) & (d3 <= 0), ax + abx * t_ab, ay + aby * t_ab, az + abz * t_ab, qx, qy, qz)
    qx, qy, qz = sel((vb <= 0) & (d2 >= 0) & (d6 <= 0), ax + acx * t_ac, ay + acy * t_ac, az + acz * t_ac, qx, qy, qz)
    qx, qy, qz = sel((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0), bx + (cx - bx) * t_bc, by + (cy - by) * t_bc, bz + (cz - bz) * t_bc, qx, qy, qz)
    qx, qy, qz = sel((d1 <= 0) & (d2 <= 0), ax, ay, az, qx, qy, qz)
    qx, qy, qz = sel((d3 >= 0) & (d4 <= d3), bx, by, bz, qx, qy, qz)
    qx, qy, qz = sel((d6 >= 0) & (d5 <= d6), cx, cy, cz, qx, qy, qz)
    return qx, qy, qz


def _qrot(qx, qy, qz, qw, vx, vy, vz):
    tx = 2 * (qy * vz - qz * vy)
    ty = 2 * (qz * vx - qx * vz)
    tz = 2 * (qx * vy - qy * vx)
    return (
        vx + qw * tx + qy * tz - qz * ty,
        vy + qw * ty + qz * tx - qx * tz,
        vz + qw * tz + qx * ty - qy * tx,
    )


def _first_row(m):
    """Row index (along axis 0) of the first True per column; m.shape[0] if
    none. keepdims form, int32."""
    ii = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    return jnp.min(jnp.where(m, ii, m.shape[0]), axis=0, keepdims=True)


def _chunk_best(px, py, pz, sy0, sy1, tri):
    """Deepest capsule contact against one triangle chunk.
    tri: [T_CHUNK, 16]; returns (depth [1,BLK], normal comps [1,BLK])."""
    col = lambda k: tri[:, k : k + 1]
    ax, ay, az = col(0), col(1), col(2)
    bx, by, bz = col(3), col(4), col(5)
    cx, cy, cz = col(6), col(7), col(8)
    fnx, fny, fnz = col(9), col(10), col(11)
    tvalid = col(12)

    qx, qy, qz = _closest_on_tri(px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz)
    # 2 alternating-projection rounds: exact for face contacts (the capsule
    # axis is vertical), within epsilon for edge contacts
    for _ in range(2):
        spy = jnp.clip(qy, sy0, sy1)
        qx, qy, qz = _closest_on_tri(px, spy, pz, ax, ay, az, bx, by, bz, cx, cy, cz)
    spy = jnp.clip(qy, sy0, sy1)
    dx, dy, dz = px - qx, spy - qy, pz - qz
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv = 1.0 / jnp.maximum(dist, 1e-9)
    rx, ry, rz = dx * inv, dy * inv, dz * inv
    side = jnp.sign((px - ax) * fnx + (py - ay) * fny + (pz - az) * fnz)
    side = jnp.where(side == 0, 1.0, side)
    flip = jnp.sign(rx * fnx + ry * fny + rz * fnz) * side
    flip = jnp.where(flip == 0, 1.0, flip)
    nx = jnp.where(dist > 1e-6, rx * flip, fnx * side)
    ny = jnp.where(dist > 1e-6, ry * flip, fny * side)
    nz = jnp.where(dist > 1e-6, rz * flip, fnz * side)
    signed = dx * nx + dy * ny + dz * nz
    depth = jnp.where(tvalid > 0.5, CAPSULE_RADIUS - signed, -1e30)

    best = jnp.max(depth, axis=0, keepdims=True)
    # first-deepest wins on ties (argmax semantics of the XLA fallback in
    # physics/batched.py; averaging tied normals would break unit length).
    # iota+min instead of cumsum: cumsum has no Pallas TPU lowering.
    m = depth == best
    first = m & (_first_row(m) == jax.lax.broadcasted_iota(jnp.int32, m.shape, 0))
    wnx = jnp.sum(jnp.where(first, nx, 0.0), 0, keepdims=True)
    wny = jnp.sum(jnp.where(first, ny, 0.0), 0, keepdims=True)
    wnz = jnp.sum(jnp.where(first, nz, 0.0), 0, keepdims=True)
    return best, wnx, wny, wnz


def _kernel(tri_ref, idx_ref, cnt_ref, box_ref, bh_ref, pin_ref, vin_ref, pout_ref, vout_ref, g_ref):
    px = pin_ref[0:1, :]
    py = pin_ref[1:2, :]
    pz = pin_ref[2:3, :]
    vx = vin_ref[0:1, :]
    vy = vin_ref[1:2, :]
    vz = vin_ref[2:3, :]
    grounded = jnp.zeros_like(px)

    for _ in range(ITERS):
        sy0 = py - CAPSULE_HALF_HEIGHT
        sy1 = py + CAPSULE_HALF_HEIGHT

        # compacted chunk list for this env block (ops/chunk_compact.py):
        # only chunks whose XZ AABB overlaps the block's capsule bounds are
        # visited; dynamic trip count, no branches
        def chunk_body(j, acc):
            ci = idx_ref[0, 0, j]
            best, bnx, bny, bnz = acc
            tri = tri_ref[pl.ds(ci * T_CHUNK, T_CHUNK), :]
            cb, cnx, cny, cnz = _chunk_best(px, py, pz, sy0, sy1, tri)
            better = cb > best
            return (
                jnp.where(better, cb, best),
                jnp.where(better, cnx, bnx),
                jnp.where(better, cny, bny),
                jnp.where(better, cnz, bnz),
            )

        zero = jnp.zeros_like(px)
        best, wnx, wny, wnz = jax.lax.fori_loop(
            0, cnt_ref[0, 0, 0], chunk_body, (zero - 1e30, zero, zero + 1.0, zero)
        )

        # ---- boxes: alternating projection segment <-> OBB ----
        ox = box_ref[0, :, :]
        oy = box_ref[1, :, :]
        oz = box_ref[2, :, :]
        bqx = box_ref[3, :, :]
        bqy = box_ref[4, :, :]
        bqz = box_ref[5, :, :]
        bqw = box_ref[6, :, :]
        bmask = box_ref[7, :, :]
        hx = bh_ref[0, :, :]
        hy = bh_ref[1, :, :]
        hz = bh_ref[2, :, :]

        def obb_closest(wx, wy, wz):
            lx, ly, lz = _qrot(-bqx, -bqy, -bqz, bqw, wx - ox, wy - oy, wz - oz)
            lx = jnp.clip(lx, -hx, hx)
            ly = jnp.clip(ly, -hy, hy)
            lz = jnp.clip(lz, -hz, hz)
            gx_, gy_, gz_ = _qrot(bqx, bqy, bqz, bqw, lx, ly, lz)
            return gx_ + ox, gy_ + oy, gz_ + oz

        qbx, qby, qbz = obb_closest(px, py, pz)
        for _k in range(2):
            spby = jnp.clip(qby, sy0, sy1)
            qbx, qby, qbz = obb_closest(px, spby, pz)
        spby = jnp.clip(qby, sy0, sy1)
        ddx, ddy, ddz = px - qbx, spby - qby, pz - qbz
        bdist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        binv = 1.0 / jnp.maximum(bdist, 1e-9)
        depth_b = jnp.where(bmask > 0.5, CAPSULE_RADIUS - bdist, -1e30)
        bb = jnp.max(depth_b, axis=0, keepdims=True)
        mB = depth_b == bb
        firstB = mB & (_first_row(mB) == jax.lax.broadcasted_iota(jnp.int32, mB.shape, 0))
        bbx = jnp.sum(jnp.where(firstB, ddx * binv, 0.0), 0, keepdims=True)
        bby = jnp.sum(jnp.where(firstB, ddy * binv, 0.0), 0, keepdims=True)
        bbz = jnp.sum(jnp.where(firstB, ddz * binv, 0.0), 0, keepdims=True)

        use_box = bb > best
        best = jnp.where(use_box, bb, best)
        wnx = jnp.where(use_box, bbx, wnx)
        wny = jnp.where(use_box, bby, wny)
        wnz = jnp.where(use_box, bbz, wnz)

        hit = best > -0.01
        push = jnp.where(hit, jnp.maximum(best, 0.0), 0.0)
        px = px + wnx * push
        py = py + wny * push
        pz = pz + wnz * push
        vn = vx * wnx + vy * wny + vz * wnz
        clip = hit & (vn < 0)
        vx = jnp.where(clip, vx - wnx * vn, vx)
        vy = jnp.where(clip, vy - wny * vn, vy)
        vz = jnp.where(clip, vz - wnz * vn, vz)
        grounded = jnp.where(hit & (wny >= MAX_SLOPE_COS), 1.0, grounded)

    pout_ref[0:1, :] = px
    pout_ref[1:2, :] = py
    pout_ref[2:3, :] = pz
    pout_ref[3:8, :] = jnp.zeros((5, px.shape[1]), jnp.float32)
    vout_ref[0:1, :] = vx
    vout_ref[1:2, :] = vy
    vout_ref[2:3, :] = vz
    vout_ref[3:8, :] = jnp.zeros((5, px.shape[1]), jnp.float32)
    g_ref[0:1, :] = grounded


@jax.jit
def resolve_capsule_pallas(tri16, chunk_bounds, box8, boxh, pos, vel):
    """pos/vel [B, 3] -> (pos, vel, grounded [B]).

    tri16: [T, 16] triangle table, T a multiple of T_CHUNK
    chunk_bounds: [T/T_CHUNK, 4] per-chunk XZ AABB (minx minz maxx maxz)
    box8:  [8, N, B] per-env box comps (ox oy oz qx qy qz qw mask)
    boxh:  [4, N, B] half extents
    """
    from c_game_engine_tpu.ops.chunk_compact import block_minmax, compact_chunk_lists

    B = pos.shape[0]
    assert B % BLK == 0, "batch must be a multiple of 128"
    assert tri16.shape[0] % T_CHUNK == 0
    pin = jnp.zeros((8, B), jnp.float32).at[0:3].set(pos.T)
    vin = jnp.zeros((8, B), jnp.float32).at[0:3].set(vel.T)

    # per-block compacted chunk lists. MARGIN 1.0 covers the capsule radius
    # (0.2) + contact tolerance + the <=4 resolve pushes per call.
    MARGIN = 1.0
    xmin, xmax = block_minmax(pos[:, 0], BLK)
    zmin, zmax = block_minmax(pos[:, 2], BLK)
    idx, cnt = compact_chunk_lists(chunk_bounds, xmin, xmax, zmin, zmax, MARGIN)
    # SMEM windows must keep the last two dims equal to the array's; give
    # the per-block axis a leading position
    idx = idx[:, None, :]  # [G, 1, NC]
    cnt = cnt[:, None, None]  # [G, 1, 1]

    n_blocks = B // BLK
    T = tri16.shape[0]
    NC = chunk_bounds.shape[0]
    N = box8.shape[1]
    pout, vout, g = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((T, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NC), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, N, BLK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, N, BLK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, B), jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
        ],
    )(tri16, idx, cnt, box8, boxh, pin, vin)
    return pout[0:3].T, vout[0:3].T, g[0] > 0.5
