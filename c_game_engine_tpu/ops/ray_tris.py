"""Pallas TPU kernel: closest-hit parameter of rays vs the static triangle
soup (Moller-Trumbore, two-sided), triangle chunks resident in VMEM.

Used by the player's interaction ray (PlayerPhysics.c:297-315) and the
laser hitscans (Laser.c:127-158); the ray-vs-actor-box part stays in XLA
(it is dense [N, R] already). Returns t in world units (inf = miss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c_game_engine_tpu.ops.capsule_resolve import T_CHUNK

BLK = 128


def _kernel(tri_ref, idx_ref, cnt_ref, ray_ref, out_ref):
    ox = ray_ref[0:1, :]
    oy = ray_ref[1:2, :]
    oz = ray_ref[2:3, :]
    dx = ray_ref[3:4, :]
    dy = ray_ref[4:5, :]
    dz = ray_ref[5:6, :]
    maxt = ray_ref[6:7, :]

    def chunk_loop(j, tbest):
        return chunk_body(idx_ref[0, 0, j], tbest)

    def chunk_body(ci, tbest):
        tri = tri_ref[pl.ds(ci * T_CHUNK, T_CHUNK), :]
        col = lambda k: tri[:, k : k + 1]
        ax, ay, az = col(0), col(1), col(2)
        e1x, e1y, e1z = col(3) - ax, col(4) - ay, col(5) - az
        e2x, e2y, e2z = col(6) - ax, col(7) - ay, col(8) - az
        tvalid = col(12)

        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        det = e1x * hx + e1y * hy + e1z * hz
        ok = jnp.abs(det) > 1e-9
        inv = 1.0 / jnp.where(ok, det, 1.0)
        sx = ox - ax
        sy = oy - ay
        sz = oz - az
        u = (sx * hx + sy * hy + sz * hz) * inv
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        hit = ok & (tvalid > 0.5) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-5) & (t <= maxt)
        t = jnp.where(hit, t, 1e30)
        return jnp.minimum(tbest, jnp.min(t, axis=0, keepdims=True))

    tbest = jax.lax.fori_loop(0, cnt_ref[0, 0, 0], chunk_loop, jnp.full_like(ox, 1e30))
    out_ref[0:1, :] = tbest


def ray_tris_pallas(tri16, chunk_bounds, origin, direction, max_dist):
    """origin/direction [R, 3] -> t [R] (1e30 = miss). R padded to BLK.
    chunk_bounds [T/T_CHUNK, 4] XZ AABBs (minx minz maxx maxz)."""
    from c_game_engine_tpu.ops.chunk_compact import block_minmax, compact_chunk_lists

    R = origin.shape[0]
    pad = (-R) % BLK
    rays = jnp.zeros((8, R + pad), jnp.float32)
    rays = rays.at[0:3, :R].set(origin.T)
    rays = rays.at[3:6, :R].set(direction.T)
    rays = rays.at[6, :R].set(max_dist)

    # per-block compacted chunk lists over the ray-segment XZ AABBs
    # (padded lanes have zero origin/direction — a degenerate point query)
    exx = rays[0] + rays[3] * rays[6]
    ezz = rays[2] + rays[5] * rays[6]
    xmin, _ = block_minmax(jnp.minimum(rays[0], exx), BLK)
    _, xmax = block_minmax(jnp.maximum(rays[0], exx), BLK)
    zmin, _ = block_minmax(jnp.minimum(rays[2], ezz), BLK)
    _, zmax = block_minmax(jnp.maximum(rays[2], ezz), BLK)
    idx, cnt = compact_chunk_lists(chunk_bounds, xmin, xmax, zmin, zmax, 0.0)
    idx = idx[:, None, :]  # [G, 1, NC]
    cnt = cnt[:, None, None]  # [G, 1, 1]

    T = tri16.shape[0]
    NC = chunk_bounds.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=((R + pad) // BLK,),
        in_specs=[
            pl.BlockSpec((T, 16), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NC), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R + pad), jnp.float32),
    )(tri16, idx, cnt, rays)
    return out[0, :R]
