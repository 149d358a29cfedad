"""Sensor overlap: player capsule vs static box sensors.

The reference models triggers/coins/goals/door-sensors as Jolt sensor bodies
whose contacts with the CharacterVirtual fire OnContactAdded/Persisted/
Removed (PlayerPhysics.c:103-152). Here sensors are a compact static OBB
table; the per-tick overlap bitmask plus the previous tick's bitmask yields
the added/persisted/removed edges.
"""

from __future__ import annotations

import jax.numpy as jnp

from c_game_engine_tpu.physics.character import CAPSULE_HALF_HEIGHT, CAPSULE_RADIUS
from c_game_engine_tpu.physics.geometry import (
    closest_point_on_obb,
    closest_point_on_segment,
)


def sensor_overlap(cmap, actors, player_pos):
    """bool[S]: capsule overlaps sensor s (owner must be active).
    Component-wise math (works single-env [3] and batched [B, 3] via the
    batched wrapper below)."""
    from c_game_engine_tpu.physics import geometry_soa as g

    px, py, pz = player_pos[..., 0], player_pos[..., 1], player_pos[..., 2]
    sy0, sy1 = py - CAPSULE_HALF_HEIGHT, py + CAPSULE_HALF_HEIGHT
    ox, oy, oz = (cmap.sensor_pos[:, k] for k in range(3))
    qx, qy, qz, qw = (cmap.sensor_quat[:, k] for k in range(4))
    hx, hy, hz = (cmap.sensor_halfext[:, k] for k in range(3))
    if player_pos.ndim == 2:  # batched: sensor axis first, env axis last
        px, py, pz, sy0, sy1 = (a[None, :] for a in (px, py, pz, sy0, sy1))
        ox, oy, oz, qx, qy, qz, qw, hx, hy, hz = (
            a[:, None] for a in (ox, oy, oz, qx, qy, qz, qw, hx, hy, hz)
        )

    wx, wy, wz = g.closest_point_on_obb_soa(px, py, pz, ox, oy, oz, qx, qy, qz, qw, hx, hy, hz)
    for _ in range(2):
        spy = jnp.clip(wy, sy0, sy1)
        wx, wy, wz = g.closest_point_on_obb_soa(px, spy, pz, ox, oy, oz, qx, qy, qz, qw, hx, hy, hz)
    spy = jnp.clip(wy, sy0, sy1)
    dist = jnp.sqrt((px - wx) ** 2 + (spy - wy) ** 2 + (pz - wz) ** 2)
    if player_pos.ndim == 2:
        dist = dist.T  # [B, S]
        owner_ok = (cmap.sensor_owner >= 0)[None, :] & jnp.take(
            actors.active, jnp.clip(cmap.sensor_owner, 0, None), axis=-1
        )
    else:
        owner_ok = (cmap.sensor_owner >= 0) & actors.active[jnp.clip(cmap.sensor_owner, 0, None)]
    return owner_ok & (dist < CAPSULE_RADIUS)
