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
    """bool[S]: capsule overlaps sensor s (owner must be active)."""
    s0 = player_pos - jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0])
    s1 = player_pos + jnp.array([0.0, CAPSULE_HALF_HEIGHT, 0.0])
    q = closest_point_on_obb(player_pos, cmap.sensor_pos, cmap.sensor_quat, cmap.sensor_halfext)
    for _ in range(2):
        p = closest_point_on_segment(q, jnp.broadcast_to(s0, q.shape), jnp.broadcast_to(s1, q.shape))
        q = closest_point_on_obb(p, cmap.sensor_pos, cmap.sensor_quat, cmap.sensor_halfext)
    dist = jnp.linalg.norm(p - q, axis=-1)
    owner_ok = (cmap.sensor_owner >= 0) & actors.active[jnp.clip(cmap.sensor_owner, 0, None)]
    return owner_ok & (dist < CAPSULE_RADIUS)
