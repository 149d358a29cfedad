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
    # follow-sensors track their owner's live body pose (item_eraser touch
    # pickup rides the dynamic eraser body, ItemEraser.c:74-76)
    fol = cmap.sensor_follow
    own = jnp.clip(cmap.sensor_owner, 0, None)
    scx, scy, scz = (cmap.shape_center[own, k] for k in range(3))
    # static gate: aux is a compile-time dict, so quiet maps trace no
    # follow-sensor gathers at all
    has_follow = bool((cmap.aux or {}).get("has_follow_sensors", False))
    if player_pos.ndim == 2:  # batched: sensor axis first, env axis last
        px, py, pz, sy0, sy1 = (a[None, :] for a in (px, py, pz, sy0, sy1))
        ox, oy, oz, qx, qy, qz, qw, hx, hy, hz = (
            a[:, None] for a in (ox, oy, oz, qx, qy, qz, qw, hx, hy, hz)
        )
        if has_follow:
            folb = fol[:, None]
            apx, apy, apz = (actors.pos[:, own, k].T for k in range(3))
            aqx, aqy, aqz, aqw = (actors.quat[:, own, k].T for k in range(4))
            rcx, rcy, rcz = g.quat_rotate_soa(
                aqx, aqy, aqz, aqw, scx[:, None], scy[:, None], scz[:, None]
            )
            ox = jnp.where(folb, apx + rcx, ox)
            oy = jnp.where(folb, apy + rcy, oy)
            oz = jnp.where(folb, apz + rcz, oz)
            qx = jnp.where(folb, aqx, qx)
            qy = jnp.where(folb, aqy, qy)
            qz = jnp.where(folb, aqz, qz)
            qw = jnp.where(folb, aqw, qw)
    elif has_follow:
        apx, apy, apz = (actors.pos[own, k] for k in range(3))
        aqx, aqy, aqz, aqw = (actors.quat[own, k] for k in range(4))
        rcx, rcy, rcz = g.quat_rotate_soa(aqx, aqy, aqz, aqw, scx, scy, scz)
        ox = jnp.where(fol, apx + rcx, ox)
        oy = jnp.where(fol, apy + rcy, oy)
        oz = jnp.where(fol, apz + rcz, oz)
        qx = jnp.where(fol, aqx, qx)
        qy = jnp.where(fol, aqy, qy)
        qz = jnp.where(fol, aqz, qz)
        qw = jnp.where(fol, aqw, qw)

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
