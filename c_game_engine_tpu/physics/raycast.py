"""Hitscan raycasts vs the static world and actor colliders.

Replaces Jolt's NarrowPhaseQuery::CastRay with layer/body filters
(PlayerPhysics.c:297-315 player interaction ray, 10u; Laser.c:127-158 laser
rays, 50u, honoring ACTOR_FLAG_CAN_BLOCK_LASERS)."""

from __future__ import annotations

import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import ActorFlags, Layer, Motion, Shape
from c_game_engine_tpu.physics.geometry import ray_obb, ray_triangle


def cast_ray(
    cmap,
    actors,
    origin,
    direction,
    max_dist,
    exclude_actor=-1,
    require_flags: int = 0,
    static_layer_only: bool = False,
    include_statics: bool = True,
):
    """Returns (hit: bool, fraction: f32 in [0,1], actor_idx: i32, -1 for the
    static world).

    `require_flags`: actors missing these flags are transparent (the laser's
    JPH_BodyFilter, Laser.c:73-86). Static world triangles always hit.
    `static_layer_only`: triple lasers only collide the STATIC broadphase
    layer (Laser.c:64-71)."""
    t_best = jnp.asarray(jnp.inf, jnp.float32)
    idx_best = jnp.asarray(-1, jnp.int32)

    if include_statics:
        a, b, c = cmap.tris[:, 0], cmap.tris[:, 1], cmap.tris[:, 2]
        hit, t = ray_triangle(origin, direction, a, b, c, max_dist)
        t = jnp.where(cmap.tri_valid, t, jnp.inf)
        t_tri = jnp.min(t)
        t_best = jnp.minimum(t_best, t_tri)

    solid = (
        actors.active
        & (cmap.shape != int(Shape.EMPTY))
        & (cmap.motion != int(Motion.NONE))
        & (cmap.layer != int(Layer.SENSOR))
        & (jnp.arange(cmap.num_actors) != exclude_actor)
    )
    if static_layer_only:
        solid = solid & (cmap.layer == int(Layer.STATIC))
    if require_flags:
        solid = solid & ((cmap.flags & require_flags) == require_flags)

    from c_game_engine_tpu.utils.mathx import quat_rotate

    box_ctr = actors.pos + quat_rotate(actors.quat, cmap.shape_center)
    bhit, bt = ray_obb(origin, direction, box_ctr, actors.quat, cmap.halfext, max_dist)
    bt = jnp.where(solid & bhit, bt, jnp.inf)
    k = jnp.argmin(bt)
    t_act = bt[k]
    better = t_act < t_best
    idx_best = jnp.where(better, k.astype(jnp.int32), idx_best)
    t_best = jnp.minimum(t_best, t_act)

    hit_any = jnp.isfinite(t_best)
    fraction = jnp.where(hit_any, t_best / max_dist, 1.0)
    return hit_any, fraction.astype(jnp.float32), idx_best


def forward_vector(yaw, pitch):
    """World forward for the player/camera orientation: -Z at yaw=0,
    pitch rotating up/down (W moves -Z, MovePlayer PlayerPhysics.c:225)."""
    cp = jnp.cos(pitch)
    return jnp.stack([-jnp.sin(yaw) * cp, jnp.sin(pitch), -jnp.cos(yaw) * cp], axis=-1)
