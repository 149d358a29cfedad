"""Per-tick action encoding.

Replaces the reference's dual InputSystem (engine/src/subsystem/Input.c:34-52,
queued cross-thread events PhysicsThread.c:45-53) with a dense per-env action
vector. Buttons carry *edge* semantics explicitly: the reference distinguishes
pressed vs just-pressed (Input.c 4-state tracking); here `jump` etc. below are
already the edge/hold the consuming code wants.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
from flax import struct


class Button(enum.IntEnum):
    JUMP = 0  # just-pressed (SPACE, PlayerPhysics.c:287)
    INTERACT = 1  # just-pressed (E, PlayerPhysics.c:337+)
    SLOW = 2  # held (LCTRL, PlayerPhysics.c:245)
    SPRINT = 3  # held (LSHIFT, freecam/noclip only, PlayerPhysics.c:249)
    NOCLIP = 4  # just-released toggle (V, PlayerPhysics.c:434)
    FREECAM = 5  # just-released toggle (F8, PlayerPhysics.c:320)
    ITEM_NEXT = 6  # mouse wheel down (MapPhysics.c:92-99)
    ITEM_PREV = 7  # mouse wheel up
    FIRE = 8  # mouse left, item use (EraserItem.c / LaserStopperItem.c)
    ALT_FIRE = 9  # mouse right (LaserStopperItem.c turn_on)


NUM_BUTTONS = len(Button)
# flat action vector: move_x, move_z, look_dx, look_dy, buttons...
ACTION_DIM = 4 + NUM_BUTTONS


@struct.dataclass
class Actions:
    move: jnp.ndarray  # [..., 2] x (strafe, +right), z (+backward; W = -1)
    look: jnp.ndarray  # [..., 2] yaw delta, pitch delta (radians this tick)
    buttons: jnp.ndarray  # [..., NUM_BUTTONS] bool

    @staticmethod
    def zeros(batch_shape=()):
        return Actions(
            move=jnp.zeros((*batch_shape, 2), jnp.float32),
            look=jnp.zeros((*batch_shape, 2), jnp.float32),
            buttons=jnp.zeros((*batch_shape, NUM_BUTTONS), bool),
        )

    @staticmethod
    def from_flat(flat: jnp.ndarray) -> "Actions":
        return Actions(
            move=flat[..., 0:2].astype(jnp.float32),
            look=flat[..., 2:4].astype(jnp.float32),
            buttons=flat[..., 4 : 4 + NUM_BUTTONS] > 0.5,
        )

    def to_flat(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.move, self.look, self.buttons.astype(jnp.float32)], axis=-1
        )
