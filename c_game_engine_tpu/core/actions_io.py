"""Action-stream recording/replay ("CGAS" container).

The reference's input path is a live SDL event queue copied across the
physics-thread boundary (PhysicsThread.c:45-53); the batch framework drives
envs from scripted action streams instead (core/actions.py). This module
persists those streams — [T, B] Actions — as a compact gzip container so
long multi-thousand-env sessions replay byte-exactly (determinism tests,
demo walkthroughs, regression traces).

Codec lives in the native runtime (native/cge_native.cpp cge_actions_*,
C ABI over ctypes) with a byte-identical pure-Python fallback. Format:

  header (32 B LE): magic 'CGAS' | version u8 | n_buttons u8 | pad u16 |
    batch u32 | n_ticks u32 | raw_size u64 | comp_size u64
  gzip payload: move [T*B*2] f32, look [T*B*2] f32,
    buttons [T*B] u16 bitmask
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from c_game_engine_tpu.core.actions import NUM_BUTTONS, Actions

MAGIC = 0x53414743  # "CGAS"
_HEADER = struct.Struct("<IBBHIIQQ")
assert _HEADER.size == 32


def _to_numpy(actions: Actions):
    move = np.asarray(actions.move, np.float32)
    look = np.asarray(actions.look, np.float32)
    buttons = np.asarray(actions.buttons, np.uint8)
    if move.ndim != 3:
        raise ValueError("expected a [T, B] action stream")
    return move, look, buttons


def save_actions(path: str | Path, actions: Actions, native: bool | None = None):
    """Write a [T, B] action stream. native=None tries the C codec first."""
    move, look, buttons = _to_numpy(actions)
    t, b = move.shape[:2]
    if native is not False:
        try:
            from c_game_engine_tpu.native import actions_write_native

            actions_write_native(str(path), move, look, buttons)
            return
        except Exception:
            if native:
                raise
    mask = np.zeros((t * b,), np.uint16)
    flat_b = buttons.reshape(t * b, NUM_BUTTONS)
    for i in range(NUM_BUTTONS):
        mask |= (flat_b[:, i].astype(np.uint16)) << i
    raw = move.tobytes() + look.tobytes() + mask.tobytes()
    comp = gzip.compress(raw, 6, mtime=0)
    header = _HEADER.pack(MAGIC, 1, NUM_BUTTONS, 0, b, t, len(raw), len(comp))
    Path(path).write_bytes(header + comp)


def load_actions(path: str | Path, native: bool | None = None) -> Actions:
    """Read a CGAS stream back as a [T, B] Actions pytree."""
    if native is not False:
        try:
            from c_game_engine_tpu.native import actions_read_native

            move, look, buttons = actions_read_native(str(path))
            return Actions(
                move=jnp.asarray(move), look=jnp.asarray(look),
                buttons=jnp.asarray(buttons > 0),
            )
        except Exception:
            if native:
                raise
    data = Path(path).read_bytes()
    magic, version, nb, _pad, b, t, raw_size, comp_size = _HEADER.unpack_from(data, 0)
    if magic != MAGIC or version != 1:
        raise ValueError(f"{path}: not a CGAS v1 stream")
    if len(data) - 32 != comp_size:
        raise ValueError(f"{path}: truncated stream")
    raw = gzip.decompress(data[32:])
    if len(raw) != raw_size or raw_size != t * b * 18:
        raise ValueError(f"{path}: bad payload size")
    tb = t * b
    move = np.frombuffer(raw, np.float32, tb * 2, 0).reshape(t, b, 2)
    look = np.frombuffer(raw, np.float32, tb * 2, tb * 8).reshape(t, b, 2)
    mask = np.frombuffer(raw, np.uint16, tb, tb * 16)
    buttons = ((mask[:, None] >> np.arange(nb)[None, :]) & 1).astype(bool)
    buttons = buttons.reshape(t, b, nb)
    if nb != NUM_BUTTONS:  # forward/backward compatible button sets
        out = np.zeros((t, b, NUM_BUTTONS), bool)
        out[..., : min(nb, NUM_BUTTONS)] = buttons[..., : min(nb, NUM_BUTTONS)]
        buttons = out
    return Actions(
        move=jnp.asarray(move), look=jnp.asarray(look), buttons=jnp.asarray(buttons)
    )


class ActionRecorder:
    """Accumulate per-tick [B] actions from a live loop, then save()."""

    def __init__(self):
        self._ticks: list[Actions] = []

    def record(self, actions: Actions):
        self._ticks.append(actions)

    def __len__(self):
        return len(self._ticks)

    def stream(self) -> Actions:
        if not self._ticks:
            raise ValueError("nothing recorded")
        import jax

        return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *self._ticks)

    def save(self, path: str | Path, native: bool | None = None):
        save_actions(path, self.stream(), native=native)
