"""Flagship model: a batched map simulation.

Bundles a CompiledMap with jitted batched reset/step/rollout. This is the
TPU-native replacement for the reference's engine loop (InitEngine /
EngineIteration / physics thread, SURVEY.md §3): B environments step in
lockstep; time is a `lax.scan`; the batch axis vmaps and (optionally)
shards over a device mesh (see parallel/).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import EnvState, reset
from c_game_engine_tpu.core.step import step, step_batch as _step_batch


def reset_batch(cmap, batch: int, save=None, frame=None) -> EnvState:
    """Fresh state broadcast over a batch axis. Pass `save` (a batched
    SaveData) to carry hp/coins/items across a map change — the reference
    keeps SaveData in GlobalState across ChangeMap (GlobalState.h:23-35,
    ChangeMapByName GlobalState.c:227-248). Pass `frame` (batched i32) to
    carry the engine-uptime physicsFrame counter (PhysicsThread.c:101)."""
    single = reset(cmap)
    out = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch, *x.shape)), single)
    if save is not None:
        out = out.replace(save=save)
    if frame is not None:
        out = out.replace(frame=frame)
    return out


def change_map(new_cmap, old_state: EnvState) -> EnvState:
    """ChangeMapByName equivalent: fresh state on `new_cmap` carrying the
    batch's SaveData (items/coins/hp persist; world state resets) and the
    uptime physicsFrame (animation phases stay continuous, PARITY.md #15)."""
    batch = old_state.tick.shape[0]
    return reset_batch(new_cmap, batch, save=old_state.save, frame=old_state.frame)


def step_batch(cmap, state: EnvState, actions: Actions) -> EnvState:
    return _step_batch(cmap, state, actions)


def rollout(cmap, state: EnvState, actions: Actions) -> EnvState:
    """Scan over a [T, B, ...] action stream; returns the final state.

    The fixed-timestep loop (PhysicsThread.c:59-112) as a lax.scan."""

    def body(st, act_t):
        return step_batch(cmap, st, act_t), None

    final, _ = jax.lax.scan(body, state, actions)
    return final


def rollout_collect(cmap, state: EnvState, actions: Actions, collect_fn):
    """Like rollout but also stacks collect_fn(state) per tick."""

    def body(st, act_t):
        st = step_batch(cmap, st, act_t)
        return st, collect_fn(st)

    return jax.lax.scan(body, state, actions)


@dataclass
class BatchedSim:
    """Convenience bundle with jit-compiled entry points."""

    cmap: Any
    batch: int
    reset: Any
    step: Any
    rollout: Any

    @property
    def name(self) -> str:
        return self.cmap.aux["name"] if self.cmap.aux else "map"


def make_sim(map_source: str, batch: int = 4096, jit: bool = True) -> BatchedSim:
    cmap = compile_map(map_source)
    _reset = functools.partial(reset_batch, cmap)
    _step = functools.partial(step_batch, cmap)
    _roll = functools.partial(rollout, cmap)
    if jit:
        _step = jax.jit(_step)
        _roll = jax.jit(_roll)
    return BatchedSim(cmap=cmap, batch=batch, reset=lambda: _reset(batch), step=_step, rollout=_roll)
