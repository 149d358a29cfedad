"""Runtime signal (I/O) system.

The reference fires outputs synchronously and recursively
(ActorFireOutput -> GetActorsByName -> ActorTriggerInput -> handler,
engine/src/structs/Actor.c:52-122). Here outputs fired during a tick are
accumulated into a dense [N, NUM_OUTPUTS] matrix, expanded through the
compiled edge table into a bounded event queue, and applied in
SIGNAL_ROUNDS bounded rounds (breadth-first instead of depth-first; chains
deeper than SIGNAL_ROUNDS per tick are carried into the next tick's queue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import (
    ActorClass,
    DecimalOp,
    DoorState,
    Input,
    LogicOp,
    Output,
)
from c_game_engine_tpu.assets.kvlist import ParamType
from c_game_engine_tpu.core.state import EVENT_CAPACITY, EventQueue

NUM_OUTPUTS = len(Output)

# default param carried by each output when fired (Param override on the
# edge wins, Actor.c:103-107)
_OUTPUT_PTYPE = jnp.zeros(NUM_OUTPUTS, jnp.int32).at[int(Output.EXECUTION_RESULT)].set(
    int(ParamType.BOOL)
).at[int(Output.COUNTER_CHANGED)].set(int(ParamType.INTEGER))


def empty_fired(n):
    return (
        jnp.zeros((n, NUM_OUTPUTS), bool),
        jnp.zeros((n, NUM_OUTPUTS), jnp.int32),
    )


def fire(fired, fired_pi, mask, output: Output, pi=None):
    """Mark output fired where mask is set. Works on [N, O] and batched
    [B, N, O] fired arrays (mask [N] / [B, N])."""
    o = int(output)
    fired = fired.at[..., o].set(fired[..., o] | mask)
    if pi is not None:
        fired_pi = fired_pi.at[..., o].set(jnp.where(mask, pi, fired_pi[..., o]))
    return fired, fired_pi


def expand_outputs(cmap, fired, fired_pi, prev_queue: EventQueue) -> EventQueue:
    """Convert fired outputs into queued events through the edge table,
    appending to whatever is already in prev_queue (normally empty)."""
    e = cmap.edge_src.shape[0]
    valid_edge = cmap.edge_src >= 0
    src = jnp.clip(cmap.edge_src, 0, None)
    out = cmap.edge_out
    # (src, out) picks as a dense one-hot contraction: the edge table is
    # unbatched, so under vmap this is one [B, N*O] x [N*O, E] reduction
    # instead of per-env gather kernels (TPU gathers don't fuse)
    n_out = fired.shape[-1]
    edge_oh = jnp.arange(fired.size)[:, None] == (src * n_out + out)[None, :]  # [N*O, E]
    triggered = valid_edge & jnp.any(edge_oh & fired.reshape(-1)[:, None], 0)

    # param: edge override if set, else the output's default payload
    has_override = cmap.edge_ptype != int(ParamType.NONE)
    ptype = jnp.where(has_override, cmap.edge_ptype, _OUTPUT_PTYPE[out])
    default_pi = jnp.sum(jnp.where(edge_oh, fired_pi.reshape(-1)[:, None], 0), 0)
    pi = jnp.where(has_override, cmap.edge_pi, default_pi)
    pf = jnp.where(
        has_override[:, None], cmap.edge_pf,
        default_pi[:, None].astype(jnp.float32) * (jnp.arange(4) == 0),
    )

    # compact triggered edges into queue slots after the existing events;
    # non-triggered lanes write out-of-bounds and are dropped
    base = prev_queue.count
    slot = jnp.cumsum(triggered.astype(jnp.int32)) - 1 + base
    ok = triggered & (slot < EVENT_CAPACITY)
    slot_w = jnp.where(ok, slot, EVENT_CAPACITY)

    # dense placement instead of a dynamic scatter: slot values are unique
    # per lane, so each queue slot matches at most one edge
    q_match = jnp.arange(EVENT_CAPACITY)[:, None] == slot_w[None, :]  # [Q, E]
    q_any = jnp.any(q_match, 1)

    def scatter(buf, vals):
        placed = jnp.sum(
            jnp.where(q_match.reshape(q_match.shape + (1,) * (vals.ndim - 1)), vals[None], 0), 1
        ).astype(buf.dtype)
        keep = q_any.reshape((EVENT_CAPACITY,) + (1,) * (vals.ndim - 1))
        return jnp.where(keep, placed, buf)

    target = scatter(prev_queue.target, cmap.edge_dst)
    inp = scatter(prev_queue.input, cmap.edge_in)
    q_ptype = scatter(prev_queue.ptype, ptype)
    q_pf = scatter(prev_queue.pf, pf)
    q_pi = scatter(prev_queue.pi, pi)
    n_new = jnp.sum(ok.astype(jnp.int32))
    n_drop = jnp.sum((triggered & ~ok).astype(jnp.int32))
    return EventQueue(
        target=target,
        input=inp,
        ptype=q_ptype,
        pf=q_pf,
        pi=q_pi,
        count=jnp.minimum(base + n_new, EVENT_CAPACITY),
        dropped=prev_queue.dropped + n_drop,
    )


def apply_events(cmap, state, fired, fired_pi):
    """Consume the event queue in one vectorized pass (see
    handlers.apply_round); newly fired outputs accumulate into
    fired/fired_pi. Returns (state, fired, fired_pi) with an emptied
    queue."""
    from c_game_engine_tpu.actors import handlers  # circular-safe local import

    q = state.events
    state, fired, fired_pi = handlers.apply_round(cmap, state, fired, fired_pi, q)
    from c_game_engine_tpu.core.state import empty_events

    state = state.replace(events=empty_events().replace(dropped=q.dropped))
    return state, fired, fired_pi


def process_signals(cmap, state, fired, fired_pi, rounds: int):
    """Bounded propagation: seed the queue with the caller's fired outputs
    (contact + update phases), then alternate apply/expand for `rounds`
    rounds. Events still queued after the last round carry into the next
    tick (the reference's recursion depth is unbounded; game content is
    <= 3 deep)."""
    state = state.replace(events=expand_outputs(cmap, fired, fired_pi, state.events))
    for _ in range(rounds):
        state, new_fired, new_pi = apply_events(cmap, state, *empty_fired(cmap.num_actors))
        state = state.replace(events=expand_outputs(cmap, new_fired, new_pi, state.events))
    return state
