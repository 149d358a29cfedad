"""Multi-chip scaling: env-batch data parallelism over a 1-D device mesh.

The reference has no distributed execution at all (SURVEY.md §2.9: 4 OS
threads, no NCCL/MPI); the batched-env design scales by sharding the env
axis over ICI with jax.sharding + shard_map. Per-env state never crosses
chips during stepping (embarrassingly parallel); collectives (psum) carry
metrics only. PP/TP have no counterpart for this workload (KB-scale state
per env) and are intentionally N/A — see ARCHITECTURE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c_game_engine_tpu.models.sim import reset_batch, step_batch

ENV_AXIS = "env"


def make_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ENV_AXIS,))


def shard_sim(cmap, batch: int, mesh: Mesh):
    """Fresh batched state with the env axis sharded over the mesh; the map
    is replicated. Returns (state, step_fn) where step_fn keeps shardings."""
    assert batch % mesh.devices.size == 0, "batch must divide the mesh"
    state = reset_batch(cmap, batch)
    env_sharding = NamedSharding(mesh, P(ENV_AXIS))
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(ENV_AXIS, *([None] * (x.ndim - 1))))),
        state,
    )
    cmap_sh = jax.tree.map(lambda x: jax.device_put(x, repl), cmap)

    @jax.jit
    def step_fn(st, actions):
        return step_batch(cmap_sh, st, actions)

    return cmap_sh, state, step_fn


def sharded_rollout(cmap, mesh: Mesh, batch: int, n_ticks: int, actions=None):
    """Jitted scan of n_ticks over a sharded batch; returns (final_state,
    metrics) with metrics reduced across the batch (the psum-equivalent under
    jit+sharding is a plain mean — XLA inserts the collective)."""
    from c_game_engine_tpu.core.actions import Actions

    cmap_sh, state, _ = shard_sim(cmap, batch, mesh)
    if actions is None:
        actions = Actions.zeros((batch,))

    @jax.jit
    def run(st):
        def body(s, _):
            return step_batch(cmap_sh, s, actions), None

        final, _ = jax.lax.scan(body, st, None, length=n_ticks)
        metrics = {
            "mean_player_y": jnp.mean(final.player.pos[:, 1]),
            "mean_coins": jnp.mean(final.save.coins.astype(jnp.float32)),
            "ticks": final.tick[0],
        }
        return final, metrics

    return run(state)
