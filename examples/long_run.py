"""Checkpointed long-run: the production-deployment loop.

Runs a sharded env batch for many ticks in scan segments, checkpointing
the full EnvState pytree between segments and proving bitwise resume: the
trajectory of (checkpoint -> restore -> continue) equals an uninterrupted
run. This is the TPU counterpart of leaving the reference engine running
(its only persistence is options.kvl + in-RAM SaveData — SURVEY.md §5);
here the whole world state of every env is one pytree, so checkpoint /
restore is exact by construction.

Single host: the env axis shards over the local mesh (all visible
devices). Multi host (one process per host on a pod slice, DCN-connected):
launch with `jax.distributed.initialize()` (see docs/MULTIHOST.md) and the
same code runs unchanged — `make_mesh()` picks up the global device list
and each host checkpoints its addressable shards.

Usage:  python examples/long_run.py [map] [total_ticks] [segment]
        CGE_FORCE_DEVICES=8 python examples/long_run.py   (8-dev CPU mesh)
"""

import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if os.environ.get("CGE_FORCE_DEVICES"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={os.environ['CGE_FORCE_DEVICES']}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.compiler.cache import load_compiled
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import step_batch
from c_game_engine_tpu.parallel.mesh import make_mesh, shard_sim
from c_game_engine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "test"
    total_ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    segment = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    batch = int(os.environ.get("CGE_BATCH", "512"))

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} device(s) ({jax.default_backend()})")
    cmap, _ = load_compiled(f"/root/reference/assets/game/map/{name}.gmap", with_bundle=False)
    cmap_sh, state, _ = shard_sim(cmap, batch, mesh)

    # per-env distinct action stream (walk + turn, phase by env index)
    i = jnp.arange(batch, dtype=jnp.float32)
    acts = Actions.zeros((batch,)).replace(
        move=jnp.stack([jnp.sin(i * 0.37), -jnp.ones(batch)], -1),
        look=jnp.stack([0.01 * jnp.cos(i * 0.11), jnp.zeros(batch)], -1),
    )

    @jax.jit
    def run_segment(st):
        def body(s, _):
            return step_batch(cmap_sh, s, acts), None

        final, _ = jax.lax.scan(body, st, None, length=segment)
        return final

    ckdir = pathlib.Path(tempfile.mkdtemp(prefix="cge_longrun_"))
    t0 = time.perf_counter()
    ticks_done = 0
    while ticks_done < total_ticks:
        state = run_segment(state)
        jax.block_until_ready(state.tick)
        ticks_done += segment
        path = ckdir / f"ck_{ticks_done:08d}"
        save_checkpoint(str(path), state)
        rate = batch * ticks_done / (time.perf_counter() - t0)
        print(
            f"tick {ticks_done}/{total_ticks}  {rate:,.0f} env-steps/s  "
            f"checkpoint -> {path.name}",
            flush=True,
        )

    # ---- bitwise resume proof: restore the penultimate checkpoint, re-run
    # one segment, compare with the final state ----
    prev = ckdir / f"ck_{total_ticks - segment:08d}"
    restored = load_checkpoint(str(prev), like=state)
    # restore the mesh shardings: a host-local restored array would make
    # jit recompile for the unsharded layout, whose different reduction
    # order costs bitwise equality (1-ulp drift)
    restored = jax.tree.map(
        lambda a, ref: jax.device_put(jnp.asarray(a), ref.sharding), restored, state
    )
    replay = run_segment(restored)
    jax.block_until_ready(replay.tick)
    leaves_a = jax.tree.leaves(state)
    leaves_b = jax.tree.leaves(replay)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"resume proof: restored {prev.name}, re-ran {segment} ticks -> "
          f"BITWISE equal to the uninterrupted run ({len(leaves_a)} leaves)")
    print(f"final mean player pos: {np.asarray(jnp.mean(state.player.pos, 0)).round(3)}")


if __name__ == "__main__":
    main()
