"""One 'host' of the 2-process jax.distributed CPU cluster that
tests/test_multihost.py launches (docs/MULTIHOST.md executed, not just
documented). Each process owns 4 virtual CPU devices; after
jax.distributed.initialize the global mesh is 8 devices and this process
holds the addressable half of every env-sharded leaf.

Phases:
  start  - fresh state, step `ticks`, save the allgathered player
           positions (process 0) + a distributed checkpoint, exit
  resume - a FRESH process group restores that checkpoint, steps `ticks`
           more, saves final positions

Usage: python multihost_worker.py <port> <process_id> <phase> <outdir> <ticks>
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
port, pid, phase, outdir, ticks = sys.argv[1:6]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=int(pid)
)

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

from c_game_engine_tpu.compiler.cache import load_compiled
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.parallel.mesh import make_mesh, shard_sim
from c_game_engine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

BATCH = 16
ticks = int(ticks)
out = pathlib.Path(outdir)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

cmap, _ = load_compiled(
    "/root/reference/assets/game/map/button.gmap", with_bundle=False
)
mesh = make_mesh()
cmap_sh, state, step_fn = shard_sim(cmap, BATCH, mesh)

if phase == "resume":
    # host-side template with the right global shapes/dtypes, then place
    # the restored leaves back on the global mesh
    like = multihost_utils.process_allgather(state, tiled=True)
    host_state = load_checkpoint(str(out / "ckpt"), like)
    state = jax.tree.map(
        lambda x: jax.device_put(
            jnp.asarray(x),
            NamedSharding(mesh, P("env", *([None] * (np.ndim(x) - 1)))),
        ),
        host_state,
    )

# distinct per-env action streams, computed identically on every host —
# no action broadcast over DCN (docs/MULTIHOST.md)
i = jnp.arange(BATCH, dtype=jnp.float32)
acts = Actions.zeros((BATCH,)).replace(
    move=jnp.stack([jnp.sin(i * 0.37), -jnp.ones(BATCH)], -1),
    look=jnp.stack([0.01 * jnp.cos(i * 0.11), jnp.zeros(BATCH)], -1),
)
for _ in range(ticks):
    state = step_fn(state, acts)

# cross-host metric reduction (the only stepping-adjacent collective)
mean_y = float(jnp.mean(state.player.pos[:, 1]))
pos = multihost_utils.process_allgather(state.player.pos, tiled=True)
if jax.process_index() == 0:
    np.save(out / f"pos_{phase}.npy", np.asarray(pos))
    with open(out / f"meany_{phase}_{pid}.txt", "w") as f:
        f.write(repr(mean_y))
if phase == "start":
    save_checkpoint(str(out / "ckpt"), state)
multihost_utils.sync_global_devices("cge_worker_done")
print("WORKER_OK", flush=True)
