"""Executed multi-host recipe: 2 OS processes x 4 virtual CPU devices.

docs/MULTIHOST.md's pod-slice claims, run for real on one machine:
jax.distributed bring-up, a global 8-device mesh stepping an env-sharded
batch with distinct per-env actions, a checkpoint saved FROM the
distributed run, and a restore in a FRESH process group — with the whole
trajectory equal to a single-process 8-device run of the same batch
(both place 2 envs per device, so the compiled per-shard programs match
and the comparison is bitwise; contrast tests/test_multichip.py where
1-vs-8-device shard shapes differ and floats get a 2-ulp allowance).
"""

import os
import pathlib
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

TICKS = 8
BATCH = 16
MAP = "/root/reference/assets/game/map/button.gmap"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(phase, outdir):
    port = _free_port()
    env = dict(os.environ)
    # workers set their own 4-device count; don't inherit the suite's 8
    env.pop("XLA_FLAGS", None)
    worker = pathlib.Path(__file__).parent / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(pid), phase,
             str(outdir), str(TICKS)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{out[-4000:]}"
        assert "WORKER_OK" in out, out[-4000:]
    return outs


def test_two_process_step_checkpoint_resume(tmp_path):
    _launch("start", tmp_path)
    _launch("resume", tmp_path)
    pos_start = np.load(tmp_path / "pos_start.npy")
    pos_resume = np.load(tmp_path / "pos_resume.npy")
    assert pos_start.shape == (BATCH, 3)

    # single-process 8-virtual-device reference trajectory (same batch,
    # same per-env action streams as the workers)
    from c_game_engine_tpu.compiler.compile import compile_map
    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.parallel.mesh import make_mesh, shard_sim

    cmap = compile_map(MAP)
    mesh = make_mesh(8)
    _, state, step_fn = shard_sim(cmap, BATCH, mesh)
    i = jnp.arange(BATCH, dtype=jnp.float32)
    acts = Actions.zeros((BATCH,)).replace(
        move=jnp.stack([jnp.sin(i * 0.37), -jnp.ones(BATCH)], -1),
        look=jnp.stack([0.01 * jnp.cos(i * 0.11), jnp.zeros(BATCH)], -1),
    )
    for _ in range(TICKS):
        state = step_fn(state, acts)
    np.testing.assert_array_equal(np.asarray(state.player.pos), pos_start)
    # the workers' resume phase restored the checkpoint in a brand-new
    # process group; continuing the reference uninterrupted must land on
    # the same trajectory
    for _ in range(TICKS):
        state = step_fn(state, acts)
    np.testing.assert_array_equal(np.asarray(state.player.pos), pos_resume)
    # distinct action streams actually diverged the envs
    assert len(np.unique(np.asarray(state.player.pos)[:, 0])) > 8
