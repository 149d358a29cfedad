"""Auxiliary-subsystem tests (SURVEY.md §5): checkpoint/resume, options
persistence, run config, and metrics instrumentation."""

import jax
import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step_batch
from c_game_engine_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from c_game_engine_tpu.utils.config import Options, RunConfig
from c_game_engine_tpu.utils.metrics import RateGraph, TickBenchmark


def _run(cmap, state, n, batch):
    fn = jax.jit(lambda s, a: step_batch(cmap, s, a))
    acts = Actions(
        move=jnp.tile(jnp.array([0.0, -1.0]), (batch, 1)),
        look=jnp.zeros((batch, 2)),
        buttons=jnp.zeros((batch, 10), bool),
    )
    for _ in range(n):
        state = fn(state, acts)
    return state


def test_checkpoint_resume_bitwise(rig, tmp_path):
    """Save mid-run, restore, continue: must match the uninterrupted run
    bit-for-bit (replaces the reference's options.kvl+SaveData persistence
    with full-EnvState checkpointing)."""
    B = 2
    st0 = jax.vmap(lambda _: reset(rig))(jnp.arange(B))
    mid = _run(rig, st0, 5, B)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, mid)
    restored = load_checkpoint(path, mid)
    for a, b in zip(jax.tree.leaves(mid), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    end_direct = _run(rig, mid, 5, B)
    end_resumed = _run(rig, restored, 5, B)
    np.testing.assert_array_equal(
        np.asarray(end_direct.player.pos), np.asarray(end_resumed.player.pos)
    )
    assert int(end_resumed.tick[0]) == 10


def test_options_roundtrip_and_validation(tmp_path):
    """options.kvl binary round-trip + bounds clamping (Options.c:55-100)."""
    o = Options(fov=150.0, msaa=16, lod_multiplier=0.01, vsync=False, master_volume=0.5)
    o.validate()
    assert o.fov == 120.0 and o.msaa == 8 and o.lod_multiplier == 0.25

    p = str(tmp_path / "options.kvl")
    o.save(p)
    o2 = Options.load(p)
    assert o2 == o

    # missing file -> defaults (Options.c fallback path)
    d = Options.load(str(tmp_path / "nope.kvl"))
    assert d == Options()


def test_run_config_cli():
    rc = RunConfig.from_cli(["--batch", "64", "--ticks", "7", "--render"])
    assert rc.batch == 64 and rc.ticks == 7 and rc.render
    assert RunConfig.from_cli([]).batch == 4096


def test_metrics_instruments():
    tb = TickBenchmark()
    for _ in range(3):
        with tb.tick():
            pass
    assert tb.count == 3 and tb.best <= tb.worst
    assert "ticks=3" in tb.report(batch=128)

    rg = RateGraph(max_samples=4, interval=0.0)
    for _ in range(10):
        rg.add_event(5)
    assert len(rg.samples) <= 4
    assert rg.sparkline()
