"""Generate the committed CPU physics trace for the on-chip trajectory
test (tests/test_tpu_parity.py::test_tpu_trajectory_matches_cpu_trace).

The round-4 verdict showed XLA:TPU *does* diverge from CPU on this
codebase (the bf16-matmul projection collapse, PARITY.md #19), and until
round 5 the only on-chip physics evidence was Pallas-vs-XLA — TPU
internal, blind to a backend-wide miscompile. This trace pins the CPU
trajectory of a 90-tick scripted rollout (8 envs, per-env action spread:
walking, turning, jumping) on test.gmap; the chip must track it within
float-reorder tolerance.

Usage: python benchmarks/gen_cpu_trace.py   (CPU-forced; writes
tests/goldens/cpu_trace.npz)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if __name__ == "__main__":  # imported by the TPU test, which must NOT pin CPU
    jax.config.update("jax_platforms", "cpu")

import numpy as np

TICKS = 90
BATCH = 8
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "cpu_trace.npz"


def scripted_actions(batch, ticks):
    """Deterministic per-env action spread: forward walk with per-env
    heading drift; env 0 jumps every 30 ticks; env 1 strafes."""
    import jax.numpy as jnp

    from c_game_engine_tpu.core.actions import Actions

    i = jnp.arange(batch, dtype=jnp.float32)
    t = jnp.arange(ticks, dtype=jnp.float32)
    move = jnp.stack(
        [
            jnp.broadcast_to(jnp.sin(i * 0.7)[None, :], (ticks, batch)),
            jnp.broadcast_to(-jnp.ones(batch)[None, :], (ticks, batch)),
        ],
        -1,
    )
    look = jnp.stack(
        [
            jnp.broadcast_to((0.01 * jnp.cos(i))[None, :], (ticks, batch)),
            jnp.zeros((ticks, batch)),
        ],
        -1,
    )
    acts = Actions.zeros((ticks, batch))
    jump = ((t[:, None] % 30.0) == 5.0) & (i[None, :] == 0.0)
    buttons = acts.buttons.at[..., 0].set(jump)  # BTN_JUMP is button 0
    return acts.replace(move=move, look=look, buttons=buttons)


def run_trace():
    from c_game_engine_tpu.compiler.cache import load_compiled
    from c_game_engine_tpu.models.sim import reset_batch, step_batch

    cmap, _ = load_compiled(
        "/root/reference/assets/game/map/test.gmap", with_bundle=False
    )
    state = reset_batch(cmap, BATCH)
    acts = scripted_actions(BATCH, TICKS)
    f = jax.jit(lambda s, a: step_batch(cmap, s, a))
    ppos, apos = [], []
    for k in range(TICKS):
        state = f(state, jax.tree.map(lambda x: x[k], acts))
        ppos.append(np.asarray(state.player.pos))
        apos.append(np.asarray(state.actors.pos))
    return np.stack(ppos), np.stack(apos), np.asarray(state.player.on_ground)


if __name__ == "__main__":
    ppos, apos, ground = run_trace()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, player_pos=ppos, actor_pos=apos, on_ground=ground)
    print(f"wrote {OUT}: player_pos {ppos.shape}, actor_pos {apos.shape}")
    print("final env0 player:", ppos[-1, 0])
