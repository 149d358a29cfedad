"""Benchmark: batched physics steps/sec/chip on test.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >= 1,000,000 combined physics steps/sec/chip at
4096 envs (driver target; the reference publishes no numbers and runs one
env at 60 steps/sec on a desktop CPU).
"""

import json
import time

import jax

from c_game_engine_tpu.compiler.cache import load_compiled
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import reset_batch, rollout


def main():
    batch = int(__import__("os").environ.get("BENCH_BATCH", "4096"))
    n_ticks = int(__import__("os").environ.get("BENCH_TICKS", "240"))
    cmap, _ = load_compiled("/root/reference/assets/game/map/test.gmap", with_bundle=False)
    state = reset_batch(cmap, batch)
    # scripted action stream: hold W + slight turn so the whole pipeline
    # (movement, raycasts, contacts) does real work
    import jax.numpy as jnp

    acts = Actions.zeros((n_ticks, batch))
    acts = acts.replace(
        move=acts.move.at[..., 1].set(-1.0),
        look=acts.look.at[..., 0].set(0.01),
    )

    roll = jax.jit(lambda s, a: rollout(cmap, s, a))
    # warmup/compile with the SAME stream shape (a different length would
    # compile a different scan and the timed call would pay compilation)
    out = roll(state, acts)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    out = roll(state, acts)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_sec = batch * n_ticks / dt
    target = 1_000_000.0
    print(
        json.dumps(
            {
                "metric": f"combined physics steps/sec/chip ({batch} envs, test.json)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / target, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
