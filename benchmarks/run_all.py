"""Benchmark harness over the five BASELINE configs (BASELINE.md).

Usage: python benchmarks/run_all.py [--batch 4096] [--ticks 240]
Writes a markdown table to stdout and benchmarks/results.json.

Configs (BASELINE.json):
  test            headless fixed-timestep tick + physics
  shapes          collider variety
  stacked         resting stability (physbox stack spawned programmatically)
  advanced_doors  kinematic doors + triggers + hitscan (with button map)
  max_box         max-extent sector stress (compiled from mapSources JSON)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import reset_batch, rollout

GMAPS = "/root/reference/assets/game/map"
JSONS = "/root/reference/mapSources"

CONFIGS = {
    "test": f"{GMAPS}/test.gmap",
    "shapes": f"{GMAPS}/shapes.gmap",
    "stacked": f"{GMAPS}/stacked.gmap",
    "advanced_doors": f"{GMAPS}/advanced_doors.gmap",
    "max_box": f"{JSONS}/max_box.json",  # no shipped .gmap; our JSON compiler
}


def spawn_stack(cmap, state, n=4):
    """stacked.json ships no actors (SURVEY.md §6); when benchmarking it we
    drop the map's dynamic bodies into a vertical stack."""
    import numpy as np

    rows = np.where(np.asarray(cmap.motion) == 3)[0]
    if len(rows) == 0:
        return state
    pos = state.actors.pos
    for i, r in enumerate(rows):
        pos = pos.at[:, r].set(jnp.array([0.0, 0.5 + 0.5 * i, 0.0]))
    return state.replace(actors=state.actors.replace(pos=pos))


def bench_config(name, path, batch, ticks):
    cmap = compile_map(path)
    state = reset_batch(cmap, batch)
    if name == "stacked":
        state = spawn_stack(cmap, state)
    acts = Actions.zeros((ticks, batch))
    acts = acts.replace(
        move=acts.move.at[..., 1].set(-1.0), look=acts.look.at[..., 0].set(0.01)
    )
    roll = jax.jit(lambda s, a: rollout(cmap, s, a))
    out = roll(state, acts)  # warmup: same shapes as the timed call
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = roll(state, acts)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    sps = batch * ticks / dt
    return {
        "config": name,
        "batch": batch,
        "ticks": ticks,
        "wall_s": round(dt, 3),
        "steps_per_sec_per_chip": round(sps, 1),
        "actors": cmap.aux["num_real_actors"],
        "tris": cmap.aux["num_real_tris"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=240)
    args = ap.parse_args()

    results = []
    for name, path in CONFIGS.items():
        r = bench_config(name, path, args.batch, args.ticks)
        results.append(r)
        print(
            f"{name:16s} {r['steps_per_sec_per_chip']:>14,.0f} steps/s/chip "
            f"({r['actors']} actors, {r['tris']} tris)",
            flush=True,
        )

    out = Path(__file__).parent / "results.json"
    out.write_text(json.dumps({"device": str(jax.devices()[0]), "results": results}, indent=1))
    print(f"\nwritten {out}")


if __name__ == "__main__":
    main()
