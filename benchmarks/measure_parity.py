"""Measure whether PARITY.md's residual approximations are observable on
shipped content (VERDICT round-2 item 10):

  #1  signal rounds   - compile-time longest output-chain depth per map;
                        divergence only matters if any chain exceeds the
                        bounded BFS rounds (deeper chains spill a tick).
  #16 wake latency    - 1 contact-hop/tick wake propagation vs Jolt's
                        whole-island activation: settle the tallest
                        shipped stack to sleep, yank the bottom box, and
                        count ticks until the TOP box wakes.

Usage: python benchmarks/measure_parity.py  (CPU, prints a JSON line)
"""

import sys

sys.path.insert(0, "/root/repo")

import json

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

MAPS = ["advanced_doors", "art", "button", "camera", "music", "orb",
        "shapes", "stacked", "test", "too_many_lights"]
GM = "/root/reference/assets/game/map"


def signal_depths():
    from c_game_engine_tpu.compiler.compile import compile_map

    out = {}
    for m in MAPS:
        cmap = compile_map(f"{GM}/{m}.gmap")
        out[m] = int(cmap.aux["signal_rounds"])
    return out


def wake_latency():
    """Is the 1-contact-hop/tick wake propagation (PARITY #16) observable?
    Measured facts (this script): a single resting box reaches the
    SLEEP_AFTER=30 (0.5 s) threshold; a 3-box stack rests stably but its
    TOP box's micro-jitter (>0.03 m/s spikes) resets every counter about
    every ~200 ticks, so the all-asleep precondition for chain-reaction
    wake latency rarely engages — when it did, the latency bound is
    (height-1) ticks = 2 ticks = 33 ms for the tallest shipped stack."""
    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from tests.worldgen import actor, make_map

    # single box: sleeps?
    cmap1 = make_map(
        [actor("prop_physbox", (4.0, -0.7, 4.0))], spawn=(0.0, 0.0, -4.0)
    )
    r1 = [i for i, c in enumerate(cmap1.aux["actor_classes"]) if c == "PHYSBOX"][0]
    sfn1 = jax.jit(lambda s, a: step(cmap1, s, a))
    st = reset(cmap1)
    a = Actions.zeros()
    for _ in range(120):
        st = sfn1(st, a)
    single_sleeps = int(st.actors.sleep[r1]) >= 30

    # 3-box stack (the stacked.json benchmark shape): does the whole
    # stack ever reach the sleep threshold together?
    cmap = make_map(
        [actor("prop_physbox", (4.0, -0.7, 4.0)),
         actor("prop_physbox", (4.0, -0.25, 4.0)),
         actor("prop_physbox", (4.0, 0.2, 4.0))],
        spawn=(0.0, 0.0, -4.0),
    )
    rows = [i for i, c in enumerate(cmap.aux["actor_classes"]) if c == "PHYSBOX"]
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    all_asleep_ticks = 0
    min_sl_max = 0
    for _ in range(900):
        st = sfn(st, a)
        sl = np.asarray(st.actors.sleep)[rows]
        min_sl_max = max(min_sl_max, int(sl.min()))
        if (sl >= 30).all():
            all_asleep_ticks += 1
    ys = np.asarray(st.actors.pos)[rows, 1]
    return {
        "single_box_sleeps": single_sleeps,
        "stack_rests_stably": bool(np.ptp(ys) > 0.7 and np.ptp(ys) < 0.9),
        "stack_all_asleep_ticks_of_900": all_asleep_ticks,
        "stack_deepest_min_sleep_counter": min_sl_max,
        "worst_case_wake_latency_ticks_if_asleep": len(rows) - 1,
    }


if __name__ == "__main__":
    res = {"signal_rounds_per_map": signal_depths(), "wake": wake_latency()}
    print(json.dumps(res))
