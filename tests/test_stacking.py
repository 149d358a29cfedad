"""Resting-contact stability: a programmatic physbox stack (the stacked.json
benchmark spawns these at runtime — BASELINE.md note; SURVEY.md §6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step

from tests.worldgen import actor, make_map


@pytest.fixture(scope="module")
def stack_map():
    # 3 cubes (half extent 0.2) dropped in a column with small gaps
    return make_map(
        [
            actor("prop_physbox", (4.0, -0.7, 4.0)),
            actor("prop_physbox", (4.0, -0.25, 4.0)),
            actor("prop_physbox", (4.0, 0.2, 4.0)),
        ],
        spawn=(0.0, 0.0, -4.0),
    )


def test_stack_settles_and_rests(stack_map):
    cmap = stack_map
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    a = Actions.zeros()
    for _ in range(240):
        st = sfn(st, a)
    rows = [i for i, c in enumerate(cmap.aux["actor_classes"]) if c == "PHYSBOX"]
    ys = sorted(float(st.actors.pos[i, 1]) for i in rows)
    # bottom box rests on the floor (-1 + 0.2), others stack at ~0.4 spacing
    assert abs(ys[0] - (-0.8)) < 0.05, ys
    assert 0.3 < ys[1] - ys[0] < 0.5, ys
    assert 0.3 < ys[2] - ys[1] < 0.5, ys
    # no lateral explosion
    for i in rows:
        p = np.asarray(st.actors.pos[i])
        assert abs(p[0] - 4.0) < 0.5 and abs(p[2] - 4.0) < 0.5, p
    # velocities near zero (resting)
    for i in rows:
        assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.2


def test_stack_survives_long_run(stack_map):
    cmap = stack_map
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    a = Actions.zeros()
    for _ in range(240):
        st = sfn(st, a)
    rows = [i for i, c in enumerate(cmap.aux["actor_classes"]) if c == "PHYSBOX"]
    ys0 = [float(st.actors.pos[i, 1]) for i in rows]
    for _ in range(300):
        st = sfn(st, a)
    ys1 = [float(st.actors.pos[i, 1]) for i in rows]
    for y0, y1 in zip(ys0, ys1):
        assert abs(y1 - y0) < 0.08  # no sinking/jitter drift


def test_stack_reaches_whole_stack_sleep_and_wakes(stack_map):
    """Whole-stack sleep within ~2 s (VERDICT r4 next #7): Jolt's resting
    stacks pass timeBeforeSleep (0.5 s) soon after settling; before the
    round-5 rest-bleed damping (physics/batched.py REST_BLEED) the top
    box's solver chatter reset the counters every few seconds and
    whole-stack sleep almost never engaged (PARITY #18). Wake-on-impulse
    must still propagate: kicking the bottom box wakes the stack within a
    few ticks (1 contact-hop/tick, PARITY #16)."""
    from c_game_engine_tpu.physics.batched import SLEEP_AFTER

    cmap = stack_map
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    a = Actions.zeros()
    for _ in range(120):  # settle (~2 s incl. the drop)
        st = sfn(st, a)
    rows = [i for i, c in enumerate(cmap.aux["actor_classes"]) if c == "PHYSBOX"]
    asleep = [int(st.actors.sleep[i]) >= SLEEP_AFTER for i in rows]
    assert all(asleep), [int(st.actors.sleep[i]) for i in rows]

    # kick the bottom box sideways; the whole stack must wake and move
    by = min(rows, key=lambda i: float(st.actors.pos[i, 1]))
    st = st.replace(
        actors=st.actors.replace(
            vel=st.actors.vel.at[by].set(jnp.array([2.0, 0.0, 0.0])),
            sleep=st.actors.sleep.at[by].set(0),
        )
    )
    for _ in range(6):  # >= one hop per tick up a 3-box chain
        st = sfn(st, a)
    awake_now = [int(st.actors.sleep[i]) < SLEEP_AFTER for i in rows]
    assert all(awake_now), [int(st.actors.sleep[i]) for i in rows]
    # and the kick physically displaced the bottom box
    assert float(st.actors.pos[by, 0]) > 4.05


def test_four_box_stack_holds_with_warm_start():
    """A dropped 4-box stack settles rigid and sleeps (round 5). Depth 3
    exceeds the fixed-sweep Jacobi solver's cold convergence (it needs
    ~16 sweeps/substep cold and collapses at the default 6); the
    cross-tick contact warm start (EnvState.warm_n/warm_pair — Jolt's
    ContactConstraintManager warm starting, the mechanism behind its
    stack stability) lets convergence accumulate across ticks instead.
    Guards the whole warm-start pipeline: slew-limited cache (impact
    spikes must not re-launch the stack), key re-matching across pair
    slot shuffles, and island-synchronized sleep entry (a member
    sleeping solo would take an unopposed warm reaction kick)."""
    from c_game_engine_tpu.physics.batched import SLEEP_AFTER

    cmap = make_map(
        [actor("prop_physbox", (4.0, -0.7 + 0.45 * i, 4.0)) for i in range(4)],
        spawn=(0.0, 0.0, -4.0),
    )
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    a = Actions.zeros()
    for _ in range(240):
        st = sfn(st, a)
    rows = [i for i, c in enumerate(cmap.aux["actor_classes"]) if c == "PHYSBOX"]
    ys = sorted(float(st.actors.pos[i, 1]) for i in rows)
    assert abs(ys[0] - (-0.8)) < 0.05, ys
    for lo, hi in zip(ys, ys[1:]):
        assert 0.37 < hi - lo < 0.43, ys  # rigid: no sag, no separation
    for i in rows:
        p = np.asarray(st.actors.pos[i])
        assert abs(p[0] - 4.0) < 0.3 and abs(p[2] - 4.0) < 0.3, p
        assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.05
    # the island sleeps as a unit (island-min gate): all four asleep
    assert all(int(st.actors.sleep[i]) >= SLEEP_AFTER for i in rows), [
        int(st.actors.sleep[i]) for i in rows
    ]
    # and STAYS asleep: no solo-sleep warm-reaction glitch for 5 s
    ys0 = [float(st.actors.pos[i, 1]) for i in rows]
    for _ in range(300):
        st = sfn(st, a)
    for i, y0 in zip(rows, ys0):
        assert abs(float(st.actors.pos[i, 1]) - y0) < 0.01
    assert all(int(st.actors.sleep[i]) >= SLEEP_AFTER for i in rows)


def test_warm_cache_reaches_static_support_ratios():
    """At rest the warm cache holds the analytic static support set: a
    3-stack's floor contact carries 3 body-weights of impulse per
    substep, the pairs 2 and 1 (m*g*h each) — the quantitative signature
    that the solver starts every substep at the exact equilibrium
    (velocities are 0 to float precision, not merely under the sleep
    threshold)."""
    import c_game_engine_tpu.physics.batched as pb

    cmap = make_map(
        [actor("prop_physbox", (4.0, -0.7 + 0.45 * i, 4.0)) for i in range(3)],
        spawn=(0.0, 0.0, -4.0),
    )
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    a = Actions.zeros()
    for _ in range(40):  # settled, not yet asleep (cache still live-updated)
        st = sfn(st, a)
    rows = [i for i, c in enumerate(cmap.aux["actor_classes"]) if c == "PHYSBOX"]
    bottom = min(rows, key=lambda i: float(st.actors.pos[i, 1]))
    m = 1.0 / float(cmap.inv_mass[bottom])
    h = (1.0 / 60.0) / 2.0  # tick / n_substeps
    w_unit = m * 9.81 * h  # one body-weight of impulse per substep
    floor_w = float(st.actors.warm_n[bottom])
    assert abs(floor_w - 3.0 * w_unit) < 0.35 * w_unit, (floor_w, w_unit)
    wp = np.asarray(st.actors.warm_pair)
    wi = np.asarray(st.actors.warm_pair_idx)
    pair_vals = sorted(float(v) for v in wp[wi >= 0] if v > 1e-3)
    assert len(pair_vals) == 2, (wp, wi)
    assert abs(pair_vals[0] - 1.0 * w_unit) < 0.35 * w_unit, (pair_vals, w_unit)
    assert abs(pair_vals[1] - 2.0 * w_unit) < 0.35 * w_unit, (pair_vals, w_unit)
