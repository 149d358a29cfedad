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
