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
