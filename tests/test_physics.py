"""Physics behavior tests: analytic golden cases + determinism.

These replace the test suite the reference never had (SURVEY.md §4):
projectile integration, resting contacts, movement speeds, wall blocking,
jump apex, bitwise determinism under jit/vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.core.actions import Actions, Button
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step
from c_game_engine_tpu.models.sim import reset_batch, step_batch

from tests.worldgen import actor, make_map


@pytest.fixture(scope="module")
def freefall_map():
    # physbox high above the floor of a box room
    return make_map([actor("prop_physbox", (0, 2.0, 4))])


@pytest.fixture(scope="module")
def stepped(freefall_map):
    return jax.jit(lambda s, a: step(freefall_map, s, a))


def run_ticks(cmap, st, n, actions=None, sfn=None):
    sfn = sfn or jax.jit(lambda s, a: step(cmap, s, a))
    a = actions if actions is not None else Actions.zeros()
    for _ in range(n):
        st = sfn(st, a)
    return st


def test_physbox_freefall_analytic(freefall_map, stepped):
    """While airborne the box must track s = s0 - 0.5 g t^2 closely."""
    st = reset(freefall_map)
    i = freefall_map.aux["actor_classes"].index("PHYSBOX")
    g = 9.81
    a = Actions.zeros()
    ys = []
    for t in range(20):
        st = stepped(st, a)
        ys.append(float(st.actors.pos[i, 1]))
    # substepped symplectic Euler at h=1/120: y_n = y0 - g*h^2*sum(k)
    h = 1.0 / 120.0
    for t in range(10):  # first 10 ticks are airborne (falls ~0.54 m to -1+0.2)
        n_sub = 2 * (t + 1)
        expected = 2.0 - g * h * h * (n_sub * (n_sub + 1) / 2)
        assert abs(ys[t] - expected) < 1e-3, (t, ys[t], expected)


def test_physbox_rests_on_floor(freefall_map, stepped):
    st = reset(freefall_map)
    i = freefall_map.aux["actor_classes"].index("PHYSBOX")
    st = run_ticks(freefall_map, st, 120, sfn=stepped)
    y = float(st.actors.pos[i, 1])
    # floor at -1, cube half extent 0.2 -> rest at -0.8 (small solver slop)
    assert abs(y - (-0.8)) < 0.03
    assert float(jnp.linalg.norm(st.actors.vel[i])) < 0.05


def test_player_rests_on_floor(freefall_map, stepped):
    st = reset(freefall_map)
    st = run_ticks(freefall_map, st, 60, sfn=stepped)
    # capsule total half height 0.45 -> center rests at -0.55
    assert abs(float(st.player.pos[1]) - (-0.55)) < 0.02
    assert bool(st.player.on_ground)


def test_walk_speed(freefall_map, stepped):
    """W at yaw 0 moves -Z at 6 m/s (PlayerPhysics.c MOVE_SPEED)."""
    st = reset(freefall_map)
    st = run_ticks(freefall_map, st, 30, sfn=stepped)  # settle
    z0 = float(st.player.pos[2])
    a = Actions.zeros().replace(move=jnp.array([0.0, -1.0]))
    st = run_ticks(freefall_map, st, 30, actions=a, sfn=stepped)
    dz = float(st.player.pos[2]) - z0
    assert abs(dz - (-3.0)) < 0.1  # 6 m/s * 0.5 s


def test_slow_walk_speed(freefall_map, stepped):
    st = reset(freefall_map)
    st = run_ticks(freefall_map, st, 30, sfn=stepped)
    z0 = float(st.player.pos[2])
    a = Actions.zeros()
    a = a.replace(
        move=jnp.array([0.0, -1.0]), buttons=a.buttons.at[Button.SLOW].set(True)
    )
    st = run_ticks(freefall_map, st, 60, actions=a, sfn=stepped)
    dz = float(st.player.pos[2]) - z0
    assert abs(dz - (-0.6)) < 0.05  # 0.6 m/s * 1 s


def test_wall_blocks_player(freefall_map, stepped):
    st = reset(freefall_map)
    a = Actions.zeros().replace(move=jnp.array([0.0, -1.0]))
    st = run_ticks(freefall_map, st, 60 * 4, actions=a, sfn=stepped)
    # room half extent 8; capsule radius 0.2 -> can't pass -7.8
    assert float(st.player.pos[2]) > -8.0
    assert float(st.player.pos[2]) < -7.0  # did reach the wall


def test_jump_apex(freefall_map, stepped):
    st = reset(freefall_map)
    st = run_ticks(freefall_map, st, 30, sfn=stepped)
    y0 = float(st.player.pos[1])
    a = Actions.zeros()
    jump = a.replace(buttons=a.buttons.at[Button.JUMP].set(True))
    st = stepped(st, jump)
    peak = y0
    for _ in range(60):
        st = stepped(st, a)
        peak = max(peak, float(st.player.pos[1]))
    # v^2/2g = 4.25^2 / 19.62 = 0.921
    assert abs((peak - y0) - 0.921) < 0.06
    # and lands again
    for _ in range(30):
        st = stepped(st, a)
    assert abs(float(st.player.pos[1]) - y0) < 0.02


def test_noclip_through_wall(freefall_map, stepped):
    st = reset(freefall_map)
    a0 = Actions.zeros()
    noclip = a0.replace(buttons=a0.buttons.at[Button.NOCLIP].set(True))
    st = stepped(st, noclip)
    assert bool(st.player.noclip)
    a = a0.replace(move=jnp.array([0.0, -1.0]))
    st = run_ticks(freefall_map, st, 60 * 3, actions=a, sfn=stepped)
    assert float(st.player.pos[2]) < -9.0  # outside the room


def test_determinism_and_vmap_consistency(freefall_map):
    """Same seed/actions -> bitwise equal; batched env 0 == single env."""
    st1 = reset(freefall_map)
    st2 = reset(freefall_map)
    sfn = jax.jit(lambda s, a: step(freefall_map, s, a))
    a = Actions.zeros().replace(move=jnp.array([1.0, -1.0]))
    for _ in range(30):
        st1 = sfn(st1, a)
        st2 = sfn(st2, a)
    for l1, l2 in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    bst = reset_batch(freefall_map, 4)
    ba = Actions.zeros((4,)).replace(
        move=jnp.broadcast_to(jnp.array([1.0, -1.0]), (4, 2))
    )
    bfn = jax.jit(lambda s, a: step_batch(freefall_map, s, a))
    for _ in range(30):
        bst = bfn(bst, ba)
    np.testing.assert_allclose(
        np.asarray(bst.player.pos[0]), np.asarray(st1.player.pos), rtol=0, atol=0
    )


def test_body_sleeping(rig):
    """A settled body sleeps after 0.5 s below Jolt's velocity threshold
    (frozen pose, no drift) and wakes on an external impulse or the moving
    player (physics/batched.py SLEEP_*)."""
    import jax

    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.physics.batched import SLEEP_AFTER

    sfn = jax.jit(lambda s, a: step(rig, s, a))
    i_pb = [i for i, c in enumerate(rig.aux["actor_classes"]) if c == "PHYSBOX"][0]
    st = reset(rig)
    for _ in range(40 + SLEEP_AFTER):
        st = sfn(st, Actions.zeros())
    assert int(st.actors.sleep[i_pb]) >= SLEEP_AFTER
    frozen = np.asarray(st.actors.pos[i_pb])
    for _ in range(10):
        st = sfn(st, Actions.zeros())
    np.testing.assert_array_equal(np.asarray(st.actors.pos[i_pb]), frozen)
    # external impulse wakes it
    st = st.replace(
        actors=st.actors.replace(vel=st.actors.vel.at[i_pb].set(jnp.array([1.0, 0.0, 0.0])))
    )
    for _ in range(3):
        st = sfn(st, Actions.zeros())
    assert int(st.actors.sleep[i_pb]) < SLEEP_AFTER
    assert abs(float(st.actors.pos[i_pb, 0]) - frozen[0]) > 0.01


def test_walk_direction_matches_camera_forward_at_rotated_yaw():
    """W must move the player along the camera forward for EVERY spawn yaw
    (PlayerPhysics.c:268-273 rotates moveVec by the Y-axis player quat).
    Regression: the flat-walk rotation used the transposed matrix, so W
    walked backward at yaw 3pi/2 (shapes.gmap's spawn)."""
    from c_game_engine_tpu.core.step import _forward_xyz
    from tests.worldgen import make_map

    for yaw in (0.0, np.pi / 2, np.pi * 1.5, 2.2):
        cmap = make_map([], spawn_yaw=yaw)
        sfn = jax.jit(lambda s, a: step(cmap, s, a))
        st = reset(cmap)
        fwd = np.asarray(_forward_xyz(st.player.yaw[None], jnp.zeros(1)))[0]
        p0 = np.asarray(st.player.pos)
        a = Actions.zeros().replace(move=jnp.asarray([0.0, -1.0], jnp.float32))
        for _ in range(20):
            st = sfn(st, a)
        d = np.asarray(st.player.pos) - p0
        d[1] = 0.0
        dn = d / max(np.linalg.norm(d), 1e-9)
        assert float(dn @ fwd) > 0.99, f"yaw={yaw}: walked {dn} vs forward {fwd}"
        # strafe right (D) moves along camera right = forward x up... (cy, 0, -sy)
        st2 = reset(cmap)
        a2 = Actions.zeros().replace(move=jnp.asarray([1.0, 0.0], jnp.float32))
        for _ in range(20):
            st2 = sfn(st2, a2)
        d2 = np.asarray(st2.player.pos) - p0
        d2[1] = 0.0
        d2 /= max(np.linalg.norm(d2), 1e-9)
        right = np.array([np.cos(yaw), 0.0, -np.sin(yaw)])
        assert float(d2 @ right) > 0.99, f"yaw={yaw}: strafed {d2} vs right {right}"
