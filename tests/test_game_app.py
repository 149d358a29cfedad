"""Game-layer state machine tests (GameMain.c screen flow + SaveData
persistence across map changes)."""

import jax.numpy as jnp
import pytest

from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.game import GameApp, Screen


def test_screen_flow_and_level_list():
    app = GameApp(batch=1)
    assert app.screen == Screen.LOGO_SPLASH
    app.advance_splash()
    app.open_level_select()
    levels = app.list_levels()
    assert "test" in levels and "advanced_doors" in levels
    app.load_level("advanced_doors")
    assert app.screen == Screen.IN_GAME
    st = app.tick()
    assert int(st.tick[0]) >= 1
    app.pause()
    t0 = int(app.state.tick[0])
    app.tick()  # paused: world frozen
    assert int(app.state.tick[0]) == t0
    app.resume()
    app.tick()
    assert int(app.state.tick[0]) == t0 + 1


def test_save_data_persists_across_maps():
    app = GameApp(batch=1, initial_map="advanced_doors")
    app.state = app.state.replace(
        save=app.state.save.replace(coins=jnp.array([7]), item_mask=jnp.array([1]))
    )
    app.load_level("button")
    assert int(app.state.save.coins[0]) == 7
    assert int(app.state.save.item_mask[0]) == 1
    assert int(app.state.tick[0]) <= 1  # world state reset


def test_physics_frame_uptime_persists_across_maps():
    """GlobalState.physicsFrame is engine uptime (PhysicsThread.c:101) —
    never reset by ChangeMap — while per-map tick restarts; animation
    phases (coin uv cycle Coin.c:60, view-bob MapPhysics.c:84) stay
    continuous across a map change (PARITY.md #15)."""
    app = GameApp(batch=1, initial_map="advanced_doors")
    for _ in range(5):
        app.tick()
    f0 = int(app.state.frame[0])
    assert f0 >= 5
    app.load_level("button")
    assert int(app.state.tick[0]) <= 1  # per-map tick reset
    assert int(app.state.frame[0]) >= f0  # uptime carried
