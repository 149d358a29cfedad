"""Game application layer: the reference's screen state machine, headless.

Reproduces game/src/GameMain.c + gameState/*.c as a host-side driver around
the batched sim:

  LOGO_SPLASH -> MENU -> LEVEL_SELECT -> LOADING -> IN_GAME <-> PAUSED
  (GameMain.c:14-39 SetInitialGameState: `--map` skips straight to loading
   the named map, else the splash; LoadingState.c:23-111 staged load with a
   250 ms minimum; LevelSelectState.c enumerates map/*.gmap.)

The interactive screens have no pixels to click headlessly; they are
modeled as explicit transitions (`select_level`, `pause`, ...) so scripted
drivers and tests can exercise the same state flow, including SaveData
persistence across maps and the menu's background map
(BackgroundMapManager.h:11-39).
"""

from __future__ import annotations

import enum
import time
from pathlib import Path

import jax

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import change_map, reset_batch, step_batch
from c_game_engine_tpu.utils.log import log_info


class Screen(enum.Enum):
    LOGO_SPLASH = "logo_splash"
    MENU = "menu"
    LEVEL_SELECT = "level_select"
    LOADING = "loading"
    IN_GAME = "in_game"
    PAUSED = "paused"


MIN_LOAD_TIME = 0.25  # LoadingState.c minimum display time


class GameApp:
    def __init__(
        self,
        map_dir: str = "/root/reference/assets/game/map",
        batch: int = 1,
        initial_map: str | None = None,
        background_map: str | None = None,
    ):
        self.map_dir = Path(map_dir)
        self.batch = batch
        self.screen = Screen.LOGO_SPLASH
        self.cmap = None
        self.state = None
        self._pending_map: str | None = None
        self._cmap_cache: dict[str, object] = {}
        self.background_map = background_map
        if initial_map:
            # --map flag: straight into loading (GameMain.c:14-39)
            self.load_level(initial_map)

    # ---- screen queries -------------------------------------------------
    def list_levels(self) -> list[str]:
        """LevelSelectState.c:126 enumerates map/*.gmap."""
        return sorted(p.stem for p in self.map_dir.glob("*.gmap"))

    # ---- transitions ----------------------------------------------------
    def advance_splash(self):
        assert self.screen == Screen.LOGO_SPLASH
        self.screen = Screen.MENU

    def open_level_select(self):
        assert self.screen == Screen.MENU
        self.screen = Screen.LEVEL_SELECT

    def load_level(self, name: str):
        """LoadingState: compile + reset (ChangeMapByName,
        GlobalState.c:227-248), carrying SaveData when a run is active."""
        self.screen = Screen.LOADING
        self._t_load = time.monotonic()
        path = name if "/" in name else str(self.map_dir / f"{name}.gmap")
        if path not in self._cmap_cache:
            self._cmap_cache[path] = compile_map(path)
        new_cmap = self._cmap_cache[path]
        if self.state is not None:
            self.state = change_map(new_cmap, self.state)
        else:
            self.state = reset_batch(new_cmap, self.batch)
        self.cmap = new_cmap
        self._step = jax.jit(lambda s, a: step_batch(new_cmap, s, a))
        # one physics tick before entering MainState (LoadingState waits for
        # a tick, LoadingState.c:51-66)
        self.state = self._step(self.state, Actions.zeros((self.batch,)))
        dt = time.monotonic() - self._t_load
        log_info("map %s loaded in %.0f ms", name, dt * 1e3)
        self.screen = Screen.IN_GAME

    def pause(self):
        assert self.screen == Screen.IN_GAME
        self.screen = Screen.PAUSED

    def resume(self):
        assert self.screen == Screen.PAUSED
        self.screen = Screen.IN_GAME

    def quit_to_menu(self):
        self.screen = Screen.MENU

    # ---- per-tick -------------------------------------------------------
    def tick(self, actions: Actions | None = None):
        """One fixed-timestep tick; only IN_GAME advances the world (the
        physics thread pauses the tick while not in MainState)."""
        if self.screen != Screen.IN_GAME:
            return self.state
        a = actions if actions is not None else Actions.zeros((self.batch,))
        self.state = self._step(self.state, a)
        return self.state
