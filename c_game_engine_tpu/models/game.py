"""Game application layer: the reference's screen state machine.

Reproduces game/src/GameMain.c + gameState/*.c as a host-side driver around
the batched sim:

  LOGO_SPLASH -> MENU -> LEVEL_SELECT -> LOADING -> IN_GAME <-> PAUSED
                   \\-> OPTIONS -> {VIDEO,SOUND,INPUT}_OPTIONS
  (GameMain.c:14-39 SetInitialGameState: `--map` skips straight to loading
   the named map, else the splash; LoadingState.c:23-111 staged load with a
   250 ms minimum; LevelSelectState.c enumerates map/*.gmap.)

Menu screens are real: each owns a widget stack (ui/screens.py) processed
by `ui_tick(UiInput)` and drawn by `render_frame()`, so the whole screen
flow produces pixels, exactly like the reference's Render fns. Explicit
transition methods (`select_level`, `pause`, ...) remain for scripted
drivers and tests. SaveData persists across maps and the menu keeps a
background map (BackgroundMapManager.h:11-39).
"""

from __future__ import annotations

import enum
import time
from pathlib import Path

import jax
import numpy as np

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import change_map, reset_batch, step_batch
from c_game_engine_tpu.utils.config import Options
from c_game_engine_tpu.utils.log import log_error, log_info


class Screen(enum.Enum):
    LOGO_SPLASH = "logo_splash"
    MENU = "menu"
    LEVEL_SELECT = "level_select"
    LOADING = "loading"
    IN_GAME = "in_game"
    PAUSED = "paused"
    OPTIONS = "options"
    VIDEO_OPTIONS = "video_options"
    SOUND_OPTIONS = "sound_options"
    INPUT_OPTIONS = "input_options"


MIN_LOAD_TIME = 0.25  # LoadingState.c minimum display time


def _aniso_ratio(enum_val: int) -> int:
    """Options.anisotropy enum -> sampler max-anisotropy ratio.

    Options.h:30-34 stores an enum (0=off, 1=2x, 2=4x, 3=8x, 4=16x); the
    reference's CreateTextureSamplers switch maps it to the Vulkan
    maxAnisotropy float the same way (VulkanInternal.c). render(aniso=...)
    expects the ratio/tap count, so translate here.
    """
    return 0 if enum_val <= 0 else 2 ** min(int(enum_val), 4)


class GameApp:
    def __init__(
        self,
        map_dir: str = "/root/reference/assets/game/map",
        batch: int = 1,
        initial_map: str | None = None,
        background_map: str | None = None,
        show_debug: bool = False,
        show_console: bool = False,
    ):
        from c_game_engine_tpu.render.dprint import DPrintConsole

        self.map_dir = Path(map_dir)
        # on-frame debug text (DPrint.h ENABLE_DEBUG_PRINT) + the last-2s
        # message console (--show-console, DPrintConsole.c:84-91)
        self.show_debug = show_debug
        self.console = DPrintConsole(enabled=show_console)
        self.batch = batch
        self.screen = Screen.LOGO_SPLASH
        self.cmap = None
        self.state = None
        self._pending_map: str | None = None
        self._current_path: str | None = None
        self._cmap_cache: dict[str, object] = {}
        self._bundle_cache: dict[str, object] = {}
        self.background_map = background_map
        self.options = Options()
        self.request_exit = False
        self.selected_level = 0  # LevelSelectState.c:28
        self.splash_tick = 0
        self._options_in_game = False  # optionsStateInGame (OptionsState.c:30)
        self._ui = {}  # Screen -> (stackdef, event names, UiState)
        # host-side UI/system sound channels (SoundSystem parity for the
        # app layer: Button.c:55 click, MainState.c:47 popup,
        # PauseState.c:36 popdown, LogoSplashState.c:26 coincling)
        from c_game_engine_tpu.audio.mixer import empty_audio

        self.ui_audio = empty_audio()
        self._ui_lengths = None
        self._ui_bank = None
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
        prev_path = self._current_path
        self._current_path = path
        if path not in self._cmap_cache:
            try:
                self._cmap_cache[path] = compile_map(path)
            except Exception as e:  # noqa: BLE001 - any load fault recovers
                # failed load: log and fall back to the menu before anything
                # crashes (LoadingState.c:56-61 "get out before crash")
                log_error("Failed to load map: %s (%s)", name, e)
                self._current_path = prev_path
                self.screen = Screen.MENU
                return
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
        self._play_ui("popup")  # MainState.c:47
        self.screen = Screen.PAUSED

    def resume(self):
        assert self.screen == Screen.PAUSED
        self._play_ui("popdown")  # PauseState.c:36
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

    # ---- widget screens --------------------------------------------------
    # option-field bindings per screen: event name -> (Options field, kind)
    _VIDEO_BIND = {
        "fov": ("fov", float), "msaa": ("msaa", int), "anisotropy": ("anisotropy", int),
        "lod": ("lod_multiplier", float), "max_fps": ("max_fps", int),
        "fullscreen": ("fullscreen", bool), "vsync": ("vsync", bool),
        "limit_bg_fps": ("limit_fps_when_unfocused", bool), "mipmaps": ("mipmaps", bool),
        "prefer_wayland": ("prefer_wayland", bool),
    }
    _SOUND_BIND = {
        "master_volume": ("master_volume", float), "music_volume": ("music_volume", float),
        "sfx_volume": ("sfx_volume", float), "ui_volume": ("ui_volume", float),
    }
    _INPUT_BIND = {
        "sensitivity": ("camera_speed", float), "invert_h": ("invert_horizontal_camera", bool),
        "invert_v": ("invert_vertical_camera", bool), "rumble": ("rumble", bool),
        "swap_ok_cancel": ("swap_ok_cancel", bool),
    }

    def _ui_for(self, screen: Screen):
        """Lazy per-screen widget stack + state (the *StateSet fns)."""
        if screen not in self._ui:
            from c_game_engine_tpu.ui import screens as scr
            from c_game_engine_tpu.ui.stack import init_ui_state

            builders = {
                Screen.MENU: scr.menu_stack,
                Screen.PAUSED: scr.pause_stack,
                Screen.OPTIONS: scr.options_stack,
                Screen.VIDEO_OPTIONS: lambda: scr.video_options_stack(self.options),
                Screen.SOUND_OPTIONS: lambda: scr.sound_options_stack(self.options),
                Screen.INPUT_OPTIONS: lambda: scr.input_options_stack(self.options),
            }
            sd, events = builders[screen]()
            self._ui[screen] = [sd, events, init_ui_state(sd)]
        return self._ui[screen]

    def _set_screen(self, screen: Screen):
        """SetGameState: entering a widget screen resets its focus
        (UiStackResetFocus in every *StateSet)."""
        self.screen = screen
        if screen in (
            Screen.MENU, Screen.PAUSED, Screen.OPTIONS, Screen.VIDEO_OPTIONS,
            Screen.SOUND_OPTIONS, Screen.INPUT_OPTIONS,
        ):
            ui = self._ui_for(screen)
            st = ui[2]
            ui[2] = st.replace(
                focused=jax.numpy.asarray(-1, jax.numpy.int32),
                active=jax.numpy.asarray(-1, jax.numpy.int32),
                active_state=jax.numpy.asarray(0, jax.numpy.int32),
            )

    def _sync_options(self, screen: Screen, sd, events, st):
        bind = {
            Screen.VIDEO_OPTIONS: self._VIDEO_BIND,
            Screen.SOUND_OPTIONS: self._SOUND_BIND,
            Screen.INPUT_OPTIONS: self._INPUT_BIND,
        }.get(screen)
        if not bind:
            return
        values = np.asarray(st.value)
        checked = np.asarray(st.checked)
        for i, ev in enumerate(events):
            if ev in bind:
                field, kind = bind[ev]
                v = bool(checked[i]) if kind is bool else kind(values[i])
                setattr(self.options, field, v)

    def ui_tick(self, inp=None):
        """One frame of the active screen's Update + ProcessUiStack,
        dispatching activation events to screen transitions (the reference's
        button callbacks). Pass a ui.stack.UiInput; defaults to no input."""
        from c_game_engine_tpu.ui.stack import UiInput, ui_process

        if inp is None:
            inp = UiInput.none()
        esc = bool(inp.escape)
        scr = self.screen
        self._advance_ui_audio()

        if scr == Screen.LOGO_SPLASH:
            # LogoSplashState: any key (or 100 ticks) -> menu
            self.splash_tick += 1
            if self.splash_tick == 20:
                from c_game_engine_tpu.audio.mixer import CATEGORY_SFX

                self._play_ui("coincling", CATEGORY_SFX)  # LogoSplashState.c:24-27
            if self.splash_tick > 100 or esc or bool(inp.space) or bool(inp.enter):
                self._set_screen(Screen.MENU)
            return []

        if scr == Screen.LEVEL_SELECT:
            # LevelSelectState.c:31-64 (custom scroll list, not a UiStack)
            names = self.list_levels()
            if esc:
                self._set_screen(Screen.MENU)
                return []
            if len(names) > 1:
                if bool(inp.down) or bool(inp.dpad_down):
                    self.selected_level = (self.selected_level + 1) % len(names)
                elif bool(inp.up) or bool(inp.dpad_up):
                    self.selected_level = (self.selected_level - 1) % len(names)
            if names and (bool(inp.space) or bool(inp.ok_released)):
                self.load_level(names[self.selected_level])
            return []

        if scr == Screen.PAUSED and esc:
            self.resume()  # PauseStateUpdate (PauseState.c:32-38)
            return []
        if scr == Screen.OPTIONS and esc:
            self._back_from_options()
            return []
        if scr in (Screen.VIDEO_OPTIONS, Screen.SOUND_OPTIONS, Screen.INPUT_OPTIONS) and esc:
            self._set_screen(Screen.OPTIONS)
            return []
        if scr == Screen.IN_GAME:
            if esc:
                self.pause()
            return []
        if scr not in self._ui and scr not in (
            Screen.MENU, Screen.PAUSED, Screen.OPTIONS, Screen.VIDEO_OPTIONS,
            Screen.SOUND_OPTIONS, Screen.INPUT_OPTIONS,
        ):
            return []

        ui = self._ui_for(scr)
        sd, events, st = ui
        st, activated = ui_process(sd, st, inp)
        ui[2] = st
        self._sync_options(scr, sd, events, st)
        fired = [events[i] for i in np.where(np.asarray(activated))[0]]
        for ev in fired:
            self._dispatch(scr, ev)
        return fired

    def _back_from_options(self):
        """BtnOptionsBack (OptionsState.c:32-42)."""
        self._set_screen(Screen.PAUSED if self._options_in_game else Screen.MENU)

    # ---- host-side UI audio ---------------------------------------------
    # index into audio.bank.BUILTIN_SOUNDS
    _UI_SOUND_IDS = {"click": 0, "popup": 1, "popdown": 2, "coincling": 3}

    def _play_ui(self, name: str, category: int | None = None):
        import jax.numpy as jnp

        from c_game_engine_tpu.audio.mixer import CATEGORY_UI, alloc_channels

        sid = self._UI_SOUND_IDS[name]
        cat = CATEGORY_UI if category is None else category
        self.ui_audio, _ = alloc_channels(
            self.ui_audio,
            jnp.asarray([True]),
            jnp.asarray([sid], jnp.int32),
            jnp.ones(1, jnp.float32),
            jnp.asarray([cat], jnp.int32),
            jnp.zeros(1, jnp.int32),
            jnp.zeros(1, bool),
            jnp.zeros((1, 3), jnp.float32),
        )

    def _advance_ui_audio(self):
        import jax.numpy as jnp

        from c_game_engine_tpu.audio.mixer import tick_advance

        if self._ui_lengths is None:
            from c_game_engine_tpu.audio.bank import BUILTIN_SOUNDS
            from c_game_engine_tpu.compiler.compile import _sound_lengths
            from c_game_engine_tpu.compiler.models import AssetResolver

            self._ui_lengths = jnp.asarray(
                _sound_lengths(AssetResolver(), BUILTIN_SOUNDS)
            )
        self.ui_audio, _ = tick_advance(self.ui_audio, self._ui_lengths)

    def mix_ui_audio(self, n_samples: int):
        """Render the app-layer sounds as [n, 2] f32 (host demo output)."""
        import jax.numpy as jnp

        from c_game_engine_tpu.audio.bank import BUILTIN_SOUNDS, build_sound_bank
        from c_game_engine_tpu.audio.mixer import mix_frame
        from c_game_engine_tpu.compiler.models import AssetResolver

        if self._ui_bank is None:
            self._ui_bank = build_sound_bank(AssetResolver(), BUILTIN_SOUNDS)
        o = self.options
        vols = jnp.asarray(
            [o.master_volume, o.music_volume, o.sfx_volume, o.ui_volume],
            jnp.float32,
        )
        return mix_frame(
            self._ui_bank, self.ui_audio, jnp.zeros(3),
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), vols, n_samples,
        )

    def _dispatch(self, screen: Screen, ev: str):
        self._play_ui("click")  # uiStack control activation (Button.c:55)
        if screen == Screen.MENU:
            if ev == "start":
                self.open_level_select()
            elif ev == "options":
                self._options_in_game = False
                self._set_screen(Screen.OPTIONS)
            elif ev == "quit":
                self.request_exit = True  # QuitGame (MenuState.c:37-40)
            elif ev == "reload_assets":
                self._cmap_cache.clear()
                self._bundle_cache.clear()
        elif screen == Screen.PAUSED:
            if ev == "resume":
                self.resume()
            elif ev == "options":
                self._options_in_game = True
                self._set_screen(Screen.OPTIONS)
            elif ev == "exit_level":
                # BtnPauseExit: ChangeMap(NULL) + LevelSelect (PauseState.c:74-78)
                self._set_screen(Screen.LEVEL_SELECT)
        elif screen == Screen.OPTIONS:
            if ev == "video":
                self._set_screen(Screen.VIDEO_OPTIONS)
            elif ev == "sound":
                self._set_screen(Screen.SOUND_OPTIONS)
            elif ev == "input":
                self._set_screen(Screen.INPUT_OPTIONS)
            elif ev == "back":
                self._back_from_options()
        elif screen in (Screen.VIDEO_OPTIONS, Screen.SOUND_OPTIONS, Screen.INPUT_OPTIONS):
            if ev == "back":
                self._set_screen(Screen.OPTIONS)

    # ---- frames -----------------------------------------------------------
    def _bundle_for(self, path: str):
        if path not in self._bundle_cache:
            from c_game_engine_tpu.render.bundle import build_render_bundle

            if path not in self._cmap_cache:
                self._cmap_cache[path] = compile_map(path)
            self._bundle_cache[path] = build_render_bundle(self._cmap_cache[path])
        return self._cmap_cache[path], self._bundle_cache[path]

    def _menu_background(self, height, width):
        """RenderMenuBackground: live view of gameConfig.backgroundMap
        (BackgroundMapManager.c:25-119); black while unset/loading."""
        import jax.numpy as jnp

        if not self.background_map:
            return jnp.zeros((height, width, 3), jnp.float32)
        from c_game_engine_tpu.core.state import reset
        from c_game_engine_tpu.render.raster import render

        path = str(self.map_dir / f"{self.background_map}.gmap")
        cmap, bundle = self._bundle_for(path)
        return render(bundle, cmap, reset(cmap), height, width)

    def render_frame(self, height=256, width=256, env=0):
        """Pixels for the current screen (the reference's RenderGame fns).
        Returns f32 [H, W, 3]."""
        import jax.numpy as jnp

        from c_game_engine_tpu.ui import screens as scr

        # any compiled map gives us the shared engine/game asset atlas
        ui_path = (
            str(self.map_dir / f"{self.background_map}.gmap")
            if self.background_map
            else (self._current_path or str(self.map_dir / "test.gmap"))
        )
        _, ui_bundle = self._bundle_for(ui_path)
        atlas, ui_assets = ui_bundle.atlas, ui_bundle.ui

        s = self.screen
        if s in (Screen.IN_GAME, Screen.PAUSED):
            from c_game_engine_tpu.render.raster import render_with_hud

            cmap, bundle = self._bundle_for(self._current_path)
            env_state = jax.tree.map(lambda x: x[env], self.state)
            frame = render_with_hud(
                bundle, cmap, env_state, height, width,
                mipmaps=self.options.mipmaps,
                aniso=_aniso_ratio(self.options.anisotropy),
            )
            if self.show_debug or self.console.enabled:
                # MainStateRender debug tail (MainState.c:100-109) + the
                # console's last-2s messages (ProcessDPrintConsole)
                from c_game_engine_tpu.render.dprint import (
                    dprint_overlay,
                    standard_debug_lines,
                )

                lines = (
                    standard_debug_lines(cmap, env_state) if self.show_debug else []
                )
                lines += self.console.process(time.monotonic() * 1e3)
                frame = dprint_overlay(frame, bundle.atlas, bundle.ui, lines)
            if s == Screen.IN_GAME:
                return frame
            sd, _, st = self._ui_for(Screen.PAUSED)
            return scr.render_pause_screen(frame, atlas, ui_assets, sd, st)

        bg = self._menu_background(height, width)
        if s == Screen.LOGO_SPLASH:
            return scr.render_splash_screen(
                jnp.zeros((height, width, 3), jnp.float32), atlas, ui_assets,
                self.splash_tick,
            )
        if s == Screen.MENU:
            sd, _, st = self._ui_for(Screen.MENU)
            return scr.render_menu_screen(bg, atlas, ui_assets, sd, st)
        if s == Screen.LEVEL_SELECT:
            return scr.render_level_select_screen(
                bg, atlas, ui_assets, self.list_levels(), self.selected_level
            )
        if s in (Screen.OPTIONS, Screen.VIDEO_OPTIONS, Screen.SOUND_OPTIONS,
                 Screen.INPUT_OPTIONS):
            titles = {
                Screen.OPTIONS: "Options", Screen.VIDEO_OPTIONS: "Video Options",
                Screen.SOUND_OPTIONS: "Sound Options", Screen.INPUT_OPTIONS: "Input Options",
            }
            sd, _, st = self._ui_for(s)
            if self._options_in_game and self.state is not None:
                from c_game_engine_tpu.render.raster import render_with_hud

                cmap, bundle = self._bundle_for(self._current_path)
                env_state = jax.tree.map(lambda x: x[env], self.state)
                bg = render_with_hud(
                    bundle, cmap, env_state, height, width,
                    mipmaps=self.options.mipmaps,
                    aniso=_aniso_ratio(self.options.anisotropy),
                )
                bg = scr.draw_rect(bg, 0, 0, width, height, (0.0, 0.0, 0.0, 0.5))
            return scr.render_options_screen(
                bg, atlas, ui_assets, sd, st, titles[s]
            )
        # LOADING: centered "LOADING" text over black (LoadingState.c:77-85)
        return scr.render_loading_screen(bg, atlas, ui_assets)
