"""Widget-stack semantics (engine/src/uiStack/*) and the drawn menu
screens (game/src/gameState/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.ui import (
    Anchor,
    UiInput,
    build_stack,
    button,
    checkbox,
    init_ui_state,
    radio,
    slider,
    textbox,
    ui_process,
)


@pytest.fixture(scope="module")
def rig_stack():
    sd = build_stack(
        [
            button((0, 80), (480, 40), "Start", Anchor.MIDDLE_CENTER),
            button((0, 130), (480, 40), "Quit", Anchor.MIDDLE_CENTER),
            slider(
                (0, 180), (480, 40), "Volume", Anchor.MIDDLE_CENTER,
                0.0, 1.0, 0.5, 0.01, 0.1, percent=True,
            ),
            checkbox((0, 230), (480, 40), "VSync", Anchor.MIDDLE_CENTER, True),
            radio((0, 280), (230, 40), "A", Anchor.MIDDLE_CENTER, True, 1, 0),
            radio((240, 280), (230, 40), "B", Anchor.MIDDLE_CENTER, False, 1, 1),
            textbox((0, 330), (480, 40), "name...", Anchor.MIDDLE_CENTER),
        ]
    )
    return sd, jax.jit(ui_process)


def _center(sd, i):
    r = np.asarray(sd.rect)
    return float(r[i, 0] + r[i, 2] / 2), float(r[i, 1] + r[i, 3] / 2)


def test_tab_cycles_focus_both_ways(rig_stack):
    """UiStack.c:196-217: tab forward with wrap, shift-tab backward."""
    sd, proc = rig_stack
    st = init_ui_state(sd)
    assert int(st.focused) == -1  # mouse users start unfocused
    seen = []
    for _ in range(8):
        st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))
        seen.append(int(st.focused))
    assert seen == [0, 1, 2, 3, 4, 5, 6, 0]  # wraps
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True, shift=True))
    assert int(st.focused) == 6  # 0 - 1 wraps to last


def test_hover_topmost_wins(rig_stack):
    """UiStack.c:168-178: reverse scan — the last control under the mouse
    is hovered."""
    sd, proc = rig_stack
    # radios 4 and 5 sit at the same y; point inside 4 only
    x, y = _center(sd, 4)
    st, _ = proc(sd, init_ui_state(sd), UiInput.at_mouse(x, y))
    assert int(st.active) == 4 and int(st.active_state) == 1  # HOVER


def test_button_mouse_activation_on_release(rig_stack):
    """HasMouseActivation (UiStack.c:349-353): fires on release over the
    active control; press only focuses + shows ACTIVE art."""
    sd, proc = rig_stack
    x, y = _center(sd, 0)
    st = init_ui_state(sd)
    st, act = proc(sd, st, UiInput.at_mouse(x, y, mouse_down=True, mouse_pressed=True))
    assert int(st.active_state) == 2 and int(st.focused) == 0
    assert not bool(np.asarray(act).any())
    st, act = proc(sd, st, UiInput.at_mouse(x, y, mouse_released=True))
    assert np.asarray(act).tolist() == [True] + [False] * 6


def test_keyboard_activation_on_focused(rig_stack):
    """HasKeyboardActivation (UiStack.c:355-360): enter on the focused
    control."""
    sd, proc = rig_stack
    st = init_ui_state(sd)
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))
    _, act = proc(sd, st, UiInput.at_mouse(-1, -1, enter=True))
    assert np.asarray(act).tolist() == [False, True] + [False] * 5


def test_checkbox_toggles(rig_stack):
    sd, proc = rig_stack
    st = init_ui_state(sd)
    assert bool(st.checked[3])
    for _ in range(4):
        st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, enter=True))
    assert not bool(st.checked[3])
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, enter=True))
    assert bool(st.checked[3])


def test_radio_group_exclusive(rig_stack):
    """RadioButton.c:56-94: checking B unchecks A (same group)."""
    sd, proc = rig_stack
    st = init_ui_state(sd)
    x, y = _center(sd, 5)
    st, _ = proc(sd, st, UiInput.at_mouse(x, y, mouse_down=True, mouse_pressed=True))
    st, _ = proc(sd, st, UiInput.at_mouse(x, y, mouse_released=True))
    assert np.asarray(st.checked)[4:6].tolist() == [False, True]


def test_slider_arrows_step_and_clamp(rig_stack):
    """Slider.c:103-134: left/right step by `step`, clamped to [min, max]."""
    sd, proc = rig_stack
    st = init_ui_state(sd)
    for _ in range(3):
        st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, right=True))
    assert float(st.value[2]) == pytest.approx(0.51)
    for _ in range(60):
        st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, right=True))
    assert float(st.value[2]) == pytest.approx(1.0)  # clamped at max


def test_slider_mouse_drag_remaps_and_snaps(rig_stack):
    """Slider.c:146-181: drag remaps mouse x over the rect, snapping to
    step (altStep while shift held)."""
    sd, proc = rig_stack
    st = init_ui_state(sd)
    r = np.asarray(sd.rect)
    x = float(r[2, 0] + 0.25 * r[2, 2])
    y = float(r[2, 1] + 5)
    st, _ = proc(sd, st, UiInput.at_mouse(x, y, mouse_down=True))
    assert float(st.value[2]) == pytest.approx(0.25, abs=0.011)
    st, _ = proc(sd, st, UiInput.at_mouse(x, y, mouse_down=True, shift=True))
    assert float(st.value[2]) == pytest.approx(0.2) or float(
        st.value[2]
    ) == pytest.approx(0.3)  # altStep 0.1 snap


def test_textbox_insert_cursor_backspace_delete(rig_stack):
    sd, proc = rig_stack
    st = init_ui_state(sd)
    for _ in range(7):
        st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))

    def codes(s):
        out = np.full(8, -1, np.int32)
        out[: len(s)] = [ord(c) for c in s]
        return jnp.asarray(out)

    def text(st):
        return "".join(chr(c) for c in np.asarray(st.text[6]) if c >= 0)

    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, text=codes("hello")))
    assert text(st) == "hello" and int(st.cursor[6]) == 5
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, home=True))
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, text=codes("X")))
    assert text(st) == "Xhello"
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, backspace=True))
    assert text(st) == "hello" and int(st.cursor[6]) == 0
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, delete=True))
    assert text(st) == "ello"
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, end=True))
    assert int(st.cursor[6]) == 4


def test_controller_focus_is_hover(rig_stack):
    """UiStack.c:157-164: controller mode pins hover to the focused
    control; OK release activates it."""
    sd, proc = rig_stack
    st = init_ui_state(sd, use_controller=True)
    assert int(st.focused) == 0
    st, _ = proc(sd, st, UiInput.at_mouse(-1, -1, controller=True))
    assert int(st.active) == 0 and int(st.active_state) == 1
    _, act = proc(sd, st, UiInput.at_mouse(-1, -1, controller=True, ok_released=True))
    assert bool(act[0])


# ---------------------------------------------------------------------------
# game screens
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def app():
    from c_game_engine_tpu.models.game import GameApp

    return GameApp(background_map="test")


def test_menu_flow_with_widgets(app):
    """Splash -> menu -> (tab, enter on Start) -> level select -> (down,
    space) -> in-game, all via input, mirroring the reference callbacks."""
    from c_game_engine_tpu.models.game import Screen

    app.ui_tick(UiInput.at_mouse(-1, -1, space=True))
    assert app.screen == Screen.MENU
    app.ui_tick(UiInput.at_mouse(-1, -1, tab=True))
    assert app.ui_tick(UiInput.at_mouse(-1, -1, enter=True)) == ["start"]
    assert app.screen == Screen.LEVEL_SELECT
    app.ui_tick(UiInput.at_mouse(-1, -1, down=True))
    assert app.selected_level == 1
    app.ui_tick(UiInput.at_mouse(-1, -1, up=True))
    assert app.selected_level == 0
    app.ui_tick(UiInput.at_mouse(-1, -1, space=True))
    assert app.screen == Screen.IN_GAME
    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))
    assert app.screen == Screen.PAUSED
    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))
    assert app.screen == Screen.IN_GAME


def test_options_screens_write_back(app):
    """Pause -> Options -> Video Options; the FOV slider writes
    options.fov (SldOptionsFov, VideoOptionsState.c:143-150)."""
    from c_game_engine_tpu.models.game import Screen

    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))
    assert app.screen == Screen.PAUSED
    app.ui_tick(UiInput.at_mouse(-1, -1, tab=True))
    app.ui_tick(UiInput.at_mouse(-1, -1, tab=True))
    assert app.ui_tick(UiInput.at_mouse(-1, -1, enter=True)) == ["options"]
    app.ui_tick(UiInput.at_mouse(-1, -1, tab=True))
    assert app.ui_tick(UiInput.at_mouse(-1, -1, enter=True)) == ["video"]
    assert app.screen == Screen.VIDEO_OPTIONS
    fov0 = app.options.fov
    app.ui_tick(UiInput.at_mouse(-1, -1, tab=True))
    app.ui_tick(UiInput.at_mouse(-1, -1, right=True))
    assert app.options.fov == fov0 + 1
    # escape unwinds: video -> options -> paused (in-game options)
    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))
    assert app.screen == Screen.OPTIONS
    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))
    assert app.screen == Screen.PAUSED
    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))
    assert app.screen == Screen.IN_GAME


def test_menu_screens_render_pixels(app):
    """Every screen produces a frame; the menu differs from its raw
    background (logo + buttons drawn) and the pause screen from the world
    frame (dim + logo + buttons)."""
    from c_game_engine_tpu.models.game import Screen

    size = 96
    world = np.asarray(app.render_frame(size, size))
    app.ui_tick(UiInput.at_mouse(-1, -1, escape=True))  # pause
    pause = np.asarray(app.render_frame(size, size))
    assert np.abs(pause - world).mean() > 0.01
    app._set_screen(Screen.MENU)
    menu = np.asarray(app.render_frame(size, size))
    bg = np.asarray(app._menu_background(size, size))
    assert np.abs(menu - bg).mean() > 0.01
    app._set_screen(Screen.LEVEL_SELECT)
    ls = np.asarray(app.render_frame(size, size))
    assert np.abs(ls - bg).mean() > 0.005
    app._set_screen(Screen.OPTIONS)
    app._options_in_game = False
    opt = np.asarray(app.render_frame(size, size))
    assert np.abs(opt - bg).mean() > 0.005
    app._set_screen(Screen.LOADING)
    # LoadingStateRender (LoadingState.c:77-85): "LOADING" text over black
    loading = np.asarray(app.render_frame(size, size))
    assert loading.max() > 0.5 and loading.mean() < 0.05
    for s in (menu, pause, ls, opt, loading):
        assert s.min() >= 0.0 and s.max() <= 1.0


def test_focus_ring_visible(rig_stack):
    """Flipping focus between two controls changes pixels (the focus_rect
    ninepatch is drawn around the focused control, UiStack.c:266-273)."""
    from c_game_engine_tpu.compiler.cache import load_compiled
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.ui.stack import ui_draw

    sd, proc = rig_stack
    cm, _ = load_compiled("/root/reference/assets/game/map/test.gmap", with_bundle=False)
    rb = build_render_bundle(cm)
    frame = jnp.zeros((96, 96, 3))
    st = init_ui_state(sd)
    img0 = np.asarray(ui_draw(sd, st, rb.atlas, rb.ui, frame))
    st1, _ = proc(sd, st, UiInput.at_mouse(-1, -1, tab=True))
    img1 = np.asarray(ui_draw(sd, st1, rb.atlas, rb.ui, frame))
    assert np.abs(img1 - img0).sum() > 0.0
