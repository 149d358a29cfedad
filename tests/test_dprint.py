"""DPrint / DPrintConsole overlay tests (engine/src/debug/DPrint.c,
DPrintConsole.c:24-70)."""

import numpy as np
import pytest

from c_game_engine_tpu.render.dprint import (
    ANSI_COLORS,
    CONSOLE_MESSAGE_VISIBLE_FOR_MS,
    DPrintConsole,
    ansi_color,
    dprint_overlay,
    standard_debug_lines,
)


def test_console_disabled_drops_messages():
    c = DPrintConsole(enabled=False)
    c.add("hello", 37)
    assert c.process(0.0) == []


def test_console_timestamps_on_first_process():
    """AddConsoleMessage defers the timestamp to the first process so a
    long frame can't expire a message before it was ever drawn
    (DPrintConsole.c:116-118)."""
    c = DPrintConsole(enabled=True)
    c.add("late", 37)
    # even if 10 s pass before the first frame, the message must survive
    out = c.process(10_000.0)
    assert [m for m, _ in out] == ["late"]
    out = c.process(10_000.0 + CONSOLE_MESSAGE_VISIBLE_FOR_MS - 1)
    assert [m for m, _ in out] == ["late"]
    # expired: still DRAWN this frame (removal happens after the draw
    # loop), gone the next
    out = c.process(10_000.0 + CONSOLE_MESSAGE_VISIBLE_FOR_MS + 1)
    assert [m for m, _ in out] == ["late"]
    assert c.process(10_000.0 + CONSOLE_MESSAGE_VISIBLE_FOR_MS + 2) == []


def test_console_removes_one_expired_per_frame():
    """ProcessDPrintConsole removes at most ONE expired message per frame
    (single indexToRemove, DPrintConsole.c:128-151)."""
    c = DPrintConsole(enabled=True)
    c.add("a", 31)
    c.add("b", 32)
    assert len(c.process(0.0)) == 2  # stamps both
    t = CONSOLE_MESSAGE_VISIBLE_FOR_MS + 1.0
    assert len(c.process(t)) == 2  # both drawn; one removed after
    assert len(c.process(t)) == 1
    assert len(c.process(t)) == 0


def test_ansi_color_table():
    """Normal 30-37 map to the dim row. Bright codes reproduce the
    reference's `(color % 10) + 9` indexing (DPrintConsole.c:95-101),
    which shifts them by one: 90 -> DEFAULT, 91 -> bright black,
    92 -> bright red, 97 -> bright cyan."""
    assert ansi_color(31)[:3] == pytest.approx((0xD0 / 255, 0, 0))
    assert ansi_color(37)[:3] == pytest.approx((0xE0 / 255,) * 3)
    assert ansi_color(90)[:3] == pytest.approx((0xE0 / 255,) * 3)  # DEFAULT
    assert ansi_color(91)[:3] == pytest.approx((0x40 / 255,) * 3)  # br. black
    assert ansi_color(92)[:3] == pytest.approx((1.0, 0.0, 0.0))  # br. red
    assert ansi_color(97)[:3] == pytest.approx((0.0, 1.0, 1.0))  # br. cyan
    assert ANSI_COLORS.shape == (18, 4)


def test_overlay_draws_text_pixels(test_map):
    """dprint_overlay composites a backing rect + glyphs: the frame must
    darken under the rect (0x80000000) and gain bright text pixels."""
    import jax.numpy as jnp

    from c_game_engine_tpu.render.bundle import build_render_bundle

    rb = build_render_bundle(test_map)
    base = jnp.full((96, 192, 3), 0.5)
    out = np.asarray(
        dprint_overlay(base, rb.atlas, rb.ui, [("HELLO WORLD", (1.0, 1.0, 1.0, 1.0))])
    )
    assert (out < 0.27).any(), "backing rect missing (0.5 * 0.5 = 0.25)"
    assert (out > 0.8).any(), "text glyphs missing"
    # untouched area stays the base color
    assert np.allclose(out[-1, -1], 0.5)


def test_standard_debug_lines(test_map):
    from c_game_engine_tpu.core.state import reset

    st = reset(test_map)
    lines = standard_debug_lines(test_map, st)
    texts = [t for t, _ in lines]
    assert any(t.startswith("Position: (") for t in texts)
    assert any(t.startswith("Velocity: ") for t in texts)
    assert any(t.startswith("Actors: ") for t in texts)
    assert any("Actor:" in t for t in texts)
    assert any(t.startswith("Frame Delta") for t in texts)
    assert any(t.startswith("Tick Delta") for t in texts)


def test_game_app_debug_overlay_changes_frame():
    """GameApp(show_debug=True) composites the overlay onto the in-game
    frame (MainState.c:100-109)."""
    from c_game_engine_tpu.models.game import GameApp

    path = "/root/reference/assets/game/map/test.gmap"
    app = GameApp(batch=1, initial_map=path)
    plain = np.asarray(app.render_frame(96, 128))
    app.show_debug = True
    app.console.enabled = True
    app.console.add("console line", 92)
    debug = np.asarray(app.render_frame(96, 128))
    assert np.abs(debug - plain).mean() > 1e-4
