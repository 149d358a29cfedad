"""The game's menu screens on top of the widget stack.

Builders mirror the control lists in game/src/gameState/*.c (layouts,
labels, slider ranges cited per function); render functions reproduce each
screen's RenderGame: menu background frame -> logo / headers -> DrawUiStack.
Activation events come back as names the GameApp dispatches on, replacing
the reference's C callbacks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.render.hud import draw_text
from c_game_engine_tpu.ui.stack import (
    UITEX_MENU_LOGO,
    UITEX_PAUSE_LOGO,
    VIRTUAL_H,
    VIRTUAL_W,
    Anchor,
    build_stack,
    button,
    checkbox,
    slider,
    ui_draw,
)

# ---------------------------------------------------------------------------
# stacks (event-name list parallels the control list)
# ---------------------------------------------------------------------------


def menu_stack():
    """MenuState.c:139-150: Start / Options / Quit / hot reload assets."""
    controls, events = [], []
    y, spacing = 80, 50
    for label, ev in [
        ("Start", "start"),
        ("Options", "options"),
        ("Quit", "quit"),
        ("hot reload assets", "reload_assets"),
    ]:
        controls.append(button((0, y), (480, 40), label, Anchor.MIDDLE_CENTER))
        events.append(ev)
        y += spacing
    return build_stack(controls), events


def pause_stack():
    """PauseState.c:85-89: Resume / Options / Exit Level."""
    controls = [
        button((0, 20), (300, 40), "Resume", Anchor.MIDDLE_CENTER),
        button((0, 70), (300, 40), "Options", Anchor.MIDDLE_CENTER),
        button((0, 120), (300, 40), "Exit Level", Anchor.MIDDLE_CENTER),
    ]
    return build_stack(controls), ["resume", "options", "exit_level"]


def options_stack():
    """OptionsState.c:118-145 (Discord checkbox dropped per SURVEY §2.9)."""
    controls = [
        button((0, 80), (480, 40), "Video Options", Anchor.TOP_CENTER),
        button((0, 125), (480, 40), "Sound Options", Anchor.TOP_CENTER),
        button((0, 170), (480, 40), "Input Options", Anchor.TOP_CENTER),
        button((0, -40), (480, 40), "Done", Anchor.BOTTOM_CENTER),
    ]
    return build_stack(controls), ["video", "sound", "input", "back"]


def video_options_stack(opts):
    """VideoOptionsState.c:193-310 (sliders/checkboxes + ranges)."""
    y, sp = 80, 45
    controls = [
        slider((0, y), (480, 40), "FOV", Anchor.TOP_CENTER, 30.0, 120.0, opts.fov, 1, 1),
        checkbox((-120, y + sp * 1.5), (230, 40), "Fullscreen", Anchor.TOP_CENTER, opts.fullscreen),
        checkbox((120, y + sp * 1.5), (230, 40), "VSync", Anchor.TOP_CENTER, opts.vsync),
        checkbox(
            (-120, y + sp * 2.5), (230, 40), "Limit BG FPS", Anchor.TOP_CENTER,
            opts.limit_fps_when_unfocused,
        ),
        checkbox((120, y + sp * 2.5), (230, 40), "Mipmaps", Anchor.TOP_CENTER, opts.mipmaps),
        slider((0, y + sp * 4), (480, 40), "MSAA", Anchor.TOP_CENTER, 0.0, 3.0, opts.msaa, 1, 1),
        slider(
            (0, y + sp * 5), (480, 40), "Anisotropic Filtering", Anchor.TOP_CENTER,
            0.0, 4.0, opts.anisotropy, 1, 1,
        ),
        slider(
            (0, y + sp * 6), (480, 40), "LOD Distance", Anchor.TOP_CENTER,
            0.5, 2.0, opts.lod_multiplier, 0.5, 1,
        ),
        slider(
            (0, y + sp * 7), (480, 40), "Maximum FPS", Anchor.TOP_CENTER,
            0, 500, opts.max_fps, 10, 10,
        ),
        checkbox(
            (0, y + sp * 8.5), (480, 40), "Prefer Wayland over X11", Anchor.TOP_CENTER,
            opts.prefer_wayland,
        ),
        button((0, -40), (480, 40), "Back", Anchor.BOTTOM_CENTER),
    ]
    events = [
        "fov", "fullscreen", "vsync", "limit_bg_fps", "mipmaps", "msaa",
        "anisotropy", "lod", "max_fps", "prefer_wayland", "back",
    ]
    return build_stack(controls), events


def sound_options_stack(opts):
    """SoundOptionsState.c:95-156: four percent volume sliders."""
    y, sp = 80, 45
    names = [
        ("Master Volume", opts.master_volume, "master_volume"),
        ("Music Volume", opts.music_volume, "music_volume"),
        ("SFX Volume", opts.sfx_volume, "sfx_volume"),
        ("UI Volume", opts.ui_volume, "ui_volume"),
    ]
    controls = [
        slider((0, y + i * sp), (480, 40), label, Anchor.TOP_CENTER, 0.0, 1.0, v, 0.01, 0.1,
               percent=True)
        for i, (label, v, _) in enumerate(names)
    ]
    controls.append(button((0, -40), (480, 40), "Back", Anchor.BOTTOM_CENTER))
    return build_stack(controls), [ev for _, _, ev in names] + ["back"]


def input_options_stack(opts):
    """InputOptionsState.c:126-189."""
    y, sp = 80, 45
    controls = [
        slider(
            (0, y), (480, 40), "Camera Sensitivity", Anchor.TOP_CENTER,
            0.01, 2.0, opts.camera_speed, 0.01, 0.1, percent=True,
        ),
        checkbox(
            (0, y + sp), (480, 40), "Invert Horizontal Camera", Anchor.TOP_CENTER,
            opts.invert_horizontal_camera,
        ),
        checkbox(
            (0, y + sp * 2), (480, 40), "Invert Vertical Camera", Anchor.TOP_CENTER,
            opts.invert_vertical_camera,
        ),
        slider(
            (0, y + sp * 5), (480, 40), "Rumble Strength", Anchor.TOP_CENTER,
            0.0, 1.0, 1.0 if opts.rumble else 0.0, 0.25, 0.25, percent=True,
        ),
        checkbox(
            (0, y + sp * 6), (480, 40), "Swap OK/Cancel buttons", Anchor.TOP_CENTER,
            opts.swap_ok_cancel,
        ),
        button((0, -40), (480, 40), "Back", Anchor.BOTTOM_CENTER),
    ]
    events = ["sensitivity", "invert_h", "invert_v", "rumble", "swap_ok_cancel", "back"]
    return build_stack(controls), events


# ---------------------------------------------------------------------------
# screen rendering
# ---------------------------------------------------------------------------


def _codes_arr(s: str, cap: int = 64) -> jnp.ndarray:
    out = np.full(cap, -1, np.int32)
    for i, ch in enumerate(s[:cap]):
        out[i] = min(ord(ch), 127)
    return jnp.asarray(out)


def draw_rect(frame, x0, y0, w, h, rgba):
    """DrawRect: solid color quad with alpha."""
    fh, fw = frame.shape[:2]
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]
    inside = (xs >= x0) & (xs < x0 + w) & (ys >= y0) & (ys < y0 + h)
    a = jnp.where(inside, rgba[3], 0.0)[..., None]
    return frame * (1 - a) + jnp.asarray(rgba[:3]) * a


def _logo(frame, atlas, ui, slot, vw, vh):
    """Centered top logo (MenuState.c:82-88 480x320 / PauseState.c:45-51
    360x240)."""
    from c_game_engine_tpu.render.hud import blit

    fh, fw = frame.shape[:2]
    sx, sy = fw / VIRTUAL_W, fh / VIRTUAL_H
    x0 = (VIRTUAL_W - vw) / 2 * sx
    return blit(
        frame, atlas, ui.tex[slot], x0, 32 * sy, vw * sx, vh * sy, jnp.ones(4)
    )


def render_splash_screen(frame, atlas, ui, tick):
    """LogoSplashStateRender (LogoSplashState.c:38-63): centered 300x300
    studio logo, fading in over ticks 20-40 and out over 80-100."""
    from c_game_engine_tpu.render.hud import blit
    from c_game_engine_tpu.ui.stack import UITEX_STUDIO

    fh, fw = frame.shape[:2]
    sx, sy = fw / VIRTUAL_W, fh / VIRTUAL_H
    tick = jnp.asarray(tick, jnp.float32)
    alpha = jnp.clip((tick - 20.0) / 20.0, 0.0, 1.0) * jnp.clip(
        1.0 - (tick - 80.0) / 20.0, 0.0, 1.0
    )
    alpha = jnp.where((tick < 20) | (tick > 100), 0.0, alpha)
    mod = jnp.concatenate([jnp.ones(3), alpha[None]])
    return blit(
        frame, atlas, ui.tex[UITEX_STUDIO],
        (VIRTUAL_W / 2 - 150) * sx, (VIRTUAL_H / 2 - 150) * sy, 300 * sx, 300 * sy, mod,
    )


def render_menu_screen(frame, atlas, ui, sd, st, version_line="c-game-engine_tpu"):
    """MenuStateRender (MenuState.c:72-131): background -> logo ->
    version/copyright -> widgets."""
    fh, fw = frame.shape[:2]
    sx, sy = fw / VIRTUAL_W, fh / VIRTUAL_H
    out = _logo(frame, atlas, ui, UITEX_MENU_LOGO, 480, 320)
    size = 16.0 * min(sx, sy)
    codes = _codes_arr(version_line)
    out = draw_text(
        out, atlas, ui, codes, fw / 2 + 2 * sx, fh - 30 * sy + 2 * sy, size,
        jnp.array([0, 0, 0, 1.0]), halign="center",
    )
    out = draw_text(
        out, atlas, ui, codes, fw / 2, fh - 30 * sy, size,
        jnp.array([0.63, 0.63, 0.63, 1.0]), halign="center",
    )
    return ui_draw(sd, st, atlas, ui, out)


def render_pause_screen(frame, atlas, ui, sd, st):
    """PauseStateRender (PauseState.c:41-61): dimmed world -> pause logo ->
    widgets. RenderInGameMenuBackground darkens the frozen game frame."""
    out = draw_rect(frame, 0, 0, frame.shape[1], frame.shape[0], (0.0, 0.0, 0.0, 0.5))
    out = _logo(out, atlas, ui, UITEX_PAUSE_LOGO, 360, 240)
    return ui_draw(sd, st, atlas, ui, out)


def render_options_screen(frame, atlas, ui, sd, st, title="Options"):
    """OptionsStateRender + the three submenus: centered title + widgets."""
    fh, fw = frame.shape[:2]
    sx, sy = fw / VIRTUAL_W, fh / VIRTUAL_H
    out = draw_text(
        frame, atlas, ui, _codes_arr(title), fw / 2, (100 - 32) / 2 * sy,
        32.0 * min(sx, sy), jnp.array([1.0, 1.0, 1.0, 1.0]), halign="center",
    )
    return ui_draw(sd, st, atlas, ui, out)


def render_loading_screen(frame, atlas, ui):
    """LoadingStateRender (LoadingState.c:77-85): "LOADING" at size 16,
    white, centered in the full window (FONT_HALIGN_CENTER /
    FONT_VALIGN_MIDDLE, smallFont) over black."""
    fh, fw = frame.shape[:2]
    sx, sy = fw / VIRTUAL_W, fh / VIRTUAL_H
    size = 16.0 * min(sx, sy)
    return draw_text(
        frame * 0.0, atlas, ui, _codes_arr("LOADING"), fw / 2, (fh - size) / 2,
        size, jnp.array([1.0, 1.0, 1.0, 1.0]), halign="center",
    )


def render_level_select_screen(frame, atlas, ui, names, selected):
    """LevelSelectStateRender (LevelSelectState.c:67-121): header, 0x80000000
    band at y 315..435, neighbor rows at 50% alpha, progress + hint lines."""
    fh, fw = frame.shape[:2]
    sx, sy = fw / VIRTUAL_W, fh / VIRTUAL_H
    s = min(sx, sy)
    out = frame
    out = draw_text(
        out, atlas, ui, _codes_arr("Map Select"), 52 * sx, 52 * sy, 64 * s,
        jnp.array([0, 0, 0, 1.0]),
    )
    out = draw_text(
        out, atlas, ui, _codes_arr("Map Select"), 50 * sx, 50 * sy, 64 * s,
        jnp.array([1.0, 1.0, 1.0, 1.0]),
    )
    out = draw_rect(out, 0, 315 * sy, fw, 120 * sy, (0.0, 0.0, 0.0, 0.5))
    if not names:
        return draw_text(
            out, atlas, ui, _codes_arr("No Levels Found"), 50 * sx, 359 * sy, 32 * s,
            jnp.array([1.0, 1.0, 1.0, 1.0]),
        )
    for i, name in enumerate(names):
        ypos = (345 + (i - selected) * 60 + 14) * sy
        if i == selected:
            continue
        if -60 < 345 + (i - selected) * 60 < 480:
            out = draw_text(
                out, atlas, ui, _codes_arr(name), 50 * sx, ypos, 32 * s,
                jnp.array([1.0, 1.0, 1.0, 0.31]),
            )
    out = draw_text(
        out, atlas, ui, _codes_arr(names[selected]), 50 * sx, (345 + 14) * sy, 32 * s,
        jnp.array([1.0, 1.0, 1.0, 1.0]),
    )
    out = draw_text(
        out, atlas, ui, _codes_arr("Map %02d/%02d" % (selected + 1, len(names))),
        50 * sx, 325 * sy, 16 * s, jnp.array([1.0, 1.0, 1.0, 1.0]),
    )
    out = draw_text(
        out, atlas, ui, _codes_arr("Up/Down to change, space to play"),
        50 * sx, 409 * sy, 16 * s, jnp.array([1.0, 1.0, 1.0, 1.0]),
    )
    return out
