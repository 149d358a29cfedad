"""HUD overlay: coin counter, blue-coin icons, crosshair, item HUD.

Reproduces RenderHUD (engine/src/graphics/Drawing.c:235-271) as a 2D
compositing pass over the rasterized frame: textured quad blits with alpha
blending (the UI pipeline's src-alpha/1-src-alpha blend,
VulkanPipelines.c:21-85) and bitmap-font text (Font.c glyph quads).

Crosshair colors per Player.h:15-18 (0xAARRGGBB):
  NORMAL 0xFFFFCCCC, INTERACTABLE 0xFF006600, ENEMY 0xFFFF0000,
  INVISIBLE alpha 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from c_game_engine_tpu.core.state import Crosshair
from c_game_engine_tpu.render.textures import sample

CROSSHAIR_COLORS = jnp.array(
    [
        [1.0, 0.8, 0.8, 1.0],  # NORMAL
        [0.0, 0.4, 0.0, 1.0],  # INTERACTABLE
        [1.0, 0.0, 0.0, 0.0],  # INVISIBLE
        [1.0, 0.0, 0.0, 1.0],  # ENEMY
    ],
    jnp.float32,
)

MAX_DIGITS = 8


@struct.dataclass
class HudAssets:
    ycoin_tex: jnp.ndarray  # [] i32 atlas ids (-1 = missing)
    bcoin_tex: jnp.ndarray
    crosshair_tex: jnp.ndarray
    font_tex: jnp.ndarray
    font_start_u: jnp.ndarray  # [128] per-ascii start U (-1 = absent)
    font_end_u: jnp.ndarray  # [128]
    font_widths: jnp.ndarray  # [128] glyph widths in texture px
    font_height: jnp.ndarray  # [] texture height px
    font_spacing: jnp.ndarray  # [] char spacing px


def blit(frame, atlas, tex_id, x0, y0, w, h, mod_color):
    """Alpha-blend a textured rect onto frame [H,W,3]. Coordinates in frame
    pixels; broadcasts over the whole frame (HUD rects are few)."""
    fh, fw = frame.shape[:2]
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]
    u, v = jnp.broadcast_arrays((xs - x0) / jnp.maximum(w, 1e-6), (ys - y0) / jnp.maximum(h, 1e-6))
    inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1) & (tex_id >= 0)
    tex = sample(atlas, jnp.broadcast_to(tex_id, u.shape), jnp.stack([u, v], -1))
    rgba = tex * mod_color
    a = jnp.where(inside, rgba[..., 3], 0.0)[..., None]
    return frame * (1 - a) + rgba[..., :3] * a


def draw_number(frame, atlas, hud: HudAssets, value, x0, y0, size, color):
    """Right-padded decimal number using the bitmap font (FontDrawString,
    Font.c). value: i32 scalar."""
    digits = []
    v = jnp.maximum(value, 0)
    for i in range(MAX_DIGITS):
        digits.append((v // (10 ** (MAX_DIGITS - 1 - i))) % 10)
    digits = jnp.stack(digits)  # [MAX_DIGITS] most-significant first
    leading = jnp.cumsum(digits, 0) == 0  # leading zeros (except last digit)
    visible = ~leading | (jnp.arange(MAX_DIGITS) == MAX_DIGITS - 1)

    scale = size / jnp.maximum(hud.font_height, 1.0)
    codes = digits + ord("0")
    widths = hud.font_widths[codes] * scale
    advances = jnp.where(visible, widths + hud.font_spacing * scale, 0.0)
    offs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(advances)[:-1]])

    fh, fw = frame.shape[:2]
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]
    out = frame
    for i in range(MAX_DIGITS):
        cx = x0 + offs[i]
        u_loc, v_loc = jnp.broadcast_arrays(
            (xs - cx) / jnp.maximum(widths[i], 1e-6), (ys - y0) / jnp.maximum(size, 1e-6)
        )
        su = hud.font_start_u[codes[i]]
        eu = hud.font_end_u[codes[i]]
        u_tex = su + u_loc * (eu - su)
        inside = (
            (u_loc >= 0) & (u_loc < 1) & (v_loc >= 0) & (v_loc < 1)
            & visible[i] & (hud.font_tex >= 0)
        )
        tex = sample(
            atlas, jnp.broadcast_to(hud.font_tex, u_loc.shape), jnp.stack([u_tex, v_loc], -1)
        )
        a = jnp.where(inside, tex[..., 3] * color[3], 0.0)[..., None]
        out = out * (1 - a) + tex[..., :3] * jnp.asarray(color[:3]) * a
    return out


def draw_text(frame, atlas, font, codes, x, y, size, color, halign="left"):
    """Bitmap-font string draw (FontDrawString / DrawTextAligned, Font.c).
    `font` is any struct with font_tex/font_start_u/font_end_u/font_widths/
    font_height/font_spacing (HudAssets or ui.stack.UiAssets). `codes` is a
    fixed-length i32 array of ASCII codes, -1 = skip (zero advance).
    halign: "left" anchors at x, "center" centers the string on x."""
    codes = jnp.asarray(codes)
    L = codes.shape[0]
    visible = codes >= 0
    ci = jnp.clip(codes, 0, 127)
    scale = size / jnp.maximum(font.font_height, 1.0)
    widths = font.font_widths[ci] * scale
    advances = jnp.where(visible, widths + font.font_spacing * scale, 0.0)
    offs = jnp.concatenate([jnp.zeros(1), jnp.cumsum(advances)[:-1]])
    total = jnp.sum(advances)
    x0 = x - total * 0.5 if halign == "center" else x

    fh, fw = frame.shape[:2]
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :]
    color = jnp.asarray(color)
    out = frame
    for i in range(L):
        cx = x0 + offs[i]
        u_loc, v_loc = jnp.broadcast_arrays(
            (xs - cx) / jnp.maximum(widths[i], 1e-6), (ys - y) / jnp.maximum(size, 1e-6)
        )
        su = font.font_start_u[ci[i]]
        eu = font.font_end_u[ci[i]]
        u_tex = su + u_loc * (eu - su)
        inside = (
            (u_loc >= 0) & (u_loc < 1) & (v_loc >= 0) & (v_loc < 1)
            & visible[i] & (font.font_tex >= 0) & (su >= 0)
        )
        tex = sample(
            atlas, jnp.broadcast_to(font.font_tex, u_loc.shape), jnp.stack([u_tex, v_loc], -1)
        )
        a = jnp.where(inside, tex[..., 3] * color[3], 0.0)[..., None]
        out = out * (1 - a) + tex[..., :3] * color[:3] * a
    return out


def render_hud(atlas, hud: HudAssets, state, frame):
    """Composite the in-game HUD over one env's frame (Drawing.c:235-271).
    Skipped when a camera actor overrides the player camera."""
    h, w = frame.shape[:2]
    show = state.camera_actor < 0
    out = frame

    # coin icon + count (top right)
    out = blit(out, atlas, hud.ycoin_tex, w - 260, 16, 40, 40, jnp.ones(4))
    out = draw_number(
        out, atlas, hud, state.save.coins, w - 210.0, 16.0, 40.0, jnp.array([1.0, 1.0, 1.0, 1.0])
    )
    # blue coins (row below; up to 5)
    for i in range(5):
        visible = state.save.blue_coins > i
        mod = jnp.where(visible, 1.0, 0.0) * jnp.ones(4)
        out = blit(out, atlas, hud.bcoin_tex, w - 260 + i * 48, 64, 40, 40, mod)

    # crosshair (center, color by state)
    cc = CROSSHAIR_COLORS[jnp.clip(state.player.crosshair, 0, 3)]
    out = blit(out, atlas, hud.crosshair_tex, w * 0.5 - 12, h * 0.5 - 12, 24, 24, cc)

    return jnp.where(show, out, frame)
