"""Widget stack as SoA tables + pure process/draw functions.

Re-architects engine/src/uiStack/UiStack.c (+ controls/*.c) for the batched
TPU runtime: a screen's controls compile once into static device arrays
(`UiStackDef`), the mutable widget state is a small jittable pytree
(`UiState`), and one `ui_process` call per frame reproduces the reference's
hover/focus/activation rules (UiStack.c:112-222):

  * topmost control under the mouse is hovered (reverse-order scan,
    UiStack.c:168-192 — here: highest overlapping index wins);
  * mouse-press / space / controller-OK on the hovered control focuses it
    and shows the ACTIVE art; activation fires on mouse release over the
    active control or enter/space on the focused one (HasActivation,
    UiStack.c:343-375);
  * tab / dpad-down cycles focus forward, shift-tab / dpad-up backward
    (UiStack.c:196-217);
  * per-kind updates: button events (Button.c:50-61), checkbox toggle
    (CheckBox.c:51-69), radio group-exclusive select (RadioButton.c:56-94),
    slider arrow steps + mouse drag with step snapping (Slider.c:98-181),
    textbox cursor/backspace/delete/insert (TextBox.c:82-212).

Coordinates live in the reference's scaled virtual space (layouts are
authored for ~640x480; ScaledWindowWidthFloat in UiStack.c:277-321);
`ui_draw` maps virtual units onto the actual frame. Activation "callbacks"
become an `activated [N] bool` event vector the host game layer dispatches
on — the pure-function analogue of the reference's C function pointers.

Divergence note: the reference updates the previous frame's focused/active
control before re-picking hover (UiStack.c:121-136); headlessly that
one-frame skew is unobservable, so process runs in a single pass.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np
from flax import struct

MAX_TEXT = 40  # label / textbox capacity (codes, -1 = pad)
MAX_INSERT = 8  # host text-input codes per tick

# virtual design space (reference layouts target this scaled size)
VIRTUAL_W = 640.0
VIRTUAL_H = 480.0


class ControlKind(enum.IntEnum):
    BUTTON = 0
    SLIDER = 1
    CHECKBOX = 2
    RADIO = 3
    TEXTBOX = 4


class Anchor(enum.IntEnum):
    TOP_LEFT = 0
    TOP_CENTER = 1
    TOP_RIGHT = 2
    MIDDLE_LEFT = 3
    MIDDLE_CENTER = 4
    MIDDLE_RIGHT = 5
    BOTTOM_LEFT = 6
    BOTTOM_CENTER = 7
    BOTTOM_RIGHT = 8


@dataclass
class ControlSpec:
    kind: ControlKind
    pos: tuple
    size: tuple
    label: str = ""
    anchor: Anchor = Anchor.TOP_LEFT
    # slider params (Slider.c)
    vmin: float = 0.0
    vmax: float = 1.0
    value: float = 0.0
    step: float = 0.1
    alt_step: float = 0.1
    percent: bool = False  # SliderLabelPercent formatting
    # checkbox / radio
    checked: bool = False
    group: int = 0
    rid: int = 0
    # textbox
    max_len: int = MAX_TEXT
    placeholder: str = ""


def button(pos, size, label, anchor=Anchor.TOP_LEFT):
    return ControlSpec(ControlKind.BUTTON, pos, size, label, anchor)


def slider(pos, size, label, anchor, vmin, vmax, value, step, alt_step, percent=False):
    return ControlSpec(
        ControlKind.SLIDER, pos, size, label, anchor,
        vmin=vmin, vmax=vmax, value=float(np.clip(value, vmin, vmax)),
        step=step, alt_step=alt_step, percent=percent,
    )


def checkbox(pos, size, label, anchor, checked=False):
    return ControlSpec(ControlKind.CHECKBOX, pos, size, label, anchor, checked=checked)


def radio(pos, size, label, anchor, checked, group, rid):
    return ControlSpec(
        ControlKind.RADIO, pos, size, label, anchor, checked=checked, group=group, rid=rid
    )


def textbox(pos, size, placeholder, anchor, max_len=MAX_TEXT - 1):
    return ControlSpec(
        ControlKind.TEXTBOX, pos, size, "", anchor,
        max_len=min(max_len, MAX_TEXT - 1), placeholder=placeholder,
    )


def _codes(s: str) -> np.ndarray:
    out = np.full(MAX_TEXT, -1, np.int32)
    for i, ch in enumerate(s[:MAX_TEXT]):
        out[i] = min(ord(ch), 127)
    return out


def _anchored(spec: ControlSpec) -> tuple:
    """CalculateControlPosition (UiStack.c:277-321) in virtual units."""
    px, py = spec.pos
    w, h = spec.size
    ax = {0: 0.0, 1: (VIRTUAL_W - w) / 2, 2: VIRTUAL_W - w}[int(spec.anchor) % 3]
    ay = {0: 0.0, 1: (VIRTUAL_H - h) / 2, 2: VIRTUAL_H - h}[int(spec.anchor) // 3]
    return ax + px, ay + py


@struct.dataclass
class UiStackDef:
    kind: jnp.ndarray  # [N] i32
    rect: jnp.ndarray  # [N, 4] f32 anchored x, y, w, h (virtual units)
    label: jnp.ndarray  # [N, MAX_TEXT] i32 codes
    vmin: jnp.ndarray  # [N] f32
    vmax: jnp.ndarray  # [N]
    step: jnp.ndarray  # [N]
    alt_step: jnp.ndarray  # [N]
    percent: jnp.ndarray  # [N] bool
    group: jnp.ndarray  # [N] i32
    rid: jnp.ndarray  # [N] i32
    max_len: jnp.ndarray  # [N] i32
    placeholder: jnp.ndarray  # [N, MAX_TEXT] i32
    init_value: jnp.ndarray  # [N] f32
    init_checked: jnp.ndarray  # [N] bool

    @property
    def n(self):
        return self.kind.shape[0]


@struct.dataclass
class UiState:
    focused: jnp.ndarray  # i32, -1 = none
    active: jnp.ndarray  # i32, -1 = none (hovered / pressed control)
    active_state: jnp.ndarray  # i32: 0 NORMAL, 1 HOVER, 2 ACTIVE
    value: jnp.ndarray  # [N] f32 slider values
    checked: jnp.ndarray  # [N] bool
    text: jnp.ndarray  # [N, MAX_TEXT] i32 codes, -1 pad
    cursor: jnp.ndarray  # [N] i32


@struct.dataclass
class UiInput:
    """One tick of UI-relevant input (virtual-space mouse)."""

    mouse: jnp.ndarray  # [2] f32
    mouse_down: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    mouse_pressed: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    mouse_released: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    tab: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    shift: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    space: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    enter: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    left: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    right: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    up: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    down: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    escape: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    home: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    end: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    backspace: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    delete: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    controller: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    ok_pressed: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    ok_released: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    dpad_up: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    dpad_down: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    dpad_left: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    dpad_right: jnp.ndarray = struct.field(default_factory=lambda: jnp.zeros((), bool))
    text: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.full((MAX_INSERT,), -1, jnp.int32)
    )

    @classmethod
    def at_mouse(cls, x, y, **kw):
        kw = {k: jnp.asarray(v) for k, v in kw.items()}
        return cls(mouse=jnp.array([x, y], jnp.float32), **kw)

    @classmethod
    def none(cls):
        return cls(mouse=jnp.array([-1.0, -1.0], jnp.float32))


def build_stack(controls: list) -> UiStackDef:
    n = len(controls)
    kind = np.array([int(c.kind) for c in controls], np.int32)
    rect = np.array(
        [[*_anchored(c), c.size[0], c.size[1]] for c in controls], np.float32
    )
    return UiStackDef(
        kind=jnp.asarray(kind),
        rect=jnp.asarray(rect),
        label=jnp.asarray(np.stack([_codes(c.label) for c in controls])),
        vmin=jnp.asarray(np.array([c.vmin for c in controls], np.float32)),
        vmax=jnp.asarray(np.array([c.vmax for c in controls], np.float32)),
        step=jnp.asarray(np.array([c.step for c in controls], np.float32)),
        alt_step=jnp.asarray(np.array([c.alt_step for c in controls], np.float32)),
        percent=jnp.asarray(np.array([c.percent for c in controls], bool)),
        group=jnp.asarray(np.array([c.group for c in controls], np.int32)),
        rid=jnp.asarray(np.array([c.rid for c in controls], np.int32)),
        max_len=jnp.asarray(np.array([c.max_len for c in controls], np.int32)),
        placeholder=jnp.asarray(np.stack([_codes(c.placeholder) for c in controls])),
        init_value=jnp.asarray(
            np.array([c.value for c in controls], np.float32)
        ),
        init_checked=jnp.asarray(np.array([c.checked for c in controls], bool)),
    )


def init_ui_state(sd: UiStackDef, use_controller: bool = False) -> UiState:
    """UiStackResetFocus (UiStack.c:377-380): controller users start with
    the first control focused, mouse users with none."""
    n = sd.n
    return UiState(
        focused=jnp.asarray(0 if use_controller else -1, jnp.int32),
        active=jnp.asarray(-1, jnp.int32),
        active_state=jnp.asarray(0, jnp.int32),
        value=sd.init_value,
        checked=sd.init_checked,
        text=jnp.full((n, MAX_TEXT), -1, jnp.int32),
        cursor=jnp.zeros((n,), jnp.int32),
    )


def _text_len(text_row):
    return jnp.sum((text_row >= 0).astype(jnp.int32))


def ui_process(sd: UiStackDef, st: UiState, inp: UiInput):
    """One frame of ProcessUiStack + control updates. Returns
    (new UiState, activated [N] bool event vector)."""
    n = sd.n
    idx = jnp.arange(n)
    x0, y0 = sd.rect[:, 0], sd.rect[:, 1]
    w, h = sd.rect[:, 2], sd.rect[:, 3]
    mx, my = inp.mouse[0], inp.mouse[1]
    in_rect = (mx >= x0) & (mx <= x0 + w) & (my >= y0) & (my <= y0 + h)

    # hover pick: last (topmost) overlapping control (UiStack.c:168-192)
    any_hover = jnp.any(in_rect)
    hover = jnp.where(any_hover, n - 1 - jnp.argmax(in_rect[::-1]), -1).astype(jnp.int32)

    # controller mode pins hover to the focused control (UiStack.c:157-164)
    focused = st.focused
    focused = jnp.where(inp.controller & (focused < 0), 0, focused)
    active = jnp.where(inp.controller, focused, hover)

    press = jnp.where(
        inp.controller,
        inp.ok_pressed,
        inp.mouse_pressed | inp.space | inp.ok_pressed,
    )
    has_active = active >= 0
    active_state = jnp.where(
        has_active, jnp.where(press, 2, 1), 0
    ).astype(jnp.int32)
    # pressing over a control focuses it (UiStack.c:146-152, 179-186)
    focused = jnp.where(press & has_active, active, focused)

    # ---- activation events (HasActivation, UiStack.c:343-375) ----
    mouse_act = (idx == active) & in_rect & inp.mouse_released & ~inp.controller
    key_act = (idx == focused) & (inp.enter | inp.space | inp.ok_released)
    activated = mouse_act | key_act

    # ---- checkbox toggle (CheckBox.c:51-69) ----
    is_cb = sd.kind == int(ControlKind.CHECKBOX)
    checked = st.checked ^ (activated & is_cb)

    # ---- radio select + group unique (RadioButton.c:56-94) ----
    is_radio = sd.kind == int(ControlKind.RADIO)
    r_act = activated & is_radio
    any_r = jnp.any(r_act)
    # highest activated index wins if several fire in one tick
    r_sel = jnp.where(any_r, n - 1 - jnp.argmax(r_act[::-1]), -1)
    same_group = sd.group == sd.group[jnp.clip(r_sel, 0, n - 1)]
    checked = jnp.where(
        any_r & is_radio & same_group, idx == r_sel, checked
    )

    # ---- slider (Slider.c:98-181) ----
    is_sl = sd.kind == int(ControlKind.SLIDER)
    f_sl = is_sl & (idx == focused)
    step_l = inp.left | inp.dpad_left
    step_r = inp.right | inp.dpad_right
    value = st.value
    value = jnp.where(f_sl & step_l, value - sd.step, value)
    value = jnp.where(f_sl & step_r, value + sd.step, value)
    # mouse drag on the hovered slider while held: remap + snap to step
    drag = is_sl & (idx == active) & inp.mouse_down & ~inp.controller
    raw = sd.vmin + (mx - x0) / jnp.maximum(w, 1e-6) * (sd.vmax - sd.vmin)
    snap = jnp.where(inp.shift, sd.alt_step, sd.step)
    snapped = jnp.round(raw / jnp.maximum(snap, 1e-9)) * snap
    value = jnp.where(drag, snapped, value)
    value = jnp.clip(value, sd.vmin, sd.vmax)

    # ---- textbox (TextBox.c:82-212) ----
    is_tb = sd.kind == int(ControlKind.TEXTBOX)
    f_tb = is_tb & (idx == focused)
    tlen = jnp.sum((st.text >= 0).astype(jnp.int32), axis=1)
    cursor = st.cursor
    cursor = jnp.where(f_tb & inp.left, cursor - 1, cursor)
    cursor = jnp.where(f_tb & inp.right, cursor + 1, cursor)
    cursor = jnp.where(f_tb & inp.home, 0, cursor)
    cursor = jnp.where(f_tb & inp.end, tlen, cursor)
    cursor = jnp.clip(cursor, 0, tlen)

    pos = jnp.arange(MAX_TEXT)[None, :]
    cur = cursor[:, None]
    text = st.text
    # backspace: close the gap at cursor-1
    bs = (f_tb & inp.backspace & (cursor > 0))[:, None]
    shifted_left = jnp.concatenate([text[:, 1:], jnp.full((n, 1), -1, jnp.int32)], 1)
    text = jnp.where(bs & (pos >= cur - 1), shifted_left, text)
    cursor = jnp.where(f_tb & inp.backspace & (cursor > 0), cursor - 1, cursor)
    # delete: close the gap at cursor
    cur = cursor[:, None]
    dl = (f_tb & inp.delete)[:, None]
    shifted_left = jnp.concatenate([text[:, 1:], jnp.full((n, 1), -1, jnp.int32)], 1)
    text = jnp.where(dl & (pos >= cur), shifted_left, text)
    # insert host text codes at the cursor (TextBoxTextInputCallback)
    k = jnp.sum((inp.text >= 0).astype(jnp.int32))
    tlen = jnp.sum((text >= 0).astype(jnp.int32), axis=1)
    k_row = jnp.minimum(k, sd.max_len - tlen)  # truncate at maxLength
    cur = cursor[:, None]
    combined = jnp.concatenate([text, jnp.broadcast_to(inp.text[None], (n, MAX_INSERT))], 1)
    src = jnp.where(
        pos < cur,
        pos,
        jnp.where(pos < cur + k_row[:, None], MAX_TEXT + (pos - cur), pos - k_row[:, None]),
    )
    inserted = jnp.take_along_axis(combined, jnp.clip(src, 0, MAX_TEXT + MAX_INSERT - 1), 1)
    do_ins = (f_tb & (k > 0))[:, None]
    text = jnp.where(do_ins & (pos < sd.max_len[:, None]), inserted, text)
    cursor = jnp.where(f_tb & (k > 0), cursor + k_row, cursor)

    # ---- tab / dpad focus cycling (UiStack.c:196-217) ----
    fwd = (inp.tab & ~inp.shift) | inp.dpad_down
    bwd = (inp.tab & inp.shift) | inp.dpad_up
    focused = jnp.where(
        fwd, jnp.where(focused < 0, 0, (focused + 1) % n), focused
    )
    focused = jnp.where(
        bwd, jnp.where(focused <= 0, n - 1, focused - 1), focused
    )

    new = UiState(
        focused=focused.astype(jnp.int32),
        active=active.astype(jnp.int32),
        active_state=active_state,
        value=value,
        checked=checked,
        text=text,
        cursor=cursor.astype(jnp.int32),
    )
    return new, activated


# ---------------------------------------------------------------------------
# drawing
# ---------------------------------------------------------------------------

# UiAssets texture slots (render/bundle.py fills these from
# assets/engine/texture/interface/*.gtex)
UITEX_BUTTON = 0
UITEX_BUTTON_HOVER = 1
UITEX_BUTTON_PRESSED = 2
UITEX_SLIDER = 3
UITEX_SLIDER_THUMB = 4
UITEX_CHECKBOX_UNCHECKED = 5
UITEX_CHECKBOX_CHECKED = 6
UITEX_RADIO_UNCHECKED = 7
UITEX_RADIO_CHECKED = 8
UITEX_TEXTBOX = 9
UITEX_FOCUS_RECT = 10
UITEX_MENU_LOGO = 11
UITEX_PAUSE_LOGO = 12
UITEX_STUDIO = 13
NUM_UITEX = 14


@struct.dataclass
class UiAssets:
    tex: jnp.ndarray  # [NUM_UITEX] i32 atlas ids (-1 = missing)
    tex_size: jnp.ndarray  # [NUM_UITEX, 2] f32 texture pixel dims
    # small font (font/small_font.gfon; the reference's widget font)
    font_tex: jnp.ndarray
    font_start_u: jnp.ndarray  # [128]
    font_end_u: jnp.ndarray  # [128]
    font_widths: jnp.ndarray  # [128]
    font_height: jnp.ndarray
    font_spacing: jnp.ndarray


def draw_ninepatch(frame, atlas, ui: UiAssets, slot, x0, y0, w, h, corner):
    """DrawNinePatchTexture: corners keep their pixel size, edges/center
    stretch. Virtual-unit rect already scaled by the caller."""
    from c_game_engine_tpu.render.textures import sample

    tex_id = ui.tex[slot]
    tw = ui.tex_size[slot, 0]
    th = ui.tex_size[slot, 1]
    fh, fw = frame.shape[:2]
    ys = jnp.arange(fh, dtype=jnp.float32)[:, None] - y0
    xs = jnp.arange(fw, dtype=jnp.float32)[None, :] - x0

    def axis_uv(p, size, t_size):
        c = jnp.minimum(corner, t_size * 0.5)
        lo = p < c
        hi = p > size - c
        u_lo = p / jnp.maximum(t_size, 1.0)
        u_hi = 1.0 - (size - p) / jnp.maximum(t_size, 1.0)
        u_mid = (c + (p - c) / jnp.maximum(size - 2 * c, 1e-6) * (t_size - 2 * c)) / jnp.maximum(
            t_size, 1.0
        )
        return jnp.where(lo, u_lo, jnp.where(hi, u_hi, u_mid))

    u, v = jnp.broadcast_arrays(axis_uv(xs, w, tw), axis_uv(ys, h, th))
    inside = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h) & (tex_id >= 0)
    rgba = sample(atlas, jnp.broadcast_to(tex_id, u.shape), jnp.stack([u, v], -1))
    a = jnp.where(inside, rgba[..., 3], 0.0)[..., None]
    return frame * (1 - a) + rgba[..., :3] * a


def _slider_value_codes(sd, st, i):
    """Default/percent slider labels (Slider.c:25-50): ': 1.23' / ': 57%'."""
    val = st.value[i]
    pct = sd.percent[i]
    shown = jnp.where(pct, jnp.round(val * 100.0), jnp.round(val * 100.0) / 100.0)
    whole = jnp.floor(jnp.where(pct, shown, shown)).astype(jnp.int32)
    frac = jnp.round((jnp.where(pct, 0.0, shown) - whole) * 100.0).astype(jnp.int32)
    frac = jnp.clip(frac, 0, 99)

    def dig(v, p):
        return v // p % 10 + 48

    d100, d10, d1 = dig(whole, 100), dig(whole, 10), dig(whole, 1)
    show100 = whole >= 100
    show10 = whole >= 10
    blank = jnp.int32(-1)
    codes = jnp.stack(
        [
            jnp.int32(ord(":")),
            jnp.int32(ord(" ")),
            jnp.where(show100, d100, blank),
            jnp.where(show10, d10, blank),
            d1,
            jnp.where(pct, jnp.int32(ord("%")), jnp.int32(ord("."))),
            jnp.where(pct, blank, dig(frac, 10)),
            jnp.where(pct, blank, dig(frac, 1)),
        ]
    )
    return codes


def ui_draw(sd: UiStackDef, st: UiState, atlas, ui: UiAssets, frame):
    """DrawUiStack (UiStack.c:256-275) over `frame` [H, W, 3]. Virtual
    coordinates scale to the frame size."""
    from c_game_engine_tpu.render.hud import draw_text

    fh, fw = frame.shape[:2]
    sx_ = fw / VIRTUAL_W
    sy_ = fh / VIRTUAL_H
    scale = min(sx_, sy_)
    n = sd.n
    out = frame
    font_size = 16.0 * scale
    for i in range(n):
        k = int(sd.kind[i])
        x0 = sd.rect[i, 0] * sx_
        y0 = sd.rect[i, 1] * sy_
        w = sd.rect[i, 2] * sx_
        h = sd.rect[i, 3] * sy_
        state_i = jnp.where(st.active == i, st.active_state, 0)
        label = sd.label[i]
        cx = x0 + w / 2
        cy = y0 + (h - font_size) / 2
        black = jnp.array([0.0, 0.0, 0.0, 1.0])
        white = jnp.array([1.0, 1.0, 1.0, 1.0])

        if k == int(ControlKind.BUTTON):
            slot = (
                UITEX_BUTTON
                + (state_i == 1).astype(jnp.int32) * 1
                + (state_i == 2).astype(jnp.int32) * 2
            )
            out = draw_ninepatch(out, atlas, ui, slot, x0, y0, w, h, 8.0 * scale)
            out = draw_text(out, atlas, ui, label, cx, cy, font_size, black, halign="center")
        elif k == int(ControlKind.SLIDER):
            out = draw_ninepatch(out, atlas, ui, UITEX_SLIDER, x0, y0, w, h, 8.0 * scale)
            # thumb (Slider.c:188-192)
            t = (st.value[i] - sd.vmin[i]) / jnp.maximum(sd.vmax[i] - sd.vmin[i], 1e-9)
            hx = x0 + t * (w - 18.0 * scale) + 4.0 * scale
            out = draw_ninepatch(
                out, atlas, ui, UITEX_SLIDER_THUMB, hx, y0 + scale, 10.0 * scale,
                h - 2 * scale, 4.0 * scale,
            )
            codes = jnp.concatenate([label, _slider_value_codes(sd, st, i)])
            out = draw_text(out, atlas, ui, codes, cx, cy, font_size, white, halign="center")
        elif k in (int(ControlKind.CHECKBOX), int(ControlKind.RADIO)):
            base = (
                UITEX_CHECKBOX_UNCHECKED
                if k == int(ControlKind.CHECKBOX)
                else UITEX_RADIO_UNCHECKED
            )
            slot = base + st.checked[i].astype(jnp.int32)
            box = 32.0 * scale
            out = draw_ninepatch(
                out, atlas, ui, slot, x0 + 2 * scale, y0 + (h - box) / 2, box, box, 16.0 * scale
            )
            col = jnp.where(
                (k == int(ControlKind.RADIO)) & ~st.checked[i],
                jnp.array([0.75, 0.75, 0.75, 1.0]),
                white,
            )
            out = draw_text(
                out, atlas, ui, label, x0 + 40 * scale, cy, font_size, col, halign="left"
            )
        elif k == int(ControlKind.TEXTBOX):
            out = draw_ninepatch(out, atlas, ui, UITEX_TEXTBOX, x0, y0, w, h, 8.0 * scale)
            empty = jnp.all(st.text[i] < 0)
            codes = jnp.where(empty, sd.placeholder[i], st.text[i])
            col = jnp.where(empty, jnp.array([0.0, 0.0, 0.0, 0.5]), black)
            out = draw_text(
                out, atlas, ui, codes, x0 + 6 * scale, cy, font_size, col, halign="left"
            )

        # focus ring (UiStack.c:266-273)
        ring = draw_ninepatch(
            out, atlas, ui, UITEX_FOCUS_RECT,
            x0 - 4 * scale, y0 - 4 * scale, w + 8 * scale, h + 8 * scale, 16.0 * scale,
        )
        out = jnp.where(st.focused == i, ring, out)
    return out
