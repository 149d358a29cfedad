"""Scripted end-to-end demo: compile a map from the reference assets, run a
keyboard-style action script through the jitted simulator, and render a
filmstrip of first-person frames (with HUD + viewmodel) to docs/demo.png.

This is the TPU-native equivalent of launching the reference game
(game/src/GameMain.c) and playing: the action stream stands in for SDL
input, `step` for the 60 Hz physics thread, and the software rasterizer for
the Vulkan frame (engine/src/graphics/ — see render/raster.py).

Usage:  python examples/demo.py [map_name] [frames]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step
from c_game_engine_tpu.render.bundle import build_render_bundle
from c_game_engine_tpu.render.raster import render_with_hud


def script_actions(t: int) -> Actions:
    """A little choreography: look around, walk forward, hop, keep walking."""
    a = Actions.zeros()
    move = jnp.zeros(2)
    look = jnp.zeros(2)
    buttons = a.buttons
    if t < 30:  # pan right
        look = jnp.array([0.02, 0.0])
    elif t < 60:  # walk forward while panning back
        move = jnp.array([0.0, -1.0])
        look = jnp.array([-0.02, 0.0])
    elif t < 66:  # jump
        buttons = buttons.at[0].set(True)  # JUMP
    else:  # turn in place, surveying the room
        look = jnp.array([0.025, 0.0])
    return Actions(move=move, look=look, buttons=buttons)


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "test"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    total_ticks = 150

    cm = compile_map(f"/root/reference/assets/game/map/{name}.gmap")
    rb = build_render_bundle(cm)
    st = reset(cm)

    step_fn = jax.jit(lambda s, a: step(cm, s, a))
    render_fn = jax.jit(lambda s: render_with_hud(rb, cm, s, 160, 160))

    snap_every = total_ticks // n_frames
    frames = []
    for t in range(total_ticks):
        st = step_fn(st, script_actions(t))
        if (t + 1) % snap_every == 0 and len(frames) < n_frames:
            frames.append(np.asarray(render_fn(st)))
            print(f"tick {t + 1}: frame {len(frames)}/{n_frames}", flush=True)

    strip = np.concatenate(frames, axis=1)
    u8 = (np.clip(strip, 0.0, 1.0) * 255).astype(np.uint8)
    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / "demo.png"
    out.parent.mkdir(exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(u8).save(out)
        print(f"wrote {out} ({u8.shape[1]}x{u8.shape[0]})")
    except ImportError:
        np.save(out.with_suffix(".npy"), u8)
        print(f"PIL unavailable; wrote {out.with_suffix('.npy')}")
    pos = np.asarray(st.player.pos)
    print(f"final player position: {pos.round(3).tolist()}, tick={int(st.tick)}")


if __name__ == "__main__":
    main()
