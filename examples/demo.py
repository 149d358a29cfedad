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

from c_game_engine_tpu.compiler.cache import load_compiled
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step
from c_game_engine_tpu.render.raster import render_with_hud


def script_actions(t: int, name: str = "test") -> Actions:
    """A little choreography: look around, walk forward, hop, keep walking.
    On shapes.json the walk strafes across the coin row at x=1..3
    (five pickups -> coinclings on the audio mixer + HUD counter)."""
    a = Actions.zeros()
    move = jnp.zeros(2)
    look = jnp.zeros(2)
    buttons = a.buttons
    if name == "shapes":
        # spawn (-6, -0.25, 0) faces +X down the coin row at x=1..3; a
        # primitive at x~-1.4 deflects the walk, so sidestep back onto the
        # row (verified on CPU: all five pickups land)
        if t < 55:
            move = jnp.array([0.0, -1.0])
        elif t < 75:  # recenter after sliding around the obstacle
            move = jnp.array([0.35, -1.0])
        elif t < 105:  # straight through the coins
            move = jnp.array([0.0, -1.0])
        elif t < 111:  # hop
            buttons = buttons.at[0].set(True)
        else:  # survey the primitives
            look = jnp.array([0.03, 0.0])
        return Actions(move=move, look=look, buttons=buttons)
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

    cm, rb = load_compiled(f"/root/reference/assets/game/map/{name}.gmap")
    st = reset(cm)

    from c_game_engine_tpu.audio.bank import SAMPLES_PER_TICK, build_map_sound_bank
    from c_game_engine_tpu.audio.mixer import listener_from_state, mix_frame

    bank = build_map_sound_bank(cm)
    vols = jnp.ones(4)  # master/music/sfx/ui defaults

    def mix_tick(s):
        pos, quat = listener_from_state(s)
        return mix_frame(bank, s.audio, pos, quat, vols, SAMPLES_PER_TICK)

    step_fn = jax.jit(lambda s, a: step(cm, s, a))
    render_fn = jax.jit(lambda s: render_with_hud(rb, cm, s, 160, 160))
    mix_fn = jax.jit(mix_tick)

    snap_every = total_ticks // n_frames
    frames = []
    pcm = []
    for t in range(total_ticks):
        st = step_fn(st, script_actions(t, name))
        pcm.append(np.asarray(mix_fn(st)))
        if (t + 1) % snap_every == 0 and len(frames) < n_frames:
            frames.append(np.asarray(render_fn(st)))
            print(f"tick {t + 1}: frame {len(frames)}/{n_frames}", flush=True)

    strip = np.concatenate(frames, axis=1)
    u8 = (np.clip(strip, 0.0, 1.0) * 255).astype(np.uint8)
    # non-default maps keep their own artifacts (docs/demo.png stays the
    # canonical test.json walkthrough)
    suffix = "" if name == "test" else f"_{name}"
    out = pathlib.Path(__file__).resolve().parents[1] / "docs" / f"demo{suffix}.png"
    out.parent.mkdir(exist_ok=True)
    try:
        from PIL import Image

        Image.fromarray(u8).save(out)
        print(f"wrote {out} ({u8.shape[1]}x{u8.shape[0]})")
    except ImportError:
        np.save(out.with_suffix(".npy"), u8)
        print(f"PIL unavailable; wrote {out.with_suffix('.npy')}")
    # the session's mixed audio track (coin clings etc. from the walkthrough)
    from c_game_engine_tpu.audio.bank import write_wav

    track = np.concatenate(pcm, axis=0)
    wav = out.parent / f"demo{suffix}.wav"
    write_wav(wav, track)
    print(
        f"wrote {wav} ({track.shape[0]} samples, peak {np.abs(track).max():.3f}, "
        f"{int(st.sound_plays)} play events)"
    )
    pos = np.asarray(st.player.pos)
    print(f"final player position: {pos.round(3).tolist()}, tick={int(st.tick)}")


if __name__ == "__main__":
    main()
