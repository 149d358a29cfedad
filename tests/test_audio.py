"""Sound system tests: .gsnd codec, SoundBank packing, the 32-channel
table (alloc/pause/stop/loop/finish — SoundSystem.c semantics), the
batched positional mixer, and sound_player/coin integration in the tick."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.assets.codecs import decode_gsnd
from c_game_engine_tpu.audio.bank import (
    BUILTIN_SOUNDS,
    MIX_RATE,
    SAMPLES_PER_TICK,
    SoundBank,
    build_sound_bank,
)
from c_game_engine_tpu.audio.mixer import (
    CATEGORY_SFX,
    NUM_CHANNELS,
    alloc_channels,
    empty_audio,
    mix_frame,
    set_paused,
    stop_channels,
    tick_advance,
)
from c_game_engine_tpu.compiler.models import AssetResolver
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.core.step import step

from tests.worldgen import P_bool, P_float, P_int, P_str, actor, make_map

SHIPPED = [
    "/root/reference/assets/game/sound/sfx/coincling.gsnd",
    "/root/reference/assets/game/sound/sfx/popup.gsnd",
    "/root/reference/assets/game/sound/sfx/popdown.gsnd",
    "/root/reference/assets/engine/sound/sfx/click.gsnd",
]


def test_gsnd_decode_shipped():
    for p in SHIPPED:
        s = decode_gsnd(p)
        assert s.pcm.ndim == 2 and s.pcm.shape[1] == 2
        assert s.pcm.dtype == np.float32
        assert s.rate in (22050, 44100, 48000)
        assert np.abs(s.pcm).max() <= 1.0


def test_bank_packing():
    bank = build_sound_bank(AssetResolver(), BUILTIN_SOUNDS)
    assert bank.num_sounds == len(BUILTIN_SOUNDS)
    tab = np.asarray(bank.table)
    # contiguous layout
    assert tab[0, 0] == 0
    for i in range(1, len(tab)):
        assert tab[i, 0] == tab[i - 1, 0] + tab[i - 1, 1]
    assert tab[:, 1].min() > 1  # all four shipped sounds decoded (not silence)
    assert bank.pcm.shape[0] == tab[-1, 0] + tab[-1, 1]


def _mk_events(n, mask_idx, sound=0, volume=1.0, category=CATEGORY_SFX,
               loops=0, positional=False, pos=(0.0, 0.0, 0.0)):
    mask = np.zeros(n, bool)
    mask[list(mask_idx)] = True
    return (
        jnp.asarray(mask),
        jnp.full((n,), sound, jnp.int32),
        jnp.full((n,), volume, jnp.float32),
        jnp.full((n,), category, jnp.int32),
        jnp.full((n,), loops, jnp.int32),
        jnp.full((n,), positional, bool),
        jnp.broadcast_to(jnp.asarray(pos, jnp.float32), (n, 3)),
    )


def test_alloc_order_and_overflow():
    a = empty_audio()
    n = 40
    a, h = alloc_channels(a, *_mk_events(n, range(40)))
    h = np.asarray(h)
    # channels claimed in actor-index order; beyond 32 free channels -> drop
    # ("If there are no free channels, the sound will not play")
    assert list(h[:NUM_CHANNELS]) == list(range(NUM_CHANNELS))
    assert (h[NUM_CHANNELS:] == -1).all()
    assert int((np.asarray(a.snd) >= 0).sum()) == NUM_CHANNELS


def test_loop_and_finish():
    lengths = jnp.asarray([SAMPLES_PER_TICK * 2, 10], jnp.int32)
    a = empty_audio()
    a, h = alloc_channels(a, *_mk_events(2, [0]))  # sound 0, no loops
    a1, fin1 = tick_advance(a, lengths)
    assert not bool(fin1[0])
    a2, fin2 = tick_advance(a1, lengths)
    assert bool(fin2[0])
    assert int(a2.snd[0]) == -1  # freed

    # loops=1 plays twice: finishes on the 4th tick
    a = empty_audio()
    a, _ = alloc_channels(a, *_mk_events(2, [0], loops=1))
    for i in range(3):
        a, fin = tick_advance(a, lengths)
        assert not bool(fin[0]), f"tick {i}"
    a, fin = tick_advance(a, lengths)
    assert bool(fin[0])

    # loops=-1 never finishes (sound 1 is 10 samples, wraps 80x per tick)
    a = empty_audio()
    a, _ = alloc_channels(a, *_mk_events(2, [0], sound=1, loops=-1))
    for _ in range(5):
        a, fin = tick_advance(a, lengths)
        assert not bool(fin[0])
    assert int(a.snd[0]) == 1  # still playing


def test_pause_stops_clock_and_stop_frees():
    lengths = jnp.asarray([SAMPLES_PER_TICK], jnp.int32)
    a = empty_audio()
    a, h = alloc_channels(a, *_mk_events(1, [0]))
    ch = jnp.arange(NUM_CHANNELS) == int(h[0])
    a = set_paused(a, ch, True)
    a, fin = tick_advance(a, lengths)
    assert not bool(fin[0]) and int(a.elapsed[0]) == 0  # paused: no advance
    a = set_paused(a, ch, False)
    a, fin = tick_advance(a, lengths)
    assert bool(fin[0])

    a = empty_audio()
    a, h = alloc_channels(a, *_mk_events(1, [0]))
    a = stop_channels(a, jnp.arange(NUM_CHANNELS) == int(h[0]))
    assert int(a.snd[0]) == -1


def _tone_bank(n=100):
    pcm = np.zeros((n, 2), np.float32)
    pcm[:, 0] = np.linspace(1.0, 0.5, n)
    pcm[:, 1] = np.linspace(-1.0, -0.5, n)
    return SoundBank(pcm=jnp.asarray(pcm), table=jnp.asarray([[0, n]], np.int32),
                     names=("tone",))


def test_mix_gain_and_window():
    bank = _tone_bank(100)
    a = empty_audio()
    a, _ = alloc_channels(a, *_mk_events(1, [0], volume=0.5))
    vols = jnp.asarray([0.8, 1.0, 0.25, 1.0])  # master, music, sfx, ui
    out = np.asarray(mix_frame(bank, a, jnp.zeros(3), jnp.asarray([0, 0, 0, 1.0]),
                               vols, n_samples=150))
    gain = 0.5 * 0.25 * 0.8  # volume x sfx x master (GetCategoryVolume)
    np.testing.assert_allclose(out[:100], np.asarray(bank.pcm) * gain, atol=1e-6)
    assert (out[100:] == 0).all()  # past the end: silence (no loops)


def test_mix_positional_pan_and_distance():
    bank = _tone_bank(100)
    vols = jnp.ones(4)
    ident = jnp.asarray([0, 0, 0, 1.0])

    def level(pos):
        a = empty_audio()
        a, _ = alloc_channels(a, *_mk_events(1, [0], positional=True, pos=pos))
        out = np.asarray(mix_frame(bank, a, jnp.zeros(3), ident, vols, 50))
        return np.abs(out).mean(0)  # [2] l, r levels

    l_right, r_right = level((3.0, 0.0, 0.0))  # +X = right of -Z forward
    assert r_right > l_right * 3
    l_left, r_left = level((-3.0, 0.0, 0.0))
    assert l_left > r_left * 3
    near = level((1.0, 0.0, 0.0)).sum()
    far = level((9.0, 0.0, 0.0)).sum()
    assert near > far * 2  # 1/(1+d) attenuation


@pytest.fixture(scope="module")
def sound_map():
    return make_map(
        [
            actor(
                "sound_player",
                (2.0, 0.0, -3.0),
                params={
                    "name": P_str("snd1"),
                    "sound": P_str("sfx/coincling"),
                    "volume": P_float(0.7),
                    "loops": P_int(-1),
                    "positional": P_bool(True),
                },
            ),
            actor(
                "trigger",
                (0, -0.5, 2),
                params={
                    "width": P_float(2), "height": P_float(2), "depth": P_float(2),
                    "oneShot": P_bool(False), "name": P_str("trig1"),
                },
                connections=[
                    ("entered", "snd1", "play", None),
                    ("exited", "snd1", "stop", None),
                ],
            ),
            actor("prop_coin", (0, -0.5, -2), params={"isBlue": P_bool(False)}),
        ]
    )


def _walk(sfn, st, target_xz, max_ticks=600):
    for _ in range(max_ticks):
        pos = np.asarray(st.player.pos)
        d = np.array([target_xz[0] - pos[0], target_xz[1] - pos[2]])
        if np.linalg.norm(d) < 0.3:
            break
        yaw = float(st.player.yaw)
        c, s = np.cos(yaw), np.sin(yaw)
        m = np.array([c * d[0] - s * d[1], s * d[0] + c * d[1]])
        m /= max(np.linalg.norm(m), 1e-6)
        st = sfn(st, Actions.zeros().replace(move=jnp.asarray(m, jnp.float32)))
    return st


def test_sound_player_play_stop_in_tick(sound_map):
    cmap = sound_map
    sid = cmap.aux["sound_names"].index("sound/sfx/coincling.gsnd")
    sp = cmap.aux["actor_classes"].index("SOUND_PLAYER")
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    st = _walk(sfn, st, (0, 2))  # into the trigger -> play
    snd = np.asarray(st.audio.snd)
    handle = int(st.actors.idata[sp, 1])
    assert handle >= 0
    assert snd[handle] == sid
    assert bool(st.audio.positional[handle])
    assert float(st.audio.volume[handle]) == pytest.approx(0.7)
    assert int(st.audio.loops[handle]) == -1
    np.testing.assert_allclose(
        np.asarray(st.audio.pos[handle]), [2.0, 0.0, -3.0], atol=1e-5
    )
    st = _walk(sfn, st, (0, 5))  # out of the trigger -> stop
    assert int(st.actors.idata[sp, 1]) == -1
    assert int(st.audio.snd[handle]) == -1


def test_coin_pickup_plays_cling(sound_map):
    cmap = sound_map
    sid = cmap.aux["sound_names"].index("sound/sfx/coincling.gsnd")
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    st = _walk(sfn, st, (0, -2))
    assert int(st.save.coins) == 1
    # coincling fired on a channel this tick (it frees itself once the
    # ~1.2 s sample finishes; ticks here are far fewer than that)
    snd = np.asarray(st.audio.snd)
    assert (snd == sid).any()


def test_finished_channel_frees_and_clears_handle():
    cmap = make_map(
        [
            actor(
                "sound_player",
                (0.0, 0.0, 0.0),
                params={"name": P_str("s"), "sound": P_str("sfx/click")},
            ),
            actor(
                "trigger",
                (0, -0.5, 2),
                params={
                    "width": P_float(2), "height": P_float(2), "depth": P_float(2),
                    "oneShot": P_bool(True), "name": P_str("t"),
                },
                connections=[("entered", "s", "play", None)],
            ),
        ]
    )
    sp = cmap.aux["actor_classes"].index("SOUND_PLAYER")
    click_len = int(cmap.sound_len[cmap.aux["sound_names"].index("sound/sfx/click.gsnd")])
    ticks_to_finish = click_len // SAMPLES_PER_TICK + 2
    sfn = jax.jit(lambda s, a: step(cmap, s, a))
    st = reset(cmap)
    # walk toward the trigger, stopping the moment the play fires (the
    # click is only ~6 ticks long, shorter than the rest of the walk)
    fwd = Actions.zeros().replace(move=jnp.asarray([0.0, 1.0], jnp.float32))
    saw_handle = False
    for _ in range(600):
        st = sfn(st, fwd)
        if int(st.actors.idata[sp, 1]) >= 0:
            saw_handle = True
            break
    assert saw_handle
    for _ in range(ticks_to_finish):
        st = sfn(st, Actions.zeros())
    assert int(st.actors.idata[sp, 1]) == -1  # SoundPlayerSoundDone parity
    assert (np.asarray(st.audio.snd) == -1).all()


def test_game_app_ui_sounds():
    from c_game_engine_tpu.models.game import GameApp, Screen

    app = GameApp()
    for _ in range(25):
        app.ui_tick()  # splash: coincling fires at tick 20
    snd = np.asarray(app.ui_audio.snd)
    assert (snd == app._UI_SOUND_IDS["coincling"]).any()

    # popup on pause, popdown on resume (MainState.c:47 / PauseState.c:36)
    app.screen = Screen.IN_GAME
    app.pause()
    assert (np.asarray(app.ui_audio.snd) == app._UI_SOUND_IDS["popup"]).any()
    app.resume()
    assert (np.asarray(app.ui_audio.snd) == app._UI_SOUND_IDS["popdown"]).any()

    out = np.asarray(app.mix_ui_audio(2048))
    assert out.shape == (2048, 2)
    assert np.abs(out).max() > 0  # something audible is mixed

    # channels free themselves once the samples run out
    for _ in range(80):
        app._advance_ui_audio()
    assert (np.asarray(app.ui_audio.snd) == -1).all()
