"""Batched 32-channel audio mixer (SoundSystem parity, TPU-native).

The reference mixes on the host with SDL3_mixer: 32 fixed tracks, per-track
gain = volume x category volume x master volume, and positional tracks whose
3D position is re-projected into listener (camera) space every frame
(SoundSystem.c: SOUND_SYSTEM_CHANNEL_COUNT=32, GetCategoryVolume,
UpdateSoundSystem listener math, PlaySoundEx/Pause/Resume/Stop).

Here the channel table is fixed-shape per-env state (AudioState) updated
inside the jitted tick — allocation, loop/finish bookkeeping, pause flags —
while PCM mixing is a separate jittable `mix_frame` called at whatever
cadence the caller wants (the same split as the reference: game thread
fires events, mixer renders audio asynchronously). Mixing gathers each
channel's window from the SoundBank and reduces over channels: one
[C, n-samples] gather + elementwise math per env, vmap over the batch.

Spatialization divergence (documented, PARITY.md): SDL3_mixer's internal
3D panner is approximated by inverse-distance attenuation 1/(1+d) and
constant-power stereo panning from the listener-space azimuth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from c_game_engine_tpu.audio.bank import SAMPLES_PER_TICK, SoundBank
from c_game_engine_tpu.utils.mathx import quat_conj, quat_from_yaw_pitch, quat_rotate

NUM_CHANNELS = 32  # SOUND_SYSTEM_CHANNEL_COUNT (SoundSystem.h:10)

# sound categories (SoundSystem.h enum SoundCategory)
CATEGORY_MUSIC = 0
CATEGORY_SFX = 1
CATEGORY_UI = 2


@struct.dataclass
class AudioState:
    """Per-env channel table. A channel is free iff snd < 0."""

    snd: jnp.ndarray  # [C] i32 sound id (-1 free)
    elapsed: jnp.ndarray  # [C] i32 samples played within the current loop
    loops: jnp.ndarray  # [C] i32 remaining EXTRA loops (-1 = infinite)
    volume: jnp.ndarray  # [C] f32 original volume (pre category/master)
    category: jnp.ndarray  # [C] i32
    positional: jnp.ndarray  # [C] bool
    pos: jnp.ndarray  # [C, 3] f32 world position
    paused: jnp.ndarray  # [C] bool


def empty_audio() -> AudioState:
    c = NUM_CHANNELS
    return AudioState(
        snd=jnp.full((c,), -1, jnp.int32),
        elapsed=jnp.zeros((c,), jnp.int32),
        loops=jnp.zeros((c,), jnp.int32),
        volume=jnp.ones((c,), jnp.float32),
        category=jnp.zeros((c,), jnp.int32),
        positional=jnp.zeros((c,), bool),
        pos=jnp.zeros((c, 3), jnp.float32),
        paused=jnp.zeros((c,), bool),
    )


def alloc_channels(audio: AudioState, mask, sound, volume, category, loops,
                   positional, pos):
    """Start one sound per set lane of `mask` (all args [N]-shaped per-actor
    arrays). Events claim free channels in actor-index order; events beyond
    the free-channel supply are dropped — "If there are no free channels,
    the sound will not play" (SoundSystem.h PlaySound doc).

    Returns (audio, handle [N] i32): the claimed channel per event (-1 if
    dropped/not firing) — the SoundChannel* handle equivalent."""
    c = audio.snd.shape[0]
    mask = mask & (sound >= 0)
    free = audio.snd < 0
    evt_rank = jnp.cumsum(mask.astype(jnp.int32)) - 1  # [N]
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # [C]
    match = (
        mask[:, None] & free[None, :] & (evt_rank[:, None] == free_rank[None, :])
    )  # [N, C] one-hot (<=1 per row and per column)
    placed = jnp.any(match, axis=1)
    handle = jnp.where(
        placed, jnp.sum(match * jnp.arange(c, dtype=jnp.int32)[None, :], axis=1), -1
    )
    taken = jnp.any(match, axis=0)  # [C]
    mt = match.astype(jnp.float32)

    def pick_i(vals):
        return jnp.sum(match * vals[:, None].astype(jnp.int32), axis=0)

    def pick_f(vals):
        return jnp.sum(mt * vals[:, None].astype(jnp.float32), axis=0)

    audio = audio.replace(
        snd=jnp.where(taken, pick_i(sound), audio.snd),
        elapsed=jnp.where(taken, 0, audio.elapsed),
        loops=jnp.where(taken, pick_i(loops), audio.loops),
        volume=jnp.where(taken, pick_f(volume), audio.volume),
        category=jnp.where(taken, pick_i(category), audio.category),
        positional=jnp.where(taken, jnp.sum(match * positional[:, None], axis=0) > 0,
                             audio.positional),
        pos=jnp.where(
            taken[:, None],
            jnp.matmul(mt.T, pos.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST),
            audio.pos,
        ),
        paused=jnp.where(taken, False, audio.paused),
    )
    return audio, handle


def stop_channels(audio: AudioState, ch_mask):
    """Free the channels in ch_mask [C] (StopSound / MIX_StopTrack)."""
    return audio.replace(snd=jnp.where(ch_mask, -1, audio.snd))


def set_paused(audio: AudioState, ch_mask, value: bool):
    live = ch_mask & (audio.snd >= 0)
    return audio.replace(paused=jnp.where(live, value, audio.paused))


def tick_advance(audio: AudioState, sound_len,
                 samples: int = SAMPLES_PER_TICK):
    """Advance playing channels by one tick worth of samples; loop or free
    finished ones. sound_len is the [NS] per-sound frame table
    (CompiledMap.sound_len — lengths only, so the jitted tick needs no PCM).
    Returns (audio, finished [C] bool) — finished is the
    ChannelFinished-callback parity signal (SoundSystem.c:81-101), used to
    clear actor-held handles."""
    playing = (audio.snd >= 0) & ~audio.paused
    sidx = jnp.clip(audio.snd, 0, sound_len.shape[0] - 1)
    length = jnp.maximum(sound_len[sidx], 1)
    elapsed = jnp.where(playing, audio.elapsed + samples, audio.elapsed)
    # loop boundary crossings within this tick (a short looped sound can
    # wrap more than once per tick)
    wraps = jnp.where(playing, elapsed // length, 0)
    elapsed = elapsed - wraps * length
    inf = audio.loops < 0
    new_loops = jnp.where(inf, audio.loops, jnp.maximum(audio.loops - wraps, -1))
    finished = playing & ~inf & (audio.loops - wraps < 0)
    audio = audio.replace(
        snd=jnp.where(finished, -1, audio.snd),
        elapsed=jnp.where(finished, 0, elapsed),
        loops=jnp.where(finished, 0, new_loops),
    )
    return audio, finished


def mix_frame(bank: SoundBank, audio: AudioState, listener_pos, listener_quat,
              volumes, n_samples: int = SAMPLES_PER_TICK):
    """Render one env's stereo mix for the next `n_samples` samples.

    volumes: [4] f32 (master, music, sfx, ui) — Options.h volume fields.
    Returns [n_samples, 2] f32 (unclipped; callers may jnp.clip to [-1,1]).
    vmap over envs for batched mixing."""
    c = audio.snd.shape[0]
    live = audio.snd >= 0
    audible = live & ~audio.paused
    sidx = jnp.clip(audio.snd, 0, bank.num_sounds - 1)
    off = bank.table[sidx, 0]
    length = jnp.maximum(bank.table[sidx, 1], 1)

    t = jnp.arange(n_samples, dtype=jnp.int32)[None, :]  # [1, n]
    cur = audio.elapsed[:, None] + t  # [C, n]
    total_allowed = jnp.where(
        audio.loops < 0, jnp.iinfo(jnp.int32).max,
        length * (1 + jnp.maximum(audio.loops, 0)),
    )[:, None]
    valid = audible[:, None] & (cur < total_allowed)
    idx = off[:, None] + cur % length[:, None]
    pcm = bank.pcm[jnp.clip(idx, 0, bank.pcm.shape[0] - 1)]  # [C, n, 2]

    # gain = original volume x category volume x master (GetCategoryVolume)
    cat_vol = volumes[1 + jnp.clip(audio.category, 0, 2)]
    gain = audio.volume * cat_vol * volumes[0]  # [C]

    # positional: listener-space direction (UpdateSoundSystem listener math)
    rel = quat_rotate(quat_conj(listener_quat)[None, :], audio.pos - listener_pos[None, :])
    d = jnp.linalg.norm(rel, axis=-1)
    att = 1.0 / (1.0 + d)
    # constant-power pan from azimuth; forward is -Z in listener space
    az = jnp.arctan2(rel[:, 0], jnp.maximum(jnp.abs(rel[:, 2]), 1e-6)
                     * jnp.sign(-rel[:, 2]))
    pan = jnp.clip(jnp.sin(az), -1.0, 1.0)
    theta = (pan + 1.0) * (jnp.pi / 4.0)
    l_gain = jnp.where(audio.positional, att * jnp.cos(theta) * jnp.sqrt(2.0), 1.0)
    r_gain = jnp.where(audio.positional, att * jnp.sin(theta) * jnp.sqrt(2.0), 1.0)
    lr = jnp.stack([l_gain, r_gain], -1) * gain[:, None]  # [C, 2]

    contrib = pcm * valid[:, :, None].astype(jnp.float32) * lr[:, None, :]
    return jnp.sum(contrib, axis=0)  # [n, 2]


def listener_from_state(state):
    """Listener transform = the active camera (UpdateSoundSystem uses
    GetState()->camera)."""
    p = state.player
    pos = jnp.where(p.freecam, p.freecam_pos, p.pos + jnp.array([0.0, 0.25, 0.0]))
    quat = quat_from_yaw_pitch(p.yaw, p.pitch)
    use_actor = state.camera_actor >= 0
    n = state.actors.pos.shape[0]
    ci = jnp.clip(state.camera_actor, 0, n - 1)
    pos = jnp.where(use_actor, state.actors.pos[ci], pos)
    quat = jnp.where(use_actor, state.actors.quat[ci], quat)
    return pos, quat
