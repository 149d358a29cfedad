"""SoundBank: every sound a map can play, packed into one device array.

Replaces SDL3_mixer's per-track MIX_Audio streaming (SoundSystem.c:293-318)
with a TPU-friendly layout: all referenced .gsnd PCM decoded host-side,
linearly resampled to one rate, concatenated into a single [S, 2] f32
array with an (offset, length) table — so the batched mixer samples any
channel with one gather (no per-sound arrays, no dynamic shapes).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from c_game_engine_tpu.assets.codecs import decode_gsnd

MIX_RATE = 48000
# 60 Hz fixed tick (engine/include/engine/physics/Physics.h:12-14)
SAMPLES_PER_TICK = MIX_RATE // 60

# sounds the engine/game layer can play regardless of map content
# (uiStack clicks, MainState popup, PauseState popdown, Coin.c:83 cling)
BUILTIN_SOUNDS = (
    "sound/sfx/click.gsnd",
    "sound/sfx/popup.gsnd",
    "sound/sfx/popdown.gsnd",
    "sound/sfx/coincling.gsnd",
)


@struct.dataclass
class SoundBank:
    pcm: jnp.ndarray  # [S, 2] f32 all sounds concatenated at MIX_RATE
    table: jnp.ndarray  # [NS, 2] i32 (offset, frames)
    names: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_sounds(self) -> int:
        return self.table.shape[0]


def _resample(pcm: np.ndarray, rate: int, target: int = MIX_RATE) -> np.ndarray:
    if rate == target or pcm.shape[0] == 0:
        return pcm
    n_out = max(int(round(pcm.shape[0] * target / rate)), 1)
    t = np.arange(n_out, dtype=np.float64) * (rate / target)
    i0 = np.minimum(t.astype(np.int64), pcm.shape[0] - 1)
    i1 = np.minimum(i0 + 1, pcm.shape[0] - 1)
    frac = (t - i0)[:, None].astype(np.float32)
    return pcm[i0] * (1.0 - frac) + pcm[i1] * frac


def build_sound_bank(resolver, names) -> SoundBank:
    """Decode + pack the named sounds (in id order). Missing assets become
    1-frame silence (graceful-degradation counterpart of the checkerboard
    texture fallback)."""
    chunks, table, kept = [], [], []
    offset = 0
    for name in names:
        path = resolver.resolve(name)
        if path is None:
            pcm = np.zeros((1, 2), np.float32)
        else:
            snd = decode_gsnd(path)
            pcm = _resample(snd.pcm, snd.rate)
        chunks.append(pcm.astype(np.float32))
        table.append((offset, pcm.shape[0]))
        kept.append(name)
        offset += pcm.shape[0]
    if not chunks:
        chunks = [np.zeros((1, 2), np.float32)]
        table = [(0, 1)]
    pcm = np.concatenate(chunks, axis=0)
    return SoundBank(
        pcm=jnp.asarray(pcm),
        table=jnp.asarray(np.array(table, np.int32)),
        names=tuple(kept),
    )


def write_wav(path, pcm, rate: int = MIX_RATE) -> None:
    """Write a mixed [n, 2] f32 buffer as a PCM16 stereo WAV (host-side
    demo/debug output — the TPU build has no audio device)."""
    import wave

    data = np.clip(np.asarray(pcm, np.float32), -1.0, 1.0)
    w = wave.open(str(path), "wb")
    try:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((data * 32767.0).astype("<i2").tobytes())
    finally:
        w.close()


def build_map_sound_bank(cmap) -> SoundBank:
    """Bank for a compiled map: its aux['sound_names'] list (builtins +
    every sound_player asset, ids assigned at compile time)."""
    from c_game_engine_tpu.compiler.models import AssetResolver

    names = cmap.aux.get("sound_names", list(BUILTIN_SOUNDS))
    resolver = AssetResolver()
    return build_sound_bank(resolver, names)
