"""Failure-path coverage (SURVEY §5 failure detection/recovery).

Pins the behaviors the reference implements as guards:
  * `.g*` container rejection — the header/size checks DataReader-based
    loaders rely on (engine/include/engine/assets/DataReader.h:35-90
    EXPECT_BYTES; engine/src/assets/AssetReader.c:150-257 header checks),
    for both the pure-Python codec and the native C++ one.
  * the shipped fault fixtures: mapSources/invalid.json (self-intersecting
    sector), missing_material.gmap (material path that resolves nowhere),
    entirely_skip.gmap (every surface skipped) — all must compile and
    render, with fallbacks in place of the broken pieces.
  * GameApp failed-load -> menu recovery (LoadingState.c:56-61: "get out
    before crash" — LogError + SetGameState(&MenuState)).
"""

import numpy as np
import pytest

from c_game_engine_tpu.assets.container import (
    Asset,
    AssetFormatError,
    AssetType,
    HEADER,
    read_asset,
    write_asset,
)

MAPS = "/root/reference/assets/game/map"


@pytest.fixture()
def good_asset(tmp_path):
    p = tmp_path / "ok.gkvl"
    write_asset(p, Asset(AssetType.KV_LIST, 1, b"payload bytes" * 10))
    read_asset(p)  # sanity: round-trips
    return p


def _mutate(path, tmp_path, fn, name="bad.gkvl"):
    raw = bytearray(path.read_bytes())
    out = tmp_path / name
    out.write_bytes(bytes(fn(raw)))
    return out


def test_container_rejects_truncated_header(tmp_path, good_asset):
    p = _mutate(good_asset, tmp_path, lambda raw: raw[: HEADER.size - 1])
    with pytest.raises(AssetFormatError, match="shorter than container header"):
        read_asset(p)


def test_container_rejects_bad_magic(tmp_path, good_asset):
    def fn(raw):
        raw[0] ^= 0xFF
        return raw

    with pytest.raises(AssetFormatError, match="bad magic"):
        read_asset(_mutate(good_asset, tmp_path, fn))


def test_container_rejects_bad_version(tmp_path, good_asset):
    def fn(raw):
        raw[4] = 99
        return raw

    with pytest.raises(AssetFormatError, match="container version"):
        read_asset(_mutate(good_asset, tmp_path, fn))


def test_container_rejects_truncated_payload(tmp_path, good_asset):
    # compressed size no longer matches the file remainder (the
    # AssetReader.c fileSize check / EXPECT_BYTES equivalent)
    p = _mutate(good_asset, tmp_path, lambda raw: raw[:-7])
    with pytest.raises(AssetFormatError, match="compressed size"):
        read_asset(p)


def test_container_rejects_corrupt_payload(tmp_path, good_asset):
    def fn(raw):
        raw[HEADER.size] ^= 0xFF  # break the gzip magic/stream
        return raw

    with pytest.raises(AssetFormatError, match="corrupt payload"):
        read_asset(_mutate(good_asset, tmp_path, fn))


def test_container_rejects_decompressed_size_mismatch(tmp_path, good_asset):
    def fn(raw):
        raw[7:15] = (12345).to_bytes(8, "little")  # lie in dsize
        return raw

    with pytest.raises(AssetFormatError, match="decompressed size"):
        read_asset(_mutate(good_asset, tmp_path, fn))


def test_native_codec_rejects_same_fixtures(tmp_path, good_asset):
    """The C++ codec (native/cge_native.cpp) returns distinct negative
    error codes for the same faults the Python codec raises on."""
    native = pytest.importorskip("c_game_engine_tpu.native")
    try:
        native.lib()
    except Exception:
        pytest.skip("native library unavailable")

    cases = {
        "magic": lambda raw: [raw.__setitem__(0, raw[0] ^ 0xFF), raw][1],
        "version": lambda raw: [raw.__setitem__(4, 99), raw][1],
        "trunc": lambda raw: raw[:-7],
        "gzip": lambda raw: [
            raw.__setitem__(HEADER.size, raw[HEADER.size] ^ 0xFF), raw
        ][1],
        "dsize": lambda raw: [
            raw.__setitem__(slice(7, 15), (12345).to_bytes(8, "little")), raw
        ][1],
    }
    for name, fn in cases.items():
        p = _mutate(good_asset, tmp_path, fn, name=f"{name}.gkvl")
        with pytest.raises(IOError):
            native.read_asset_native(str(p))
    # and the good file still reads
    t, tv, data = native.read_asset_native(str(good_asset))
    assert data == b"payload bytes" * 10


def test_invalid_json_source_compiles():
    """mapSources/invalid.json carries a self-intersecting sector polygon.
    The compiler must not crash: ear-clipping still emits a bounded
    triangulation and the map steps + renders."""
    from c_game_engine_tpu.compiler.compile import compile_map

    cm = compile_map("/root/reference/mapSources/invalid.json")
    n = cm.aux["num_real_tris"]
    assert 0 < n <= 32, n  # 5-point sector: bounded triangulation
    _assert_map_runs(cm)


def test_missing_material_falls_back():
    """missing_material.gmap references a material that resolves nowhere;
    its surfaces draw with the magenta/black checkerboard fallback
    (MapMaterialLoader fallback; our AssetResolver.texture)."""
    from c_game_engine_tpu.compiler.compile import compile_map

    cm = compile_map(f"{MAPS}/missing_material.gmap")
    assert cm.aux["num_real_tris"] > 0
    img = _assert_map_runs(cm)
    # the checkerboard fallback is magenta: the frame must show pixels
    # that are strongly red+blue with low green
    mask = (img[..., 0] > 0.4) & (img[..., 2] > 0.4) & (img[..., 1] < 0.2)
    assert mask.mean() > 0.01, "no magenta fallback pixels visible"


def test_entirely_skip_compiles_and_renders():
    """entirely_skip.gmap marks every surface skipped: zero map triangles,
    but the map still loads, ticks, and renders (sky only)."""
    from c_game_engine_tpu.compiler.compile import compile_map

    cm = compile_map(f"{MAPS}/entirely_skip.gmap")
    assert cm.aux["num_real_tris"] == 0
    _assert_map_runs(cm)


def _assert_map_runs(cm):
    import jax

    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render

    st = reset(cm)
    sfn = jax.jit(lambda s, a: step(cm, s, a))
    for _ in range(5):
        st = sfn(st, Actions.zeros())
    rb = build_render_bundle(cm)
    img = np.asarray(render(rb, cm, st, 64, 128))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    return img


def test_failed_load_recovers_to_menu(tmp_path):
    """LoadingState.c:56-61: a map that fails to load logs an error and
    drops to the menu instead of crashing; the app stays usable."""
    from c_game_engine_tpu.models.game import GameApp, Screen

    app = GameApp(batch=1, initial_map=f"{MAPS}/test.gmap")
    assert app.screen == Screen.IN_GAME
    app.load_level(str(tmp_path / "no_such_map.gmap"))
    assert app.screen == Screen.MENU
    # a corrupt container (not just a missing file) also recovers
    bad = tmp_path / "corrupt.gmap"
    bad.write_bytes(b"not a container at all")
    app.load_level(str(bad))
    assert app.screen == Screen.MENU
    # the previous map is still loaded and playable
    app.load_level(f"{MAPS}/test.gmap")
    assert app.screen == Screen.IN_GAME
    frame = np.asarray(app.render_frame(64, 128))
    assert np.isfinite(frame).all()
