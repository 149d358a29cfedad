"""Asset container + codec tests against the shipped reference assets."""

import glob

import numpy as np
import pytest

from c_game_engine_tpu.assets.container import Asset, AssetType, read_asset, write_asset
from c_game_engine_tpu.assets.codecs import decode_gmdl, decode_gmtl, decode_gtex
from c_game_engine_tpu.assets.gmap import decode_gmap
from c_game_engine_tpu.assets.kvlist import Param, ParamType, read_kvlist, write_kvlist
from c_game_engine_tpu.assets.reader import Reader, Writer

ASSETS = "/root/reference/assets"


def test_container_roundtrip(tmp_path):
    payload = b"hello world" * 100
    p = tmp_path / "x.gtex"
    write_asset(p, Asset(AssetType.TEXTURE, 3, payload))
    back = read_asset(p)
    assert back.type == AssetType.TEXTURE
    assert back.type_version == 3
    assert back.data == payload


def test_decode_all_textures():
    paths = glob.glob(f"{ASSETS}/*/texture/**/*.gtex", recursive=True)
    assert len(paths) > 10
    for p in paths:
        t = decode_gtex(p)
        assert t.pixels.shape == (t.height, t.width, 4)
        assert np.isfinite(t.pixels).all()


def test_decode_all_models():
    paths = glob.glob(f"{ASSETS}/*/model/**/*.gmdl", recursive=True)
    assert len(paths) > 5
    for p in paths:
        m = decode_gmdl(p)
        assert len(m.lods) >= 1
        assert m.lods[0].vertices.shape[1] == 12
        assert (m.aabb_extents >= 0).all()


def test_decode_cube_hull_is_cube():
    m = decode_gmdl(f"{ASSETS}/game/model/cube.gmdl")
    pts = np.concatenate([h["points"] + h["offset"][None] for h in m.hulls])
    assert np.allclose(np.abs(pts).max(0), [0.2, 0.2, 0.2], atol=1e-5)


def test_decode_materials():
    for p in glob.glob(f"{ASSETS}/*/material/**/*.gmtl", recursive=True):
        mm = decode_gmtl(p)
        assert mm.texture.endswith(".gtex")


def test_decode_all_gmaps():
    paths = glob.glob(f"{ASSETS}/game/map/*.gmap")
    assert len(paths) == 12
    for p in paths:
        g = decode_gmap(p)
        assert g.all_collision_tris().shape[1:] == (3, 3)
        assert g.lightmap.ndim == 3


def test_kvlist_binary_roundtrip():
    kv = {
        "a": Param(ParamType.INTEGER, -5),
        "b": Param(ParamType.FLOAT, 2.5),
        "c": Param(ParamType.BOOL, True),
        "d": Param(ParamType.STRING, "hi"),
        "e": Param(ParamType.COLOR, (1.0, 0.5, 0.25, 1.0)),
        "f": Param(ParamType.VEC2, (1.0, 2.0)),
        "g": Param(ParamType.ARRAY, [Param(ParamType.BYTE, 7)]),
        "h": Param(ParamType.KV_LIST, {"x": Param(ParamType.UINT_64, 42)}),
    }
    w = Writer()
    write_kvlist(w, kv)
    back = read_kvlist(Reader(w.getvalue()))
    assert back == kv
