"""Run configuration, replacing the reference's 4 config tiers (SURVEY.md
§5): CMake defines -> compile-time constants here; game.gkvl -> GameConfig;
options.kvl -> Options; CLI flags -> argparse.

Options mirrors engine/src/structs/Options.c:32-175 field-for-field and
round-trips through the binary .kvl codec (options.kvl in the pref path)."""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field, asdict
from pathlib import Path

from c_game_engine_tpu.assets.container import Asset, AssetType, read_asset, write_asset
from c_game_engine_tpu.assets import kvlist as kv
from c_game_engine_tpu.assets.reader import Reader, Writer


@dataclass
class Options:
    # defaults per Options.c:20-45 (DefaultOptions)
    rpc: bool = True
    camera_speed: float = 1.0
    rumble: bool = True
    invert_horizontal_camera: bool = False
    invert_vertical_camera: bool = False
    swap_ok_cancel: bool = False
    fullscreen: bool = False
    vsync: bool = True
    msaa: int = 0
    mipmaps: bool = True
    prefer_wayland: bool = False
    limit_fps_when_unfocused: bool = True
    lod_multiplier: float = 1.0
    fov: float = 90.0
    anisotropy: int = 0
    max_fps: int = 0
    master_volume: float = 1.0
    music_volume: float = 1.0
    sfx_volume: float = 1.0
    ui_volume: float = 1.0

    def validate(self):
        # Options.c:55-100 bounds
        self.fov = min(max(self.fov, 30.0), 120.0)
        self.msaa = min(max(self.msaa, 0), 8)
        self.lod_multiplier = min(max(self.lod_multiplier, 0.25), 4.0)
        return self

    def to_kvlist(self):
        m = {
            "rpc": kv.Param(kv.ParamType.BOOL, self.rpc),
            "cameraSpeed": kv.Param(kv.ParamType.FLOAT, self.camera_speed),
            "rumble": kv.Param(kv.ParamType.BOOL, self.rumble),
            "invertHorizontalCamera": kv.Param(kv.ParamType.BOOL, self.invert_horizontal_camera),
            "invertVerticalCamera": kv.Param(kv.ParamType.BOOL, self.invert_vertical_camera),
            "swapOkCancel": kv.Param(kv.ParamType.BOOL, self.swap_ok_cancel),
            "fullscreen": kv.Param(kv.ParamType.BOOL, self.fullscreen),
            "vsync": kv.Param(kv.ParamType.BOOL, self.vsync),
            "msaa": kv.Param(kv.ParamType.INTEGER, self.msaa),
            "mipmaps": kv.Param(kv.ParamType.BOOL, self.mipmaps),
            "preferWayland": kv.Param(kv.ParamType.BOOL, self.prefer_wayland),
            "limitFpsWhenUnfocused": kv.Param(kv.ParamType.BOOL, self.limit_fps_when_unfocused),
            "lodMultiplier": kv.Param(kv.ParamType.FLOAT, self.lod_multiplier),
            "fov": kv.Param(kv.ParamType.FLOAT, self.fov),
            "anisotropy": kv.Param(kv.ParamType.INTEGER, self.anisotropy),
            "maxFps": kv.Param(kv.ParamType.INTEGER, self.max_fps),
            "masterVolume": kv.Param(kv.ParamType.FLOAT, self.master_volume),
            "musicVolume": kv.Param(kv.ParamType.FLOAT, self.music_volume),
            "sfxVolume": kv.Param(kv.ParamType.FLOAT, self.sfx_volume),
            "uiVolume": kv.Param(kv.ParamType.FLOAT, self.ui_volume),
        }
        return m

    @staticmethod
    def from_kvlist(m) -> "Options":
        o = Options(
            rpc=kv.get_bool(m, "rpc", True),
            camera_speed=kv.get_float(m, "cameraSpeed", 1.0),
            rumble=kv.get_bool(m, "rumble", True),
            invert_horizontal_camera=kv.get_bool(m, "invertHorizontalCamera", False),
            invert_vertical_camera=kv.get_bool(m, "invertVerticalCamera", False),
            swap_ok_cancel=kv.get_bool(m, "swapOkCancel", False),
            fullscreen=kv.get_bool(m, "fullscreen", False),
            vsync=kv.get_bool(m, "vsync", True),
            msaa=kv.get_int(m, "msaa", 0),
            mipmaps=kv.get_bool(m, "mipmaps", True),
            prefer_wayland=kv.get_bool(m, "preferWayland", False),
            limit_fps_when_unfocused=kv.get_bool(m, "limitFpsWhenUnfocused", True),
            lod_multiplier=kv.get_float(m, "lodMultiplier", 1.0),
            fov=kv.get_float(m, "fov", 90.0),
            anisotropy=kv.get_int(m, "anisotropy", 0),
            max_fps=kv.get_int(m, "maxFps", 0),
            master_volume=kv.get_float(m, "masterVolume", 1.0),
            music_volume=kv.get_float(m, "musicVolume", 1.0),
            sfx_volume=kv.get_float(m, "sfxVolume", 1.0),
            ui_volume=kv.get_float(m, "uiVolume", 1.0),
        )
        return o.validate()

    def save(self, path: str):
        w = Writer()
        kv.write_kvlist(w, self.to_kvlist())
        write_asset(path, Asset(AssetType.KV_LIST, 1, w.getvalue()))

    @staticmethod
    def load(path: str) -> "Options":
        if not Path(path).exists():
            return Options()
        a = read_asset(path)
        return Options.from_kvlist(kv.read_kvlist(Reader(a.data)))


@dataclass
class GameConfig:
    """game.gkvl (GameConfigLoader.c:102-145)."""

    title: str = "GAME"
    copyright: str = ""
    discord_app_id: int = 0
    background_map: str = ""
    search_paths: list = field(default_factory=list)  # [(path, allow_code_execution)]

    @staticmethod
    def load(path: str) -> "GameConfig":
        a = read_asset(path)
        m = kv.read_kvlist(Reader(a.data))
        paths = []
        for p in kv._get(m, "search_paths", kv.ParamType.ARRAY, []):
            sub = p.value
            paths.append(
                (
                    kv.get_string(sub, "search_path", ""),
                    kv.get_bool(sub, "allow_code_execution", False),
                    kv.get_string(sub, "path_type", ""),
                )
            )
        return GameConfig(
            title=kv.get_string(m, "game_title", "GAME"),
            copyright=kv.get_string(m, "game_copyright", ""),
            discord_app_id=kv._get(m, "discord_app_id", kv.ParamType.UINT_64, 0),
            background_map=kv.get_string(m, "background_map", ""),
            search_paths=paths,
        )


@dataclass
class RunConfig:
    """CLI for batched runs (replaces Arguments.h:10-45 flags that still
    apply headless)."""

    map: str = "/root/reference/assets/game/map/test.gmap"
    batch: int = 4096
    ticks: int = 240
    width: int = 256
    height: int = 256
    render: bool = False
    devices: int = 0  # 0 = all
    seed: int = 0

    @staticmethod
    def from_cli(argv=None) -> "RunConfig":
        ap = argparse.ArgumentParser()
        d = RunConfig()
        ap.add_argument("--map", default=d.map)
        ap.add_argument("--batch", type=int, default=d.batch)
        ap.add_argument("--ticks", type=int, default=d.ticks)
        ap.add_argument("--width", type=int, default=d.width)
        ap.add_argument("--height", type=int, default=d.height)
        ap.add_argument("--render", action="store_true")
        ap.add_argument("--devices", type=int, default=0)
        ap.add_argument("--seed", type=int, default=0)
        ns = ap.parse_args(argv)
        return RunConfig(**vars(ns))
