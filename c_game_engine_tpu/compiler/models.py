"""Compile-time model registry: resolves model/texture/material asset paths
through the game's search paths and extracts physics shapes + render data.

Search-path semantics follow game.gkvl (assets/game/game.gkvl: 'game' dir
relative to the config's parent, then 'assets/engine'; reference loader
engine/src/assets/AssetReader.c:37-75).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from c_game_engine_tpu.assets.codecs import (
    CollisionModelType,
    Model,
    decode_gmdl,
    decode_gmtl,
    decode_gtex,
    checkerboard_fallback,
    Texture,
)

DEFAULT_SEARCH_PATHS = (
    Path("/root/reference/assets/game"),
    Path("/root/reference/assets/engine"),
)


@dataclass
class ModelInfo:
    name: str
    model: Model
    # Collision approximation for the batched narrowphase: an oriented box.
    # Boxes are exact for cube.gmdl; convex hulls are approximated by their
    # AABB for now (TODO(round2): hull SAT narrowphase).
    box_halfext: np.ndarray  # [3]
    box_center: np.ndarray  # [3] box center in the body's local frame
    mass_default: float  # Jolt density-based default (1000 kg/m^3 * volume)


class AssetResolver:
    def __init__(self, search_paths=DEFAULT_SEARCH_PATHS):
        self.search_paths = [Path(p) for p in search_paths]
        self._models: dict[str, ModelInfo] = {}
        self._textures: dict[str, Texture] = {}
        self._materials: dict[str, object] = {}

    def resolve(self, rel: str) -> Path | None:
        if not rel:
            return None
        for base in self.search_paths:
            p = base / rel
            if p.is_file():
                return p
        return None

    def model(self, rel: str) -> ModelInfo:
        if rel in self._models:
            return self._models[rel]
        path = self.resolve(rel)
        if path is None:
            # error-model fallback (ModelLoader.c:29-32,240-249)
            path = self.resolve("model/error.gmdl")
        m = decode_gmdl(path)
        if m.collision_type == CollisionModelType.DYNAMIC and m.hulls:
            pts = np.concatenate([h["points"] + h["offset"][None] for h in m.hulls], axis=0)
            lo, hi = pts.min(0), pts.max(0)
            halfext = (hi - lo) * 0.5
            center = ((hi + lo) * 0.5).astype(np.float32)
        else:
            # JPH_BoxShape_Create(extents) is centered at the body origin
            # (ModelLoader.c:149 boundingBoxShape)
            halfext = m.aabb_extents.copy()
            center = np.zeros(3, np.float32)
        halfext = np.maximum(halfext.astype(np.float32), 1e-3)
        volume = float(8.0 * halfext[0] * halfext[1] * halfext[2])
        info = ModelInfo(rel, m, halfext, center, 1000.0 * volume)
        self._models[rel] = info
        return info

    def texture(self, rel: str) -> Texture:
        if rel in self._textures:
            return self._textures[rel]
        path = self.resolve(rel)
        tex = decode_gtex(path) if path is not None else checkerboard_fallback()
        self._textures[rel] = tex
        return tex

    def material(self, rel: str):
        if rel in self._materials:
            return self._materials[rel]
        path = self.resolve(rel)
        mat = decode_gmtl(path) if path is not None else None
        self._materials[rel] = mat
        return mat
