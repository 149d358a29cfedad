"""Compiled-map disk cache.

`compile_map` + `build_render_bundle` are host-side (numpy) pipelines that
take seconds on CPU and *minutes* under the axon TPU backend (host jnp ops
round-trip the device tunnel per op). The reference engine re-parses maps
from disk per load too (MapLoader.c) but its loads are milliseconds; ours
are the dominant cost of every test/benchmark process. This cache pickles
the finished CompiledMap/RenderBundle pytrees with numpy leaves so any
process (CPU or TPU) can load a compiled map in ~100 ms.

Invalidation: the cache key hashes the map file (path, mtime, size), the
search paths, and a package fingerprint (mtimes of the compiler/assets/
render source files), so editing the compiler or the map invalidates
automatically. Delete `.cache/maps/` to force a full rebuild.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path

import jax
import numpy as np

_REPO = Path(__file__).resolve().parents[2]
CACHE_DIR = Path(os.environ.get("CGE_MAP_CACHE_DIR", _REPO / ".cache" / "maps"))

# package files whose edits must invalidate cached maps
_FINGERPRINT_GLOBS = [
    "c_game_engine_tpu/compiler/*.py",
    "c_game_engine_tpu/assets/*.py",
    "c_game_engine_tpu/render/bundle.py",
    "c_game_engine_tpu/render/textures.py",
    "c_game_engine_tpu/render/hud.py",
    "c_game_engine_tpu/ui/stack.py",
    "c_game_engine_tpu/audio/*.py",
    "c_game_engine_tpu/core/state.py",
    "c_game_engine_tpu/actors/*.py",
]

_pkg_fp_cache: str | None = None


def _package_fingerprint() -> str:
    global _pkg_fp_cache
    if _pkg_fp_cache is None:
        h = hashlib.sha1()
        for pat in _FINGERPRINT_GLOBS:
            for p in sorted(_REPO.glob(pat)):
                if p.name == "cache.py":  # this module doesn't affect content
                    continue
                st = p.stat()
                h.update(f"{p.name}:{st.st_mtime_ns}:{st.st_size};".encode())
        _pkg_fp_cache = h.hexdigest()[:16]
    return _pkg_fp_cache


def _key(source: str, search_paths) -> str:
    h = hashlib.sha1()
    h.update(_package_fingerprint().encode())
    p = Path(source)
    st = p.stat()
    h.update(f"{p.resolve()}:{st.st_mtime_ns}:{st.st_size}".encode())
    for sp in search_paths:
        h.update(str(sp).encode())
    return f"{p.stem}-{h.hexdigest()[:16]}"


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "dtype") else x, tree)


def load_compiled(source: str, search_paths=None, with_bundle: bool = True):
    """Load (cmap, bundle) for a `.gmap`/`.json` path, from the disk cache
    when fresh, compiling + caching otherwise. `with_bundle=False` returns
    (cmap, None) but still caches the bundle for later callers.

    Cache files hold numpy leaves (backend-neutral); loading converts them
    to device arrays, so the same file serves CPU and TPU processes.
    """
    from c_game_engine_tpu.compiler.compile import DEFAULT_SEARCH_PATHS, compile_map

    import jax.numpy as jnp

    to_dev = lambda tree: jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )
    sp = DEFAULT_SEARCH_PATHS if search_paths is None else search_paths
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    path = CACHE_DIR / f"{_key(source, sp)}.pkl"
    if path.is_file():
        try:
            with open(path, "rb") as f:
                cmap, bundle = pickle.load(f)
            return to_dev(cmap), (to_dev(bundle) if with_bundle else None)
        except Exception:  # corrupt/stale cache entry: rebuild
            path.unlink(missing_ok=True)

    cmap = compile_map(source, search_paths=sp)
    from c_game_engine_tpu.render.bundle import build_render_bundle

    bundle = build_render_bundle(cmap)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "wb") as f:
        pickle.dump((_to_numpy(cmap), _to_numpy(bundle)), f, protocol=4)
    os.replace(tmp, path)
    return cmap, (bundle if with_bundle else None)
