"""Golden-frame regression with per-pixel assertions.

Two golden sets (regenerate with `python benchmarks/render_goldens.py
[cpu|tpu]`):
  goldens/cpu128/  3 maps at 128x128 — compared in regular (CPU) CI
  goldens/tpu256/  all 9 maps at 256x256 (the BASELINE.json resolution) —
                   TPU-only

Tolerances are chosen to bite: flipping any shade() term (fog, lightmap,
exposure, dither, vertex color) shifts most pixels and fails; only
recompile-level float jitter (which can flip a handful of screen-door
dither discards sitting exactly on the hash threshold) passes.
"""

import json
import pathlib

import jax
import numpy as np
import pytest

GOLDENS = pathlib.Path(__file__).parent / "goldens"

# fraction of pixels allowed to differ by >1 u8 step, and mean abs error cap
PIXEL_FRAC_TOL = 0.002
MAE_TOL = 0.0015


def _render(name, size):
    from c_game_engine_tpu.compiler.compile import compile_map
    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render_with_hud

    cm = compile_map(f"/root/reference/assets/game/map/{name}.gmap")
    rb = build_render_bundle(cm)
    st = reset(cm)
    sfn = jax.jit(lambda s, a, _cm=cm: step(_cm, s, a))
    for _ in range(30):
        st = sfn(st, Actions.zeros())
    img = np.asarray(jax.jit(lambda s: render_with_hud(rb, cm, s, size, size))(st))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def _assert_matches(u8, golden_png, name):
    from PIL import Image

    ref = np.asarray(Image.open(golden_png))
    assert ref.shape == u8.shape, (name, ref.shape, u8.shape)
    diff = np.abs(u8.astype(np.int32) - ref.astype(np.int32))
    frac_off = float((diff > 1).mean())
    mae = float(diff.mean()) / 255.0
    assert frac_off <= PIXEL_FRAC_TOL, f"{name}: {frac_off:.4%} pixels differ >1 step"
    assert mae <= MAE_TOL, f"{name}: MAE {mae:.5f}"


@pytest.mark.parametrize("name", ["test", "advanced_doors", "shapes"])
def test_render_matches_cpu_goldens(name):
    if jax.default_backend() != "cpu":
        pytest.skip("cpu128 goldens are CPU-rendered")
    u8 = _render(name, 128)
    _assert_matches(u8, GOLDENS / "cpu128" / f"{name}.png", name)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only golden render")
def test_render_matches_tpu_goldens():
    stats = json.loads((GOLDENS / "tpu256" / "stats.json").read_text())
    for name in stats:
        u8 = _render(name, 256)
        _assert_matches(u8, GOLDENS / "tpu256" / f"{name}.png", name)
