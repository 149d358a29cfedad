"""Golden-frame regression (TPU only: CPU compile of the full rasterizer is
too slow for CI). Regenerate with /tmp-style script in benchmarks or
`python benchmarks/render_goldens.py` equivalents; stats in
tests/goldens/stats.json."""

import json
import pathlib

import jax
import pytest

GOLDENS = pathlib.Path(__file__).parent / "goldens"


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only golden render")
def test_render_matches_goldens():
    import hashlib
    import numpy as np
    from c_game_engine_tpu.compiler.compile import compile_map
    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render_with_hud

    stats = json.loads((GOLDENS / "stats.json").read_text())
    for name in ["test", "advanced_doors"]:
        cm = compile_map(f"/root/reference/assets/game/map/{name}.gmap")
        rb = build_render_bundle(cm)
        st = reset(cm)
        sfn = jax.jit(lambda s, a, _cm=cm: step(_cm, s, a))
        for _ in range(30):
            st = sfn(st, Actions.zeros())
        img = np.asarray(jax.jit(lambda s: render_with_hud(rb, cm, s, 128, 128))(st))
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        sha = hashlib.sha1(u8.tobytes()).hexdigest()[:16]
        assert abs(float(img.mean()) - stats[name]["mean"]) < 0.02, name
