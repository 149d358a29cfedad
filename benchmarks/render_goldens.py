"""Regenerate golden frames for tests/test_goldens.py.

Two golden sets:
  cpu128/  3 maps at 128x128, rendered on the CPU backend — compared
           per-pixel in regular (CPU) CI, so any shading change bites.
  tpu256/  all 9 maps at 256x256 (the BASELINE.json target resolution),
           rendered on a real TPU chip — checked by the TPU-only test.

Usage: python benchmarks/render_goldens.py [cpu|tpu]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDENS = Path(__file__).resolve().parent.parent / "tests" / "goldens"
GMAPS = "/root/reference/assets/game/map"

CPU_MAPS = ["test", "advanced_doors", "shapes"]
TPU_MAPS = [
    "test",
    "shapes",
    "advanced_doors",
    "button",
    "stacked",
    "camera",
    "music",
    "orb",
    "art",
]
WARMUP_TICKS = 30


def render_map(name: str, size: int):
    import jax
    import numpy as np

    from c_game_engine_tpu.compiler.compile import compile_map
    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render_with_hud

    cm = compile_map(f"{GMAPS}/{name}.gmap")
    rb = build_render_bundle(cm)
    st = reset(cm)
    sfn = jax.jit(lambda s, a, _cm=cm: step(_cm, s, a))
    for _ in range(WARMUP_TICKS):
        st = sfn(st, Actions.zeros())
    img = np.asarray(jax.jit(lambda s: render_with_hud(rb, cm, s, size, size))(st))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if backend == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        maps, size, sub = CPU_MAPS, 128, "cpu128"
    else:
        import jax

        assert jax.default_backend() == "tpu", jax.default_backend()
        maps, size, sub = TPU_MAPS, 256, "tpu256"

    from PIL import Image

    outdir = GOLDENS / sub
    outdir.mkdir(parents=True, exist_ok=True)
    stats = {}
    for name in maps:
        u8 = render_map(name, size)
        Image.fromarray(u8).save(outdir / f"{name}.png")
        stats[name] = {
            "mean": round(float(u8.mean() / 255.0), 4),
            "sha": hashlib.sha1(u8.tobytes()).hexdigest()[:16],
        }
        print(f"{sub}/{name}.png mean={stats[name]['mean']} sha={stats[name]['sha']}")
    (outdir / "stats.json").write_text(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
