"""Focused timing of the shade stage's gather cost (run on the TPU chip).

Times full render at B envs with: trilinear mips, mips off, and the
reveal pass force-disabled — isolating the two features that dropped
frame throughput between the mid-round-2 and final sweeps.

Usage: python benchmarks/profile_shade.py [--batch 32]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import time

import jax

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.models.sim import reset_batch
from c_game_engine_tpu.render.bundle import build_render_bundle
from c_game_engine_tpu.render.raster import render_batch


def timed(tag, fn, state, n=4):
    out = fn(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(state)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    b = state.tick.shape[0]
    print(f"{tag:28s} {dt * 1e3:8.1f} ms  ({b / dt:7.1f} frames/s/chip)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--map", default="/root/reference/assets/game/map/test.gmap")
    args = ap.parse_args()
    H = W = args.size

    cmap = compile_map(args.map)
    rb = build_render_bundle(cmap)
    state = reset_batch(cmap, args.batch)

    timed("full (mip + reveal)",
          jax.jit(jax.vmap(lambda e: render(rb, cmap, e, H, W))), state)
    timed("mipmaps off",
          jax.jit(jax.vmap(lambda e: render(rb, cmap, e, H, W, mipmaps=False))),
          state)
    rb_noalpha = rb.replace(has_alpha=False)
    timed("reveal off",
          jax.jit(jax.vmap(lambda e: render(rb_noalpha, cmap, e, H, W))), state)
    timed("both off",
          jax.jit(jax.vmap(lambda e: render(rb_noalpha, cmap, e, H, W,
                                            mipmaps=False))), state)


if __name__ == "__main__":
    main()
