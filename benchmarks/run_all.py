"""Benchmark harness over the BASELINE configs (BASELINE.md / BASELINE.json).

Usage: python benchmarks/run_all.py [--batch 4096] [--ticks 240] [--render]
Writes a markdown table to stdout and benchmarks/results.json.

Physics configs (BASELINE.json pairs advanced_doors+button and
max_box+too_many_lights):
  test            headless fixed-timestep tick + physics
  shapes          collider variety
  stacked         resting stability (physbox stack spawned programmatically)
  advanced_doors  kinematic doors + triggers + hitscan
  button          interactable I/O wiring
  max_box         max-extent sector stress (compiled from mapSources JSON)
  too_many_lights 36-point-light bake stress

--render additionally benchmarks frame throughput (256x256 frames/s/chip,
batch 64 — the cull/bin intermediates scale with batch x triangle soup and
batch 64 already saturates the chip; see BASELINE.md) on each config, plus
a render-only `orb` row (78k-triangle model -> the chunked streamed kernel,
backend="pallas_big"; batch 16 — the per-env streamed tables and clip-stage
intermediates are 40x the other maps').

NOTE: small/dispatch-bound configs are only valid run in isolation — a
concurrent host workload costs them ~25% (BASELINE.md round-1 note).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import reset_batch, rollout

GMAPS = "/root/reference/assets/game/map"
JSONS = "/root/reference/mapSources"

CONFIGS = {
    "test": f"{GMAPS}/test.gmap",
    "shapes": f"{GMAPS}/shapes.gmap",
    "stacked": f"{GMAPS}/stacked.gmap",
    "advanced_doors": f"{GMAPS}/advanced_doors.gmap",
    "button": f"{GMAPS}/button.gmap",
    "max_box": f"{JSONS}/max_box.json",  # no shipped .gmap; our JSON compiler
    "too_many_lights": f"{GMAPS}/too_many_lights.gmap",
}


def spawn_stack(cmap, state, n=4):
    """stacked.json ships no actors (SURVEY.md §6); when benchmarking it we
    drop the map's dynamic bodies into a vertical stack."""
    import numpy as np

    rows = np.where(np.asarray(cmap.motion) == 3)[0]
    if len(rows) == 0:
        return state
    pos = state.actors.pos
    for i, r in enumerate(rows):
        pos = pos.at[:, r].set(jnp.array([0.0, 0.5 + 0.5 * i, 0.0]))
    return state.replace(actors=state.actors.replace(pos=pos))


def bench_config(name, path, batch, ticks):
    cmap = compile_map(path)
    state = reset_batch(cmap, batch)
    if name == "stacked":
        state = spawn_stack(cmap, state)
    acts = Actions.zeros((ticks, batch))
    acts = acts.replace(
        move=acts.move.at[..., 1].set(-1.0), look=acts.look.at[..., 0].set(0.01)
    )
    roll = jax.jit(lambda s, a: rollout(cmap, s, a))
    out = roll(state, acts)  # warmup: same shapes as the timed call
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = roll(state, acts)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    sps = batch * ticks / dt
    return {
        "config": name,
        "batch": batch,
        "ticks": ticks,
        "wall_s": round(dt, 3),
        "steps_per_sec_per_chip": round(sps, 1),
        "actors": cmap.aux["num_real_actors"],
        "tris": cmap.aux["num_real_tris"],
    }


def bench_render(name, path, batch, frames, size=256):
    """Frame throughput over a SCRIPTED CAMERA SWEEP: each timed frame
    renders the spawn state rotated to a different yaw (k * 2pi/frames),
    so view-dependent costs (cull/compaction loads, per-tile binning,
    chunk-bbox pruning) are averaged over headings instead of measured at
    one lucky pose."""
    import numpy as np

    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render_batch

    cmap = compile_map(path)
    rb = build_render_bundle(cmap)
    state = reset_batch(cmap, batch)
    states = [
        state.replace(
            player=state.player.replace(
                yaw=state.player.yaw + k * (2.0 * np.pi / max(frames, 1))
            )
        )
        for k in range(frames)
    ]
    rfn = jax.jit(lambda s: render_batch(rb, cmap, s, size, size))
    img = rfn(states[-1])
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for sk in states:
        img = rfn(sk)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    fps = batch * frames / dt
    return {
        "config": f"{name}_render",
        "batch": batch,
        "frames": frames,
        "size": size,
        "wall_s": round(dt, 3),
        "frames_per_sec_per_chip": round(fps, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ticks", type=int, default=240)
    ap.add_argument("--render", action="store_true", help="also benchmark frame throughput")
    ap.add_argument("--render-batch", type=int, default=64)
    ap.add_argument("--render-frames", type=int, default=4)
    ap.add_argument("--only", type=str, default=None, help="comma-separated config subset")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    results = []
    for name, path in CONFIGS.items():
        if only and name not in only:
            continue
        r = bench_config(name, path, args.batch, args.ticks)
        results.append(r)
        print(
            f"{name:16s} {r['steps_per_sec_per_chip']:>14,.0f} steps/s/chip "
            f"({r['actors']} actors, {r['tris']} tris)",
            flush=True,
        )
        if args.render:
            rr = bench_render(name, path, args.render_batch, args.render_frames)
            results.append(rr)
            print(
                f"{name + '_render':16s} {rr['frames_per_sec_per_chip']:>14,.0f} frames/s/chip "
                f"(256x256, batch {rr['batch']})",
                flush=True,
            )

    if args.render and (only is None or "orb" in only):
        # render-only: orb's 78k-triangle hull model routes to the chunked
        # streamed kernel (backend="pallas_big"); physics steps/s is not a
        # BASELINE config for it
        rr = bench_render("orb", f"{GMAPS}/orb.gmap", min(16, args.render_batch),
                          args.render_frames)
        results.append(rr)
        print(
            f"{'orb_render':16s} {rr['frames_per_sec_per_chip']:>14,.0f} frames/s/chip "
            f"(256x256, batch {rr['batch']})",
            flush=True,
        )

    out = Path(__file__).parent / "results.json"
    prev = json.loads(out.read_text()) if out.exists() and only else None
    if prev:  # partial run: merge over the previous full table
        merged = {r["config"]: r for r in prev.get("results", [])}
        for r in results:
            merged[r["config"]] = r
        results = list(merged.values())
    out.write_text(json.dumps({"device": str(jax.devices()[0]), "results": results}, indent=1))
    print(f"\nwritten {out}")


if __name__ == "__main__":
    main()
