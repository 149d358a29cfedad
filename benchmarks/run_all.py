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

from c_game_engine_tpu.compiler.cache import load_compiled
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


def _floor_height(soup, px, pz, default):
    """Highest up-facing collision triangle under (px, pz), by 2D
    point-in-triangle over the XZ projection + plane-equation height."""
    a, b, c = soup[:, 0], soup[:, 1], soup[:, 2]
    n = np.cross(b - a, c - a)
    up = n[:, 1] > 0.5 * np.linalg.norm(n, axis=-1).clip(1e-9)
    d = np.stack([px - a[:, 0], pz - a[:, 2]], -1)
    e1 = np.stack([b[:, 0] - a[:, 0], b[:, 2] - a[:, 2]], -1)
    e2 = np.stack([c[:, 0] - a[:, 0], c[:, 2] - a[:, 2]], -1)
    det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    det = np.where(np.abs(det) > 1e-12, det, 1e-12)
    u = (d[:, 0] * e2[:, 1] - d[:, 1] * e2[:, 0]) / det
    v = (e1[:, 0] * d[:, 1] - e1[:, 1] * d[:, 0]) / det
    inside = up & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6)
    if not inside.any():
        return default
    y = a[:, 1] - (n[:, 0] * (px - a[:, 0]) + n[:, 2] * (pz - a[:, 2])) / np.where(
        np.abs(n[:, 1]) > 1e-9, n[:, 1], 1e-9
    )
    return float(y[inside].max())


def compile_with_stack(path, n=4):
    """stacked.gmap ships ZERO actors (its content is sector CSG); the
    BASELINE "stacked" config is a resting-stack benchmark, so inject n
    prop_physbox rows into the decoded IR at compile time — real dynamic
    bodies dropped as a vertical stack over the floor near the spawn.
    (The previous helper tried to MOVE dynamic rows, and with none in the
    map benchmarked an empty world — VERDICT r4 weak #2.) n=4 since the
    round-5 contact warm start (PARITY #20): the cold fixed-sweep Jacobi
    solve topped out at 3 (a 4-box stack sagged ~7 cm and chattered at
    0.13 m/s forever); warm-started it settles rigid and reaches
    whole-stack sleep (tests/test_stacking.py). 6+ still exceeds the
    6-sweep chain depth (PARITY #20)."""
    from c_game_engine_tpu.assets.gmap import MapActor, decode_gmap

    g = decode_gmap(path)
    spawn = (
        g.player_spawn.position if g.player_spawn is not None else np.zeros(3)
    )
    px, pz = float(spawn[0]) + 1.5, float(spawn[2])
    floor = _floor_height(
        g.all_collision_tris(), px, pz, default=float(spawn[1]) - 1.0
    )
    for i in range(n):
        g.actors.append(
            MapActor(
                "prop_physbox",
                np.array([px, floor + 0.3 + 0.46 * i, pz], np.float32),
                np.zeros(3, np.float32),
                [],
                {},
            )
        )
    return compile_map(g, name=str(path))


def bench_config(name, path, batch, ticks):
    if name == "stacked":
        cmap = compile_with_stack(path)
        assert cmap.aux["num_dynamic"] >= 4, cmap.aux["num_dynamic"]
    else:
        cmap, _ = load_compiled(path, with_bundle=False)
    state = reset_batch(cmap, batch)
    acts = Actions.zeros((ticks, batch))
    if name != "stacked":
        acts = acts.replace(
            move=acts.move.at[..., 1].set(-1.0), look=acts.look.at[..., 0].set(0.01)
        )
    # stacked = RESTING STABILITY (BASELINE.json): the player stands still
    # while the injected stack drops, settles, and reaches whole-stack
    # sleep — measuring the full contact solve during settling and the
    # sleep-gated steady state after. A walking player would grind the
    # stack forever and measure interaction cost instead (shapes covers
    # live body/player contact).
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

    from c_game_engine_tpu.render.raster import render_batch

    cmap, rb = load_compiled(path)
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
    # warmup + CONTENT CHECK: every sweep heading must draw geometry.
    # Guards the frames/s number against an empty-render regression — the
    # r2-r4 shapes rows measured 125 f/s of pure sky (VERDICT r4 weak #1).
    covs = []
    for sk in states:
        u8 = (np.clip(np.asarray(rfn(sk))[0], 0, 1) * 255).astype(np.uint8)
        ref = u8[0, 0].astype(np.int32)
        covs.append(float((np.abs(u8.astype(np.int32) - ref).sum(-1) > 12).mean()))
    min_cov = min(covs)
    # Anti-empty-frame tripwire; an empty-render regression scores ~0.00x
    # on maps that show geometry. Two maps are legitimately uniform at
    # some/all headings and are exempt: max_box (every wall beyond
    # fog_end -> pure fog) and art (an unlit gallery — pitch black away
    # from the exhibits). Their CONTENT is still verified against CPU by
    # the cpu256 golden suite; this floor only guards the timed rows.
    floor = 0.0 if name in ("max_box", "art") else 0.03
    assert min_cov >= floor, f"{name}: sweep frame non-sky coverage {min_cov:.3f}"
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
        "min_nonsky_coverage": round(min_cov, 4),
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

    # render-only rows: orb's 78k-triangle hull model routes to the
    # chunked streamed kernel (backend="pallas_big", smaller batch);
    # music/camera/art are golden-only maps with no BASELINE physics
    # config but still need a perf + content datapoint (VERDICT r4 #7)
    render_only = {
        "orb": (f"{GMAPS}/orb.gmap", min(16, args.render_batch)),
        "music": (f"{GMAPS}/music.gmap", args.render_batch),
        "camera": (f"{GMAPS}/camera.gmap", args.render_batch),
        "art": (f"{GMAPS}/art.gmap", args.render_batch),
    }
    if args.render:
        for rname, (rpath, rbatch) in render_only.items():
            if only and rname not in only:
                continue
            rr = bench_render(rname, rpath, rbatch, args.render_frames)
            results.append(rr)
            print(
                f"{rname + '_render':16s} {rr['frames_per_sec_per_chip']:>14,.0f} "
                f"frames/s/chip (256x256, batch {rr['batch']})",
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
