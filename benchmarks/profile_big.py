"""Stage-level profile of the STREAMED (pallas_big) render path on the
chip — orb.gmap's 78k-triangle table. Materialized stage boundaries, so
each row is an upper bound on in-pipeline cost (cross-stage fusion lost):

  setup   - gather -> transform -> clip-compact -> tri16 pack + bboxes
  kernel  - raster_tiles_big z/winner pass (pass 1, no exclude)
  gather  - vattr[winner] attribute fetch + barycentric interp
  shade   - atlas/lightmap gathers + fragment math (pass-1 inputs)
  full    - the real fused render()  (what the benchmark measures)
  no_mip  - full render, mipmaps off
  no_rev  - full render, reveal-behind pass off

Usage: python benchmarks/profile_big.py [--batch 16] [--size 256]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import time

import jax
import jax.numpy as jnp

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.models.sim import reset_batch
from c_game_engine_tpu.render import raster
from c_game_engine_tpu.render.bundle import build_render_bundle


def timed(tag, fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:10s} {dt * 1e3:8.1f} ms/frame-batch", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--map", default="/root/reference/assets/game/map/orb.gmap")
    args = ap.parse_args()
    H = W = args.size

    cmap = compile_map(args.map)
    rb = build_render_bundle(cmap)
    state = reset_batch(cmap, args.batch)
    print(f"has_alpha={rb.has_alpha} live_bound={rb.live_tri_bound}", flush=True)

    from c_game_engine_tpu.ops.raster_tiles_big import (
        SUB, T_CHK, level_bboxes, raster_tiles_big,
    )

    def setup(env_state):
        vp, cam_pos = raster.camera_matrix(cmap, env_state, W, H)
        parts = raster.gather_triangles(rb, cmap, env_state, camera_pos_hint=cam_pos)
        ts = rb.sky_pos.shape[0]
        if ts:
            parts.insert(0, dict(
                pos=rb.sky_pos + cam_pos[None, None, :], uv=rb.sky_uv,
                lmuv=jnp.zeros((ts, 3, 2)), color=jnp.ones((ts, 3, 4)),
                tex=jnp.full((ts,), 1, jnp.int32) * rb.sky_tex,
                kind=jnp.full((ts,), raster.KIND_SKY, jnp.int32),
                shaded=jnp.zeros((ts,), bool),
                valid=jnp.full((ts,), rb.sky_tex >= 0),
                twosided=jnp.ones((ts,), bool),
            ))
        tri = raster._concat_parts(parts)
        t_total = tri["pos"].shape[0]
        pad = (-t_total) % raster.CHUNK
        if pad:
            tri = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)]), tri)
            tri["valid"] = tri["valid"].at[t_total:].set(False)
        pos_h = jnp.concatenate(
            [tri["pos"], jnp.ones((*tri["pos"].shape[:2], 1))], -1)
        clip = jnp.einsum("ij,tvj->tvi", vp, pos_h)
        clip, tri = raster._clip_near_compact(
            clip, tri, min(raster.CLIP_CAP, clip.shape[0]))
        w = clip[..., 3]
        inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        ndc = clip[..., :3] * inv_w[..., None]
        sx = (ndc[..., 0] + 1.0) * 0.5 * W
        sy = (ndc[..., 1] + 1.0) * 0.5 * H
        sz = ndc[..., 2]
        ok_w = jnp.all(w > 1e-5, axis=-1)
        area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
            sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0])
        front = (area2 < 0.0) | tri["twosided"]
        tri_ok = tri["valid"] & ok_w & front & (jnp.abs(area2) > 1e-9)
        t_act = sx.shape[0]
        pad_b = (-t_act) % T_CHK
        padc = lambda col, fill: (
            jnp.concatenate([col, jnp.full((pad_b,), fill, col.dtype)])
            if pad_b else col)
        big = jnp.float32(1e30)
        okf = lambda col, fill: padc(jnp.where(tri_ok, col, fill), fill)
        bxmin = okf(jnp.min(sx, 1), big)
        bxmax = okf(jnp.max(sx, 1), -big)
        bymin = okf(jnp.min(sy, 1), big)
        bymax = okf(jnp.max(sy, 1), -big)
        zcol = jnp.zeros((t_act + pad_b,), jnp.float32)
        tri16_t = jnp.stack([
            padc(sx[:, 0], 0), padc(sy[:, 0], 0), padc(sx[:, 1], 0),
            padc(sy[:, 1], 0), padc(sx[:, 2], 0), padc(sy[:, 2], 0),
            padc(sz[:, 0], 0), padc(sz[:, 1], 0), padc(sz[:, 2], 0), zcol,
            bxmin, bxmax, bymin, bymax, zcol, zcol], axis=0)
        cboxb = level_bboxes(bxmin, bxmax, bymin, bymax, T_CHK)
        scbb = level_bboxes(bxmin, bxmax, bymin, bymax, SUB)
        vattr = jnp.concatenate(
            [sx[..., None], sy[..., None], inv_w[..., None], sz[..., None],
             tri["uv"], tri["lmuv"], tri["color"]], -1).reshape(t_act, 36)
        return tri16_t, cboxb, scbb, vattr

    setup_j = jax.jit(jax.vmap(setup))
    outs = timed("setup", setup_j, state)

    def kernel(tri16_t, cboxb, scbb):
        return raster_tiles_big(tri16_t, cboxb, scbb, H, W)

    kernel_j = jax.jit(jax.vmap(kernel))
    zw = timed("kernel", kernel_j, outs[0], outs[1], outs[2])

    def fetch(vattr, winner):
        widx = jnp.clip(winner, 0, None)
        return vattr[widx]

    fetch_j = jax.jit(jax.vmap(fetch))
    ga36 = timed("g_fetch", fetch_j, outs[3], zw[1])

    def interp36(ga36, winner):
        ga = ga36.reshape(*winner.shape, 3, 12)
        px = jnp.arange(W, dtype=jnp.float32) + 0.5
        py = jnp.arange(H, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(px, py)
        v_sx, v_sy, v_iw = ga[..., 0], ga[..., 1], ga[..., 2]

        def edge_at(i, j):
            return (v_sx[..., j] - v_sx[..., i]) * (gy - v_sy[..., i]) - (
                v_sy[..., j] - v_sy[..., i]) * (gx - v_sx[..., i])

        e0, e1, e2 = edge_at(0, 1), edge_at(1, 2), edge_at(2, 0)
        denom = e0 + e1 + e2
        denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        b = jnp.stack([e1 / denom, e2 / denom, e0 / denom], -1)
        iw = jnp.sum(b * v_iw, -1)
        pw = 1.0 / jnp.maximum(iw, 1e-12)
        bw = (b * v_iw)[..., None]

        def interp(sl):
            return jnp.sum(ga[..., sl] * bw, axis=-2) * pw[..., None]

        return interp(slice(4, 6)), interp(slice(6, 8)), interp(slice(8, 12)), \
            jnp.sum(b * ga[..., 3], -1) * pw

    interp_j = jax.jit(jax.vmap(interp36))
    timed("g_interp", interp_j, ga36, zw[1])

    full = jax.jit(lambda s: raster.render_batch(rb, cmap, s, H, W))
    timed("full", full, state)
    no_mip = jax.jit(
        lambda s: raster.render_batch(rb, cmap, s, H, W, mipmaps=False))
    timed("no_mip", no_mip, state)
    rbna = rb.replace(has_alpha=False)
    no_rev = jax.jit(lambda s: raster.render_batch(rbna, cmap, s, H, W))
    timed("no_rev", no_rev, state)


if __name__ == "__main__":
    main()
