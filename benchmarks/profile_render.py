"""Stage-level profile of the batched render pipeline on the current
backend (run on the TPU chip). Splits render() into jitted composite
stages with materialized boundaries, so each row is an upper bound on the
stage's in-pipeline cost (fusion across the cut is lost):

  setup  - gather_triangles -> transform -> cull-compact -> clip ->
           tri48 pack + bin_triangles
  kernel - raster_tiles_pallas (fused z+attr tile kernel)
  shade  - atlas/lightmap gathers + fragment math
  full   - the real fused render() (what the benchmark measures)

Usage: python benchmarks/profile_render.py [--batch 64] [--size 256]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from c_game_engine_tpu.compiler.compile import compile_map
from c_game_engine_tpu.models.sim import reset_batch
from c_game_engine_tpu.render import raster
from c_game_engine_tpu.render.bundle import build_render_bundle


def timed(fn, *args, n=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--map", default="/root/reference/assets/game/map/test.gmap")
    args = ap.parse_args()
    H = W = args.size

    cmap = compile_map(args.map)
    rb = build_render_bundle(cmap)
    state = reset_batch(cmap, args.batch)

    from c_game_engine_tpu.ops.raster_tiles import bin_triangles, raster_tiles_pallas

    def setup(env_state):
        """Everything before the kernel, for one env (vmapped below)."""
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
                twosided=jnp.ones((ts,), bool)))
        tri = raster._concat_parts(parts)
        return tri

    f_setup = jax.jit(jax.vmap(setup))
    dt, tri_b = timed(f_setup, state)
    print(f"gather+concat      {dt*1e3:8.1f} ms")

    f_full = jax.jit(jax.vmap(lambda e: raster.render(rb, cmap, e, H, W)))
    dt_full, _ = timed(f_full, state)
    print(f"FULL render        {dt_full*1e3:8.1f} ms "
          f"({args.batch/dt_full:.1f} frames/s/chip)")

    # cut the pipeline right before the kernel: produce tri48/idx/cnt
    def pre_kernel(env_state):
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
                twosided=jnp.ones((ts,), bool)))
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
        w0 = clip[..., 3]
        any_pos = jnp.any(w0 > 0.01, axis=-1)
        all_pos = jnp.all(w0 > 0.01, axis=-1)
        inv_w0 = 1.0 / jnp.where(jnp.abs(w0) > 1e-9, w0, 1e-9)
        sx0 = (clip[..., 0] * inv_w0 + 1.0) * 0.5 * W
        sy0 = (clip[..., 1] * inv_w0 + 1.0) * 0.5 * H
        area0 = (sx0[:, 1] - sx0[:, 0]) * (sy0[:, 2] - sy0[:, 0]) - (
            sy0[:, 1] - sy0[:, 0]) * (sx0[:, 2] - sx0[:, 0])
        front0 = (area0 < 0.0) | tri["twosided"]
        keep = tri["valid"] & any_pos & (~all_pos | (front0 & (jnp.abs(area0) > 1e-9)))
        t = keep.shape[0]
        cap = min(t, raster.T_CULL)
        order = jnp.sort(jnp.where(keep, jnp.arange(t, dtype=jnp.int32), t))[:cap]
        safe = jnp.minimum(order, t - 1)
        tri = {k: v[safe] for k, v in tri.items()}
        tri["valid"] = tri["valid"] & (order < t)
        clip = clip[safe]
        clip, tri = raster._clip_near(clip, tri)
        w = clip[..., 3]
        ok_w = jnp.all(w > 1e-5, axis=-1)
        inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        ndc = clip[..., :3] * inv_w[..., None]
        sx = (ndc[..., 0] + 1.0) * 0.5 * W
        sy = (ndc[..., 1] + 1.0) * 0.5 * H
        sz = ndc[..., 2]
        is_sky = tri["kind"] == raster.KIND_SKY
        sz = jnp.where(is_sky[:, None], 0.999999, sz)
        area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
            sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0])
        front = (area2 < 0.0) | tri["twosided"]
        tri_ok = tri["valid"] & ok_w & front & (jnp.abs(area2) > 1e-9)
        tex_wh = rb.atlas.table[jnp.clip(tri["tex"], 0, None)][:, 2:4]
        du1 = (tri["uv"][:, 1] - tri["uv"][:, 0]) * tex_wh
        du2 = (tri["uv"][:, 2] - tri["uv"][:, 0]) * tex_wh
        texel_area = jnp.abs(du1[:, 0] * du2[:, 1] - du1[:, 1] * du2[:, 0])
        lod = 0.5 * jnp.log2(jnp.maximum(texel_area, 1e-12)
                             / jnp.maximum(jnp.abs(area2), 1e-12))
        lod_q = jnp.clip(jnp.round(lod * 4.0), 0, 63).astype(jnp.int32)
        enc = ((tri["tex"] + 1) | (tri["kind"] << 12)
               | (tri["shaded"].astype(jnp.int32) << 14) | (lod_q << 15))
        t_act = sx.shape[0]
        cols = [sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
                sz[:, 0], sz[:, 1], sz[:, 2],
                jnp.arange(t_act, dtype=jnp.float32),
                inv_w[:, 0], inv_w[:, 1], inv_w[:, 2],
                tri["uv"][:, 0, 0], tri["uv"][:, 0, 1],
                tri["uv"][:, 1, 0], tri["uv"][:, 1, 1],
                tri["uv"][:, 2, 0], tri["uv"][:, 2, 1],
                tri["lmuv"][:, 0, 0], tri["lmuv"][:, 0, 1],
                tri["lmuv"][:, 1, 0], tri["lmuv"][:, 1, 1],
                tri["lmuv"][:, 2, 0], tri["lmuv"][:, 2, 1]]
        for vtx in range(3):
            for ch in range(4):
                cols.append(tri["color"][:, vtx, ch])
        cols.append(enc.astype(jnp.float32))
        tri48 = jnp.stack(cols + [jnp.zeros_like(sx[:, 0])] * (48 - len(cols)), -1)
        idx, cnt = bin_triangles(sx, sy, tri_ok, H, W)
        return tri48, idx, cnt

    f_pre = jax.jit(jax.vmap(pre_kernel))
    dt, (tri48_b, idx_b, cnt_b) = timed(f_pre, state)
    print(f"setup (pre-kernel) {dt*1e3:8.1f} ms")

    f_kern = jax.jit(jax.vmap(
        lambda t48, i, c: raster_tiles_pallas(t48, i, c, H, W)))
    dt, outs_b = timed(f_kern, tri48_b, idx_b, cnt_b)
    print(f"kernel             {dt*1e3:8.1f} ms")

    px = jnp.arange(W, dtype=jnp.float32) + 0.5
    py = jnp.arange(H, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py)

    def shade_stage(env_state, outs):
        (_zb, winner, frag_depth, uv_u, uv_v, lm_u, lm_v,
         cr, cg, cb, ca, genc) = outs
        uv = jnp.stack([uv_u, uv_v], -1)
        lmuv = jnp.stack([lm_u, lm_v], -1)
        color = jnp.stack([cr, cg, cb, ca], -1)
        tex_id = (genc & 0xFFF) - 1
        kind = (genc >> 12) & 3
        shaded = ((genc >> 14) & 1).astype(bool)
        lod_pix = ((genc >> 15) & 63).astype(jnp.float32) * 0.25
        rgb, disc = raster.shade(rb, env_state, gx, gy, uv, lmuv, color,
                                 tex_id, kind, shaded, frag_depth, lod=lod_pix)
        return rgb

    f_shade = jax.jit(jax.vmap(shade_stage))
    dt, _ = timed(f_shade, state, outs_b)
    print(f"shade              {dt*1e3:8.1f} ms")

    # shade without mip chain (single-tap bilinear)
    def shade_nomip(env_state, outs):
        (_zb, winner, frag_depth, uv_u, uv_v, lm_u, lm_v,
         cr, cg, cb, ca, genc) = outs
        uv = jnp.stack([uv_u, uv_v], -1)
        lmuv = jnp.stack([lm_u, lm_v], -1)
        color = jnp.stack([cr, cg, cb, ca], -1)
        tex_id = (genc & 0xFFF) - 1
        kind = (genc >> 12) & 3
        shaded = ((genc >> 14) & 1).astype(bool)
        rgb, disc = raster.shade(rb, env_state, gx, gy, uv, lmuv, color,
                                 tex_id, kind, shaded, frag_depth, lod=None)
        return rgb

    f_shade0 = jax.jit(jax.vmap(shade_nomip))
    dt, _ = timed(f_shade0, state, outs_b)
    print(f"shade (no mip)     {dt*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
