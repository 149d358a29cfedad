"""Pallas TPU kernel: tile-based rasterization (z-buffer pass + in-kernel
attribute interpolation).

Replaces the XLA reference renderer's pass 1 AND the gather-heavy half of
pass 2 (render/raster.py). The framebuffer is processed in (8, 128) VMEM
tiles; an XLA-side binning pass (bin_triangles) hands every tile a
compacted index list of the triangles whose screen bbox overlaps it, and
the kernel runs two dynamic-trip loops over that list:

  one fused loop: edge functions + affine z -> strictly-closer z test;
          where a triangle improves any pixel, a lax.cond-gated branch
          interpolates its perspective-corrected attributes (uv,
          lightmap uv, color, frag depth, encoded tex/kind/shaded) and
          selects them under the closer mask. Formulas are written
          identically to the XLA pass-2 (render/raster.py), so both
          backends shade the same image; the last strictly-closer
          triangle's attributes survive = the z-winner's (same result
          as a separate winner pass). Fully-occluded or off-tile
          triangles skip the attribute math and its ~28 scalar reads
          entirely.

Triangle data stays in one VMEM-resident table [T, 48] (f32; lane-padded
to 128 regardless of the column count, so 48 columns cost the same VMEM
as 16) indexed by dynamic SUBLANE reads — the old per-tile pre-gather
([NTy, NTx, L, 16] HBM blocks) was the single most expensive XLA stage at
batch and is gone entirely.

Mosaic notes that shaped this kernel:
  * a scalar read at a dynamic SUBLANE index with a static lane column
    compiles fine — triangle = sublane, field = lane.
  * per-tile index lists live in SMEM ((1, 1, L) blocks, ~2 KB/tile).

Column layout (f32): 0-5 sx0 sy0 sx1 sy1 sx2 sy2 | 6-8 z0 z1 z2 | 9 id |
10-12 iw0 iw1 iw2 | 13-18 uv per vertex | 19-24 lmuv per vertex |
25-36 rgba per vertex | 37 enc ((tex+1) | kind<<12 | shaded<<14, exact in
f32). vmap over envs adds the batch grid dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
# Per-tile triangle list capacity. A tile whose overlap count exceeds this
# drops the highest-index triangles (sky is bound last in gather_triangles,
# so keep maps comfortably under the cap). Callers hand in compacted live
# triangles (render/raster.py T_PRE), so per-tile overlap counts are small
# (test.json 256^2 view peaks at 30).
L_CAP = 512
N_COLS = 48


def _grids(ty, tx):
    gx = (
        (tx * TILE_W).astype(jnp.float32)
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        + 0.5
    )
    gy = (
        (ty * TILE_H).astype(jnp.float32)
        + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        + 0.5
    )
    return gx, gy


def _kernel(
    tri_ref, idx_ref, cnt_ref, excl_ref,
    z_ref, win_ref, fd_ref, u_ref, v_ref, lu_ref, lv_ref,
    cr_ref, cg_ref, cb_ref, ca_ref, enc_ref,
):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    gx, gy = _grids(ty, tx)
    cnt = cnt_ref[0, 0, 0, 0]
    excl = excl_ref[...]  # [TILE_H, TILE_W] i32 triangle id to skip (-1 none)

    def edges(ax, ay, bx, by, cx, cy):
        e0 = (bx - ax) * (gy - ay) - (by - ay) * (gx - ax)
        e1 = (cx - bx) * (gy - by) - (cy - by) * (gx - bx)
        e2 = (ax - cx) * (gy - cy) - (ay - cy) * (gx - cx)
        return e0, e1, e2

    # ---- fused z + attribute loop ----
    def body(j, carry):
        zbuf, outs = carry
        i = idx_ref[0, 0, j, 0]
        c = lambda k: tri_ref[i, k]
        e0, e1, e2 = edges(c(0), c(1), c(2), c(3), c(4), c(5))
        inside = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
        denom = e0 + e1 + e2
        denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        z0, z1, z2 = c(6), c(7), c(8)
        z = (e1 * z0 + e2 * z1 + e0 * z2) / denom
        ti = c(9)
        closer = inside & (z > 0.0) & (z < 1.0) & (z < zbuf) & (ti.astype(jnp.int32) != excl)
        zbuf = jnp.where(closer, z, zbuf)

        # attribute math (formulas identical to the XLA pass 2 in
        # render/raster.py so both backends round the same way) only runs
        # when this triangle actually improved a pixel
        def attr(outs):
            tid, fd, u, v, lu, lv, cr, cg, cb, ca, enc = outs
            b0, b1, b2 = e1 / denom, e2 / denom, e0 / denom
            iw0, iw1, iw2 = c(10), c(11), c(12)
            iw = b0 * iw0 + b1 * iw1 + b2 * iw2
            pw = 1.0 / jnp.maximum(iw, 1e-12)
            bw0, bw1, bw2 = b0 * iw0, b1 * iw1, b2 * iw2

            def interp(k0):
                return (bw0 * c(k0) + bw1 * c(k0 + 2) + bw2 * c(k0 + 4)) * pw

            def interp4(k0):
                return (bw0 * c(k0) + bw1 * c(k0 + 4) + bw2 * c(k0 + 8)) * pw

            sel = lambda a, b_: jnp.where(closer, a, b_)
            tid = sel(ti, tid)
            fd = sel((b0 * z0 + b1 * z1 + b2 * z2) * pw, fd)
            u = sel(interp(13), u)
            v = sel(interp(14), v)
            lu = sel(interp(19), lu)
            lv = sel(interp(20), lv)
            cr = sel(interp4(25), cr)
            cg = sel(interp4(26), cg)
            cb = sel(interp4(27), cb)
            ca = sel(interp4(28), ca)
            enc = sel(c(37), enc)
            return tid, fd, u, v, lu, lv, cr, cg, cb, ca, enc

        outs = jax.lax.cond(jnp.any(closer), attr, lambda o: o, outs)
        return zbuf, outs

    z0buf = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    outs0 = (zero - 1.0, zero, zero, zero, zero, zero, zero, zero, zero, zero, zero)
    zbuf, outs = jax.lax.fori_loop(0, cnt, body, (z0buf, outs0))
    tid, fd, u, v, lu, lv, cr, cg, cb, ca, enc = outs

    z_ref[...] = zbuf
    win_ref[...] = tid.astype(jnp.int32)
    fd_ref[...] = fd
    u_ref[...] = u
    v_ref[...] = v
    lu_ref[...] = lu
    lv_ref[...] = lv
    cr_ref[...] = cr
    cg_ref[...] = cg
    cb_ref[...] = cb
    ca_ref[...] = ca
    enc_ref[...] = enc.astype(jnp.int32)


def bin_triangles(sx, sy, tri_ok, height, width):
    """Per-tile compacted triangle lists. sx/sy [T, 3] screen coords,
    tri_ok [T]. Returns (idx [NTy, NTx, L] i32, cnt [NTy, NTx, 1, 1])."""
    T = sx.shape[0]
    nty, ntx = height // TILE_H, width // TILE_W
    L = min(T, L_CAP)
    xmin, xmax = jnp.min(sx, 1), jnp.max(sx, 1)
    ymin, ymax = jnp.min(sy, 1), jnp.max(sy, 1)
    tyi = jnp.arange(nty, dtype=jnp.float32)[:, None, None]  # [NTy,1,1]
    txi = jnp.arange(ntx, dtype=jnp.float32)[None, :, None]  # [1,NTx,1]
    ov = (
        tri_ok[None, None, :]
        & (xmin[None, None, :] <= (txi + 1.0) * TILE_W)
        & (xmax[None, None, :] >= txi * TILE_W)
        & (ymin[None, None, :] <= (tyi + 1.0) * TILE_H)
        & (ymax[None, None, :] >= tyi * TILE_H)
    )  # [NTy, NTx, T]
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    keys = jnp.where(ov, tri_ids, T)  # overlapping first, index order
    idx = jnp.sort(keys, axis=-1)[..., :L].astype(jnp.int32)
    idx = jnp.minimum(idx, T - 1)  # pad entries never looped over (cnt bounds)
    cnt = jnp.minimum(jnp.sum(ov, axis=-1), L).astype(jnp.int32)
    return idx, cnt[:, :, None, None]


def raster_tiles_pallas(tri48, idx, cnt, height, width, exclude=None):
    """tri48 [T, 48] packed screen-space triangles + per-vertex attributes
    (column layout in the module docstring); idx [NTy, NTx, L] per-tile
    triangle lists from bin_triangles; cnt [NTy, NTx, 1, 1].

    Returns (zbuf, winner_id i32 (-1 none), frag_depth, uv_u, uv_v, lm_u,
    lm_v, col_r, col_g, col_b, col_a, enc i32), each [H, W]. vmap over the
    env axis for batched rendering."""
    nty, ntx, L = idx.shape
    T = tri48.shape[0]
    f32 = jnp.float32
    idx4 = idx[..., None]  # trailing unit dim: Mosaic needs the last two
    # block dims to equal the array dims for SMEM blocks
    if exclude is None:
        exclude = jnp.full((height, width), -1, jnp.int32)
    outs = pl.pallas_call(
        _kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((T, N_COLS), lambda ty, tx: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, 1), lambda ty, tx: (ty, tx, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda ty, tx: (ty, tx, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx)) for _ in range(12)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
        ] + [jax.ShapeDtypeStruct((height, width), f32) for _ in range(9)]
        + [jax.ShapeDtypeStruct((height, width), jnp.int32)],
    )(tri48, idx4, cnt[:, :, :, :], exclude)
    return outs
