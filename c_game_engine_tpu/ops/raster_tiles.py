"""Pallas TPU kernel: tile-based z-buffer rasterization (pass 1).

Replaces the XLA reference renderer's pass 1 (render/raster.py), which
evaluated [CHUNK, H, W] edge functions through HBM (~240 ms/frame/env at
256x256). The framebuffer is processed in (8, 128) VMEM tiles; an XLA-side
binning pass (bin_triangles + gather_tiles) hands every tile a compacted
block of just the triangles whose screen bbox overlaps it, and the kernel
runs a dynamic-trip-count loop over that block — the z-buffer and winner
id never leave registers until the tile is done.

The winner-id buffer feeds the unchanged pass-2 shading (the exact .gshd
math in render/raster.py::shade), so Pallas and XLA paths produce the same
image up to z-tie order.

Mosaic notes that shaped this kernel:
  * a [1, 1] vector can't broadcast across both sublanes and lanes, and a
    dynamic *lane* index can't be proven aligned — but a scalar read at a
    dynamic SUBLANE index with a static lane column compiles fine. Hence
    the per-tile triangle block [L, 16]: triangle = sublane, field = lane.
  * per-tile blocks are pre-gathered on the XLA side ([NTy, NTx, L, 16]);
    streaming (1, 1, L, 16) VMEM blocks per grid step costs L*128*4 bytes
    (lane pad 16->128) — 512 KB at L=1024, fine for double buffering.

Fields: sx0 sy0 sx1 sy1 sx2 sy2 z0 z1 z2 id (f32; ids < 2^24 exact), pad
to 16. vmap over envs adds the batch grid dimension.
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
# so keep maps comfortably under the cap).
L_CAP = 1024


def _kernel(blk_ref, cnt_ref, z_ref, win_ref):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    # Mosaic iota is integer-only; cast after generating
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

    def body(j, carry):
        zbuf, win = carry
        # true scalar reads: dynamic sublane index j, static lane column
        c = lambda k: blk_ref[0, 0, j, k]
        ax, ay = c(0), c(1)
        bx, by = c(2), c(3)
        cx, cy = c(4), c(5)
        z0, z1, z2 = c(6), c(7), c(8)
        ti = c(9).astype(jnp.int32)

        e0 = (bx - ax) * (gy - ay) - (by - ay) * (gx - ax)
        e1 = (cx - bx) * (gy - by) - (cy - by) * (gx - bx)
        e2 = (ax - cx) * (gy - cy) - (ay - cy) * (gx - cx)
        inside = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
        denom = e0 + e1 + e2
        denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        z = (e1 * z0 + e2 * z1 + e0 * z2) / denom
        closer = inside & (z > 0.0) & (z < 1.0) & (z < zbuf)
        zbuf = jnp.where(closer, z, zbuf)
        win = jnp.where(closer, ti, win)
        return zbuf, win

    z0buf = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    w0 = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
    zbuf, win = jax.lax.fori_loop(0, cnt_ref[0, 0, 0, 0], body, (z0buf, w0))
    z_ref[...] = zbuf
    win_ref[...] = win


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


def gather_tiles(tri16, idx):
    """XLA-side gather of per-tile triangle blocks: tri16 [T, 16] packed
    screen-space triangles, idx [NTy, NTx, L] -> [NTy, NTx, L, 16]."""
    return tri16[idx]


def raster_tiles_pallas(tiles, cnt, height, width):
    """tiles [NTy, NTx, L, 16] from gather_tiles; cnt [NTy, NTx, 1, 1].
    Returns (zbuf [H, W] f32, winner [H, W] i32, -1 = none). vmap over the
    env axis for batched rendering."""
    nty, ntx, L, _ = tiles.shape
    zbuf, win = pl.pallas_call(
        _kernel,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(
                (1, 1, L, 16), lambda ty, tx: (ty, tx, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, 1, 1), lambda ty, tx: (ty, tx, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx)),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx: (ty, tx)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
        ],
    )(tiles, cnt)
    return zbuf, win
