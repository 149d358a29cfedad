"""Pallas TPU kernel: streamed z-buffer pass for big triangle tables.

Chunked-table variant of ops/raster_tiles.py for maps whose live triangle
set exceeds the VMEM-resident table — orb.gmap's 78k-triangle hull model;
render/raster.py routes these here under backend="pallas_big". Replaces
the same Vulkan indirect-draw path (reference engine
`engine/src/graphics/vulkan/Vulkan.c:850-912`) as the main tile kernel.

Design (differences from the main kernel):
  * grid = (num_chunks, num_tiles) with the CHUNK OUTER: each T_CHK-row
    triangle block is DMA'd into VMEM once per chunk and reused across
    all framebuffer tiles (Pallas skips the re-fetch while the block
    index is unchanged). The tile-outer ordering would re-stream the
    whole table per tile: 64x the HBM traffic at 256^2.
  * the HBM table is FIELDS-MAJOR [16, T] f32 — T on the lane axis, so
    the array is completely unpadded (a triangle-major [T, 16] table
    lane-pads 16 -> 128 = 8x HBM, and building it transposes multi-GB
    temps at batch). The kernel transposes each (16, T_CHK) block ONCE
    into a VMEM scratch [T_CHK, 16] at its first tile visit (grid is
    chunk-outer, so t == 0 <=> fresh block) and scalar-reads triangles
    from the scratch: a dynamic SUBLANE index with a static lane column
    is the one addressing mode Mosaic compiles for this pattern (a
    dynamic LANE read of the untransposed block fails to prove
    128-alignment).
  * TWO-LEVEL bbox hierarchy instead of per-tile index lists (binning a
    100k+ table costs more than the raster) and instead of caller-side
    live compaction (sorting a 150k permutation per env per frame is
    its own multi-ms cost): the caller writes per-triangle screen
    bboxes with DEAD rows at (+inf, -inf) so they can never hit, and
    the kernel skips (a) whole chunks via a [NC, 4] chunk bbox table,
    (b) SUB-triangle groups via a [NC*T_CHK/SUB, 4] subchunk bbox table
    (both SMEM), and (c) individual triangles by a scalar bbox test —
    all before any vector edge work. Model exports are strip-ordered,
    so consecutive triangles are spatially coherent and subchunk boxes
    stay tile-sized: the scalar loop cost collapses from
    live_tris x tiles to ~subchunk tests + actual overlaps. Winner ids
    stay in ORIGINAL row space (= the XLA backend's), so exclude images
    and attribute gathers need no id remapping.
  * z/winner accumulators are FULL-FRAME output blocks with a constant
    index map — VMEM-resident for the whole launch (512 KB at 256^2),
    flushed to HBM once; each step read-modify-writes its (8, 128) tile
    slice via dynamic slices (pl.multiple_of keeps Mosaic's
    sublane/lane alignment provable).
  * z/winner ONLY — attribute interpolation happens in the caller's XLA
    gather path (render/raster.py vattr), which keeps the streamed rows
    at 16 columns.

Table row layout [16, T] f32: rows 0-5 sx0 sy0 sx1 sy1 sx2 sy2 |
6-8 z0 z1 z2 | 9 pad | 10-13 per-tri bbox xmin xmax ymin ymax (dead rows
+1e30/-1e30/+1e30/-1e30) | 14-15 pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from c_game_engine_tpu.ops.raster_tiles import TILE_H, TILE_W, _grids

T_CHK = 4096  # grid-step overhead is ~0.6 us/step: bigger chunks, fewer steps
# Subchunk size for the bbox-prune hierarchy. CGE_BIG_SUB exists for
# profiling sweeps (benchmarks/profile_big.py); invalid values fail HERE,
# at import, not as a Mosaic shape error deep in a later launch.
SUB = int(__import__("os").environ.get("CGE_BIG_SUB", "64"))
if SUB <= 0 or (SUB & (SUB - 1)) or T_CHK % SUB:
    raise ValueError(
        f"CGE_BIG_SUB={SUB}: must be a power of two dividing T_CHK={T_CHK}"
    )
N_COLS_BIG = 16


def _kernel_big(
    ntx, trit_ref, cbox_ref, scb_ref, ton_ref, excl_ref, z_ref, win_ref, tblk_ref
):
    ci = pl.program_id(0)
    t = pl.program_id(1)
    ty = t // ntx
    tx = t % ntx

    @pl.when((ci == 0) & (t == 0))
    def _init():
        z_ref[...] = jnp.full_like(z_ref, jnp.inf)
        win_ref[...] = jnp.full_like(win_ref, -1)

    x0 = (tx * TILE_W).astype(jnp.float32)
    y0 = (ty * TILE_H).astype(jnp.float32)
    x1 = x0 + float(TILE_W)
    y1 = y0 + float(TILE_H)
    overlap = (
        (cbox_ref[ci, 0] <= x1)
        & (cbox_ref[ci, 1] >= x0)
        & (cbox_ref[ci, 2] <= y1)
        & (cbox_ref[ci, 3] >= y0)
    )

    # fresh chunk block (chunk-outer grid): transpose it into the
    # triangle-major scratch once, reused by all 64 tile visits. Gated on
    # the chunk being non-empty (an all-dead chunk has an inverted bbox
    # and can never overlap ANY tile) — NOT on this tile's overlap, which
    # would leave stale scratch for later tiles that do overlap.
    @pl.when((t == 0) & (cbox_ref[ci, 0] <= cbox_ref[ci, 1]))
    def _xpose():
        tblk_ref[...] = trit_ref[...].T

    @pl.when(overlap & (ton_ref[t, 0] != 0))
    def _run():
        gx, gy = _grids(ty, tx)
        r0 = pl.multiple_of(ty * TILE_H, TILE_H)
        c0 = pl.multiple_of(tx * TILE_W, TILE_W)
        rows = pl.ds(r0, TILE_H)
        cols = pl.ds(c0, TILE_W)
        excl = excl_ref[rows, cols]
        base = ci * T_CHK

        def tri_body(base_j, q, carry):
            j = base_j + q
            # UNCONDITIONAL vector edge work with the scalar bbox test
            # folded into the `closer` mask: a per-triangle lax.cond
            # measured ~165 cycles/iteration on-chip (the (zbuf, win)
            # vreg carry is copied through both branches and the branch
            # serializes the pipeline) — 5x the cost of just doing the
            # ~30-op edge math. Subchunk-level conds above prune the
            # all-dead groups, and unroll=8 below breaks the z-select
            # dependency chain between consecutive triangles.
            # (Dead/padded rows carry +inf/-inf boxes: hit == False.)
            zbuf, win = carry
            c = lambda k: tblk_ref[j, k]
            hit = (c(10) <= x1) & (c(11) >= x0) & (c(12) <= y1) & (c(13) >= y0)
            e0 = (c(2) - c(0)) * (gy - c(1)) - (c(3) - c(1)) * (gx - c(0))
            e1 = (c(4) - c(2)) * (gy - c(3)) - (c(5) - c(3)) * (gx - c(2))
            e2 = (c(0) - c(4)) * (gy - c(5)) - (c(1) - c(5)) * (gx - c(4))
            inside = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | (
                (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            )
            denom = e0 + e1 + e2
            denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
            z = (e1 * c(6) + e2 * c(7) + e0 * c(8)) / denom
            ti = base + j
            closer = (
                hit & inside & (z > 0.0) & (z < 1.0) & (z < zbuf) & (ti != excl)
            )
            return jnp.where(closer, z, zbuf), jnp.where(closer, ti, win)

        def sc_body(s, carry):
            hit_sc = (
                (scb_ref[s, 0] <= x1)
                & (scb_ref[s, 1] >= x0)
                & (scb_ref[s, 2] <= y1)
                & (scb_ref[s, 3] >= y0)
            )

            def descend(carry):
                # Mosaic only supports FULL unroll, so: dynamic outer
                # loop over 8-triangle groups, fully-unrolled inner 8
                def grp(g, carry):
                    return jax.lax.fori_loop(
                        0, 8, functools.partial(tri_body, s * SUB + g * 8),
                        carry, unroll=8,
                    )

                return jax.lax.fori_loop(0, SUB // 8, grp, carry)

            return jax.lax.cond(hit_sc, descend, lambda c_: c_, carry)

        zbuf, win = jax.lax.fori_loop(
            0, T_CHK // SUB, sc_body, (z_ref[rows, cols], win_ref[rows, cols])
        )
        z_ref[rows, cols] = zbuf
        win_ref[rows, cols] = win


def level_bboxes(bxmin, bxmax, bymin, bymax, group):
    """Group per-triangle screen bboxes (dead rows +inf/-inf) into
    [T//group, 4] (xmin, xmax, ymin, ymax); all-dead groups get
    never-overlapping bounds for free."""
    f = lambda a, red: red(a.reshape(-1, group), 1)
    return jnp.stack(
        [f(bxmin, jnp.min), f(bxmax, jnp.max), f(bymin, jnp.min), f(bymax, jnp.max)],
        axis=1,
    )


def raster_tiles_big(trit, cbox, scb, height, width, exclude=None, tile_on=None):
    """Streamed z-buffer pass for big triangle tables. trit [16, NC*T_CHK]
    fields-major (row layout in the module docstring; dead rows carry
    +inf/-inf bbox cols), cbox [NC, 4] and scb [NC*T_CHK/SUB, 4] from
    level_bboxes. tile_on [NTy*NTx, 1] i32 gates whole tiles (the reveal
    pass enables only tiles with a discarded pixel); None = all on.

    Returns (zbuf, winner_id) [H, W] with winner in ORIGINAL row space.
    vmap over envs."""
    nty, ntx = height // TILE_H, width // TILE_W
    n_tiles = nty * ntx
    nc = trit.shape[1] // T_CHK
    if exclude is None:
        exclude = jnp.full((height, width), -1, jnp.int32)
    if tile_on is None:
        tile_on = jnp.ones((n_tiles, 1), jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_kernel_big, ntx),
        grid=(nc, n_tiles),
        in_specs=[
            pl.BlockSpec((N_COLS_BIG, T_CHK), lambda ci, t: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((T_CHK // SUB, 4), lambda ci, t: (ci, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((height, width), lambda ci, t: (0, 0)) for _ in range(2)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((height, width), jnp.float32),
            jax.ShapeDtypeStruct((height, width), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((T_CHK, N_COLS_BIG), jnp.float32)],
    )(trit, cbox, scb, tile_on, exclude)
    return outs
