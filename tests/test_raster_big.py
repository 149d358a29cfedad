"""Kernel-level tests for the chunked streamed rasterizer
(ops/raster_tiles_big.py) against a brute-force z-buffer — fast coverage
of the kernel itself; the full-pipeline bit-exactness test against the
XLA backend is tests/test_render.py::test_pallas_big_backend_matches_xla.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from c_game_engine_tpu.ops.raster_tiles_big import (
    SUB,
    T_CHK,
    level_bboxes,
    raster_tiles_big,
)

BIG = np.float32(1e30)


def _make_table(rng, T, H, W, live):
    """Random triangle soup -> fields-major [16, T] table + screen bbox
    column vectors (dead rows +inf/-inf, as render() writes them)."""
    sx = rng.uniform(-20, W + 20, (T, 3)).astype(np.float32)
    sy = rng.uniform(-20, H + 20, (T, 3)).astype(np.float32)
    sz = rng.uniform(0.01, 0.99, (T, 3)).astype(np.float32)
    bxmin = np.where(live, sx.min(1), BIG)
    bxmax = np.where(live, sx.max(1), -BIG)
    bymin = np.where(live, sy.min(1), BIG)
    bymax = np.where(live, sy.max(1), -BIG)
    z = np.zeros(T, np.float32)
    trit = np.stack(
        [sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
         sz[:, 0], sz[:, 1], sz[:, 2], z, bxmin, bxmax, bymin, bymax, z, z]
    )
    return trit, sx, sy, sz, (bxmin, bxmax, bymin, bymax)


def _reference(trit, sz, live, H, W, exclude=None):
    gx, gy = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    zref = np.full((H, W), np.inf, np.float32)
    wref = np.full((H, W), -1, np.int32)
    ex = np.full((H, W), -1, np.int32) if exclude is None else exclude
    for i in range(trit.shape[1]):
        if not live[i]:
            continue
        ax, ay, bx, by, cx, cy = trit[:6, i]
        e0 = (bx - ax) * (gy - ay) - (by - ay) * (gx - ax)
        e1 = (cx - bx) * (gy - by) - (cy - by) * (gx - bx)
        e2 = (ax - cx) * (gy - cy) - (ay - cy) * (gx - cx)
        inside = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | (
            (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        )
        den = e0 + e1 + e2
        den = np.where(np.abs(den) > 1e-9, den, 1e-9)
        z = (e1 * sz[i, 0] + e2 * sz[i, 1] + e0 * sz[i, 2]) / den
        closer = inside & (z > 0) & (z < 1) & (z < zref) & (i != ex)
        zref = np.where(closer, z, zref).astype(np.float32)
        wref = np.where(closer, i, wref)
    return zref, wref


def _levels(bb):
    bxmin, bxmax, bymin, bymax = (jnp.asarray(a) for a in bb)
    return (
        level_bboxes(bxmin, bxmax, bymin, bymax, T_CHK),
        level_bboxes(bxmin, bxmax, bymin, bymax, SUB),
    )


@pytest.mark.parametrize("pattern", ["none", "sparse", "spanning"])
def test_streamed_kernel_matches_bruteforce(pattern):
    """Multi-chunk table, random triangles, winner + z vs a numpy
    z-buffer. Live patterns: none, a sparse scatter (exercises subchunk
    skipping with dead rows interleaved), and a dense block crossing the
    chunk boundary."""
    rng = np.random.default_rng(0)
    H = W = 128
    T = 2 * T_CHK
    live = np.zeros(T, bool)
    if pattern == "sparse":
        live[rng.choice(T, 300, replace=False)] = True
    elif pattern == "spanning":
        live[T_CHK - 1000 : T_CHK + 1125] = True
    trit, sx, sy, sz, bb = _make_table(rng, T, H, W, live)
    cbox, scb = _levels(bb)
    with pltpu.force_tpu_interpret_mode():
        zb, win = raster_tiles_big(jnp.asarray(trit), cbox, scb, H, W)
    zref, wref = _reference(trit, sz, live, H, W)
    np.testing.assert_array_equal(np.asarray(win), wref)
    fin = np.isfinite(zref)
    np.testing.assert_array_equal(np.isfinite(np.asarray(zb)), fin)
    # winner ids are exact; stored z differs from the numpy reference by
    # FMA/reassociation only (observed max 3e-6 rel in interpret mode)
    np.testing.assert_allclose(np.asarray(zb)[fin], zref[fin], rtol=2e-5)


def test_streamed_kernel_exclude_and_tile_gate():
    """The reveal pass's per-pixel exclude skips exactly that id, and a
    zeroed tile_on row leaves the gated tile at the init values."""
    rng = np.random.default_rng(1)
    H = W = 128
    T = T_CHK
    live = np.zeros(T, bool)
    live[:200] = True
    trit, sx, sy, sz, bb = _make_table(rng, T, H, W, live)
    cbox, scb = _levels(bb)

    zref0, wref0 = _reference(trit, sz, live, H, W)
    exclude = wref0  # peel the first layer everywhere
    with pltpu.force_tpu_interpret_mode():
        _, win = raster_tiles_big(
            jnp.asarray(trit), cbox, scb, H, W, exclude=jnp.asarray(exclude)
        )
    _, wref = _reference(trit, sz, live, H, W, exclude=exclude)
    np.testing.assert_array_equal(np.asarray(win), wref)

    n_tiles = (H // 8) * (W // 128)
    ton = np.ones((n_tiles, 1), np.int32)
    ton[3, 0] = 0  # gate tile row 3 (rows 24..31)
    with pltpu.force_tpu_interpret_mode():
        _, win_g = raster_tiles_big(
            jnp.asarray(trit), cbox, scb, H, W, tile_on=jnp.asarray(ton)
        )
    win_g = np.asarray(win_g)
    np.testing.assert_array_equal(win_g[24:32], -1)
    np.testing.assert_array_equal(win_g[:24], wref0[:24])
    np.testing.assert_array_equal(win_g[32:], wref0[32:])
