"""Compacted triangle-chunk lists for the Pallas physics kernels.

The round-1 kernels skipped triangle chunks with a per-chunk `lax.cond` on
an XZ AABB test computed inside the kernel. That leaves two costs: the
branch itself (NC conds per body per block) and the fact that every chunk
is still *visited*. Here the overlap test runs once per kernel call in XLA
(tiny [G, D, NC] arrays), producing for each (env-block, query) a dense
prefix of overlapping chunk ids + a count; the kernel then runs a
dynamic-trip-count loop over exactly the chunks it can touch — no branches,
no wasted visits. For a settled body this is typically 1-4 of NC chunks.

Chunks are Morton-sorted at compile time (compiler/compile.py), so nearby
triangles share chunks and the compacted lists stay short.
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_chunk_lists(chunk_bounds, xmin, xmax, zmin, zmax, margin):
    """chunk_bounds [NC, 4] (minx minz maxx maxz); xmin/xmax/zmin/zmax [...]
    per-query XZ extents (any leading shape). An empty query (xmin > xmax,
    e.g. no active lane) yields cnt 0.

    Returns (idx [..., NC] i32 — overlapping chunk ids packed first,
    cnt [...] i32)."""
    cb = chunk_bounds
    margin = jnp.asarray(margin)
    if margin.ndim:  # per-query margins, e.g. [D] per body
        margin = margin.reshape(margin.shape + (1,) * (xmin.ndim + 1 - margin.ndim))
    ov = (
        (cb[:, 0] <= xmax[..., None] + margin)
        & (cb[:, 2] >= xmin[..., None] - margin)
        & (cb[:, 1] <= zmax[..., None] + margin)
        & (cb[:, 3] >= zmin[..., None] - margin)
    )  # [..., NC]
    pos = jnp.cumsum(ov.astype(jnp.int32), axis=-1) - 1
    cnt = jnp.sum(ov.astype(jnp.int32), axis=-1)
    NC = cb.shape[0]
    c_ids = jnp.arange(NC, dtype=jnp.int32)
    # scatter-free compaction: idx[..., j] = sum_c c * (ov & pos==j)
    onehot = ov[..., None] & (pos[..., None] == c_ids)
    idx = jnp.sum(onehot.astype(jnp.int32) * c_ids[..., :, None], axis=-2)
    return idx.astype(jnp.int32), cnt.astype(jnp.int32)


def block_minmax(comp, blk, mask=None):
    """Per-env-block min/max of a [..., B] component. Returns ([..., G] min,
    [..., G] max) with G = B // blk. Masked-out lanes (mask False) are
    excluded; an all-masked block yields (+inf, -inf) = empty query."""
    B = comp.shape[-1]
    g = comp.reshape(*comp.shape[:-1], B // blk, blk)
    if mask is not None:
        m = mask.reshape(*mask.shape[:-1], B // blk, blk)
        lo = jnp.min(jnp.where(m, g, jnp.inf), axis=-1)
        hi = jnp.max(jnp.where(m, g, -jnp.inf), axis=-1)
        return lo, hi
    return jnp.min(g, axis=-1), jnp.max(g, axis=-1)
