"""Runtime queries against the compile-time uniform grid
(compiler/broadphase.py)."""

from __future__ import annotations

import jax.numpy as jnp


def query_cell(cmap, pos):
    """Candidate static-triangle indices near `pos`.
    pos: [..., 3] -> [..., L] i32 (-1 padded)."""
    gx, gz = cmap.aux["grid_shape"]
    cx = jnp.clip(
        ((pos[..., 0] - cmap.grid_lo[0]) * cmap.grid_inv_cell).astype(jnp.int32), 0, gx - 1
    )
    cz = jnp.clip(
        ((pos[..., 2] - cmap.grid_lo[1]) * cmap.grid_inv_cell).astype(jnp.int32), 0, gz - 1
    )
    return cmap.grid_cells[cx * gz + cz]
