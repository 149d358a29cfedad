"""Texture atlas: all textures a map references packed into one device
array, replacing the bindless Textures[512] descriptor array
(VulkanInternal.c:288-324, MAX_TEXTURES=512 TextureLoader.h:15).

Per-texture sampling honors the .gtex filter/repeat flags
(TextureLoader.c:70-140, 6 sampler variants VulkanResources.c:434-511):
repeat wraps UVs, clamp otherwise; filter=bilinear, else nearest.
Mipmaps are not implemented (TODO round2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TextureAtlas:
    image: jnp.ndarray  # [AH, AW, 4] f32
    table: jnp.ndarray  # [T, 6] f32: x0, y0, w, h, repeat, filter

    @property
    def size(self):
        return self.image.shape[1], self.image.shape[0]


def build_atlas(textures: list) -> TextureAtlas:
    """Shelf-pack decoded Texture objects (assets.codecs.Texture)."""
    if not textures:
        textures = []
    sizes = [(t.width, t.height) for t in textures]
    # shelf pack, 1px gutter
    width = 1
    max_w = max([w for w, h in sizes], default=1)
    area = sum((w + 2) * (h + 2) for w, h in sizes) or 1
    while width < max_w + 2 or width * width < area:
        width *= 2
    x, y, shelf = 1, 1, 0
    pos = []
    for w, h in sizes:
        if x + w + 1 > width:
            x, y, shelf = 1, y + shelf + 2, 0
        pos.append((x, y))
        x += w + 2
        shelf = max(shelf, h)
    height = 1
    while height < y + shelf + 1:
        height *= 2
    img = np.zeros((height, width, 4), np.float32)
    table = np.zeros((max(len(textures), 1), 6), np.float32)
    for i, (t, (px, py)) in enumerate(zip(textures, pos)):
        img[py : py + t.height, px : px + t.width] = t.pixels
        table[i] = [px, py, t.width, t.height, float(t.repeat), float(t.filter)]
    return TextureAtlas(image=jnp.asarray(img), table=jnp.asarray(table))


def sample(atlas: TextureAtlas, tex_id, uv):
    """Sample texture `tex_id` at `uv`. Broadcasts over leading dims.
    tex_id: [...] i32; uv: [..., 2]. Returns [..., 4]."""
    t = atlas.table[jnp.clip(tex_id, 0, atlas.table.shape[0] - 1)]
    x0, y0, w, h = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
    repeat = t[..., 4] > 0.5
    bilinear = t[..., 5] > 0.5

    u = uv[..., 0]
    v = uv[..., 1]
    u = jnp.where(repeat, u - jnp.floor(u), jnp.clip(u, 0.0, 1.0))
    v = jnp.where(repeat, v - jnp.floor(v), jnp.clip(v, 0.0, 1.0))

    fx = u * w - 0.5
    fy = v * h - 0.5
    ix0 = jnp.floor(fx)
    iy0 = jnp.floor(fy)
    tx = fx - ix0
    ty = fy - iy0

    def fetch(ix, iy):
        ix = jnp.where(repeat, jnp.mod(ix, jnp.maximum(w, 1)), jnp.clip(ix, 0, w - 1))
        iy = jnp.where(repeat, jnp.mod(iy, jnp.maximum(h, 1)), jnp.clip(iy, 0, h - 1))
        xi = (x0 + ix).astype(jnp.int32)
        yi = (y0 + iy).astype(jnp.int32)
        return atlas.image[yi, xi]

    c00 = fetch(ix0, iy0)
    nearest = fetch(jnp.round(fx), jnp.round(fy))
    c10 = fetch(ix0 + 1, iy0)
    c01 = fetch(ix0, iy0 + 1)
    c11 = fetch(ix0 + 1, iy0 + 1)
    lin = (
        c00 * ((1 - tx) * (1 - ty))[..., None]
        + c10 * (tx * (1 - ty))[..., None]
        + c01 * ((1 - tx) * ty)[..., None]
        + c11 * (tx * ty)[..., None]
    )
    return jnp.where(bilinear[..., None], lin, nearest)
