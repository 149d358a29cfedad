"""Texture atlas: all textures a map references packed into one device
array, replacing the bindless Textures[512] descriptor array
(VulkanInternal.c:288-324, MAX_TEXTURES=512 TextureLoader.h:15).

Per-texture sampling honors the .gtex filter/repeat/mipmaps flags
(TextureLoader.c:70-140 — the reference picks 1 of 6 samplers from these
flags, VulkanResources.c:434-511):
  repeat  -> wrap UVs, else clamp
  filter  -> bilinear (trilinear across mip levels), else nearest
  mipmaps -> a box-filtered mip chain is packed into the atlas; the
             rasterizer selects the level from the per-triangle
             texel/pixel density (render/raster.py), honoring
             Options.mipmaps (Options.h:37-84) via render(mipmaps=...).
Anisotropic filtering (Options anisotropy 0-16x) is implemented in the
rasterizer: render(aniso=ratio) fits the pixel footprint ellipse in texel
space per triangle and averages trilinear taps along its major axis
(render/raster.py, the maxAnisotropy sampler of VulkanResources.c:434-511);
only linear-filtered mipmapped textures are eligible, like the reference's
sampler selection.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

MAX_MIPS = 6  # 1/32 of base resolution — plenty below 256^2 framebuffers


@struct.dataclass
class TextureAtlas:
    # GATHER-PACKED atlas: blocked[y, x] holds the 2x2 texel neighborhood
    # (c00, c10(+x), c01(+y), c11) as 16 channels, with the +1 neighbors
    # pre-wrapped/clamped per each texture's repeat mode at build time. A
    # bilinear tap is then ONE [H, W] gather instead of four (TPU gathers
    # are scalarized; fetch count is the whole cost of texturing).
    blocked: jnp.ndarray  # [AH, AW, 16] bf16 by default (build_atlas blocked_dtype)
    table: jnp.ndarray  # [T, 6] f32: x0, y0, w, h, repeat, filter
    mips: jnp.ndarray  # [T, MAX_MIPS, 4] f32: x0, y0, w, h per level
    n_mips: jnp.ndarray  # [T] f32 (1 = no chain)
    # per-(texture, level) rect PAIR (level L | level min(L+1, last)) in
    # one row: a trilinear tap's table metadata in ONE per-pixel gather
    # instead of four (table/n_mips/mips[l0]/mips[l1]). TPU gathers price
    # per FETCH, not per channel (benchmarks/profile_gather.py: 4ch and
    # 16ch rows both ~22.5 ms per 2M-pixel gather at 256^2 B=32), so
    # callers that already know repeat/filter per pixel (the rasterizer
    # encodes them per triangle) save ~3 gathers per tap.
    mip_pairs: jnp.ndarray | None = None  # [T, MAX_MIPS, 8] f32
    # per-texture sampler flags PRE-PACKED at the enc-word bit positions
    # (repeat<<21 | filter<<22): the rasterizer ORs this straight into its
    # per-triangle enc word. Packing on the host sidesteps an observed
    # XLA:TPU miscompilation of the fused f32-gather -> compare -> bool ->
    # shift chain (table[:, 4] > 0.5 ...) when the z-pass scan shares the
    # graph: the repeat bit silently dropped, clamping every repeat-mode
    # texture to its border (near-black frames on the TPU xla backend).
    flag_words: jnp.ndarray | None = None  # [T] i32
    # DUAL-LEVEL rows: dual[y, x, 0:16] = blocked[y, x]; dual[y, x, 16:52]
    # = the NEXT mip level's 3x3 texel neighborhood (row-major (dy, dx),
    # 4 ch each) anchored at (x//2 - 1, y//2 - 1) in that level, wrapped/
    # clamped per the texture's repeat mode. Because a level-L+1 bilinear
    # footprint derived from the same uv always lands within that 3x3
    # (fx' = fx/2 - 0.25 for even widths), a trilinear tap becomes ONE
    # gather instead of two. Last chain levels embed themselves (their
    # blend fraction is always 0). None when build_atlas(dual=False).
    dual: jnp.ndarray | None = None  # [AH, AW, 52]

    @property
    def size(self):
        return self.blocked.shape[1], self.blocked.shape[0]


def _downsample(px: np.ndarray) -> np.ndarray:
    """2x2 box filter (odd sizes drop the last row/col, min size 1)."""
    h, w = px.shape[:2]
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    px = px[: nh * 2, : nw * 2] if (h > 1 and w > 1) else px
    if h > 1 and w > 1:
        return 0.25 * (px[0::2, 0::2] + px[1::2, 0::2] + px[0::2, 1::2] + px[1::2, 1::2])
    if h > 1:
        return 0.5 * (px[0::2] + px[1::2])
    if w > 1:
        return 0.5 * (px[:, 0::2] + px[:, 1::2])
    return px


def build_atlas(textures: list, dual: bool = False, dual_dtype=None,
                blocked_dtype=jnp.bfloat16) -> TextureAtlas:
    """Shelf-pack decoded Texture objects (assets.codecs.Texture) and the
    mip chains of those with the mipmaps flag. dual=True additionally
    packs each texel's next-mip-level 3x3 neighborhood into the same row
    (TextureAtlas.dual) so trilinear sampling costs one gather — bit-exact
    with the two-tap path (tests/test_render.py), but measured 2x SLOWER
    on TPU v5e (52-channel gather rows cost more than two 16-channel
    gathers; benchmarks notes in ROADMAP.md), so it is off by default.

    blocked_dtype: storage dtype of the packed texel rows, bf16 by
    default — it HALVES the atlas footprint (shapes/orb: 128 -> 64 MB),
    which cuts the per-pixel gather cost of the biggest shade stage (orb
    full frame 698 -> 579 ms/frame-batch at B=32; the gather is cache-
    residency-bound, not row-width-bound). Texels are 8-bit sources, so
    bf16's 8 mantissa bits cost <= 0.2% per channel — the same order as
    GPU texture-filter precision (the reference's R8G8B8A8 mips). The
    dual rows follow blocked_dtype unless dual_dtype overrides, keeping
    the two paths bit-identical to each other."""
    if dual_dtype is None:
        dual_dtype = blocked_dtype
    if not textures:
        textures = []
    # per-texture mip pyramids (level 0 = the texture itself)
    chains = []
    for t in textures:
        levels = [np.asarray(t.pixels, np.float32)]
        if t.mipmaps:
            while len(levels) < MAX_MIPS and max(levels[-1].shape[:2]) > 1:
                levels.append(_downsample(levels[-1]))
        chains.append(levels)

    rects = [(lv.shape[1], lv.shape[0]) for ch in chains for lv in ch]
    # shelf pack, 1px gutter
    width = 1
    max_w = max([w for w, h in rects], default=1)
    area = sum((w + 2) * (h + 2) for w, h in rects) or 1
    while width < max_w + 2 or width * width < area:
        width *= 2
    x, y, shelf = 1, 1, 0
    pos = []
    for w, h in rects:
        if x + w + 1 > width:
            x, y, shelf = 1, y + shelf + 2, 0
        pos.append((x, y))
        x += w + 2
        shelf = max(shelf, h)
    height = 1
    while height < y + shelf + 1:
        height *= 2

    blocked = np.zeros((height, width, 16), np.float32)
    dual_arr = np.zeros((height, width, 52), dual_dtype) if dual else None
    nt = max(len(textures), 1)
    table = np.zeros((nt, 6), np.float32)
    mips = np.zeros((nt, MAX_MIPS, 4), np.float32)
    n_mips = np.ones(nt, np.float32)
    ri = 0
    for i, (t, ch) in enumerate(zip(textures, chains)):
        for li, lv in enumerate(ch):
            px, py = pos[ri]
            ri += 1
            lh, lw = lv.shape[:2]
            if t.repeat:
                xn = (np.arange(lw) + 1) % lw
                yn = (np.arange(lh) + 1) % lh
            else:
                xn = np.minimum(np.arange(lw) + 1, lw - 1)
                yn = np.minimum(np.arange(lh) + 1, lh - 1)
            blocked[py : py + lh, px : px + lw, 0:4] = lv
            blocked[py : py + lh, px : px + lw, 4:8] = lv[:, xn]
            blocked[py : py + lh, px : px + lw, 8:12] = lv[yn]
            blocked[py : py + lh, px : px + lw, 12:16] = lv[yn][:, xn]
            if dual:
                dual_arr[py : py + lh, px : px + lw, 0:16] = blocked[
                    py : py + lh, px : px + lw
                ]
                # next level's 3x3 anchored at (x//2 - 1, y//2 - 1); the
                # last level embeds itself (its blend fraction is 0)
                lv1 = ch[min(li + 1, len(ch) - 1)]
                h1, w1 = lv1.shape[:2]
                kx = np.arange(lw) // 2
                ky = np.arange(lh) // 2
                for j in range(3):
                    sy = ky - 1 + j
                    sy = sy % h1 if t.repeat else np.clip(sy, 0, h1 - 1)
                    for ii in range(3):
                        sx = kx - 1 + ii
                        sx = sx % w1 if t.repeat else np.clip(sx, 0, w1 - 1)
                        c0 = 16 + (j * 3 + ii) * 4
                        dual_arr[py : py + lh, px : px + lw, c0 : c0 + 4] = lv1[
                            sy
                        ][:, sx]
            mips[i, li] = [px, py, lw, lh]
            if li == 0:
                table[i] = [px, py, lw, lh, float(t.repeat), float(t.filter)]
        # pad the chain by repeating the last level (lod clamps there)
        for li in range(len(ch), MAX_MIPS):
            mips[i, li] = mips[i, len(ch) - 1]
        n_mips[i] = len(ch)
    if not textures:
        mips[0, :] = [0, 0, 1, 1]
    # rect pairs: level L alongside min(L+1, n_mips-1) — the mips table is
    # already padded by repeating the last level, so mips[:, min(l+1, ...)]
    # equals mips[:, l+1] except at the final slot
    pairs = np.concatenate(
        [mips, np.concatenate([mips[:, 1:], mips[:, -1:]], axis=1)], axis=2
    )
    flag_words = (
        (table[:, 4] > 0.5).astype(np.int32) * (1 << 21)
        + (table[:, 5] > 0.5).astype(np.int32) * (1 << 22)
    )
    return TextureAtlas(
        blocked=jnp.asarray(blocked).astype(blocked_dtype),
        flag_words=jnp.asarray(flag_words),
        table=jnp.asarray(table),
        mips=jnp.asarray(mips),
        n_mips=jnp.asarray(n_mips),
        dual=jnp.asarray(dual_arr) if dual else None,
        mip_pairs=jnp.asarray(pairs),
    )


def _sample_level(atlas, rect, repeat, bilinear, uv):
    """Bilinear/nearest fetch within one mip rect: ONE blocked gather.

    Clamp mode pins fx into [0, w-1] before the floor, so border half-texel
    lookups degenerate to tx=0 and reproduce the old independent-tap clamp
    values exactly; repeat mode floors first and wraps the block index (the
    block's +1 channels are pre-wrapped)."""
    x0, y0, w, h = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]
    u = uv[..., 0]
    v = uv[..., 1]
    u = jnp.where(repeat, u - jnp.floor(u), jnp.clip(u, 0.0, 1.0))
    v = jnp.where(repeat, v - jnp.floor(v), jnp.clip(v, 0.0, 1.0))

    fx = u * w - 0.5
    fy = v * h - 0.5
    fx = jnp.where(repeat, fx, jnp.clip(fx, 0.0, jnp.maximum(w - 1.0, 0.0)))
    fy = jnp.where(repeat, fy, jnp.clip(fy, 0.0, jnp.maximum(h - 1.0, 0.0)))
    ix0 = jnp.floor(fx)
    iy0 = jnp.floor(fy)
    tx = fx - ix0
    ty = fy - iy0

    bx = jnp.where(repeat, jnp.mod(ix0, jnp.maximum(w, 1)), ix0)
    by = jnp.where(repeat, jnp.mod(iy0, jnp.maximum(h, 1)), iy0)
    xi = (x0 + bx).astype(jnp.int32)
    yi = (y0 + by).astype(jnp.int32)
    blk = atlas.blocked[yi, xi].astype(jnp.float32)  # [..., 16]
    c00, c10, c01, c11 = blk[..., 0:4], blk[..., 4:8], blk[..., 8:12], blk[..., 12:16]
    lin = (
        c00 * ((1 - tx) * (1 - ty))[..., None]
        + c10 * (tx * (1 - ty))[..., None]
        + c01 * ((1 - tx) * ty)[..., None]
        + c11 * (tx * ty)[..., None]
    )
    near_x = tx > 0.5
    near_y = ty > 0.5
    nearest = jnp.where(
        near_y[..., None],
        jnp.where(near_x[..., None], c11, c01),
        jnp.where(near_x[..., None], c10, c00),
    )
    return jnp.where(bilinear[..., None], lin, nearest)


def _sample_dual(atlas, rect, rect1, repeat, bilinear, uv, frac):
    """Trilinear tap from ONE dual-row gather: the level-L 2x2 block plus
    the embedded level-L+1 3x3 neighborhood (see TextureAtlas.dual). The
    L math mirrors _sample_level exactly; the L+1 bilinear footprint is
    located within the stored 3x3 by its offset from the anchor
    (x//2 - 1, y//2 - 1) — exact for even level widths (all power-of-two
    chains); odd deep levels clip to the nearest stored texel."""
    x0, y0, w, h = rect[..., 0], rect[..., 1], rect[..., 2], rect[..., 3]
    u = uv[..., 0]
    v = uv[..., 1]
    u = jnp.where(repeat, u - jnp.floor(u), jnp.clip(u, 0.0, 1.0))
    v = jnp.where(repeat, v - jnp.floor(v), jnp.clip(v, 0.0, 1.0))

    fx = u * w - 0.5
    fy = v * h - 0.5
    fx = jnp.where(repeat, fx, jnp.clip(fx, 0.0, jnp.maximum(w - 1.0, 0.0)))
    fy = jnp.where(repeat, fy, jnp.clip(fy, 0.0, jnp.maximum(h - 1.0, 0.0)))
    ix0 = jnp.floor(fx)
    iy0 = jnp.floor(fy)
    tx = fx - ix0
    ty = fy - iy0
    bx = jnp.where(repeat, jnp.mod(ix0, jnp.maximum(w, 1)), ix0)
    by = jnp.where(repeat, jnp.mod(iy0, jnp.maximum(h, 1)), iy0)
    xi = (x0 + bx).astype(jnp.int32)
    yi = (y0 + by).astype(jnp.int32)
    blk = atlas.dual[yi, xi].astype(jnp.float32)  # [..., 52]

    c00, c10, c01, c11 = blk[..., 0:4], blk[..., 4:8], blk[..., 8:12], blk[..., 12:16]
    lin = (
        c00 * ((1 - tx) * (1 - ty))[..., None]
        + c10 * (tx * (1 - ty))[..., None]
        + c01 * ((1 - tx) * ty)[..., None]
        + c11 * (tx * ty)[..., None]
    )
    nearest = jnp.where(
        (ty > 0.5)[..., None],
        jnp.where((tx > 0.5)[..., None], c11, c01),
        jnp.where((tx > 0.5)[..., None], c10, c00),
    )
    c0 = jnp.where(bilinear[..., None], lin, nearest)

    # ---- L+1 tap out of the embedded 3x3 ----
    w1, h1 = rect1[..., 2], rect1[..., 3]
    fx1 = u * w1 - 0.5
    fy1 = v * h1 - 0.5
    fx1 = jnp.where(repeat, fx1, jnp.clip(fx1, 0.0, jnp.maximum(w1 - 1.0, 0.0)))
    fy1 = jnp.where(repeat, fy1, jnp.clip(fy1, 0.0, jnp.maximum(h1 - 1.0, 0.0)))
    ix1 = jnp.floor(fx1)
    iy1 = jnp.floor(fy1)
    tx1 = fx1 - ix1
    ty1 = fy1 - iy1
    bx1 = jnp.where(repeat, jnp.mod(ix1, jnp.maximum(w1, 1)), ix1)
    by1 = jnp.where(repeat, jnp.mod(iy1, jnp.maximum(h1, 1)), iy1)
    offx = bx1 - jnp.floor(bx * 0.5) + 1.0
    offy = by1 - jnp.floor(by * 0.5) + 1.0
    offx = jnp.clip(jnp.where(repeat, jnp.mod(offx, jnp.maximum(w1, 1)), offx), 0.0, 1.0)
    offy = jnp.clip(jnp.where(repeat, jnp.mod(offy, jnp.maximum(h1, 1)), offy), 0.0, 1.0)

    cidx = jnp.arange(3, dtype=jnp.float32)
    nx = offx + (tx1 > 0.5)
    ny = offy + (ty1 > 0.5)
    wx3 = jnp.where(
        bilinear[..., None],
        (cidx == offx[..., None]) * (1.0 - tx1)[..., None]
        + (cidx == offx[..., None] + 1.0) * tx1[..., None],
        (cidx == nx[..., None]).astype(jnp.float32),
    )  # [..., 3]
    wy3 = jnp.where(
        bilinear[..., None],
        (cidx == offy[..., None]) * (1.0 - ty1)[..., None]
        + (cidx == offy[..., None] + 1.0) * ty1[..., None],
        (cidx == ny[..., None]).astype(jnp.float32),
    )
    # explicit 9-term accumulation: a reshape/einsum over a [..., 9, 4]
    # intermediate materializes ~300 MB at batch — this form fuses
    c1 = jnp.zeros_like(c0)
    for j in range(3):
        for i in range(3):
            c0ch = 16 + (j * 3 + i) * 4
            wji = (wy3[..., j] * wx3[..., i])[..., None]
            c1 = c1 + wji * blk[..., c0ch : c0ch + 4]
    return c0 + (c1 - c0) * frac[..., None]


def sample(atlas: TextureAtlas, tex_id, uv, lod=None, flags=None):
    """Sample texture `tex_id` at `uv`. Broadcasts over leading dims.
    tex_id: [...] i32; uv: [..., 2]; lod: [...] f32 mip level or None
    (None = base level only, e.g. Options.mipmaps off). Returns [..., 4].
    Trilinear (blend between the two straddling levels) when the texture's
    filter flag is set; nearest level otherwise. With a dual-packed atlas
    the trilinear tap is a single gather (_sample_dual).

    flags: optional ([...] repeat bool, [...] bilinear bool) the caller
    already carries per pixel (the rasterizer encodes them per triangle,
    render/raster.py enc bits 21/22). When given WITH a lod that is
    already clamped to the texture's chain (the rasterizer clamps at
    encode time), the per-pixel table metadata collapses to ONE mip_pairs
    gather — 3 per-pixel gathers per trilinear tap instead of 6. Results
    are bit-identical to the flagless path."""
    tid = jnp.clip(tex_id, 0, atlas.table.shape[0] - 1)
    # per-pixel metadata rows index FLAT ([T*MAX_MIPS, 8]): a composite
    # 2-axis gather [tid, l0] lowers to XLA's generic gather and measures
    # ~2x the cost of a single-index row gather on these small tables
    if flags is not None:
        repeat, bilinear = flags
        mp = atlas.mip_pairs.reshape(-1, 8)
        if lod is None:
            rect = mp[tid * MAX_MIPS][..., :4]
            return _sample_level(atlas, rect, repeat, bilinear, uv)
        # lod is pre-clamped to [0, n_mips-1] and pre-rounded for
        # nearest-level textures; frac at the chain end is 0 because the
        # clamp lands exactly on an integer level
        l0 = jnp.floor(lod).astype(jnp.int32)
        frac = jnp.where(bilinear, lod - l0.astype(jnp.float32), 0.0)
        pair = mp[tid * MAX_MIPS + l0]  # [..., 8]
        c0 = _sample_level(atlas, pair[..., 0:4], repeat, bilinear, uv)
        c1 = _sample_level(atlas, pair[..., 4:8], repeat, bilinear, uv)
        return c0 + (c1 - c0) * frac[..., None]

    t = atlas.table[tid]
    repeat = t[..., 4] > 0.5
    bilinear = t[..., 5] > 0.5
    if lod is None:
        return _sample_level(atlas, t[..., :4], repeat, bilinear, uv)

    max_l = jnp.maximum(atlas.n_mips[tid] - 1.0, 0.0)
    lodc = jnp.clip(lod, 0.0, max_l)
    l0 = jnp.floor(jnp.where(bilinear, lodc, jnp.round(lodc))).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_l.astype(jnp.int32))
    frac = jnp.where(bilinear, lodc - l0.astype(jnp.float32), 0.0)
    mips_flat = atlas.mips.reshape(-1, 4)  # single-index row gathers (see above)
    r0 = mips_flat[tid * MAX_MIPS + l0]
    r1 = mips_flat[tid * MAX_MIPS + l1]
    if atlas.dual is not None:
        return _sample_dual(atlas, r0, r1, repeat, bilinear, uv, frac)
    c0 = _sample_level(atlas, r0, repeat, bilinear, uv)
    c1 = _sample_level(atlas, r1, repeat, bilinear, uv)
    return c0 + (c1 - c0) * frac[..., None]
