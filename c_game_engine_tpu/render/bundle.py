"""RenderBundle: per-map device arrays for the software rasterizer.

Collects what VK_LoadMap uploads to the GPU (Vulkan.c:1045-1078): map
geometry, actor model registry (LOD0), wall quad parameters, sky mesh, the
texture atlas and the lightmap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from c_game_engine_tpu.assets.codecs import ModelShader, decode_gfon
from c_game_engine_tpu.render.hud import HudAssets
from c_game_engine_tpu.render.textures import TextureAtlas, build_atlas
from c_game_engine_tpu.ui.stack import NUM_UITEX, UiAssets

MAX_SKINS = 8
MAX_SLOTS = 8
MAX_LODS = 4


@struct.dataclass
class RenderBundle:
    atlas: TextureAtlas
    lightmap: jnp.ndarray  # [LH, LW, 4]

    # static map geometry as a triangle soup
    map_pos: jnp.ndarray  # [Tm, 3, 3]
    map_uv: jnp.ndarray  # [Tm, 3, 2]
    map_lmuv: jnp.ndarray  # [Tm, 3, 2]
    map_tex: jnp.ndarray  # [Tm] i32
    map_shaded: jnp.ndarray  # [Tm] bool

    # model triangle pool (all models referenced by the map, LOD0)
    mdl_pos: jnp.ndarray  # [Tp, 3, 3] local space
    mdl_uv: jnp.ndarray  # [Tp, 3, 2]
    mdl_color: jnp.ndarray  # [Tp, 3, 4] vertex color
    mdl_slot: jnp.ndarray  # [Tp] i32 material slot
    mdl_lod: jnp.ndarray  # [Tp] i32 LOD index of each pool triangle
    mdl_range: jnp.ndarray  # [M, 2] i32 (start, count) per model id (all LODs)
    mdl_lod_dist_sq: jnp.ndarray  # [M, MAX_LODS] LOD switch distance^2 (inf pad)
    mdl_skin_tex: jnp.ndarray  # [M, MAX_SKINS, MAX_SLOTS] i32 texture id
    mdl_skin_color: jnp.ndarray  # [M, MAX_SKINS, MAX_SLOTS, 4] material color
    mdl_skin_shaded: jnp.ndarray  # [M, MAX_SKINS, MAX_SLOTS] bool

    # sky
    sky_pos: jnp.ndarray  # [Ts, 3, 3]
    sky_uv: jnp.ndarray  # [Ts, 3, 2]
    sky_tex: jnp.ndarray  # [] i32 (-1 = no sky)

    # HUD assets (render/hud.py)
    hud: HudAssets

    # widget-stack assets (ui/stack.py; interface/*.gtex + small_font)
    ui: UiAssets

    # viewmodel (first-person item model; eraser item only — EraserItem.c
    # SwitchTo loads model/eraser.gmdl at x=+0.5, yaw 5 deg)
    vm_pos: jnp.ndarray  # [Tv, 3, 3]
    vm_uv: jnp.ndarray  # [Tv, 3, 2]
    vm_color: jnp.ndarray  # [Tv, 3, 4]
    vm_tex: jnp.ndarray  # [Tv] i32
    vm_item: jnp.ndarray  # [Tv] i32 which item id shows this model

    # static upper bound on simultaneously-valid triangles in any frame
    # (map + per-actor worst LOD + walls + sky) — sizes the pre-clip
    # compaction in render/raster.py so it can never drop live geometry
    live_tri_bound: int = struct.field(pytree_node=False, default=1 << 30)
    # whether any texture/material/actor color carries alpha < 1: gates
    # the screen-door reveal-behind second render pass (render/raster.py)
    has_alpha: bool = struct.field(pytree_node=False, default=True)
    # atlas slot id -> source texture asset name (Textures[] descriptor
    # index bookkeeping, VulkanHelpers.c:120-137); lets tests resolve a
    # tex id back to the decoded .gtex independently of the atlas packing
    tex_names: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_map_tris(self):
        return self.map_pos.shape[0]


def _morton3(c):
    """30-bit Morton codes of points [N, 3] over their own AABB (10
    bits/axis) — spatial sort key for big-model triangle coherence."""
    mn, mx = c.min(0), c.max(0)
    q = np.clip(
        ((c - mn) / np.maximum(mx - mn, 1e-9) * 1023.0), 0, 1023
    ).astype(np.uint32)

    def spread(x):
        x = (x | (x << np.uint32(16))) & np.uint32(0x030000FF)
        x = (x | (x << np.uint32(8))) & np.uint32(0x0300F00F)
        x = (x | (x << np.uint32(4))) & np.uint32(0x030C30C3)
        x = (x | (x << np.uint32(2))) & np.uint32(0x09249249)
        return x

    return (
        (spread(q[:, 0]) << np.uint32(2))
        | (spread(q[:, 1]) << np.uint32(1))
        | spread(q[:, 2])
    )


def build_render_bundle(cmap) -> RenderBundle:
    aux = cmap.aux
    resolver = aux["resolver"]
    tex_names = list(aux["texture_names"])
    tex_index = {n: i for i, n in enumerate(tex_names)}

    def intern(name):
        if name not in tex_index:
            tex_index[name] = len(tex_names)
            tex_names.append(name)
        return tex_index[name]

    # ---------------- map geometry ----------------
    mv = np.asarray(cmap.map_verts)
    mi = np.asarray(cmap.map_indices).reshape(-1, 3)
    vt = np.asarray(cmap.map_vert_tex)
    vs = np.asarray(cmap.map_vert_shaded)
    map_pos = mv[mi][:, :, 0:3] if len(mi) else np.zeros((0, 3, 3), np.float32)
    map_uv = mv[mi][:, :, 3:5] if len(mi) else np.zeros((0, 3, 2), np.float32)
    map_lmuv = mv[mi][:, :, 5:7] if len(mi) else np.zeros((0, 3, 2), np.float32)
    map_tex = vt[mi[:, 0]] if len(mi) else np.zeros(0, np.int32)
    map_shaded = vs[mi[:, 0]] if len(mi) else np.zeros(0, bool)

    # ---------------- models ----------------
    model_names = aux["model_names"]
    pool_pos, pool_uv, pool_color, pool_slot, pool_lod = [], [], [], [], []
    m_count = max(len(model_names), 1)
    ranges = np.zeros((m_count, 2), np.int32)
    lod_dist_sq = np.full((m_count, MAX_LODS), np.inf, np.float32)
    skin_tex = np.full((m_count, MAX_SKINS, MAX_SLOTS), -1, np.int32)
    skin_color = np.ones((m_count, MAX_SKINS, MAX_SLOTS, 4), np.float32)
    skin_shaded = np.zeros((m_count, MAX_SKINS, MAX_SLOTS), bool)
    off = 0
    for m_id, name in enumerate(model_names):
        info = resolver.model(name)
        count = 0
        for lod_i, lod in enumerate(info.model.lods[:MAX_LODS]):
            lod_dist_sq[m_id, lod_i] = lod.distance_squared
            verts = lod.vertices  # [V, 12]
            for slot, idx in enumerate(lod.indices):
                if len(idx) == 0:
                    continue
                tri = idx.reshape(-1, 3).astype(np.int64)
                if len(tri) > 4096:
                    # big models route to the streamed rasterizer
                    # (ops/raster_tiles_big.py), whose subchunk-bbox
                    # pruning wants spatially-coherent row order: sort
                    # by centroid Morton code within the (lod, slot)
                    # block. Only z-TIE winners can change (<0.2% px).
                    tri = tri[np.argsort(_morton3(verts[tri][:, :, 0:3].mean(1)))]
                pool_pos.append(verts[tri][:, :, 0:3])
                pool_uv.append(verts[tri][:, :, 3:5])
                pool_color.append(verts[tri][:, :, 5:9])
                pool_slot.append(np.full(len(tri), slot, np.int32))
                pool_lod.append(np.full(len(tri), lod_i, np.int32))
                count += len(tri)
        ranges[m_id] = (off, count)
        off += count
        skins = info.model.skins
        for s in range(min(len(skins), MAX_SKINS)):
            for slot in range(min(skins.shape[1], MAX_SLOTS)):
                mat = info.model.materials[int(skins[s, slot])]
                skin_tex[m_id, s, slot] = intern(mat["texture"])
                skin_color[m_id, s, slot] = mat["color"]
                skin_shaded[m_id, s, slot] = int(mat["shader"]) == int(ModelShader.SHADED)
        # out-of-range skins fall back to skin 0 (PhysicsModel.c bounds check)
        for s in range(len(skins), MAX_SKINS):
            skin_tex[m_id, s] = skin_tex[m_id, 0]
            skin_color[m_id, s] = skin_color[m_id, 0]
            skin_shaded[m_id, s] = skin_shaded[m_id, 0]

    if pool_pos:
        mdl_pos = np.concatenate(pool_pos, 0).astype(np.float32)
        mdl_uv = np.concatenate(pool_uv, 0).astype(np.float32)
        mdl_color = np.concatenate(pool_color, 0).astype(np.float32)
        mdl_slot = np.concatenate(pool_slot, 0)
        mdl_lod = np.concatenate(pool_lod, 0)
    else:
        mdl_pos = np.zeros((0, 3, 3), np.float32)
        mdl_uv = np.zeros((0, 3, 2), np.float32)
        mdl_color = np.zeros((0, 3, 4), np.float32)
        mdl_slot = np.zeros(0, np.int32)
        mdl_lod = np.zeros(0, np.int32)

    # ---------------- sky ----------------
    sky_tex_id = -1
    sky_pos = np.zeros((0, 3, 3), np.float32)
    sky_uv = np.zeros((0, 3, 2), np.float32)
    if aux.get("sky_texture"):
        sky_tex_id = intern(aux["sky_texture"])
        sky_info = resolver.model("model/sky.gmdl")
        lod = sky_info.model.lods[0]
        verts = lod.vertices
        for idx in lod.indices:
            if len(idx):
                tri = idx.reshape(-1, 3).astype(np.int64)
                sky_pos = verts[tri][:, :, 0:3].astype(np.float32)
                sky_uv = verts[tri][:, :, 3:5].astype(np.float32)
                break

    # ---------------- HUD assets ----------------
    def intern_or_missing(name):
        return intern(name) if resolver.resolve(name) else -1

    ycoin = intern_or_missing("texture/interface/hud_ycoin.gtex")
    bcoin = intern_or_missing("texture/interface/hud_bcoin.gtex")
    cross = intern_or_missing("texture/interface/crosshair.gtex")

    def font_arrays(name):
        start = np.full(128, -1.0, np.float32)
        end = np.full(128, -1.0, np.float32)
        fw_ = np.zeros(128, np.float32)
        fh_, fsp, ftex = 16.0, 1.0, -1
        path = resolver.resolve(name)
        if path:
            f = decode_gfon(path)
            ftex = intern_or_missing(f.texture)
            fh_ = float(f.texture_height)
            fsp = float(f.char_spacing)
            for i, ch in enumerate(f.chars):
                ci = ord(ch)
                if ci < 128:
                    start[ci] = f.start_uvs[i]
                    end[ci] = f.end_uvs[i]
                    fw_[ci] = f.widths[i]
            if f.uppercase_only:
                for lo in range(ord("a"), ord("z") + 1):
                    up = lo - 32
                    start[lo] = start[up]
                    end[lo] = end[up]
                    fw_[lo] = fw_[up]
        return ftex, start, end, fw_, fh_, fsp

    font_tex, font_start, font_end, font_w, font_h, font_sp = font_arrays(
        "font/large_font.gfon"
    )
    hud = HudAssets(
        ycoin_tex=jnp.asarray(np.int32(ycoin)),
        bcoin_tex=jnp.asarray(np.int32(bcoin)),
        crosshair_tex=jnp.asarray(np.int32(cross)),
        font_tex=jnp.asarray(np.int32(font_tex)),
        font_start_u=jnp.asarray(font_start),
        font_end_u=jnp.asarray(font_end),
        font_widths=jnp.asarray(font_w),
        font_height=jnp.asarray(np.float32(font_h)),
        font_spacing=jnp.asarray(np.float32(font_sp)),
    )

    # ---------------- UI assets ----------------
    # slot order must match ui/stack.py UITEX_* constants
    ui_names = [
        "texture/interface/button.gtex",
        "texture/interface/button_hover.gtex",
        "texture/interface/button_pressed.gtex",
        "texture/interface/slider.gtex",
        "texture/interface/slider_thumb.gtex",
        "texture/interface/checkbox_unchecked.gtex",
        "texture/interface/checkbox_checked.gtex",
        "texture/interface/radio_unchecked.gtex",
        "texture/interface/radio_checked.gtex",
        "texture/interface/textbox.gtex",
        "texture/interface/focus_rect.gtex",
        "texture/interface/menu_logo.gtex",
        "texture/interface/pause_logo.gtex",
        "texture/interface/studio.gtex",
    ]
    assert len(ui_names) == NUM_UITEX
    ui_tex = np.full(NUM_UITEX, -1, np.int32)
    ui_size = np.ones((NUM_UITEX, 2), np.float32)
    for i, name in enumerate(ui_names):
        if resolver.resolve(name):
            ui_tex[i] = intern(name)
            t = resolver.texture(name)
            ui_size[i] = (t.width, t.height)
    sf_tex, sf_start, sf_end, sf_w, sf_h, sf_sp = font_arrays("font/small_font.gfon")
    ui_assets = UiAssets(
        tex=jnp.asarray(ui_tex),
        tex_size=jnp.asarray(ui_size),
        font_tex=jnp.asarray(np.int32(sf_tex)),
        font_start_u=jnp.asarray(sf_start),
        font_end_u=jnp.asarray(sf_end),
        font_widths=jnp.asarray(sf_w),
        font_height=jnp.asarray(np.float32(sf_h)),
        font_spacing=jnp.asarray(np.float32(sf_sp)),
    )

    # ---------------- viewmodel models ----------------
    vm_pos = np.zeros((0, 3, 3), np.float32)
    vm_uv = np.zeros((0, 3, 2), np.float32)
    vm_color = np.zeros((0, 3, 4), np.float32)
    vm_tex = np.zeros(0, np.int32)
    vm_item = np.zeros(0, np.int32)
    er_path = resolver.resolve("model/eraser.gmdl")
    if er_path:
        from c_game_engine_tpu.assets.codecs import decode_gmdl

        em = decode_gmdl(er_path)
        lod = em.lods[0]
        verts = lod.vertices
        parts_p, parts_u, parts_c, parts_t = [], [], [], []
        for slot, idx in enumerate(lod.indices):
            if not len(idx):
                continue
            tri = idx.reshape(-1, 3).astype(np.int64)
            mat = em.materials[int(em.skins[0, slot])] if len(em.skins) else em.materials[0]
            parts_p.append(verts[tri][:, :, 0:3])
            parts_u.append(verts[tri][:, :, 3:5])
            parts_c.append(verts[tri][:, :, 5:9] * mat["color"][None, None, :])
            parts_t.append(np.full(len(tri), intern(mat["texture"]), np.int32))
        vm_pos = np.concatenate(parts_p, 0).astype(np.float32)
        vm_uv = np.concatenate(parts_u, 0).astype(np.float32)
        vm_color = np.concatenate(parts_c, 0).astype(np.float32)
        vm_tex = np.concatenate(parts_t, 0)
        vm_item = np.zeros(len(vm_pos), np.int32)  # eraser = item 0

    atlas = build_atlas([resolver.texture(n) for n in tex_names])

    # static live-triangle bound: LOD selection keeps exactly one LOD per
    # actor, so the worst case is each actor at its largest LOD
    mdl_lod_np = np.asarray(mdl_lod)
    ranges_np = np.asarray(ranges)
    worst_lod = np.zeros(len(ranges_np), np.int64)
    for m in range(len(ranges_np)):
        s, c = ranges_np[m]
        if c > 0:
            lods_here = mdl_lod_np[s : s + c]
            worst_lod[m] = max(
                (lods_here == l).sum() for l in np.unique(lods_here)
            )
    model_id_np = np.asarray(cmap.model_id)
    wall_axis_np = np.asarray(cmap.wall_axis)
    live_bound = int(
        len(map_pos)
        + sum(int(worst_lod[m]) for m in model_id_np if m >= 0)
        + 2 * int((wall_axis_np >= 0).sum())
        + len(sky_pos)
    )

    atlas_np_alpha = min(
        (float(np.asarray(resolver.texture(n).pixels)[..., 3].min()) for n in tex_names),
        default=1.0,
    )
    color_alpha = min(
        float(np.asarray(cmap.init_mod_color)[..., 3].min()),
        float(np.asarray(skin_color)[..., 3].min()),
        float(np.asarray(mdl_color)[..., 3].min()) if len(mdl_color) else 1.0,
    )
    has_alpha = bool(min(atlas_np_alpha, color_alpha) < 0.999)

    return RenderBundle(
        live_tri_bound=live_bound,
        has_alpha=has_alpha,
        tex_names=tuple(tex_names),
        atlas=atlas,
        lightmap=cmap.lightmap,
        map_pos=jnp.asarray(map_pos),
        map_uv=jnp.asarray(map_uv),
        map_lmuv=jnp.asarray(map_lmuv),
        map_tex=jnp.asarray(map_tex.astype(np.int32)),
        map_shaded=jnp.asarray(map_shaded),
        mdl_pos=jnp.asarray(mdl_pos),
        mdl_uv=jnp.asarray(mdl_uv),
        mdl_color=jnp.asarray(mdl_color),
        mdl_slot=jnp.asarray(mdl_slot),
        mdl_lod=jnp.asarray(mdl_lod),
        mdl_range=jnp.asarray(ranges),
        mdl_lod_dist_sq=jnp.asarray(lod_dist_sq),
        mdl_skin_tex=jnp.asarray(skin_tex),
        mdl_skin_color=jnp.asarray(skin_color),
        mdl_skin_shaded=jnp.asarray(skin_shaded),
        sky_pos=jnp.asarray(sky_pos),
        sky_uv=jnp.asarray(sky_uv),
        sky_tex=jnp.asarray(np.int32(sky_tex_id)),
        hud=hud,
        ui=ui_assets,
        vm_pos=jnp.asarray(vm_pos),
        vm_uv=jnp.asarray(vm_uv),
        vm_color=jnp.asarray(vm_color),
        vm_tex=jnp.asarray(vm_tex),
        vm_item=jnp.asarray(vm_item),
    )
