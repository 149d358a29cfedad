"""Software rasterizer (XLA reference implementation).

Replaces the Vulkan render path (VK_RenderMap, Vulkan.c:850-912: sky -> map
-> actors -> viewmodel) with a two-pass batched rasterizer:

  pass 1: scan triangle chunks, keep per-pixel depth + winning triangle id
  pass 2: recompute the winner's attributes per pixel and apply the exact
          extracted fragment math (map_shaded_f / model_(un)shaded_f /
          sky_f .gshd sources — see shade())

Depth = NDC z interpolated affinely in screen space (exact for planar
triangles with a zo projection); attributes are perspective-corrected via
1/w. Triangles are clipped against the near plane (1 -> up to 2 emission,
_clip_near). Alpha screen-door discard currently falls through to fog/sky
rather than the next fragment behind (single-winner buffer; faithful for
the maps' mostly-opaque surfaces).

Pass 1 has two interchangeable backends sharing the same triangle setup
and pass-2 shading:
  "xla"    — chunked lax.scan evaluating [CHUNK, H, W] edge functions;
             the correctness reference for image goldens, runs anywhere.
  "pallas" — ops/raster_tiles.py tile kernel: (8, 128) VMEM framebuffer
             tiles, per-tile compacted triangle lists, z/winner in
             registers. The TPU production path.
The default ("auto") picks pallas on TPU and xla elsewhere; both compute
the identical edge/z expressions so winner ids match up to float ties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from c_game_engine_tpu.actors.defs import ActorClass
from c_game_engine_tpu.render.textures import sample
from c_game_engine_tpu.utils.mathx import (
    perspective_lh_zo,
    quat_from_axis_angle,
    quat_from_yaw_pitch,
    quat_mul,
    quat_look,
    quat_rotate,
)

CHUNK = 64
CULL_MODE = "neg"  # neg | pos | none (debug)
BACKEND = "auto"  # pass-1 default: auto | xla | pallas
MAGIC_XY = jnp.array([0.06711056, 0.00583715])
MAGIC_Z = 52.9829189

# triangle kinds
KIND_MAP = 0
KIND_MODEL = 1
KIND_WALL = 2
KIND_SKY = 3


def camera_matrix(cmap, state, width, height, fov_deg=90.0):
    """View-projection matrix (VulkanHelpers.c:140-171): perspective_lh_zo
    (fov, w/h, 0.01, 2000) x quat_look(pos, rot * rotX(pi))."""
    p = state.player
    cam_pos = jnp.where(p.freecam, p.freecam_pos, p.pos + jnp.array([0.0, 0.25, 0.0]))
    cam_rot = quat_from_yaw_pitch(p.yaw, p.pitch)
    # camera actor override (Camera.c: enable swaps GetState()->camera)
    use_actor = state.camera_actor >= 0
    ci = jnp.clip(state.camera_actor, 0, cmap.num_actors - 1)
    cam_pos = jnp.where(use_actor, state.actors.pos[ci], cam_pos)
    cam_rot = jnp.where(use_actor, state.actors.quat[ci], cam_rot)

    persp = perspective_lh_zo(jnp.deg2rad(fov_deg), width / height, 0.01, 2000.0)
    flip = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi)
    view = quat_look(cam_pos, quat_mul(cam_rot, flip))
    # full-f32 product: TPU's default bf16 matmul inputs round the z-row
    # constants (far/(far-near) = 1.000005, -far*near/(far-near) = -0.01)
    # to 1.0/-0.0100, collapsing NDC depth of distant geometry to exactly
    # 1.0 — which the z < 1 raster gate then culls, rendering whole maps
    # as pure sky on TPU while CPU (always f32) draws them (PARITY.md #19)
    return jnp.matmul(persp, view, precision=jax.lax.Precision.HIGHEST), cam_pos


def gather_triangles(bundle, cmap, state, camera_pos_hint=None):
    """Assemble the per-env world-space triangle soup with attributes.

    Returns dict of arrays over T = Tmap + Tmodels + Twalls + Tsky:
      pos [T,3,3], uv [T,3,2], lmuv [T,3,2], color [T,3,4], tex [T],
      kind [T], shaded [T], valid [T], twosided [T]
    """
    actors = state.actors
    n = cmap.num_actors

    parts = []

    def add(pos, uv, color, tex, kind, shaded, valid, twosided, lmuv=None):
        t = pos.shape[0]
        parts.append(
            dict(
                pos=pos,
                uv=uv,
                lmuv=jnp.zeros((t, 3, 2)) if lmuv is None else lmuv,
                color=color,
                tex=tex,
                kind=jnp.full((t,), kind, jnp.int32),
                shaded=shaded,
                valid=valid,
                twosided=jnp.full((t,), twosided, bool),
            )
        )

    # ---- map ----
    tm = bundle.map_pos.shape[0]
    add(
        bundle.map_pos,
        bundle.map_uv,
        jnp.ones((tm, 3, 4)),
        bundle.map_tex,
        KIND_MAP,
        bundle.map_shaded,
        jnp.ones((tm,), bool),
        False,
        lmuv=bundle.map_lmuv,
    )

    # ---- actor models ----
    # static table: which pool triangles belong to which actor
    import numpy as np

    model_id = np.asarray(cmap.model_id)
    actor_rows, pool_rows = [], []
    ranges = np.asarray(bundle.mdl_range)
    for i in range(n):
        m = model_id[i]
        if m >= 0:
            s, c = ranges[m]
            actor_rows.extend([i] * int(c))
            pool_rows.extend(range(int(s), int(s + c)))
    if actor_rows:
        a_of = jnp.asarray(np.array(actor_rows, np.int32))
        p_of = jnp.asarray(np.array(pool_rows, np.int32))
        local = bundle.mdl_pos[p_of]  # [Tmo, 3, 3]
        aq = actors.quat[a_of]
        ap = actors.pos[a_of]
        world = quat_rotate(aq[:, None, :], local) + ap[:, None, :]
        slot = bundle.mdl_slot[p_of]
        mid = cmap.model_id[a_of]
        skin = jnp.clip(actors.skin[a_of], 0, bundle.mdl_skin_tex.shape[1] - 1)
        tex = bundle.mdl_skin_tex[mid, skin, slot]
        mat_color = bundle.mdl_skin_color[mid, skin, slot]
        shaded = bundle.mdl_skin_shaded[mid, skin, slot]
        vcolor = bundle.mdl_color[p_of]
        color = vcolor * mat_color[:, None, :] * actors.mod_color[a_of][:, None, :]
        # LOD selection per actor: camera distance^2 vs per-LOD thresholds
        # (LodThread.c:56-78; lodMultiplier fixed at 1.0)
        cam = camera_pos_hint if camera_pos_hint is not None else state.player.pos
        d2 = jnp.sum((actors.pos - cam[None, :]) ** 2, -1)  # [N]
        thresh = bundle.mdl_lod_dist_sq[cmap.model_id.clip(0)]  # [N, MAX_LODS]
        # LOD i applies once d2 exceeds lod[i].distanceSquared; lod 0 always
        sel_lod = jnp.sum((d2[:, None] >= thresh[:, 1:]).astype(jnp.int32), axis=1)
        sel_lod = jnp.clip(sel_lod, 0, bundle.mdl_lod_dist_sq.shape[1] - 1)
        valid = (
            actors.active[a_of]
            & actors.visible[a_of]
            & (bundle.mdl_lod[p_of] == sel_lod[a_of])
        )
        add(world, bundle.mdl_uv[p_of], color, tex, KIND_MODEL, shaded, valid, False)

    # ---- actor walls (two-sided quads; base verts VulkanResources.c:251-334,
    # vertex math actor_wall_shaded_v.gshd) ----
    wall_mask_np = np.asarray(cmap.wall_axis) >= 0
    wall_rows = np.where(wall_mask_np)[0]
    if len(wall_rows):
        w_of = jnp.asarray(wall_rows.astype(np.int32))
        wq = actors.quat[w_of]
        wp = actors.pos[w_of]
        axis = cmap.wall_axis[w_of]  # 0 X, 1 Z
        size = cmap.wall_size[w_of]  # length, height (inScale)
        # lasers override length + uv scroll from live state (Laser.c)
        is_laser = cmap.cls[w_of] == int(ActorClass.LASER)
        length = jnp.where(is_laser, actors.fdata[w_of, 0], size[:, 0])
        size = jnp.stack([length, size[:, 1]], -1)
        center = cmap.wall_center[w_of]
        center = jnp.where(
            is_laser[:, None],
            jnp.stack([-length / 2, jnp.zeros_like(length)], -1),
            center,
        )
        uv_scale = cmap.wall_uv_scale[w_of]
        uv_off = cmap.wall_uv_offset[w_of]
        is_coin = cmap.cls[w_of] == int(ActorClass.COIN)
        uv_off = jnp.where(
            is_coin[:, None],
            jnp.stack([0.25 * actors.idata[w_of, 0].astype(jnp.float32), jnp.zeros_like(length)], -1),
            uv_off,
        )
        uv_off = jnp.where(
            is_laser[:, None],
            jnp.stack([actors.fdata[w_of, 1], jnp.zeros_like(length)], -1),
            uv_off,
        )
        # quad corners in 2D: (+-0.5, +-0.5); uv: u = x+0.5, v = 0.5-y
        corners2 = jnp.array(
            [[0.5, -0.5], [0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5]], jnp.float32
        )
        base_uv = jnp.stack([corners2[:, 0] + 0.5, 0.5 - corners2[:, 1]], -1)
        p2 = corners2[None] * size[:, None, :] + center[:, None, :]  # [W,4,2]
        ax = jnp.where(axis == 0, 1.0, 0.0)
        az = jnp.where(axis == 1, 1.0, 0.0)
        p3 = jnp.stack(
            [p2[..., 0] * ax[:, None], p2[..., 1], p2[..., 0] * az[:, None]], -1
        )
        world4 = quat_rotate(wq[:, None, :], p3) + wp[:, None, :]  # [W,4,3]
        uv4 = base_uv[None] * uv_scale[:, None, :] * size[:, None, :] + uv_off[:, None, :]
        tri_idx = jnp.array([[0, 1, 2], [0, 2, 3]])
        wpos = world4[:, tri_idx]  # [W,2,3,3]
        wuv = uv4[:, tri_idx]
        wpos = wpos.reshape(-1, 3, 3)
        wuv = wuv.reshape(-1, 3, 2)
        wtex = jnp.repeat(cmap.wall_tex[w_of], 2)
        wshaded = jnp.repeat(~cmap.wall_unshaded[w_of], 2)
        wcolor = jnp.repeat(actors.mod_color[w_of], 2, axis=0)[:, None, :].repeat(3, 1)
        wvalid = jnp.repeat(
            actors.active[w_of] & actors.visible[w_of] & (cmap.wall_tex[w_of] >= 0), 2
        )
        add(wpos, wuv, wcolor, wtex, KIND_WALL, wshaded, wvalid, True)

    # ---- sky (sky_v.gshd: position offset by camera pos; added in render())
    return parts


def _concat_parts(parts):
    out = {}
    for k in parts[0]:
        out[k] = jnp.concatenate([p[k] for p in parts], axis=0)
    return out


# Maps whose worst-case live triangle count exceeds this use the XLA
# backend under "auto": the tile kernel's VMEM-resident table caps at
# T_CULL live triangles and overflow drops geometry. Only orb.gmap (78k
# hull-model tris) exceeds it among the shipped maps.
PALLAS_MAX_BOUND = 65536


def _resolve_backend(backend, height, width, bundle=None):
    backend = BACKEND if backend is None else backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if bundle is not None and bundle.live_tri_bound > PALLAS_MAX_BOUND:
            # beyond the VMEM-resident table: stream the soup through the
            # chunked kernel (ops/raster_tiles_big.py)
            backend = "pallas_big" if backend == "pallas" else "xla"
    # the tile kernels need whole (8, 128) framebuffer tiles
    if backend in ("pallas", "pallas_big") and (height % 8 or width % 128):
        backend = "xla"
    return backend


# Framebuffer tile for the reveal-pass shade compaction. Aliased from the
# kernel's tile shape so kernel tile-gating and the packed shade can never
# disagree; (8, 128) is the native TPU layout tile, so packing is a pure
# sublane-block permutation (no lane shuffles).
from c_game_engine_tpu.ops.raster_tiles import TILE_H as RTILE_H, TILE_W as RTILE_W
# Compacted pass-2 shade budget = num_tiles // REVEAL_TILE_FRAC tiles.
# Frames whose screen-door pixels touch more tiles OVERFLOW to a
# full-frame pass-2 shade via lax.cond — taken for real only outside
# vmap (render()) or hoisted to the batch level (render_batch()).
# Bench poses touch <= 2 of 64 tiles; 1/8 keeps 8 tiles of headroom at
# 256^2 (orb B=32: 579 -> 556 ms/frame-batch vs 1/4).
REVEAL_TILE_FRAC = 8


def _tile_pack(a, order_c, nty, ntx):
    """Gather [H, W, ...] image tiles into [K, RTILE_H, RTILE_W, ...] by
    flat tile ids `order_c` (pre-clipped to a valid range)."""
    extra = a.shape[2:]
    at = a.reshape(nty, RTILE_H, ntx, RTILE_W, *extra)
    at = jnp.moveaxis(at, 2, 1).reshape(nty * ntx, RTILE_H, RTILE_W, *extra)
    return at[order_c]


def _tile_unpack(vals, order, nty, ntx, fill):
    """Scatter [K, RTILE_H, RTILE_W, C] tiles back to a [H, W, C] image
    initialized to `fill`; order entries == nty*ntx (padding) drop."""
    nt = nty * ntx
    c = vals.shape[-1]
    buf = jnp.broadcast_to(fill, (nt, RTILE_H, RTILE_W, c)).astype(vals.dtype)
    buf = buf.at[order].set(vals, mode="drop")
    buf = jnp.moveaxis(buf.reshape(nty, ntx, RTILE_H, RTILE_W, c), 1, 2)
    return buf.reshape(nty * RTILE_H, ntx * RTILE_W, c)


def _attrs_from_winner(vattr36, enc, winner, gxx, gyy):
    """Per-pixel attribute fetch + perspective-correct interpolation from
    a winner-id image of ANY shape (full frame or packed tiles). vattr36
    [T, 36] is the flattened per-vertex table (vertex-major 3 x 12)."""
    has = winner >= 0
    widx = jnp.clip(winner, 0, None)
    ga = vattr36[widx].reshape(*winner.shape, 3, 12)
    v_sx = ga[..., 0]
    v_sy = ga[..., 1]
    v_iw = ga[..., 2]

    def edge_at(i, j):
        return (v_sx[..., j] - v_sx[..., i]) * (gyy - v_sy[..., i]) - (
            v_sy[..., j] - v_sy[..., i]
        ) * (gxx - v_sx[..., i])

    e0 = edge_at(0, 1)
    e1 = edge_at(1, 2)
    e2 = edge_at(2, 0)
    denom = e0 + e1 + e2
    denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
    b = jnp.stack([e1 / denom, e2 / denom, e0 / denom], -1)

    # perspective-correct interpolation
    iw = jnp.sum(b * v_iw, -1)  # interp(1/w)
    pw = 1.0 / jnp.maximum(iw, 1e-12)
    bw = (b * v_iw)[..., None]

    def interp(sl):  # channel slice of the packed gather
        return jnp.sum(ga[..., sl] * bw, axis=-2) * pw[..., None]

    uv = interp(slice(4, 6))
    lmuv = interp(slice(6, 8))
    color = interp(slice(8, 12))
    z_pix = jnp.sum(b * ga[..., 3], -1)
    frag_depth = z_pix * pw  # gl_FragCoord.z / gl_FragCoord.w
    return has, winner, uv, lmuv, color, frag_depth, enc[widx]


def _shade_generic(bundle, state, pass_data, gxx, gyy, aniso_uv, mipmaps, aniso):
    """Decode the enc word and shade a pass's pixels at any image shape.
    Returns (rgb, discard-with-sky-masked)."""
    has, winner, uv, lmuv, color, frag_depth, genc = pass_data
    tex_id = (genc & 0xFFF) - 1
    kind = (genc >> 12) & 3
    shaded = ((genc >> 14) & 1).astype(bool)
    lod_pix = ((genc >> 15) & 63).astype(jnp.float32) * 0.25 if mipmaps else None
    flags = (((genc >> 21) & 1).astype(bool), ((genc >> 22) & 1).astype(bool))
    astep = aniso_uv[jnp.clip(winner, 0, None)] if aniso_uv is not None else None
    rgb, disc = shade(
        bundle, state, gxx, gyy, uv, lmuv, color, tex_id, kind, shaded, frag_depth,
        lod=lod_pix, flags=flags, aniso_step=astep, aniso_taps=aniso,
    )
    return rgb, disc & has & (kind != KIND_SKY)


def _pass_data_of(backend, raw, vattr36, enc, gxx, gyy):
    """Normalize a pass's raw output to the per-pixel attribute tuple.
    pallas: raw = the 12 in-kernel-interpolated images; others: raw = the
    winner-id image, attributes gathered + interpolated here."""
    if backend == "pallas":
        (_zb, winner, frag_depth, uv_u, uv_v, lm_u, lm_v,
         col_r, col_g, col_b, col_a, genc) = raw
        has = winner >= 0
        uv = jnp.stack([uv_u, uv_v], -1)
        lmuv = jnp.stack([lm_u, lm_v], -1)
        color = jnp.stack([col_r, col_g, col_b, col_a], -1)
        return has, winner, uv, lmuv, color, frag_depth, genc
    return _attrs_from_winner(vattr36, enc, raw, gxx, gyy)


def _combine_layers(rgb1, disc1, has1, layer2):
    rgb = jnp.where(disc1[..., None], layer2, rgb1)
    rgb = jnp.where(has1[..., None], rgb, 0.0)
    return jnp.clip(rgb, 0.0, 1.0)


def _finish_reveal_full(bundle, ctx, state, height, width, mipmaps, aniso, backend):
    """Overflow fallback: shade the reveal pass over the FULL frame from
    the carried pass-2 raw output (winner image / kernel outs). Bitwise
    the pre-compaction behavior."""
    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    gxx, gyy = jnp.meshgrid(px, py)
    p2 = _pass_data_of(
        backend, ctx["raw2"], ctx.get("vattr36"), ctx.get("enc"), gxx, gyy
    )
    rgb2, disc2 = _shade_generic(
        bundle, state, p2, gxx, gyy, ctx.get("aniso_uv"), mipmaps, aniso
    )
    env = state.env
    fog_rgb = jnp.clip(env.fog_color[:3] * env.exposure, 0.0, 1.0)
    layer2 = jnp.where((p2[0] & ~disc2)[..., None], rgb2, fog_rgb)
    return _combine_layers(ctx["rgb1"], ctx["disc1"], ctx["has1"], layer2)


def render(bundle, cmap, state, height=256, width=256, fov_deg=90.0, backend=None,
           mipmaps=True, ssaa=1, aniso=0, debug_wireframe=False):
    """Render one env's view. Returns f32 [H, W, 3] in [0, 1].
    debug_wireframe=True overlays depth-tested collision wireframes
    (JoltDebugRendererDrawBodies counterpart; render/debug_draw.py).
    mipmaps=False samples base levels only (Options.mipmaps off,
    Options.h:37-84). ssaa=N renders at N x the resolution and box-filters
    down — the software counterpart of Options.msaa (true MSAA's
    edge-only resolve has no software-rasterizer cost advantage, so this
    supersamples shading too; PARITY.md #10). aniso=N is the sampler
    maxAnisotropy RATIO (VulkanResources.c:434-511; Options.anisotropy is
    an enum — models/game.py::_aniso_ratio maps 0..4 -> 0/2/4/8/16): the
    per-triangle mip level becomes log2(rho_major/clamped_ratio) and the
    shade averages N taps along the footprint's major axis, for
    linear-filtered mipmapped textures only (requires mipmaps; 0/1 =
    isotropic, the reference's anisotropy-off sampler).

    Pipeline (both backends): gather triangle soup -> PRE-CLIP compaction
    by the validity mask (the pool carries every LOD of every actor, so
    <10-15% is ever live; bundle.live_tri_bound proves the compacted cap
    never drops live geometry) -> vertex transform + near clip + cull ->
    pass 1 z-buffer -> pass 2 shading. The pallas backend interpolates
    attributes inside the tile kernel (ops/raster_tiles.py); the xla
    backend gathers per-pixel from a packed per-vertex table."""
    if ssaa > 1:
        big = render(
            bundle, cmap, state, height * ssaa, width * ssaa, fov_deg, backend,
            mipmaps=mipmaps, ssaa=1, aniso=aniso, debug_wireframe=debug_wireframe,
        )
        return big.reshape(height, ssaa, width, ssaa, 3).mean((1, 3))
    out, _, _ = _render_env(bundle, cmap, state, height, width, fov_deg, backend,
                            mipmaps, aniso, debug_wireframe, defer_reveal=False)
    return out


def render_batch(bundle, cmap, states, height=256, width=256, fov_deg=90.0,
                 backend=None, mipmaps=True, ssaa=1, aniso=0,
                 debug_wireframe=False):
    """Batched render with the reveal-overflow fallback hoisted OUT of the
    per-env vmap. Under vmap a lax.cond lowers to a select — BOTH branches
    execute for every env — which would erase the compacted pass-2
    shade's savings. Here each env computes the tile-compacted reveal and
    an overflow flag; the full-frame fallback re-shades all envs only
    when ANY env's screen-door pixels touch more than the tile budget.
    Prefer this over jax.vmap(render) in jitted batch paths (benchmarks,
    rollouts). Returns f32 [B, H, W, 3]."""
    if ssaa > 1:
        big = render_batch(bundle, cmap, states, height * ssaa, width * ssaa,
                           fov_deg, backend, mipmaps, 1, aniso, debug_wireframe)
        return big.reshape(-1, height, ssaa, width, ssaa, 3).mean((2, 4))
    rgb_cmp, overflow, ctx = jax.vmap(
        lambda e: _render_env(bundle, cmap, e, height, width, fov_deg, backend,
                              mipmaps, aniso, debug_wireframe, defer_reveal=True)
    )(states)
    if ctx is None:
        return rgb_cmp
    rbackend = _resolve_backend(backend, height, width, bundle)
    return jax.lax.cond(
        jnp.any(overflow),
        lambda: jax.vmap(
            lambda c, e: _finish_reveal_full(bundle, c, e, height, width,
                                             mipmaps, aniso, rbackend)
        )(ctx, states),
        lambda: rgb_cmp,
    )


def _render_env(bundle, cmap, state, height, width, fov_deg, backend,
                mipmaps, aniso, debug_wireframe, defer_reveal):
    """One env's pipeline. Returns (rgb, reveal_overflow, reveal_ctx):
    ctx is None when the reveal resolved locally (no alpha content, or a
    non-tile-aligned framebuffer); otherwise rgb is the tile-compacted
    result, and ctx carries what _finish_reveal_full needs to redo pass-2
    over the full frame when `reveal_overflow` fires."""
    backend = _resolve_backend(backend, height, width, bundle)
    vp, cam_pos = camera_matrix(cmap, state, width, height, fov_deg)
    parts = gather_triangles(bundle, cmap, state, camera_pos_hint=cam_pos)
    extra_live = 0
    if debug_wireframe:
        from c_game_engine_tpu.render.debug_draw import (
            collect_segments,
            segments_to_part,
        )

        segs, cols, dvalid = collect_segments(cmap, state)
        dbg_part = segments_to_part(segs, cols, dvalid, cam_pos)
        parts.append(dbg_part)
        extra_live = dbg_part["pos"].shape[0]

    # sky triangles follow the camera (sky_v.gshd). Sky goes FIRST in the
    # soup: cap overflow in the cull compaction below drops highest-index
    # rows, and losing sky (half the frame) would be the worst failure
    # mode. Sky depth is forced to 0.999999, below any world z, so soup
    # order cannot change a z-tie against world geometry.
    ts = bundle.sky_pos.shape[0]
    if ts:
        parts.insert(
            0,
            dict(
                pos=bundle.sky_pos + cam_pos[None, None, :],
                uv=bundle.sky_uv,
                lmuv=jnp.zeros((ts, 3, 2)),
                color=jnp.ones((ts, 3, 4)),
                tex=jnp.full((ts,), 1, jnp.int32) * bundle.sky_tex,
                kind=jnp.full((ts,), KIND_SKY, jnp.int32),
                shaded=jnp.zeros((ts,), bool),
                valid=jnp.full((ts,), bundle.sky_tex >= 0),
                twosided=jnp.ones((ts,), bool),
            ),
        )
    tri = _concat_parts(parts)
    t_total = tri["pos"].shape[0]
    pad = (-t_total) % CHUNK
    if pad:
        tri = jax.tree.map(
            lambda x: jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]), x.dtype)]), tri
        )
        tri["valid"] = tri["valid"].at[t_total:].set(False)

    # ---- vertex transform (full soup) ----
    pos_h = jnp.concatenate([tri["pos"], jnp.ones((*tri["pos"].shape[:2], 1))], -1)
    clip = jnp.einsum("ij,tvj->tvi", vp, pos_h,
                      precision=jax.lax.Precision.HIGHEST)  # [T,3,4]

    # ---- pre-clip cull + compaction (stable order) ----
    # Conservative keep mask evaluated BEFORE the expensive near-plane
    # clip: invalid rows (the pool carries every LOD of every actor),
    # fully-behind-camera rows, and — for triangles entirely in front of
    # the near plane, where screen coords are already exact — backfaces.
    # Triangles crossing the near plane are kept unconditionally. The
    # pallas backend compacts to T_CULL rows so the post-clip table fits
    # VMEM (live post-cull counts are ~1-3k on the shipped maps; a map
    # that can exceed this — orb.gmap's 78k-triangle model — should use
    # backend="xla", which compacts without a cap).
    w0 = clip[..., 3]
    any_pos = jnp.any(w0 > 0.01, axis=-1)
    all_pos = jnp.all(w0 > 0.01, axis=-1)
    inv_w0 = 1.0 / jnp.where(jnp.abs(w0) > 1e-9, w0, 1e-9)
    sx0 = (clip[..., 0] * inv_w0 + 1.0) * 0.5 * width
    sy0 = (clip[..., 1] * inv_w0 + 1.0) * 0.5 * height
    area0 = (sx0[:, 1] - sx0[:, 0]) * (sy0[:, 2] - sy0[:, 0]) - (
        sy0[:, 1] - sy0[:, 0]
    ) * (sx0[:, 2] - sx0[:, 0])
    if CULL_MODE == "neg":
        front0 = (area0 < 0.0) | tri["twosided"]
    elif CULL_MODE == "pos":
        front0 = (area0 > 0.0) | tri["twosided"]
    else:
        front0 = jnp.ones_like(tri["twosided"])
    keep = tri["valid"] & any_pos & (
        ~all_pos | (front0 & (jnp.abs(area0) > 1e-9))
    )
    t = keep.shape[0]
    if backend == "pallas":
        cap = min(t, T_CULL)
    elif backend == "pallas_big":
        # no live compaction: the streamed kernel prunes dead rows via
        # the bbox hierarchy, and the compacting gather alone copies the
        # whole multi-10MB table per env (~27 ms/frame-batch on orb)
        cap = t
    else:
        bound = -(-max(bundle.live_tri_bound + extra_live, 1) // CHUNK) * CHUNK
        cap = min(t, max(bound, CHUNK))
    if cap < t:
        order = jnp.sort(jnp.where(keep, jnp.arange(t, dtype=jnp.int32), t))[:cap]
        safe = jnp.minimum(order, t - 1)
        tri = {k: v[safe] for k, v in tri.items()}
        tri["valid"] = tri["valid"] & (order < t)
        clip = clip[safe]
    else:
        tri = dict(tri)
        tri["valid"] = keep

    # ---- near-plane clipping: 1 triangle -> up to 2 ----
    if backend == "pallas_big":
        # compacted variant: the uniform path below rotates/intersects
        # the WHOLE table and doubles it to 2T rows — ~35 ms/frame-batch
        # of gathers on orb's 78k-row table for the handful of triangles
        # that actually straddle the near plane
        clip, tri = _clip_near_compact(clip, tri, min(CLIP_CAP, clip.shape[0]))
    else:
        clip, tri = _clip_near(clip, tri)
    w = clip[..., 3]
    ok_w = jnp.all(w > 1e-5, axis=-1)
    inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    ndc = clip[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] + 1.0) * 0.5 * width
    sy = (ndc[..., 1] + 1.0) * 0.5 * height
    sz = ndc[..., 2]
    # sky renders behind everything with no depth write (sky pipeline):
    # force its depth to the far plane
    is_sky = tri["kind"] == KIND_SKY
    sz = jnp.where(is_sky[:, None], 0.999999, sz)

    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])
    # back-face culling (pipeline: cull back, CCW front;
    # VulkanPipelines.c:21-85); two-sided geometry skips the cull
    if CULL_MODE == "neg":
        front = (area2 < 0.0) | tri["twosided"]
    elif CULL_MODE == "pos":
        front = (area2 > 0.0) | tri["twosided"]
    else:
        front = jnp.ones_like(tri["twosided"])
    tri_ok = tri["valid"] & ok_w & front & (jnp.abs(area2) > 1e-9)

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py)

    # per-triangle mip level from texel/pixel density (exact for affine
    # mappings; perspective variation within one triangle is small at map
    # scales). Quantized to quarter-levels in the enc word so both
    # backends carry it for free. The level is clamped to the texture's
    # chain and pre-rounded for nearest-level textures HERE (per
    # triangle), and the repeat/filter sampler flags ride bits 21/22, so
    # the per-pixel shade needs only ONE metadata gather (mip_pairs) per
    # tap — TPU gathers price per fetch (benchmarks/profile_gather.py).
    tclip = jnp.clip(tri["tex"], 0, None)
    t_meta = bundle.atlas.table[tclip]  # [T, 6]
    tex_wh = t_meta[:, 2:4]
    # sampler flags via the PRE-PACKED int words: gathering the f32 table
    # columns and comparing in-graph (t_meta[:, 4] > 0.5) miscompiles on
    # XLA:TPU when fused with the z-pass scan — the repeat bit silently
    # drops (see TextureAtlas.flag_words)
    fw_tab = bundle.atlas.flag_words
    if fw_tab is None:
        # hand-built atlas (tests/older pickles): derive the words from
        # the f32 table. This is the very chain the TPU miscompile hits,
        # so it is a CPU-path convenience only — build_atlas always packs.
        tab = bundle.atlas.table
        fw_tab = (tab[:, 4] > 0.5).astype(jnp.int32) * (1 << 21) + (
            tab[:, 5] > 0.5
        ).astype(jnp.int32) * (1 << 22)
    fw = fw_tab[tclip]  # [T] i32: rep<<21 | bil<<22
    bil_t = ((fw >> 22) & 1).astype(bool)
    du1 = (tri["uv"][:, 1] - tri["uv"][:, 0]) * tex_wh
    du2 = (tri["uv"][:, 2] - tri["uv"][:, 0]) * tex_wh
    texel_area = jnp.abs(du1[:, 0] * du2[:, 1] - du1[:, 1] * du2[:, 0])
    px_area = jnp.abs(area2)
    lod = 0.5 * jnp.log2(jnp.maximum(texel_area, 1e-12) / jnp.maximum(px_area, 1e-12))
    aniso_uv = None
    if aniso > 1 and mipmaps:
        # anisotropic footprint (the maxAnisotropy sampler,
        # VulkanResources.c:434-511): texel-per-pixel jacobian M = U P^-1
        # from the triangle's affine screen->texel mapping; the pixel
        # footprint in texel space is the ellipse MM^T with semi-axes
        # rho_major/rho_minor (its singular values). The area-form lod
        # above is log2(sqrt(rho_maj*rho_min)); subtracting
        # 0.5*log2(ratio) yields log2(rho_minor) (clamped at `aniso`,
        # blurring past the cap exactly like hardware), and the shade
        # averages taps spanning the major axis.
        dp1x, dp1y = sx[:, 1] - sx[:, 0], sy[:, 1] - sy[:, 0]
        dp2x, dp2y = sx[:, 2] - sx[:, 0], sy[:, 2] - sy[:, 0]
        det = dp1x * dp2y - dp1y * dp2x
        idet = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
        m00 = (du1[:, 0] * dp2y - du2[:, 0] * dp1y) * idet
        m01 = (-du1[:, 0] * dp2x + du2[:, 0] * dp1x) * idet
        m10 = (du1[:, 1] * dp2y - du2[:, 1] * dp1y) * idet
        m11 = (-du1[:, 1] * dp2x + du2[:, 1] * dp1x) * idet
        a_ = m00 * m00 + m01 * m01
        b_ = m10 * m10 + m11 * m11
        c_ = m00 * m10 + m01 * m11
        disc = jnp.sqrt(jnp.maximum((a_ - b_) ** 2 + 4.0 * c_ * c_, 0.0))
        lam_hi = jnp.maximum(0.5 * (a_ + b_ + disc), 1e-12)
        lam_lo = jnp.maximum(0.5 * (a_ + b_ - disc), 1e-12)
        rho_maj = jnp.sqrt(lam_hi)
        ratio = jnp.clip(jnp.sqrt(lam_hi / lam_lo), 1.0, float(aniso))
        # Only linear-filtered, mipmapped textures use the anisotropic
        # sampler in the reference (VulkanResources.c:438-452 picks the
        # *NoAnisotropy variant for nearest filter or useMipmaps=false);
        # ineligible triangles keep the isotropic lod and a zero tap step.
        elig = bil_t & (bundle.atlas.n_mips[tclip] > 1)
        # spec/hardware lod with anisotropy: log2(rho_maj / clamped_ratio)
        # == log2(rho_minor) below the cap; past the cap it blurs only to
        # rho_maj/N instead of re-sharpening like the area-form would.
        lod = jnp.where(elig, jnp.log2(rho_maj) - jnp.log2(ratio), lod)
        # major-axis eigenvector of [[a, c], [c, b]] in texel space
        vx = jnp.where(jnp.abs(c_) > 1e-12, c_, jnp.where(a_ >= b_, 1.0, 0.0))
        vy = jnp.where(jnp.abs(c_) > 1e-12, lam_hi - a_, jnp.where(a_ >= b_, 0.0, 1.0))
        vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy, 1e-24))
        span = rho_maj * (1.0 - 1.0 / ratio)  # texels covered by tap t in [-.5, .5]
        aniso_uv = jnp.stack([vx / vn, vy / vn], -1) * span[:, None] / jnp.maximum(
            tex_wh, 1.0
        )  # [T, 2] normalized-uv tap step
        aniso_uv = jnp.where(elig[:, None], aniso_uv, 0.0)
    lod_q = jnp.clip(jnp.round(lod * 4.0), 0, 63).astype(jnp.int32)
    # chain clamp (was per-pixel in sample()): same value because the
    # clamp bound (n_mips-1)*4 is itself a quarter-level multiple
    max_q = ((bundle.atlas.n_mips[tclip] - 1.0) * 4.0).astype(jnp.int32)
    lod_qc = jnp.minimum(lod_q, jnp.maximum(max_q, 0))
    # nearest-level textures round to an integer level at encode time
    # (identical to the old per-pixel round(lodc) — half-to-even on the
    # same clamped quarter-level value)
    lod_q = jnp.where(
        bil_t,
        lod_qc,
        (jnp.round(lod_qc.astype(jnp.float32) * 0.25) * 4.0).astype(jnp.int32),
    )

    enc = (
        (tri["tex"] + 1)
        | (tri["kind"] << 12)
        | (tri["shaded"].astype(jnp.int32) << 14)
        | (lod_q << 15)
        | fw
    )  # [T] (< 2^23: exact as f32 through the tile kernel)

    if backend == "pallas":
        from c_game_engine_tpu.ops.raster_tiles import bin_triangles, raster_tiles_pallas

        t_act = sx.shape[0]
        cols = [
            sx[:, 0], sy[:, 0], sx[:, 1], sy[:, 1], sx[:, 2], sy[:, 2],
            sz[:, 0], sz[:, 1], sz[:, 2],
            jnp.arange(t_act, dtype=jnp.float32),  # exact in f32 < 2^24
            inv_w[:, 0], inv_w[:, 1], inv_w[:, 2],
            tri["uv"][:, 0, 0], tri["uv"][:, 0, 1],
            tri["uv"][:, 1, 0], tri["uv"][:, 1, 1],
            tri["uv"][:, 2, 0], tri["uv"][:, 2, 1],
            tri["lmuv"][:, 0, 0], tri["lmuv"][:, 0, 1],
            tri["lmuv"][:, 1, 0], tri["lmuv"][:, 1, 1],
            tri["lmuv"][:, 2, 0], tri["lmuv"][:, 2, 1],
        ]
        for vtx in range(3):
            for ch in range(4):
                cols.append(tri["color"][:, vtx, ch])
        cols.append(enc.astype(jnp.float32))  # col 37, exact (< 2^21)
        tri48 = jnp.stack(
            cols + [jnp.zeros_like(sx[:, 0])] * (48 - len(cols)), axis=-1
        )
        idx, cnt = bin_triangles(sx, sy, tri_ok, height, width)
        vattr = None
    elif backend == "pallas_big":
        from c_game_engine_tpu.ops.raster_tiles_big import SUB, T_CHK, level_bboxes

        # NO compaction: the kernel skips dead work through the bbox
        # hierarchy (chunk -> subchunk -> triangle), so dead rows just
        # carry never-hit (+inf/-inf) bboxes and winner ids stay in
        # ORIGINAL row space. (An earlier compacting version sorted a
        # 150k-row permutation and gathered 3 columns per env per frame
        # — multi-ms of XLA work and multi-GB padded temps at batch.)
        t_act = sx.shape[0]
        pad_b = (-t_act) % T_CHK
        padc = lambda col, fill: (
            jnp.concatenate([col, jnp.full((pad_b,), fill, col.dtype)])
            if pad_b
            else col
        )
        big = jnp.float32(1e30)
        okf = lambda col, fill: padc(jnp.where(tri_ok, col, fill), fill)
        bxmin = okf(jnp.min(sx, 1), big)
        bxmax = okf(jnp.max(sx, 1), -big)
        bymin = okf(jnp.min(sy, 1), big)
        bymax = okf(jnp.max(sy, 1), -big)
        zcol = jnp.zeros((t_act + pad_b,), jnp.float32)
        # fields-major [16, T]: completely unpadded on TPU ((8, 128)
        # tiling divides both dims), cheap to build — see the kernel
        # module docstring for why triangle-major OOMs at batch
        tri16_t = jnp.stack(
            [
                padc(sx[:, 0], 0), padc(sy[:, 0], 0),
                padc(sx[:, 1], 0), padc(sy[:, 1], 0),
                padc(sx[:, 2], 0), padc(sy[:, 2], 0),
                padc(sz[:, 0], 0), padc(sz[:, 1], 0), padc(sz[:, 2], 0),
                zcol,
                bxmin, bxmax, bymin, bymax,
                zcol, zcol,
            ],
            axis=0,
        )
        cboxb = level_bboxes(bxmin, bxmax, bymin, bymax, T_CHK)
        scbb = level_bboxes(bxmin, bxmax, bymin, bymax, SUB)
        # attribute interpolation shares the XLA gather path below, but
        # FLATTENED to [T, 36] rows: gathering [T, 3, 12] slabs pads the
        # output (3, 12) -> (8, 128) tiles = 28x the write traffic
        # (~33 ms/frame-batch on orb); flat rows pad 36 -> 128 only
        vattr = jnp.concatenate(
            [sx[..., None], sy[..., None], inv_w[..., None], sz[..., None],
             tri["uv"], tri["lmuv"], tri["color"]],
            -1,
        ).reshape(sx.shape[0], 36)  # [T, 36] (vertex-major 3 x 12)
    else:
        # packed per-vertex table: the per-pixel lookup is 2 HBM gathers
        # instead of 8
        vattr = jnp.concatenate(
            [sx[..., None], sy[..., None], inv_w[..., None], sz[..., None],
             tri["uv"], tri["lmuv"], tri["color"]],
            -1,
        )  # [T, 3, 12]

    vattr36 = None if backend == "pallas" else vattr.reshape(vattr.shape[0], 36)

    def z_pass(exclude, cnt_override=None):
        """One full-frame raster pass; exclude [H, W] skips a triangle id
        per pixel. Returns the raw output for _pass_data_of: the 12
        in-kernel-interpolated images (pallas) or the winner-id image
        (xla / pallas_big; winner ids are in ORIGINAL row space)."""
        if backend == "pallas":
            return raster_tiles_pallas(
                tri48, idx, cnt if cnt_override is None else cnt_override,
                height, width, exclude=exclude,
            )
        if backend == "pallas_big":
            from c_game_engine_tpu.ops.raster_tiles_big import raster_tiles_big

            _zb, winner = raster_tiles_big(
                tri16_t, cboxb, scbb, height, width,
                exclude=exclude, tile_on=cnt_override,
            )
            return winner
        return _pass1_xla(sx, sy, sz, tri_ok, gx, gy, height, width, exclude=exclude)

    raw1 = z_pass(None)
    p1 = _pass_data_of(backend, raw1, vattr36, enc, gx, gy)
    has1, win1 = p1[0], p1[1]
    rgb, disc1 = _shade_generic(bundle, state, p1, gx, gy, aniso_uv, mipmaps, aniso)
    env = state.env
    fog_rgb = jnp.clip(env.fog_color[:3] * env.exposure, 0.0, 1.0)
    if not bundle.has_alpha:
        out = _combine_layers(
            rgb, disc1, has1, jnp.broadcast_to(fog_rgb, (height, width, 3))
        )
        return out, jnp.array(False), None

    # ---- screen-door reveal-behind (PARITY #10): re-rasterize with the
    # discarded winner excluded per pixel; one peel level (a discarded
    # second layer falls back to fog, like the single-layer path did
    # everywhere). Kernel tiles with no discarded pixel get a ZERO trip
    # count, and the pass-2 SHADE runs only on the compacted tiles below,
    # so the whole reveal is near-free on the typical mostly-opaque frame.
    ex = jnp.where(disc1, win1, -1)
    tile_ok = height % RTILE_H == 0 and width % RTILE_W == 0
    cnt2 = None
    if tile_ok:
        nty, ntx = height // RTILE_H, width // RTILE_W
        disc_tile = disc1.reshape(nty, RTILE_H, ntx, RTILE_W).any((1, 3))
        if backend == "pallas":
            cnt2 = jnp.where(disc_tile[..., None, None], cnt, 0)
        elif backend == "pallas_big":
            # gate whole tiles in the streamed kernel's second pass
            # ([NTy*NTx, 1] i32, the kernel's flattened tile order)
            cnt2 = disc_tile.reshape(-1, 1).astype(jnp.int32)
    raw2 = z_pass(ex, cnt_override=cnt2)
    if not tile_ok:
        # non-tile-aligned framebuffer (xla backend only): full shade
        p2 = _pass_data_of(backend, raw2, vattr36, enc, gx, gy)
        rgb2, disc2 = _shade_generic(
            bundle, state, p2, gx, gy, aniso_uv, mipmaps, aniso
        )
        layer2 = jnp.where((p2[0] & ~disc2)[..., None], rgb2, fog_rgb)
        return _combine_layers(rgb, disc1, has1, layer2), jnp.array(False), None

    # tile-compacted pass-2 shade: gather only the tiles containing
    # discarded pixels (budget K), shade them as a [K*8, 128] image, and
    # scatter the revealed layer back. Index-ordered stream compaction
    # via cumsum+scatter (a sort would pay n log^2 n on the tile list).
    nt = nty * ntx
    K = min(nt, max(8, nt // REVEAL_TILE_FRAC))
    flat = disc_tile.reshape(-1)
    overflow = jnp.sum(flat.astype(jnp.int32)) > K
    dest = jnp.cumsum(flat.astype(jnp.int32)) - 1
    dest = jnp.where(flat & (dest < K), dest, K)
    order = jnp.full((K,), nt, jnp.int32).at[dest].set(
        jnp.arange(nt, dtype=jnp.int32), mode="drop"
    )
    order_c = jnp.minimum(order, nt - 1)
    pk = lambda a: _tile_pack(a, order_c, nty, ntx)
    gxp, gyp = pk(gx), pk(gy)
    raw2p = tuple(pk(o) for o in raw2) if backend == "pallas" else pk(raw2)
    p2p = _pass_data_of(backend, raw2p, vattr36, enc, gxp, gyp)
    rgb2p, disc2p = _shade_generic(
        bundle, state, p2p, gxp, gyp, aniso_uv, mipmaps, aniso
    )
    layer2p = jnp.where((p2p[0] & ~disc2p)[..., None], rgb2p, fog_rgb)
    layer2_img = _tile_unpack(layer2p, order, nty, ntx, fog_rgb)
    rgb_cmp = _combine_layers(rgb, disc1, has1, layer2_img)

    ctx = dict(rgb1=rgb, disc1=disc1, has1=has1, raw2=raw2)
    if backend != "pallas":
        ctx["vattr36"] = vattr36
        ctx["enc"] = enc
    if aniso_uv is not None:
        ctx["aniso_uv"] = aniso_uv
    if defer_reveal:
        return rgb_cmp, overflow, ctx
    out = jax.lax.cond(
        overflow,
        lambda: _finish_reveal_full(
            bundle, ctx, state, height, width, mipmaps, aniso, backend
        ),
        lambda: rgb_cmp,
    )
    return out, jnp.array(False), None


def _pass1_xla(sx, sy, sz, tri_ok, gx, gy, height, width, exclude=None):
    """Chunked z-buffer pass over [CHUNK, H, W] edge functions (reference
    path). Tie rule: strictly-closer wins, so the lowest triangle index
    takes equal-z pixels — same as the Pallas tile kernel's in-order loop.
    exclude [H, W] i32 skips one triangle id per pixel (-1 = none)."""
    n_chunks = sx.shape[0] // CHUNK
    if exclude is None:
        exclude = jnp.full((height, width), -1, jnp.int32)

    def pass1(carry, ci):
        zbuf, winner = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * CHUNK, CHUNK, axis=0)
        cx, cy, cz = sl(sx), sl(sy), sl(sz)
        cok = sl(tri_ok)
        cids = ci * CHUNK + jnp.arange(CHUNK)
        # edge functions at pixel centers: e(p) = (b-a) x (p-a)
        def edges(i, j):
            ax_, ay_ = cx[:, i], cy[:, i]
            bx_, by_ = cx[:, j], cy[:, j]
            return (bx_ - ax_)[:, None, None] * (gy[None] - ay_[:, None, None]) - (
                by_ - ay_
            )[:, None, None] * (gx[None] - ax_[:, None, None])

        e0 = edges(0, 1)
        e1 = edges(1, 2)
        e2 = edges(2, 0)
        inside = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
        # affine depth via barycentric from edge functions (fused form —
        # written identically in ops/raster_tiles.py so both backends
        # round the same way)
        denom = e0 + e1 + e2
        denom = jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        z = (
            e1 * cz[:, 0, None, None]
            + e2 * cz[:, 1, None, None]
            + e0 * cz[:, 2, None, None]
        ) / denom
        zvalid = (
            inside
            & cok[:, None, None]
            & (z > 0.0)
            & (z < 1.0)
            & (cids[:, None, None] != exclude[None])
        )
        z = jnp.where(zvalid, z, jnp.inf)
        best = jnp.argmin(z, axis=0)  # [H, W]
        bz = jnp.take_along_axis(z, best[None], axis=0)[0]
        closer = bz < zbuf
        zbuf = jnp.where(closer, bz, zbuf)
        winner = jnp.where(closer, ci * CHUNK + best, winner)
        return (zbuf, winner), None

    zbuf0 = jnp.full((height, width), jnp.inf)
    win0 = jnp.full((height, width), -1, jnp.int32)
    (zbuf, winner), _ = jax.lax.scan(pass1, (zbuf0, win0), jnp.arange(n_chunks))
    return winner


# Post-cull live-triangle cap for the pallas backend's compaction in
# render(): the near-clipped table (2x this) must fit VMEM as a [T, 128]
# f32 block. Shipped-map live counts post-cull are ~1-3k at 256^2.
T_CULL = 4096


CLIP_CAP = 2048  # big-path bound on simultaneously near-plane-crossing tris


def _clip_near_compact(clip, tri, cap, near_w=0.01):
    """Big-table variant of _clip_near: fully-in-front triangles pass
    through at their ORIGINAL rows (no rotation, no duplication), the
    (rare) near-plane-crossing rows compact to `cap` slots, get clipped
    by the uniform path, and append as 2*cap extension rows. Output is
    [T + 2*cap] rows instead of [2T] — half the streamed table on
    orb.gmap — and the full-table take_along_axis rotations disappear.
    Crossing rows beyond `cap` drop (lowest row index first; `cap` bounds
    the count of triangles simultaneously straddling a ~1 cm plane).
    Tie-order note: clipped outputs live at higher row indices than the
    uniform path would give them, so equal-z ties against them can
    resolve differently — z ties are measure-zero content."""
    t = clip.shape[0]
    w = clip[..., 3]
    n_in = jnp.sum((w > near_w).astype(jnp.int32), axis=-1)  # [T]
    crossing = tri["valid"] & (n_in > 0) & (n_in < 3)

    # pass-through originals; crossing/behind rows die here
    tri_out = dict(tri)
    tri_out["valid"] = tri["valid"] & (n_in == 3)

    order = jnp.sort(jnp.where(crossing, jnp.arange(t, dtype=jnp.int32), t))[:cap]
    safe = jnp.minimum(order, t - 1)
    clip_c = clip[safe]
    tri_c = {k: v[safe] for k, v in tri.items()}
    tri_c["valid"] = tri_c["valid"] & (order < t)
    clip_x, tri_x = _clip_near(clip_c, tri_c, near_w)  # [2*cap] extension

    clip_out = jnp.concatenate([clip, clip_x], axis=0)
    return clip_out, {
        k: jnp.concatenate([tri_out[k], tri_x[k]], axis=0) for k in tri_out
    }


def _clip_near(clip, tri, near_w=0.01):
    """Clip every triangle against the near plane (clip.w > near_w),
    emitting up to two output triangles per input: [T,3,4] -> [2T,3,4]
    (+ clipped per-vertex attributes). Vertex order is canonicalized by
    rotation so winding is preserved."""
    t = clip.shape[0]
    w = clip[..., 3]  # [T, 3]
    inside = w > near_w
    n_in = jnp.sum(inside.astype(jnp.int32), axis=-1)  # [T]

    # rotation r so the pattern becomes [in,in,in] / [in,in,out] / [in,out,out]
    out_idx = jnp.argmin(inside.astype(jnp.int32), axis=-1)  # first outside
    in_idx = jnp.argmax(inside.astype(jnp.int32), axis=-1)  # first inside
    r = jnp.where(n_in == 2, (out_idx + 1) % 3, jnp.where(n_in == 1, in_idx, 0))
    order = (r[:, None] + jnp.arange(3)[None, :]) % 3  # [T, 3]

    # per-vertex attribute stack to clip alongside positions
    attrs = jnp.concatenate([tri["uv"], tri["lmuv"], tri["color"]], axis=-1)  # [T,3,A]
    a_dim = attrs.shape[-1]

    def rot(x):
        return jnp.take_along_axis(x, order[..., None], axis=1)

    clip_r = rot(clip)
    attrs_r = rot(attrs)
    wr = clip_r[..., 3]

    def isect(i, j):
        """Intersection of edge v_i -> v_j with the near plane."""
        wa, wb = wr[:, i], wr[:, j]
        tt = (near_w - wa) / jnp.where(jnp.abs(wb - wa) > 1e-12, wb - wa, 1e-12)
        tt = jnp.clip(tt, 0.0, 1.0)[:, None]
        cp = clip_r[:, i] + (clip_r[:, j] - clip_r[:, i]) * tt
        ap = attrs_r[:, i] + (attrs_r[:, j] - attrs_r[:, i]) * tt
        return cp, ap

    e01c, e01a = isect(0, 1)
    e12c, e12a = isect(1, 2)
    e20c, e20a = isect(2, 0)

    c3 = (n_in == 3)[:, None, None]
    c2 = (n_in == 2)[:, None, None]
    c1 = (n_in == 1)[:, None, None]

    def pick(case3, case2, case1):
        return jnp.where(c3, case3, jnp.where(c2, case2, jnp.where(c1, case1, case3)))

    out1_c = pick(
        clip_r,
        jnp.stack([clip_r[:, 0], clip_r[:, 1], e12c], 1),
        jnp.stack([clip_r[:, 0], e01c, e20c], 1),
    )
    out1_a = pick(
        attrs_r,
        jnp.stack([attrs_r[:, 0], attrs_r[:, 1], e12a], 1),
        jnp.stack([attrs_r[:, 0], e01a, e20a], 1),
    )
    out2_c = jnp.stack([clip_r[:, 0], e12c, e20c], 1)
    out2_a = jnp.stack([attrs_r[:, 0], e12a, e20a], 1)

    valid1 = tri["valid"] & (n_in > 0)
    valid2 = tri["valid"] & (n_in == 2)

    clip_out = jnp.concatenate([out1_c, out2_c], axis=0)
    attrs_out = jnp.concatenate([out1_a, out2_a], axis=0)
    tri_out = dict(tri)
    dup = lambda x: jnp.concatenate([x, x], axis=0)
    for k in ("tex", "kind", "shaded", "twosided"):
        tri_out[k] = dup(tri[k])
    tri_out["valid"] = jnp.concatenate([valid1, valid2], axis=0)
    tri_out["uv"] = attrs_out[..., 0:2]
    tri_out["lmuv"] = attrs_out[..., 2:4]
    tri_out["color"] = attrs_out[..., 4:8]
    tri_out["pos"] = dup(tri["pos"])  # world positions unused downstream
    return clip_out, tri_out


def shade(bundle, state, gx, gy, uv, lmuv, color, tex_id, kind, shaded, frag_depth,
          lod=None, flags=None, aniso_step=None, aniso_taps=0):
    """Exact fragment math from the extracted .gshd sources. Returns
    (rgb, discard): screen-door-discarded pixels are the CALLER's problem
    (render() reveals the fragment behind via a second pass). flags =
    per-pixel (repeat, bilinear) from the enc word — enables sample()'s
    single-metadata-gather path; results are bit-identical either way.
    aniso_step [..., 2] + aniso_taps>1: average `aniso_taps` trilinear
    taps spaced along the footprint's major axis (render(aniso=N); the
    step is zero for isotropic pixels, so taps coincide there)."""
    env = state.env
    if aniso_step is not None and aniso_taps > 1:
        taps = min(int(aniso_taps), 8)
        acc = None
        for k in range(taps):
            t = (k + 0.5) / taps - 0.5
            s = sample(bundle.atlas, tex_id, uv + aniso_step * t, lod=lod, flags=flags)
            acc = s if acc is None else acc + s
        tex4 = acc / taps
    else:
        tex4 = sample(bundle.atlas, tex_id, uv, lod=lod, flags=flags)
    # textureIndex == -1 -> flat vertex color (ui_f.gshd rule; used by the
    # debug wireframe layer)
    tex4 = jnp.where((tex_id < 0)[..., None], 1.0, tex4)

    out = tex4 * color[..., 3:4]
    fade = jnp.clip(out[..., 3], 0.0, 1.0)
    hash_ = jnp.modf(
        MAGIC_Z * jnp.modf(gx * MAGIC_XY[0] + gy * MAGIC_XY[1])[0]
    )[0]
    discard = (fade < 0.001) | (fade < hash_)

    # lightmap (map pipeline only); flat single-index gather — a 2-axis
    # [ly, lx] gather lowers to XLA's generic (slower) gather path
    lw = bundle.lightmap.shape[1]
    lh = bundle.lightmap.shape[0]
    lx = jnp.clip((lmuv[..., 0] * lw).astype(jnp.int32), 0, lw - 1)
    ly = jnp.clip((lmuv[..., 1] * lh).astype(jnp.int32), 0, lh - 1)
    lm = bundle.lightmap.reshape(lh * lw, -1)[ly * lw + lx][..., :3]

    light = env.light_color[:3]
    base = out[..., :3] * color[..., :3]
    lit = jnp.where(
        shaded[..., None],
        base * light * jnp.where((kind == KIND_MAP)[..., None], lm, 1.0),
        base,
    )
    fog_factor = (
        jnp.clip(
            (frag_depth - env.fog_start) / jnp.maximum(env.fog_end - env.fog_start, 1e-6),
            0.0,
            1.0,
        )
        * env.fog_color[3]
    )
    rgb = lit + (env.fog_color[:3] - lit) * fog_factor[..., None]
    rgb = jnp.clip(rgb * env.exposure, 0.0, 1.0)

    # sky: texture * exposure only (sky_f.gshd)
    sky_rgb = jnp.clip(tex4[..., :3] * env.exposure, 0.0, 1.0)
    rgb = jnp.where((kind == KIND_SKY)[..., None], sky_rgb, rgb)
    return rgb, discard


def render_viewmodel(bundle, state, frame):
    """First-person viewmodel overlay (VK_RenderMap viewmodel stage;
    UpdateViewModelMatrix VulkanHelpers.c:174-212: perspective(70deg) x
    translate(+-pos) x yaw; depth test off). Shown only while the eraser
    item is selected (EraserItem.c SwitchTo: pos.x=0.5, yaw 5 deg; the
    DefaultItemUpdate bobs pos.y with viewBobbingHeight*0.2-0.35)."""
    tv = bundle.vm_pos.shape[0]
    if tv == 0:
        return frame
    h, w = frame.shape[:2]
    yaw = jnp.deg2rad(5.0)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    rot = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])  # about -Y by 5deg
    offset = jnp.stack(
        [jnp.float32(0.5), -(state.player.view_bob * 0.2 - 0.35), jnp.float32(0.0)]
    )
    world = jnp.einsum("ij,tvj->tvi", rot, bundle.vm_pos,
                       precision=jax.lax.Precision.HIGHEST) + offset
    persp = perspective_lh_zo(jnp.deg2rad(70.0), w / h, 0.01, 4.0)
    pos_h = jnp.concatenate([world * jnp.array([1.0, -1.0, 1.0]), jnp.ones((tv, 3, 1))], -1)
    clip = jnp.einsum("ij,tvj->tvi", persp, pos_h,
                      precision=jax.lax.Precision.HIGHEST)
    wc = clip[..., 3]
    ok = jnp.all(wc > 1e-4, -1)
    inv_w = 1.0 / jnp.where(jnp.abs(wc) > 1e-9, wc, 1e-9)
    ndc = clip[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] + 1) * 0.5 * w
    sy_ = (ndc[..., 1] + 1) * 0.5 * h
    sz = ndc[..., 2]

    # per-item viewmodel dispatch: each pool triangle carries the item id
    # whose SwitchTo enables it (EraserItem.c: eraser.gmdl for item 0;
    # LaserStopperItem.c:21-24 disables the viewmodel, so item 1 simply
    # owns no rows). Camera actors suppress the viewmodel like the
    # reference's camera swap does.
    show = state.camera_actor < 0
    valid = ok & show & (bundle.vm_item == state.save.current_item)

    px = jnp.arange(w, dtype=jnp.float32) + 0.5
    py = jnp.arange(h, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py)

    zbuf = jnp.full((h, w), jnp.inf)
    win = jnp.full((h, w), -1, jnp.int32)
    n_chunks = (tv + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK - tv
    if pad:
        sx = jnp.concatenate([sx, jnp.zeros((pad, 3))])
        sy_ = jnp.concatenate([sy_, jnp.zeros((pad, 3))])
        sz = jnp.concatenate([sz, jnp.ones((pad, 3))])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])

    def pass1(carry, ci):
        zbuf, win = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * CHUNK, CHUNK, 0)
        cx, cyy, cz = sl(sx), sl(sy_), sl(sz)
        cok = sl(valid)

        def edges(i, j):
            return (cx[:, j] - cx[:, i])[:, None, None] * (gy[None] - cyy[:, i][:, None, None]) - (
                cyy[:, j] - cyy[:, i]
            )[:, None, None] * (gx[None] - cx[:, i][:, None, None])

        e0, e1, e2 = edges(0, 1), edges(1, 2), edges(2, 0)
        inside = ((e0 <= 0) & (e1 <= 0) & (e2 <= 0)) | ((e0 >= 0) & (e1 >= 0) & (e2 >= 0))
        den = jnp.where(jnp.abs(e0 + e1 + e2) > 1e-9, e0 + e1 + e2, 1e-9)
        z = (e1 * cz[:, 0, None, None] + e2 * cz[:, 1, None, None] + e0 * cz[:, 2, None, None]) / den
        z = jnp.where(inside & cok[:, None, None] & (z > 0) & (z < 1), z, jnp.inf)
        best = jnp.argmin(z, 0)
        bz = jnp.take_along_axis(z, best[None], 0)[0]
        closer = bz < zbuf
        return (jnp.where(closer, bz, zbuf), jnp.where(closer, ci * CHUNK + best, win)), None

    (zbuf, win), _ = jax.lax.scan(pass1, (zbuf, win), jnp.arange(n_chunks))
    has = win >= 0
    widx = jnp.clip(win, 0, None)
    vsx, vsy = sx[widx], sy_[widx]
    e0 = (vsx[..., 1] - vsx[..., 0]) * (gy - vsy[..., 0]) - (vsy[..., 1] - vsy[..., 0]) * (gx - vsx[..., 0])
    e1 = (vsx[..., 2] - vsx[..., 1]) * (gy - vsy[..., 1]) - (vsy[..., 2] - vsy[..., 1]) * (gx - vsx[..., 1])
    e2 = (vsx[..., 0] - vsx[..., 2]) * (gy - vsy[..., 2]) - (vsy[..., 0] - vsy[..., 2]) * (gx - vsx[..., 2])
    den = jnp.where(jnp.abs(e0 + e1 + e2) > 1e-9, e0 + e1 + e2, 1e-9)
    b = jnp.stack([e1 / den, e2 / den, e0 / den], -1)
    uvpad = jnp.concatenate([bundle.vm_uv, jnp.zeros((pad, 3, 2))]) if pad else bundle.vm_uv
    colpad = jnp.concatenate([bundle.vm_color, jnp.ones((pad, 3, 4))]) if pad else bundle.vm_color
    texpad = jnp.concatenate([bundle.vm_tex, jnp.zeros(pad, jnp.int32)]) if pad else bundle.vm_tex
    uv = jnp.sum(uvpad[widx] * b[..., None], -2)
    col = jnp.sum(colpad[widx] * b[..., None], -2)
    tex4 = sample(bundle.atlas, texpad[widx], uv)
    # model_shaded math minus lightmap/fog (viewmodel draws close, fog ~0)
    env = state.env
    rgb = jnp.clip(tex4[..., :3] * col[..., :3] * env.light_color[:3] * env.exposure, 0, 1)
    return jnp.where(has[..., None], rgb, frame)


def render_with_hud(bundle, cmap, state, height=256, width=256, fov_deg=90.0, backend=None,
                    mipmaps=True, aniso=0):
    """Full frame: world render + viewmodel + HUD composite (MainStateRender,
    MainState.c:95-110: RenderMap -> RenderHUD)."""
    from c_game_engine_tpu.render.hud import render_hud

    frame = render(bundle, cmap, state, height, width, fov_deg, backend,
                   mipmaps=mipmaps, aniso=aniso)
    frame = render_viewmodel(bundle, state, frame)
    return render_hud(bundle.atlas, bundle.hud, state, frame)
