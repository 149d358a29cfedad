"""Debug wireframe + rate-graph overlays.

The reference renders two debug layers:
  * JoltDebugRenderer (debug/JoltDebugRenderer.c:49-51) —
    JPH_PhysicsSystem_DrawBodies wireframes every body through LINE_LIST
    pipelines (Vulkan.c:1304-1386 line accumulation,
    VulkanPipelines.c LINE_LIST debug pipelines).
  * FrameGrapher (debug/FrameGrapher.c:16-120) — 30-sample FPS/tick-rate
    line graphs drawn bottom-left with the 2D quad API.

TPU-native design: debug "lines" become thin world-space quads fed through
the SAME tile rasterizer as regular geometry (unshaded, flat color, depth
tested like Jolt's in-world wireframes — no separate line pipeline needed,
and the batch renders them at full speed). The rate graph is a pure-array
2D polyline composite over the finished frame (host metrics ring in,
frame out), mirroring the reference's overlay placement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.actors.defs import Motion, Shape
from c_game_engine_tpu.utils.mathx import quat_rotate, safe_normalize

# wireframe colors (Jolt's defaults: dynamic bodies white-ish, sensors
# green, the character capsule cyan; exact palette is Jolt-internal)
COLOR_BODY = (1.0, 1.0, 1.0, 1.0)
COLOR_SENSOR = (0.2, 1.0, 0.2, 1.0)
COLOR_CHARACTER = (0.2, 0.9, 1.0, 1.0)

# box edge topology: 8 corners, 12 edges
_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float32,
)
_EDGES = np.array(
    [
        (0, 1), (2, 3), (4, 5), (6, 7),  # z edges
        (0, 2), (1, 3), (4, 6), (5, 7),  # y edges
        (0, 4), (1, 5), (2, 6), (3, 7),  # x edges
    ],
    np.int32,
)

# character capsule: hexagonal prism rings at the cap centers + verticals
_HEX = np.array(
    [[np.cos(a), 0.0, np.sin(a)] for a in np.linspace(0, 2 * np.pi, 7)[:-1]],
    np.float32,
)

LINE_WIDTH = 0.012  # world-space half-thickness per unit of camera distance


def box_edge_segments(pos, quat, halfext, center):
    """[N, 12, 2, 3] world-space edge segments of oriented boxes."""
    corners = _CORNERS[None] * halfext[:, None, :]  # [N, 8, 3]
    corners = quat_rotate(quat[:, None, :], corners + center[:, None, :]) + pos[:, None, :]
    return corners[:, _EDGES]  # [N, 12, 2, 3]


def capsule_segments(pos, radius=0.2, half_height=0.25):
    """Character capsule wireframe (CharacterVirtual r=0.2 halfH=0.25,
    PlayerPhysics.c:173-194): two hex rings + 6 verticals -> [18, 2, 3]."""
    top = pos + jnp.array([0.0, half_height, 0.0])
    bot = pos - jnp.array([0.0, half_height, 0.0])
    ring = jnp.asarray(_HEX) * radius
    ring_t = top[None, :] + ring
    ring_b = bot[None, :] + ring
    nxt = jnp.roll(jnp.arange(6), -1)
    segs = jnp.concatenate(
        [
            jnp.stack([ring_t, ring_t[nxt]], axis=1),
            jnp.stack([ring_b, ring_b[nxt]], axis=1),
            jnp.stack([ring_t, ring_b], axis=1),
        ],
        axis=0,
    )  # [18, 2, 3]
    return segs


def collect_segments(cmap, state):
    """All debug segments for one env: body boxes (dynamic + kinematic,
    their collision half-extents), sensor volumes, character capsule.
    Returns (segments [L, 2, 3], colors [L, 4], valid [L])."""
    actors = state.actors
    solid = (
        (cmap.motion == int(Motion.DYNAMIC)) | (cmap.motion == int(Motion.KINEMATIC))
    ) & (cmap.shape != int(Shape.EMPTY))
    body_segs = box_edge_segments(actors.pos, actors.quat, cmap.halfext, cmap.shape_center)
    n = body_segs.shape[0]
    body_valid = (solid & actors.active)[:, None].repeat(12, 1)
    body_cols = jnp.broadcast_to(jnp.asarray(COLOR_BODY), (n, 12, 4))

    sq = cmap.sensor_quat
    s_segs = box_edge_segments(
        cmap.sensor_pos, sq, cmap.sensor_halfext, jnp.zeros_like(cmap.sensor_pos)
    )
    s_owner_active = jnp.where(
        cmap.sensor_owner >= 0,
        actors.active[jnp.clip(cmap.sensor_owner, 0, n - 1)],
        False,
    )
    s_valid = s_owner_active[:, None].repeat(12, 1)
    s_cols = jnp.broadcast_to(jnp.asarray(COLOR_SENSOR), (s_segs.shape[0], 12, 4))

    c_segs = capsule_segments(state.player.pos)
    c_valid = jnp.ones((18,), bool)
    c_cols = jnp.broadcast_to(jnp.asarray(COLOR_CHARACTER), (18, 4))

    segments = jnp.concatenate(
        [body_segs.reshape(-1, 2, 3), s_segs.reshape(-1, 2, 3), c_segs], axis=0
    )
    colors = jnp.concatenate(
        [body_cols.reshape(-1, 4), s_cols.reshape(-1, 4), c_cols], axis=0
    )
    valid = jnp.concatenate(
        [body_valid.reshape(-1), s_valid.reshape(-1), c_valid], axis=0
    )
    return segments, colors, valid


def segments_to_part(segments, colors, valid, cam_pos):
    """Expand segments into thin two-sided quads (2 triangles each) facing
    the camera, as a gather_triangles part dict (KIND_MODEL, unshaded, flat
    color) — the whole debug layer rides the normal raster pipeline."""
    from c_game_engine_tpu.render.raster import KIND_MODEL

    a = segments[:, 0]
    b = segments[:, 1]
    mid = (a + b) * 0.5
    view = mid - cam_pos[None, :]
    dist = jnp.linalg.norm(view, axis=-1, keepdims=True)
    d = b - a
    side = safe_normalize(jnp.cross(d, view), axis=-1) * (LINE_WIDTH * dist)
    # quad a-side, a+side, b+side, b-side -> triangles (0,1,2) (0,2,3)
    v0, v1, v2, v3 = a - side, a + side, b + side, b - side
    tris = jnp.stack(
        [jnp.stack([v0, v1, v2], 1), jnp.stack([v0, v2, v3], 1)], axis=1
    ).reshape(-1, 3, 3)  # [2L, 3, 3]
    l2 = tris.shape[0]
    col = jnp.repeat(colors, 2, axis=0)[:, None, :].repeat(3, 1)
    return dict(
        pos=tris,
        uv=jnp.zeros((l2, 3, 2)),
        lmuv=jnp.zeros((l2, 3, 2)),
        color=col,
        tex=jnp.full((l2,), -1, jnp.int32),
        kind=jnp.full((l2,), KIND_MODEL, jnp.int32),
        shaded=jnp.zeros((l2,), bool),
        valid=jnp.repeat(valid, 2),
        twosided=jnp.ones((l2,), bool),
    )


def graph_overlay(frame, values, lo=0.0, hi=None, origin=(8, 8), size=(120, 40),
                  color=(1.0, 1.0, 0.0), alpha=0.85):
    """FrameGrapher-style polyline overlay (FrameGrapher.c:64-120: 30-sample
    graph bottom-left). `values` [K] f32 (host metrics ring, oldest first);
    draws into the BOTTOM-LEFT corner offset by `origin` (x from left,
    y from bottom). Pure array compositing — jit/vmap friendly."""
    h, w = frame.shape[:2]
    values = jnp.asarray(values, jnp.float32)
    k = values.shape[0]
    vhi = jnp.max(values) if hi is None else hi
    vlo = jnp.asarray(lo, jnp.float32)
    span = jnp.maximum(vhi - vlo, 1e-6)
    gw, gh = size
    x0 = origin[0]
    y1 = h - origin[1]  # bottom edge (frame y grows downward)

    xs = x0 + jnp.arange(k) * (gw / max(k - 1, 1))  # [K]
    ys = y1 - (jnp.clip((values - vlo) / span, 0.0, 1.0)) * gh

    px = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = jnp.arange(h, dtype=jnp.float32)[:, None]

    # distance of each pixel to each polyline segment (K-1 segments)
    ax, ay = xs[:-1], ys[:-1]
    bx, by = xs[1:], ys[1:]
    dx, dy = bx - ax, by - ay
    seg_len2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
    # [S, H, W] projection parameter, clamped to the segment
    t = ((px[None] - ax[:, None, None]) * dx[:, None, None]
         + (py[None] - ay[:, None, None]) * dy[:, None, None]) / seg_len2[:, None, None]
    t = jnp.clip(t, 0.0, 1.0)
    cx = ax[:, None, None] + t * dx[:, None, None]
    cy = ay[:, None, None] + t * dy[:, None, None]
    d2 = (px[None] - cx) ** 2 + (py[None] - cy) ** 2
    hit = jnp.any(d2 <= 0.8**2, axis=0)  # ~1.6 px line width

    # faint background panel (the reference draws a dimmed quad behind)
    panel = (px >= x0 - 2) & (px <= x0 + gw + 2) & (py <= y1 + 2) & (py >= y1 - gh - 2)
    out = jnp.where(panel[..., None], frame * 0.55, frame)
    line_rgb = jnp.asarray(color, jnp.float32)
    return jnp.where(hit[..., None], frame * (1 - alpha) + line_rgb * alpha, out)
