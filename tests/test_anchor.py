"""Analytic anchor: rendered pixels vs an independent numpy ray tracer.

The golden-frame tests (test_goldens.py) pin the renderer against its own
past output; this file pins it against GROUND TRUTH computed outside the
render package: a Moller-Trumbore ray tracer over the world-space triangle
soup, GL-convention texture sampling straight from the decoded .gtex
pixel arrays (not the packed atlas), the shipped lightmap bytes, and the
fragment formula transcribed from the decoded .gshd sources
(map_shaded_f.gshd: tex * vertexColor * globalLight * lightmap, linear fog
on gl_FragCoord.z/w, clamp(rgb * exposure); sky_f.gshd: tex * exposure).

A systematic bug in projection, rasterization, perspective-correct
interpolation, atlas packing/sampling, or any shade() term shifts these
pixels and fails here even if the goldens were regenerated around it.
"""

import jax
import numpy as np
import pytest


def _scene(name, size):
    """Returns (frame u8-ish float [H,W,3], soup dict of np arrays, vp,
    cam_pos, env, bundle)."""
    import jax.numpy as jnp

    from c_game_engine_tpu.compiler.cache import load_compiled
    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import (
        KIND_SKY,
        camera_matrix,
        gather_triangles,
        render,
    )

    cm, _ = load_compiled(
        f"/root/reference/assets/game/map/{name}.gmap", with_bundle=False
    )
    rb = build_render_bundle(cm)
    st = reset(cm)
    sfn = jax.jit(lambda s, a: step(cm, s, a))
    for _ in range(20):
        st = sfn(st, Actions.zeros())

    frame = np.asarray(
        jax.jit(lambda s: render(rb, cm, s, size, size, mipmaps=False))(st)
    )

    vp, cam_pos = camera_matrix(cm, st, size, size)
    parts = gather_triangles(rb, cm, st, camera_pos_hint=cam_pos)
    ts = rb.sky_pos.shape[0]
    if ts and int(rb.sky_tex) >= 0:
        parts.insert(
            0,
            dict(
                pos=rb.sky_pos + cam_pos[None, None, :],
                uv=rb.sky_uv,
                lmuv=jnp.zeros((ts, 3, 2)),
                color=jnp.ones((ts, 3, 4)),
                tex=jnp.full((ts,), int(rb.sky_tex), jnp.int32),
                kind=jnp.full((ts,), KIND_SKY, jnp.int32),
                shaded=jnp.zeros((ts,), bool),
                valid=jnp.ones((ts,), bool),
                twosided=jnp.ones((ts,), bool),
            ),
        )
    soup = {
        k: np.concatenate([np.asarray(p[k]) for p in parts], 0)
        for k in parts[0]
    }
    keep = soup["valid"]
    soup = {k: v[keep] for k, v in soup.items()}
    return frame, soup, np.asarray(vp), np.asarray(cam_pos), st.env, rb, cm


def _sample_tex_np(tex, uv):
    """GL bilinear/nearest with repeat/clamp, straight off the decoded
    pixel array (TextureLoader.c sampler semantics)."""
    px = np.asarray(tex.pixels, np.float64)
    h, w = px.shape[:2]
    u, v = float(uv[0]), float(uv[1])
    if tex.repeat:
        u -= np.floor(u)
        v -= np.floor(v)
    else:
        u = min(max(u, 0.0), 1.0)
        v = min(max(v, 0.0), 1.0)
    fx, fy = u * w - 0.5, v * h - 0.5
    if not tex.repeat:
        fx = min(max(fx, 0.0), w - 1.0)
        fy = min(max(fy, 0.0), h - 1.0)
    ix0, iy0 = int(np.floor(fx)), int(np.floor(fy))
    tx, ty = fx - ix0, fy - iy0
    if tex.repeat:
        x0, y0 = ix0 % w, iy0 % h
        x1, y1 = (ix0 + 1) % w, (iy0 + 1) % h
    else:
        x0, y0 = ix0, iy0
        x1, y1 = min(ix0 + 1, w - 1), min(iy0 + 1, h - 1)
    c00, c10, c01, c11 = px[y0, x0], px[y0, x1], px[y1, x0], px[y1, x1]
    if tex.filter:
        return (
            c00 * (1 - tx) * (1 - ty)
            + c10 * tx * (1 - ty)
            + c01 * (1 - tx) * ty
            + c11 * tx * ty
        )
    return c11 if (tx > 0.5 and ty > 0.5) else (
        c01 if ty > 0.5 else (c10 if tx > 0.5 else c00)
    )


def _front_mask(soup, vp, width, height):
    """Renderer-equivalent front-facing mask: screen-space signed area of
    the projected triangle, CULL_MODE == "neg" (raster.py:344-351,
    VulkanPipelines.c:21-85 cull-back CCW). Two-sided rows always pass;
    rows with any vertex at/behind w<=0 are kept (the renderer clips them
    before culling, and the anchor only samples hits in front of the
    camera anyway)."""
    pos = soup["pos"].astype(np.float64)
    hom = np.concatenate([pos, np.ones((*pos.shape[:2], 1))], -1)
    clip = np.einsum("ij,tvj->tvi", vp.astype(np.float64), hom)
    w = clip[..., 3]
    safe_w = np.where(np.abs(w) > 1e-9, w, 1e-9)
    sx = (clip[..., 0] / safe_w + 1.0) * 0.5 * width
    sy = (clip[..., 1] / safe_w + 1.0) * 0.5 * height
    area = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])
    return soup["twosided"] | (area < 0.0) | ~np.all(w > 0.01, axis=-1)


def _trace(soup, origin, direction, front=None):
    """Nearest Moller-Trumbore hit among front-facing (or two-sided)
    triangles. Returns (t, tri_index, bary) or None."""
    v0 = soup["pos"][:, 0].astype(np.float64)
    e1 = soup["pos"][:, 1].astype(np.float64) - v0
    e2 = soup["pos"][:, 2].astype(np.float64) - v0
    pvec = np.cross(direction, e2)
    det = np.einsum("td,td->t", e1, pvec)
    ok = np.abs(det) > 1e-12
    if front is not None:
        ok = ok & front
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = origin - v0
    u = np.einsum("td,td->t", tvec, pvec) * inv
    qvec = np.cross(tvec, e1)
    v = np.dot(qvec, direction) * inv
    t = np.einsum("td,td->t", e2, qvec) * inv
    # sky triangles sit on a unit box around the camera; world geometry
    # must win every depth test against them (sz forced to far plane), so
    # trace world and sky separately
    from c_game_engine_tpu.render.raster import KIND_SKY
    is_sky = soup["kind"] == KIND_SKY
    hit = ok & (u >= -1e-9) & (v >= -1e-9) & (u + v <= 1 + 1e-9) & (t > 1e-4)
    best = None
    for sky_pass in (False, True):
        mask = hit & (is_sky if sky_pass else ~is_sky)
        if mask.any():
            ti = np.where(mask, t, np.inf).argmin()
            best = (float(t[ti]), int(ti), (float(u[ti]), float(v[ti])))
            return best
    return None


def _expected_color(soup, rb, env, vp, ti, bary, hit_point, textures):
    u, v = bary
    w0 = 1.0 - u - v
    bw = np.array([w0, u, v])
    uv = (soup["uv"][ti].astype(np.float64) * bw[:, None]).sum(0)
    lmuv = (soup["lmuv"][ti].astype(np.float64) * bw[:, None]).sum(0)
    color = (soup["color"][ti].astype(np.float64) * bw[:, None]).sum(0)
    tex_id = int(soup["tex"][ti])
    kind = int(soup["kind"][ti])
    shaded = bool(soup["shaded"][ti])

    if tex_id >= 0:
        tex4 = _sample_tex_np(textures[tex_id], uv)
    else:
        tex4 = np.ones(4)
    out = tex4 * color[3]
    fade = min(max(out[3], 0.0), 1.0)
    if fade < 0.999:
        return None  # screen-door dither territory; skip

    light = np.asarray(env.light_color, np.float64)[:3]
    lmap = np.asarray(rb.lightmap, np.float64)
    lh, lw = lmap.shape[:2]
    lx = min(max(int(lmuv[0] * lw), 0), lw - 1)
    ly = min(max(int(lmuv[1] * lh), 0), lh - 1)
    lm = lmap[ly, lx, :3]

    base = out[:3] * color[:3]
    if shaded:
        lit = base * light * (lm if kind == 0 else 1.0)  # KIND_MAP == 0
    else:
        lit = base

    clip = vp.astype(np.float64) @ np.array([*hit_point, 1.0])
    frag_depth = clip[2]  # gl_FragCoord.z / gl_FragCoord.w
    fog_c = np.asarray(env.fog_color, np.float64)
    fs, fe = float(env.fog_start), float(env.fog_end)
    ff = min(max((frag_depth - fs) / max(fe - fs, 1e-6), 0.0), 1.0) * fog_c[3]
    rgb = lit + (fog_c[:3] - lit) * ff
    rgb = np.clip(rgb * float(env.exposure), 0.0, 1.0)
    if kind == 3:  # KIND_SKY: tex * exposure only (sky_f.gshd)
        rgb = np.clip(tex4[:3] * float(env.exposure), 0.0, 1.0)
    return rgb


@pytest.mark.parametrize("name", ["test", "button"])
def test_render_matches_numpy_raytracer(name):
    size = 128
    frame, soup, vp, cam_pos, env, rb, cm = _scene(name, size)
    resolver = cm.aux["resolver"]
    textures = [resolver.texture(n) for n in rb.tex_names]

    inv_vp = np.linalg.inv(vp.astype(np.float64))

    def ray(px, py):
        pts = []
        for nz in (0.2, 0.8):
            ndc = np.array(
                [(px + 0.5) / size * 2 - 1, (py + 0.5) / size * 2 - 1, nz, 1.0]
            )
            p = inv_vp @ ndc
            pts.append(p[:3] / p[3])
        d = pts[1] - pts[0]
        return pts[0], d / np.linalg.norm(d)

    front = _front_mask(soup, vp, size, size)

    checked = mismatched = 0
    worst = 0.0
    for py in range(4, size, 9):
        for px in range(4, size, 9):
            o, d = ray(px, py)
            hit = _trace(soup, o, d, front)
            if hit is None:
                continue
            t, ti, (u, v) = hit
            # edge stability: require interior barycentrics and the same
            # winner for 4 sub-pixel jittered rays
            if min(u, v, 1 - u - v) < 0.03:
                continue
            stable = True
            for jx, jy in ((-0.3, -0.3), (0.3, -0.3), (-0.3, 0.3), (0.3, 0.3)):
                h2 = _trace(soup, *ray(px + jx, py + jy), front)
                if h2 is None or h2[1] != ti:
                    stable = False
                    break
            if not stable:
                continue
            hp = o + d * t
            exp = _expected_color(soup, rb, env, vp, ti, (u, v), hp, textures)
            if exp is None:
                continue
            got = frame[py, px].astype(np.float64)
            err = np.abs(got - exp).max()
            checked += 1
            worst = max(worst, err)
            if err > 2.5 / 255.0:
                mismatched += 1
    assert checked >= 60, f"{name}: only {checked} stable anchor pixels"
    frac = mismatched / checked
    assert frac <= 0.03, (
        f"{name}: {mismatched}/{checked} anchor pixels off "
        f"(worst {worst * 255:.1f}/255)"
    )
