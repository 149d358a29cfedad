"""Stage-by-stage instrumentation of the xla render backend.

Replicates render/raster.py::_render_env's pre-pass-1 pipeline (gather ->
cull/compact -> near clip -> setup -> z-pass) inside ONE jit, returning
per-stage counters alongside the winner image. Because the round-4 enc-bit
miscompile only appeared when the subgraph was fused with the z-pass scan,
the counters must be byproducts of the same compiled graph, not separate
little programs.

Usage: python benchmarks/debug_render_stages.py <map> [cpu]
Prints one JSON dict of counters; writes /tmp/dbg_<map>_<plat>.npz with the
winner image + per-stage masks for offline diffing.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H = W = 256


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "shapes"
    force_cpu = len(sys.argv) > 2 and sys.argv[2] == "cpu"
    if force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from c_game_engine_tpu.compiler.cache import load_compiled
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.render import raster as R

    cmap, rb = load_compiled(f"/root/reference/assets/game/map/{name}.gmap")
    plat = jax.default_backend()

    def dbg(state):
        out = {}
        vp, cam_pos = R.camera_matrix(cmap, state, W, H)
        out["cam_pos"] = cam_pos
        parts = R.gather_triangles(rb, cmap, state, camera_pos_hint=cam_pos)
        ts = rb.sky_pos.shape[0]
        if ts:
            parts.insert(
                0,
                dict(
                    pos=rb.sky_pos + cam_pos[None, None, :],
                    uv=rb.sky_uv,
                    lmuv=jnp.zeros((ts, 3, 2)),
                    color=jnp.ones((ts, 3, 4)),
                    tex=jnp.full((ts,), 1, jnp.int32) * rb.sky_tex,
                    kind=jnp.full((ts,), R.KIND_SKY, jnp.int32),
                    shaded=jnp.zeros((ts,), bool),
                    valid=jnp.full((ts,), rb.sky_tex >= 0),
                    twosided=jnp.ones((ts,), bool),
                ),
            )
        tri = R._concat_parts(parts)
        t_total = tri["pos"].shape[0]
        pad = (-t_total) % R.CHUNK
        if pad:
            tri = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)]
                ),
                tri,
            )
            tri["valid"] = tri["valid"].at[t_total:].set(False)
        out["n_input_valid"] = tri["valid"].sum()
        out["n_input_valid_map"] = (tri["valid"] & (tri["kind"] == R.KIND_MAP)).sum()

        pos_h = jnp.concatenate(
            [tri["pos"], jnp.ones((*tri["pos"].shape[:2], 1))], -1
        )
        clip = jnp.einsum("ij,tvj->tvi", vp, pos_h,
                          precision=jax.lax.Precision.HIGHEST)
        w0 = clip[..., 3]
        any_pos = jnp.any(w0 > 0.01, axis=-1)
        all_pos = jnp.all(w0 > 0.01, axis=-1)
        inv_w0 = 1.0 / jnp.where(jnp.abs(w0) > 1e-9, w0, 1e-9)
        sx0 = (clip[..., 0] * inv_w0 + 1.0) * 0.5 * W
        sy0 = (clip[..., 1] * inv_w0 + 1.0) * 0.5 * H
        area0 = (sx0[:, 1] - sx0[:, 0]) * (sy0[:, 2] - sy0[:, 0]) - (
            sy0[:, 1] - sy0[:, 0]
        ) * (sx0[:, 2] - sx0[:, 0])
        front0 = (area0 < 0.0) | tri["twosided"]
        keep = tri["valid"] & any_pos & (~all_pos | (front0 & (jnp.abs(area0) > 1e-9)))
        out["n_any_pos"] = (tri["valid"] & any_pos).sum()
        out["n_all_pos"] = (tri["valid"] & all_pos).sum()
        out["n_front0"] = (tri["valid"] & front0).sum()
        out["n_keep"] = keep.sum()
        out["n_keep_map"] = (keep & (tri["kind"] == R.KIND_MAP)).sum()
        out["keep_mask"] = keep
        out["area0"] = area0

        t = keep.shape[0]
        bound = -(-max(rb.live_tri_bound, 1) // R.CHUNK) * R.CHUNK
        cap = min(t, max(bound, R.CHUNK))
        out["static_cap"] = jnp.int32(cap)
        out["static_t"] = jnp.int32(t)
        if cap < t:
            order = jnp.sort(jnp.where(keep, jnp.arange(t, dtype=jnp.int32), t))[:cap]
            safe = jnp.minimum(order, t - 1)
            tri = {k: v[safe] for k, v in tri.items()}
            tri["valid"] = tri["valid"] & (order < t)
            clip = clip[safe]
        else:
            tri = dict(tri)
            tri["valid"] = keep
        out["n_after_compact"] = tri["valid"].sum()

        clip, tri = R._clip_near(clip, tri)
        w = clip[..., 3]
        ok_w = jnp.all(w > 1e-5, axis=-1)
        inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        ndc = clip[..., :3] * inv_w[..., None]
        sx = (ndc[..., 0] + 1.0) * 0.5 * W
        sy = (ndc[..., 1] + 1.0) * 0.5 * H
        sz = ndc[..., 2]
        is_sky = tri["kind"] == R.KIND_SKY
        sz = jnp.where(is_sky[:, None], 0.999999, sz)
        area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
            sy[:, 1] - sy[:, 0]
        ) * (sx[:, 2] - sx[:, 0])
        front = (area2 < 0.0) | tri["twosided"]
        tri_ok = tri["valid"] & ok_w & front & (jnp.abs(area2) > 1e-9)
        out["n_clip_valid"] = tri["valid"].sum()
        out["n_ok_w"] = (tri["valid"] & ok_w).sum()
        out["n_tri_ok"] = tri_ok.sum()
        out["n_tri_ok_map"] = (tri_ok & (tri["kind"] == R.KIND_MAP)).sum()
        out["tri_ok_mask"] = tri_ok
        out["sx"] = sx
        out["sy"] = sy
        out["sz"] = sz

        px = jnp.arange(W, dtype=jnp.float32) + 0.5
        py = jnp.arange(H, dtype=jnp.float32) + 0.5
        gx, gy = jnp.meshgrid(px, py)
        winner = R._pass1_xla(sx, sy, sz, tri_ok, gx, gy, H, W)
        out["winner"] = winner
        out["n_px_hit"] = (winner >= 0).sum()
        wkind = tri["kind"][jnp.clip(winner, 0, None)]
        out["n_px_map"] = ((winner >= 0) & (wkind == R.KIND_MAP)).sum()
        out["n_px_sky"] = ((winner >= 0) & (wkind == R.KIND_SKY)).sum()
        return out

    st = reset(cmap)
    res = jax.jit(dbg)(st)
    res = {k: np.asarray(v) for k, v in res.items()}
    scalars = {
        k: v.tolist()
        for k, v in res.items()
        if v.ndim == 0 or (v.ndim == 1 and v.size <= 3)
    }
    print(json.dumps({"map": name, "platform": plat, **scalars}))
    np.savez_compressed(f"/tmp/dbg_{name}_{plat}.npz", **res)

    # also run the real public render for ground truth
    img = np.asarray(
        jax.jit(lambda s: R.render(rb, cmap, s, H, W, backend="xla"))(st)
    )
    u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    nonsky = float(
        (np.abs(u8.astype(np.int32) - u8[0, 0].astype(np.int32)).sum(-1) > 12).mean()
    )
    print(json.dumps({"render_mean": float(img.mean()), "nonsky_frac_vs_corner": nonsky}))


if __name__ == "__main__":
    main()
