"""Baker calibration vs a shipped .gmap lightmap.

The reference's lightmap baker lives in its external editor (SURVEY.md
§2.6); the only ground truth we have is the baked RGBA16F lightmap inside
the shipped .gmap files. This script samples the shipped bake at triangle
surface points (via the per-vertex lightmapUv chart) and compares it with
our radiance model (compiler/baker.py) evaluated at the same WORLD
positions/normals — so the comparison is chart-layout independent.

Usage: python benchmarks/baker_calibration.py [map=shapes] [albedo ...]
Prints median/mean relative error for direct-only and direct+bounce at
each albedo (PARITY.md #13: round-1 direct-only ~0.20 median; target is
half that).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from c_game_engine_tpu.assets.gmap import decode_gmap


def sample_points(gmap, max_tris=400):
    """Surface samples: (world [S,3], normal [S,3], shipped rgb [S,3])."""
    lm = np.asarray(gmap.lightmap)  # [H, W, 4]
    lh, lw = lm.shape[:2]
    pts, nrm, ship = [], [], []
    for model in gmap.models:
        v = model.vertices  # [V, 7] pos uv lmuv
        idx = model.indices.reshape(-1, 3).astype(np.int64)
        for tri in idx[:max_tris]:
            p = v[tri][:, :3]
            uvl = v[tri][:, 5:7]
            n = np.cross(p[1] - p[0], p[2] - p[0])
            ln = np.linalg.norm(n)
            if ln < 1e-9:
                continue
            n = n / ln
            # a few interior barycentric samples per triangle
            for bary in ((1 / 3, 1 / 3, 1 / 3), (0.6, 0.2, 0.2), (0.2, 0.6, 0.2), (0.2, 0.2, 0.6)):
                b = np.asarray(bary)
                w = b @ p
                uv = b @ uvl
                x = min(max(int(uv[0] * lw), 0), lw - 1)
                y = min(max(int(uv[1] * lh), 0), lh - 1)
                pts.append(w)
                nrm.append(n)
                ship.append(lm[y, x, :3])
    return (
        np.asarray(pts, np.float32),
        np.asarray(nrm, np.float32),
        np.asarray(ship, np.float32),
    )


def occluders(gmap):
    tris = []
    for comp in gmap.collision:
        for soup in comp.sub_tris:
            tris.append(np.asarray(soup, np.float32) + comp.origin[None, None, :])
    return np.concatenate(tris, 0) if tris else np.zeros((0, 3, 3), np.float32)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "shapes"
    albedos = [float(a) for a in sys.argv[2:]] or [0.3, 0.5, 0.7]
    gmap = decode_gmap(f"/root/reference/assets/game/map/{name}.gmap")
    pts, nrm, ship = sample_points(gmap)
    occ = occluders(gmap)
    lights = np.asarray(gmap.point_lights, np.float32)
    print(f"{name}: {len(pts)} samples, {len(occ)} occluder tris, {len(lights)} lights")

    # keep lit, occlusion-aware samples (dark luxels make relative error
    # meaningless)
    lum = ship.mean(-1)
    keep = lum > 0.05
    pts, nrm, ship = pts[keep], nrm[keep], ship[keep]
    print(f"{keep.sum()} lit samples")

    from c_game_engine_tpu.compiler.baker import make_shader
    import jax.numpy as jnp

    def run_on(bounces, albedo, pts, nrm, ship):
        shade = make_shader(lights, occ, bounces=bounces, albedo=albedo)
        ours = np.zeros((len(pts), 3), np.float32)
        CH = 2048
        # group by (approximately) shared normal to reuse the jit shape
        order = np.lexsort(np.round(nrm, 3).T)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        sp, sn = pts[order], nrm[order]
        i = 0
        res = np.zeros_like(ours)
        while i < len(sp):
            j = i
            while j < len(sp) and np.allclose(sn[j], sn[i], atol=1e-4):
                j += 1
            chunk = sp[i:j]
            padded = np.zeros((CH, 3), np.float32)
            for s0 in range(0, len(chunk), CH):
                c = chunk[s0 : s0 + CH]
                padded[: len(c)] = c
                out = np.asarray(shade(jnp.asarray(padded), jnp.asarray(sn[i])))
                res[i + s0 : i + s0 + len(c)] = out[: len(c)]
            i = j
        ours = res[inv]
        o, s = ours.mean(-1), ship.mean(-1)
        # the shipped bake's global exposure/units are the editor's own;
        # fit one scalar gain (the falloff SHAPE is what we calibrate)
        gain = float(np.median(s / np.maximum(o, 1e-6)))
        rel = np.abs(gain * o - s) / np.maximum(s, 1e-3)
        return float(np.median(rel)), float(rel.mean()), gain

    for label, mask in (("all", np.ones(len(pts), bool)), ("floors", nrm[:, 1] > 0.7)):
        gp, gn, gs = pts[mask], nrm[mask], ship[mask]
        print(f"-- {label} ({mask.sum()} samples)")
        med, mean, gain = run_on(0, 0.0, gp, gn, gs)
        print(f"direct-only:          median {med:.3f}  mean {mean:.3f}  gain {gain:.3f}")
        for a in albedos:
            med, mean, gain = run_on(1, a, gp, gn, gs)
            print(f"+bounce albedo={a:.2f}:  median {med:.3f}  mean {mean:.3f}  gain {gain:.3f}", flush=True)


if __name__ == "__main__":
    main()
