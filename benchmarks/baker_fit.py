"""Data-driven fit of the editor's (unknown) lightmap model.

Regresses the shipped shapes.gmap bake luminance on candidate per-light
basis functions (lambert x falloff variants x visibility), a directional
global_light sun term, and a constant ambient, via nonnegative least
squares. Reports R^2 / median relative error per model so the baker
(compiler/baker.py) can adopt the best-fitting form (PARITY.md #13).

Usage: python benchmarks/baker_fit.py [map=shapes]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from benchmarks.baker_calibration import occluders, sample_points
from c_game_engine_tpu.assets.gmap import decode_gmap


def vis_rays(pts, targets, occ):
    """bool [S]: segment pts->targets unobstructed by occ tris [T,3,3]."""
    a = occ[:, 0]
    e1 = occ[:, 1] - occ[:, 0]
    e2 = occ[:, 2] - occ[:, 0]
    out = np.ones(len(pts), bool)
    CH = 512
    for i in range(0, len(pts), CH):
        p = pts[i : i + CH]
        d = targets[i : i + CH] - p
        h = np.cross(d[:, None, :], e2[None])
        det = np.einsum("tj,btj->bt", e1, h)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        s = p[:, None, :] - a[None]
        u = np.einsum("btj,btj->bt", s, h) * inv
        qv = np.cross(s, e1[None])
        v = np.einsum("bj,btj->bt", d, qv) * inv
        t = np.einsum("tj,btj->bt", e2, qv) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < 1 - 1e-4)
        out[i : i + CH] = ~hit.any(1)
    return out


def nnls_fit(X, y):
    """Nonnegative LS via projected coordinate descent (small problems)."""
    w = np.zeros(X.shape[1])
    XtX = X.T @ X
    Xty = X.T @ y
    for _ in range(2000):
        for j in range(len(w)):
            r = Xty[j] - XtX[j] @ w + XtX[j, j] * w[j]
            w[j] = max(r / max(XtX[j, j], 1e-12), 0.0)
    return w


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "shapes"
    gmap = decode_gmap(f"/root/reference/assets/game/map/{name}.gmap")
    pts, nrm, ship = sample_points(gmap)
    occ = occluders(gmap)
    lights = np.asarray(gmap.point_lights, np.float32)
    lum = ship.mean(-1)
    keep = lum > 0.02
    pts, nrm, lum, ship = pts[keep], nrm[keep], lum[keep], ship[keep]
    print(f"{name}: {len(pts)} lit samples, {len(occ)} occ tris, {len(lights)} lights")

    # sun direction from the map source's global_light rotation
    src = json.load(open(f"/root/reference/mapSources/{name}.json"))
    sun = None
    for a in src["actors"]:
        if a["class"] == "global_light":
            rx, ry = np.radians(a["rotation"]["x"]), np.radians(a["rotation"]["y"])
            # editor convention guess: forward -Z rotated by pitch rx then yaw ry
            d = np.array(
                [
                    np.sin(ry) * np.cos(rx),
                    np.sin(rx),
                    -np.cos(ry) * np.cos(rx),
                ]
            )
            sun = -d / np.linalg.norm(d)  # direction TOWARD the sun
            print("global_light rot:", a["rotation"], "sun dir:", sun)

    S = len(pts)

    # Per-channel fit: each sample contributes 3 rows (R, G, B), and each
    # per-light feature column carries that light's per-channel color — a red
    # light only explains the red channel. This disambiguates lights that a
    # luminance-only fit conflates.
    off = pts + nrm * 1e-3
    geos = {}  # falloff-variant -> [S] per light, color applied later
    per_light = []
    for li, L in enumerate(lights):
        lp = L[:3]
        delta = lp[None] - off
        dist = np.linalg.norm(delta, axis=-1)
        ldir = delta / np.maximum(dist, 1e-9)[:, None]
        lam = np.maximum((ldir * nrm).sum(-1), 0.0)
        vis = vis_rays(off, np.broadcast_to(lp, (S, 3)), occ)
        rng, att, br = L[7], L[8], L[6]
        d = np.maximum(dist, 1e-6)
        lin = np.clip(1 - dist / rng, 0, 1) ** att
        win = np.clip(1 - (dist / rng) ** 4, 0, 1) ** 2  # UE-style window
        base = lam * vis * br
        facing = (lam > 0).astype(np.float64)
        raw_dot = (ldir * nrm).sum(-1)
        halflam = 0.5 + 0.5 * raw_dot
        per_light.append(
            dict(
                lin=base * lin,
                inv2=base / d**2,
                inv2p1=base / (1.0 + d**2),
                inv2win=base * win / d**2,
                inv_att=base / d**att,
                inv_att1=base / d ** (att + 1.0),
                nolam_inv2=vis * br / d**2,
                nolam_inv2p1=vis * br / (1.0 + d**2),
                face_inv2=vis * br * facing / d**2,
                halflam_inv2=vis * br * halflam / d**2,
                halflam2_inv2=vis * br * halflam**2 / d**2,
                sqrtlam_inv2=vis * br * np.sqrt(lam) / d**2,
                nolam_inv=vis * br / d,
                nolam_lin=vis * br * lin,
            )
        )
    variants = list(per_light[0].keys())

    sun_feat = np.zeros(S)
    if sun is not None:
        slam = np.maximum(nrm @ sun, 0.0)
        svis = vis_rays(off, off + sun[None] * 200.0, occ)
        sun_feat = slam * svis

    # One-bounce indirect feature [S,3]: cosine-weighted hemisphere rays to
    # the nearest surface, lit there by the best direct model (nolam_inv2).
    def direct_rgb(p, n):
        out = np.zeros((len(p), 3))
        o = p + n * 1e-3
        for L in lights:
            lp, lc, br = L[:3], L[3:6], L[6]
            dist = np.maximum(np.linalg.norm(lp[None] - o, axis=-1), 1e-6)
            v = vis_rays(o, np.broadcast_to(lp, (len(o), 3)), occ)
            out += lc[None] * (v * br / dist**2)[:, None]
        return out

    def bounce_feature():
        K = 8
        uv = (np.arange(K) + 0.5) / K
        phi = 2 * np.pi * ((np.arange(K) * 0.618034) % 1.0)
        r = np.sqrt(uv)
        local = np.stack([r * np.cos(phi), r * np.sin(phi), np.sqrt(1 - uv)], -1)
        up = np.where(np.abs(nrm[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
        tx = np.cross(up, nrm)
        tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-9)
        ty = np.cross(nrm, tx)
        acc = np.zeros((S, 3))
        a0, e1, e2 = occ[:, 0], occ[:, 1] - occ[:, 0], occ[:, 2] - occ[:, 0]
        tn = np.cross(e1, e2)
        tn /= np.maximum(np.linalg.norm(tn, axis=-1, keepdims=True), 1e-12)
        o = off + nrm * 1e-3
        for k in range(K):
            wd = local[k, 0] * tx + local[k, 1] * ty + local[k, 2] * nrm  # [S,3]
            h = np.cross(wd[:, None, :], e2[None])
            det = np.einsum("tj,btj->bt", e1, h)
            ok = np.abs(det) > 1e-9
            inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
            s = o[:, None, :] - a0[None]
            u = np.einsum("btj,btj->bt", s, h) * inv
            qv = np.cross(s, e1[None])
            v = np.einsum("bij,btj->bt", wd[:, None], qv) * inv
            t = np.einsum("tj,btj->bt", e2, qv) * inv
            good = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-3)
            t = np.where(good, t, np.inf)
            best = t.argmin(1)
            tb = t[np.arange(S), best]
            hit = np.isfinite(tb)
            hp = o + wd * np.where(hit, tb, 0.0)[:, None]
            hn = tn[best]
            hn *= np.where(np.einsum("bj,bj->b", hn, wd) > 0, -1.0, 1.0)[:, None]
            li = direct_rgb(hp, hn)
            acc += np.where(hit[:, None], li, 0.0)
        return acc / K

    print("computing bounce feature...", flush=True)
    bounce_rgb = bounce_feature()

    fl = nrm[:, 1] > 0.7

    def evaluate_rgb(variant, shared_gain, extras):
        """Fit per-channel. Columns: per-light geo*color (or one shared
        column = sum over lights), optional sun (x sun color), ambient."""
        cols = []
        names = []
        nl = len(lights)
        if shared_gain:
            col = np.zeros((S, 3))
            for li in range(nl):
                col += per_light[li][variant][:, None] * lights[li, 3:6][None]
            cols.append(col)
            names.append(variant)
        else:
            for li in range(nl):
                cols.append(per_light[li][variant][:, None] * lights[li, 3:6][None])
                names.append(f"l{li}")
        if "sun" in extras:
            suncol = np.array([1.0, 0.9955, 0.8480])
            cols.append(sun_feat[:, None] * suncol[None])
            names.append("sun")
        if "amb" in extras:
            cols.append(np.ones((S, 3)))
            names.append("amb")
        if "bounce" in extras:
            cols.append(bounce_rgb)
            names.append("bounce")
        X = np.stack([c.reshape(-1) for c in cols], -1)  # [S*3, F]
        y = ship.reshape(-1)
        w = nnls_fit(X, y)
        pred = (X @ w).reshape(S, 3)
        ss = ((ship - pred) ** 2).sum() / ((ship - ship.mean(0)) ** 2).sum()
        plum = pred.mean(-1)
        rel = np.abs(plum - lum) / np.maximum(lum, 1e-3)
        return 1 - ss, float(np.median(rel)), float(np.median(rel[fl])), w, names

    for shared in (False, True):
        tag = "shared-gain" if shared else "per-light "
        for variant in variants:
            for extras in (("amb",), ("bounce",), ("bounce", "amb")):
                if sun is None and "sun" in extras:
                    continue
                r2, med, medf, w, names = evaluate_rgb(variant, shared, extras)
                ex = "+".join(extras) if extras else "-"
                print(
                    f"{tag} {variant:10s} +{ex:8s} R2={r2:.4f} med_rel={med:.3f} "
                    f"floors={medf:.3f} w={np.round(w, 3)}"
                )


if __name__ == "__main__":
    main()
