"""Lightmap radiance model — the editor's bake formula, recovered by fit.

The reference's baker lives in its external editor (SURVEY.md §2.6 — the
repo ships only compiled .gmap lightmaps), so the model was recovered by
regressing the shipped bakes on candidate basis functions
(benchmarks/baker_fit.py, nonnegative least squares over per-light
falloff/cosine/visibility variants on shapes.gmap + too_many_lights.gmap,
the two shipped maps with point lights):

  L(p) = sum_l color_l * brightness_l * visible(p, l)
         * max(1/d^att_l - 1/range_l^att_l, 0)

i.e. a shifted inverse-power falloff that reaches exactly zero at
`range` (algebraically (1/d^a)*(1-(d/r)^a)), hard shadow rays, and —
notably — NO surface-cosine (Lambert) term, no ambient, no indirect
bounce, with unit gain in the editor's output units. Fit quality at
gain 1.0 (benchmarks/baker_fit.py):

  shapes.gmap          R^2 = 0.977, median rel. err 0.013  (1370 samples)
  too_many_lights.gmap R^2 = 0.958, median rel. err 0.088  (48 samples;
                       range=2/att=2 lights -> steep luxel gradients, so
                       point-sampling noise dominates)

Every alternative with a cosine term fits far worse (R^2 <= 0.58), as
does any model without shadow rays (R^2 <= 0.52) — both terms are
decisively identified, not assumed. Light params per Light.h:12-24
(position, color, brightness, range, attenuation).
"""

from __future__ import annotations

import numpy as np

# The fitted output gain is 1.0 (0.98-1.01 on both calibration maps): the
# editor writes radiance in these natural units directly.
GAIN = 1.0
# Kept for API compatibility with experiments; the recovered editor model
# has no indirect term, so bakes default to direct-only.
ALBEDO = 0.35
N_BOUNCE = 16


def _hammersley(n: int) -> np.ndarray:
    """[n, 2] deterministic low-discrepancy points (van der Corput base 2)."""
    u = (np.arange(n) + 0.5) / n
    v = np.zeros(n)
    for i in range(n):
        x, f, r = i, 0.5, 0.0
        while x:
            r += f * (x & 1)
            x >>= 1
            f *= 0.5
        v[i] = r
    return np.stack([u, v], -1)


def _cosine_dirs(n: int) -> np.ndarray:
    """[n, 3] cosine-weighted hemisphere dirs around +Z (pdf = cos/pi)."""
    uv = _hammersley(n)
    r = np.sqrt(uv[:, 0])
    phi = 2.0 * np.pi * uv[:, 1]
    return np.stack(
        [r * np.cos(phi), r * np.sin(phi), np.sqrt(np.maximum(1.0 - uv[:, 0], 0.0))], -1
    ).astype(np.float32)


def make_shader(point_lights, occluder_tris, bounces: int = 0, albedo: float = ALBEDO):
    """Returns a jitted shade(pts [B,3], normal [3]) -> [B,3] radiance
    function over the map's light set and occluder soup.

    The default (bounces=0) is the recovered editor model above. bounces>0
    adds a cosine-weighted one-bounce estimate — not part of the editor's
    model, kept for lighting experiments on original content."""
    import jax
    import jax.numpy as jnp

    # full-f32 contractions: under the axon TPU backend default-precision
    # einsums take bf16 inputs and would corrupt the ray-hit solves
    # (PARITY.md #19)
    def _einsum32(*args, **kw):
        return jnp.einsum(*args, precision=jax.lax.Precision.HIGHEST, **kw)

    tri_a = jnp.asarray(occluder_tris[:, 0])
    tri_e1 = jnp.asarray(occluder_tris[:, 1] - occluder_tris[:, 0])
    tri_e2 = jnp.asarray(occluder_tris[:, 2] - occluder_tris[:, 0])
    tri_n = jnp.asarray(
        np.cross(
            occluder_tris[:, 1] - occluder_tris[:, 0],
            occluder_tris[:, 2] - occluder_tris[:, 0],
        )
    )
    tri_n = tri_n / jnp.maximum(jnp.linalg.norm(tri_n, axis=-1, keepdims=True), 1e-12)
    lights = jnp.asarray(point_lights)  # [L, 9]
    bdirs = jnp.asarray(_cosine_dirs(N_BOUNCE))

    def direct(pts, normals):
        """pts [B,3], normals [B,3] -> [B,3].

        normals are used only for bounce-ray hemisphere orientation; the
        editor's direct term itself is cosine-free (see module docstring).
        """
        del normals

        def per_light(L):
            lp, lc = L[:3], L[3:6]
            brightness, rng, att = L[6], L[7], L[8]
            delta = lp[None] - pts
            dist = jnp.maximum(jnp.linalg.norm(delta, axis=-1), 1e-4)
            att = jnp.maximum(att, 1e-6)
            falloff = jnp.maximum(
                dist**-att - jnp.maximum(rng, 1e-6) ** -att, 0.0
            )
            # shadow ray pts -> lp (Moller-Trumbore vs all occluders)
            d = delta  # [B,3]
            h = jnp.cross(d[:, None, :], tri_e2[None])
            det = _einsum32("tj,btj->bt", tri_e1, h)
            ok = jnp.abs(det) > 1e-9
            inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            s = pts[:, None, :] - tri_a[None]
            u = _einsum32("btj,btj->bt", s, h) * inv
            qv = jnp.cross(s, tri_e1[None])
            v = _einsum32("bj,btj->bt", d, qv) * inv
            t = _einsum32("tj,btj->bt", tri_e2, qv) * inv
            hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) & (t < 1.0 - 1e-4)
            visible = ~jnp.any(hit, axis=1)
            w = jnp.where(visible, brightness * falloff, 0.0)
            return lc[None] * w[:, None]

        acc = jax.lax.map(per_light, lights)  # [L, B, 3]
        return jnp.sum(acc, axis=0)

    def nearest_hit(origins, dirs):
        """origins/dirs [R,3] -> (hit mask [R], point [R,3], normal [R,3],
        oriented toward the ray origin)."""
        h = jnp.cross(dirs[:, None, :], tri_e2[None])
        det = _einsum32("tj,rtj->rt", tri_e1, h)
        ok = jnp.abs(det) > 1e-9
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        s = origins[:, None, :] - tri_a[None]
        u = _einsum32("rtj,rtj->rt", s, h) * inv
        qv = jnp.cross(s, tri_e1[None])
        v = _einsum32("rj,rtj->rt", dirs, qv) * inv
        t = _einsum32("tj,rtj->rt", tri_e2, qv) * inv
        good = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-3)
        t = jnp.where(good, t, jnp.inf)
        best = jnp.argmin(t, axis=1)
        tb = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
        hit = jnp.isfinite(tb)
        ph = origins + dirs * jnp.where(hit, tb, 0.0)[:, None]
        nh = tri_n[best]
        flip = jnp.sign(-jnp.sum(nh * dirs, -1))
        nh = nh * jnp.where(flip == 0, 1.0, flip)[:, None]
        return hit, ph, nh

    @jax.jit
    def shade(pts, normal):
        """pts [B,3], surface normal [3] -> radiance [B,3]."""
        b = pts.shape[0]
        normals = jnp.broadcast_to(normal, (b, 3))
        out = direct(pts, normals)
        if bounces > 0 and occluder_tris.shape[0] > 0:
            # orthonormal basis around the normal
            up = jnp.where(jnp.abs(normal[1]) < 0.9, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
            tx = jnp.cross(up, normal)
            tx = tx / jnp.maximum(jnp.linalg.norm(tx), 1e-9)
            ty = jnp.cross(normal, tx)
            world_dirs = (
                bdirs[:, 0:1] * tx[None] + bdirs[:, 1:2] * ty[None] + bdirs[:, 2:3] * normal[None]
            )  # [K,3]

            def per_dir(wd):
                hit, ph, nh = nearest_hit(pts + normal[None] * 1e-3, jnp.broadcast_to(wd, (b, 3)))
                li = direct(ph + nh * 1e-3, nh)
                return jnp.where(hit[:, None], li, 0.0)

            bounce = jax.lax.map(per_dir, world_dirs)  # [K, B, 3]
            out = out + albedo * jnp.mean(bounce, axis=0)
        return out

    return shade
