"""Map compiler structure tests over the shipped maps."""

import glob

import numpy as np
import pytest

from c_game_engine_tpu.actors.defs import ActorClass, Motion
from c_game_engine_tpu.compiler.compile import compile_map

MAPS = "/root/reference/assets/game/map"


@pytest.mark.parametrize(
    "name", [p.split("/")[-1][:-5] for p in sorted(glob.glob(f"{MAPS}/*.gmap"))]
)
def test_compile_all_shipped_maps(name):
    cm = compile_map(f"{MAPS}/{name}.gmap")
    n = cm.aux["num_real_actors"]
    assert cm.num_actors >= n
    assert bool(np.asarray(cm.init_active)[:n].all())
    assert cm.tris.shape[0] >= cm.aux["num_real_tris"]


def test_test_map_structure(test_map):
    cm = test_map
    classes = cm.aux["actor_classes"]
    # 4 emitters each pre-spawn a laser child (LaserEmitter.c behavior)
    assert classes.count("LASER_EMITTER") == 4
    assert classes.count("LASER") == 4
    assert classes.count("PHYSBOX") == 1
    # trigger wiring from test.json compiled to integer edges
    assert cm.aux["num_real_edges"] > 0
    # physbox cube: exact box half extents
    i = classes.index("PHYSBOX")
    assert np.allclose(np.asarray(cm.halfext[i]), [0.2, 0.2, 0.2], atol=1e-5)
    assert int(cm.motion[i]) == int(Motion.DYNAMIC)
    assert float(cm.mass[i]) == 10.0  # Physbox.c mass override


def test_door_compile():
    cm = compile_map(f"{MAPS}/advanced_doors.gmap")
    classes = cm.aux["actor_classes"]
    assert classes.count("DOOR") == 4
    i = classes.index("DOOR")
    width = float(cm.sfparams[i, 0])
    closed = np.asarray(cm.init_pos[i])
    opened = np.asarray(cm.sfparams[i, 2:5])
    # open and closed positions are `width` apart (Door.c:CreateDoorBodies)
    assert np.isclose(np.linalg.norm(opened - closed), width, atol=1e-4)


def test_stacked_csg_openings_match_shipped():
    """Plane-touching sectors (A.ceiling == B.floor, overlapping
    footprints) get an OPENING: the overlap is cut from both surfaces,
    render and collision alike (stacked.gmap sector 5's ceiling at y=-1 is
    an annulus around sector 6). Our tessellation is finer than the
    editor's, so the pin is exact AREA per horizontal plane."""
    import numpy as np

    from c_game_engine_tpu.assets.gmap import decode_gmap
    from c_game_engine_tpu.compiler.sectors import compile_map_source

    def plane_areas(g):
        allt = [
            np.asarray(s) + np.asarray(c.origin)[None, None, :]
            for c in g.collision
            for s in c.sub_tris
        ]
        tris = np.concatenate(allt, 0)
        flat = np.abs(tris[:, :, 1] - tris[:, 0:1, 1]).max(-1) < 1e-6
        out = {}
        for yp in np.unique(np.round(tris[flat][:, 0, 1], 4)):
            sel = flat & (np.abs(tris[:, 0, 1] - yp) < 1e-6)
            area = sum(
                abs(
                    (t[1, 0] - t[0, 0]) * (t[2, 2] - t[0, 2])
                    - (t[1, 2] - t[0, 2]) * (t[2, 0] - t[0, 0])
                )
                / 2
                for t in tris[sel]
            )
            out[float(yp)] = area
        return out

    ours = plane_areas(compile_map_source("/root/reference/mapSources/stacked.json"))
    ship = plane_areas(decode_gmap("/root/reference/assets/game/map/stacked.gmap"))
    for yp, want in ship.items():
        got = ours.get(yp)
        assert got is not None, f"missing plane y={yp}"
        assert abs(got - want) < 0.05, (yp, got, want)


@pytest.mark.parametrize("name,med_bound", [("shapes", 0.05), ("too_many_lights", 0.15)])
def test_baker_matches_shipped_bake(name, med_bound):
    """The recovered editor lightmap model (compiler/baker.py docstring:
    color*brightness*visible*max(1/d^att - 1/range^att, 0), cosine-free,
    unit gain) reproduces the shipped bakes. Exercises the production
    make_shader path at a surface subsample; bounds are tight enough that
    reintroducing a lambert term, dropping shadow rays, or changing the
    falloff form fails (those fit at >= 0.23 median rel. err)."""
    import jax.numpy as jnp

    from c_game_engine_tpu.assets.gmap import decode_gmap
    from c_game_engine_tpu.compiler.baker import GAIN, make_shader

    gmap = decode_gmap(f"{MAPS}/{name}.gmap")
    lights = np.asarray(gmap.point_lights, np.float32)
    lm = np.asarray(gmap.lightmap)
    lh, lw = lm.shape[:2]
    occ = np.concatenate(
        [
            np.asarray(s, np.float32) + np.asarray(c.origin, np.float32)[None, None, :]
            for c in gmap.collision
            for s in c.sub_tris
        ],
        0,
    )
    # surface samples via the lightmap UV chart (chart-layout independent)
    pts, nrms, ship = [], [], []
    for model in gmap.models:
        v = model.vertices
        for tri in model.indices.reshape(-1, 3).astype(np.int64)[:200]:
            p, uvl = v[tri][:, :3], v[tri][:, 5:7]
            nv = np.cross(p[1] - p[0], p[2] - p[0])
            ln = np.linalg.norm(nv)
            if ln < 1e-9:
                continue
            for bary in ((1 / 3, 1 / 3, 1 / 3), (0.6, 0.2, 0.2), (0.2, 0.6, 0.2), (0.2, 0.2, 0.6)):
                b = np.asarray(bary)
                uv = b @ uvl
                x = min(max(int(uv[0] * lw), 0), lw - 1)
                y = min(max(int(uv[1] * lh), 0), lh - 1)
                pts.append(b @ p)
                nrms.append(nv / ln)
                ship.append(lm[y, x, :3])
    pts, nrms, ship = (np.asarray(a, np.float32) for a in (pts, nrms, ship))
    lit = ship.mean(-1) > 0.05
    assert lit.sum() >= 20, f"too few lit samples on {name}"

    shade = make_shader(lights, occ, bounces=0)
    ours = np.zeros((len(pts), 3), np.float32)
    CAP = 256
    order = np.lexsort(np.round(nrms, 3).T)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and np.allclose(nrms[order[j]], nrms[order[i]], atol=1e-4):
            j += 1
        sel = order[i:j]
        padded = np.zeros((CAP, 3), np.float32)
        for s0 in range(0, len(sel), CAP):
            ss = sel[s0 : s0 + CAP]
            padded[: len(ss)] = pts[ss] + nrms[ss] * 1e-3
            out = np.asarray(shade(jnp.asarray(padded), jnp.asarray(nrms[sel[0]])))
            ours[ss] = out[: len(ss)]
        i = j
    ours *= GAIN
    lum_s, lum_o = ship[lit].mean(-1), ours[lit].mean(-1)
    rel = np.abs(lum_o - lum_s) / np.maximum(lum_s, 1e-3)
    med = float(np.median(rel))
    gain = float(np.median(lum_s / np.maximum(lum_o, 1e-6)))
    assert med < med_bound, f"{name}: median rel err {med:.3f}"
    assert 0.85 < gain < 1.15, f"{name}: unit-gain violated, fitted {gain:.3f}"
