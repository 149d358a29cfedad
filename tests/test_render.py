"""Renderer unit tests: texture sampling, camera math, shading formula.

Full-frame golden tests run on TPU via benchmarks/render_goldens.py; here we
unit-test the pieces on CPU with tiny shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.render.textures import TextureAtlas, build_atlas, sample
from c_game_engine_tpu.utils.mathx import perspective_lh_zo, quat_look, quat_from_axis_angle, quat_mul


class _Tex:
    def __init__(self, px, repeat=True, filter=False):
        self.pixels = px
        self.height, self.width = px.shape[:2]
        self.repeat = repeat
        self.filter = filter
        self.mipmaps = False


def test_atlas_nearest_sampling():
    px = np.zeros((4, 4, 4), np.float32)
    px[0, 0] = [1, 0, 0, 1]
    px[3, 3] = [0, 1, 0, 1]
    atlas = build_atlas([_Tex(px)])
    c = np.asarray(sample(atlas, jnp.int32(0), jnp.array([0.125, 0.125])))
    assert np.allclose(c, [1, 0, 0, 1])
    c = np.asarray(sample(atlas, jnp.int32(0), jnp.array([0.875, 0.875])))
    assert np.allclose(c, [0, 1, 0, 1])


def test_atlas_repeat_wraps():
    px = np.zeros((2, 2, 4), np.float32)
    px[0, 0] = [1, 1, 1, 1]
    atlas = build_atlas([_Tex(px, repeat=True)])
    a = np.asarray(sample(atlas, jnp.int32(0), jnp.array([0.25, 0.25])))
    b = np.asarray(sample(atlas, jnp.int32(0), jnp.array([2.25, -0.75])))
    assert np.allclose(a, b)


def test_atlas_bilinear_midpoint():
    px = np.zeros((1, 2, 4), np.float32)
    px[0, 0] = [0, 0, 0, 1]
    px[0, 1] = [1, 1, 1, 1]
    atlas = build_atlas([_Tex(px, repeat=False, filter=True)])
    c = np.asarray(sample(atlas, jnp.int32(0), jnp.array([0.5, 0.5])))
    assert np.allclose(c[:3], [0.5, 0.5, 0.5], atol=1e-5)


def test_perspective_matrix_matches_glm_lh_zo():
    """Spot values of glm_perspective_lh_zo (VulkanHelpers.c:142-147)."""
    m = np.asarray(perspective_lh_zo(jnp.deg2rad(90.0), 1.0, 0.01, 2000.0))
    assert np.isclose(m[0, 0], 1.0, atol=1e-5)  # cot(45deg)
    assert np.isclose(m[1, 1], 1.0, atol=1e-5)
    assert np.isclose(m[3, 2], 1.0)  # LH: +z forward after the rotX(pi) flip
    # depth maps near->0, far->1
    near = m @ np.array([0, 0, 0.01, 1.0])
    far = m @ np.array([0, 0, 2000.0, 1.0])
    assert abs(near[2] / near[3]) < 1e-4
    assert np.isclose(far[2] / far[3], 1.0, atol=1e-4)


def test_camera_view_faces_negative_z():
    """At yaw 0 the player faces -Z (MovePlayer); after the rotX(pi)
    pre-rotation the view transform must map -Z world to +Z view (in front
    of the LH camera)."""
    flip = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi)
    rot = quat_mul(jnp.array([0.0, 0.0, 0.0, 1.0]), flip)
    view = np.asarray(quat_look(jnp.zeros(3), rot))
    p = view @ np.array([0.0, 0.0, -5.0, 1.0])
    assert p[2] > 0  # in front
    p2 = view @ np.array([0.0, 0.0, 5.0, 1.0])
    assert p2[2] < 0  # behind


def test_dither_hash_matches_glsl():
    """The screen-door hash is fract(52.9829189 * fract(dot(xy, (0.06711056,
    0.00583715)))) (map_shaded_f.gshd)."""
    from c_game_engine_tpu.render.raster import MAGIC_XY, MAGIC_Z

    x, y = 37.5, 101.5
    expected = np.modf(52.9829189 * np.modf(x * 0.06711056 + y * 0.00583715)[0])[0]
    got = float(jnp.modf(MAGIC_Z * jnp.modf(x * MAGIC_XY[0] + y * MAGIC_XY[1])[0])[0])
    assert np.isclose(got, expected, atol=1e-6)


def test_render_bundle_builds(test_map):
    from c_game_engine_tpu.render.bundle import build_render_bundle

    rb = build_render_bundle(test_map)
    assert rb.map_pos.shape[0] > 0
    assert rb.atlas.blocked.ndim == 3 and rb.atlas.blocked.shape[-1] == 16
    assert int(rb.sky_tex) >= 0  # test.json has a sky
    assert rb.mdl_pos.shape[0] > 0  # leafy etc.


def test_hud_composite(test_map):
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.hud import render_hud
    from c_game_engine_tpu.core.state import reset

    rb = build_render_bundle(test_map)
    st = reset(test_map)
    st = st.replace(save=st.save.replace(coins=jnp.int32(42), blue_coins=jnp.int32(3)))
    frame = jnp.full((128, 512, 3), 0.5, jnp.float32)
    out = jax.jit(lambda s, f: render_hud(rb.atlas, rb.hud, s, f))(st, frame)
    out = np.asarray(out)
    assert out.shape == frame.shape
    diff = np.abs(out - 0.5).sum(-1)
    assert (diff > 0.01).sum() > 100  # crosshair + icons + digits drew pixels
    # crosshair region changed (center)
    assert diff[64 - 10 : 64 + 10, 256 - 10 : 256 + 10].max() > 0.01


def test_pallas_raster_backend_matches_xla(test_map):
    """The tile kernel (ops/raster_tiles.py, interpret mode on CPU) must
    produce the same frame as the XLA reference path. Pass 1 (edge/z
    winner) is written identically in both; since pass 2 moved INSIDE the
    kernel (attribute interpolation in loop 2), per-pixel values may round
    differently than the XLA gather-based interpolation — the bound below
    is far under a display quantum (1/255 ~ 4e-3), so any real divergence
    (wrong winner, wrong attribute wiring) still fails."""
    from jax.experimental.pallas import tpu as pltpu

    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render

    cm = test_map
    rb = build_render_bundle(cm)
    st = reset(cm)
    sfn = jax.jit(lambda s, a: step(cm, s, a))
    for _ in range(30):
        st = sfn(st, Actions.zeros())

    ref = np.asarray(render(rb, cm, st, 128, 128, backend="xla"))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(render(rb, cm, st, 128, 128, backend="pallas"))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_dual_atlas_sampling_matches_two_tap():
    """The dual-packed atlas trilinear path (one 52-channel gather,
    textures._sample_dual) is bit-exact with the reference two-tap path
    across repeat/clamp, filter/nearest, POT chains, and out-of-range
    uv/lod."""
    import numpy as np
    import jax.numpy as jnp

    from c_game_engine_tpu.render.textures import build_atlas, sample

    class T:
        def __init__(self, w, h, repeat, filt, mips):
            rng = np.random.RandomState((w * 31 + h * 7 + repeat * 3 + filt) % 2**31)
            self.pixels = rng.rand(h, w, 4).astype(np.float32)
            self.repeat, self.filter, self.mipmaps = repeat, filt, mips

    texs = [
        T(64, 64, True, True, True),
        T(32, 16, False, True, True),
        T(128, 128, True, False, True),
        T(8, 8, False, False, True),
        T(16, 16, True, True, False),
    ]
    a_dual = build_atlas(texs, dual=True)
    a_ref = build_atlas(texs, dual=False)
    rng = np.random.RandomState(0)
    n = 4096
    tid = jnp.asarray(rng.randint(0, len(texs), n))
    uv = jnp.asarray(rng.uniform(-1.5, 2.5, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 7, n).astype(np.float32))
    got = np.asarray(sample(a_dual, tid, uv, lod=lod))
    want = np.asarray(sample(a_ref, tid, uv, lod=lod))
    np.testing.assert_array_equal(got, want)


def test_pallas_big_backend_matches_xla(test_map):
    """The chunked streamed kernel (raster_tiles_big, backend="pallas_big"
    for maps whose live set exceeds the VMEM-resident table — orb.gmap)
    must reproduce the XLA reference frame exactly: pass 1 edge/z math is
    written identically and attribute interpolation shares the same XLA
    gather code, so the only difference is the live-first compaction,
    which preserves the z-tie order."""
    from jax.experimental.pallas import tpu as pltpu

    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.core.step import step
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render

    cm = test_map
    rb = build_render_bundle(cm)
    st = reset(cm)
    sfn = jax.jit(lambda s, a: step(cm, s, a))
    for _ in range(30):
        st = sfn(st, Actions.zeros())

    ref = np.asarray(render(rb, cm, st, 128, 128, backend="xla"))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(render(rb, cm, st, 128, 128, backend="pallas_big"))
    np.testing.assert_array_equal(out, ref)


def test_viewmodel_item_dispatch(test_map):
    """Viewmodel visibility is table-driven by SaveData.current_item:
    the eraser (item 0) enables its model (EraserItem.c SwitchTo), the
    laser stopper (item 1) disables the viewmodel entirely
    (LaserStopperItem.c:21-24), and no-item (-1) draws nothing."""
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render_viewmodel

    cm = test_map
    rb = build_render_bundle(cm)
    assert rb.vm_pos.shape[0] > 0, "eraser viewmodel rows missing"
    st = reset(cm)
    base = jnp.zeros((64, 64, 3))

    def with_item(i):
        s = st.replace(save=st.save.replace(current_item=jnp.array(i, jnp.int32)))
        return np.asarray(render_viewmodel(rb, s, base))

    eraser = with_item(0)
    stopper = with_item(1)
    none = with_item(-1)
    assert eraser.sum() > 0.0, "eraser viewmodel should draw"
    np.testing.assert_array_equal(stopper, np.asarray(base))
    np.testing.assert_array_equal(none, np.asarray(base))


def test_render_batch_matches_per_env(test_map):
    """render_batch (the benchmark/rollout entry with the hoisted reveal
    fallback) must be bitwise the per-env render at a tile-aligned size."""
    from c_game_engine_tpu.models.sim import reset_batch
    from c_game_engine_tpu.render.bundle import build_render_bundle
    from c_game_engine_tpu.render.raster import render, render_batch

    cm = test_map
    rb = build_render_bundle(cm)
    states = reset_batch(cm, 2)
    batch = np.asarray(render_batch(rb, cm, states, 256, 256))
    for e in range(2):
        env = jax.tree.map(lambda x, _e=e: x[_e], states)
        one = np.asarray(render(rb, cm, env, 256, 256))
        np.testing.assert_array_equal(batch[e], one)


def test_reveal_compaction_matches_full_fallback(test_map):
    """The tile-compacted pass-2 shade must equal the full-frame fallback
    path on frames within the tile budget — this pins the cumsum/scatter
    pack+unpack machinery against the straightforward implementation the
    overflow lax.cond falls back to."""
    from c_game_engine_tpu.core.state import reset
    from c_game_engine_tpu.render import raster as R
    from c_game_engine_tpu.render.bundle import build_render_bundle

    cm = test_map
    rb = build_render_bundle(cm)
    assert rb.has_alpha  # the reveal pass must actually engage
    st = reset(cm)
    rgb_cmp, overflow, ctx = jax.jit(
        lambda s: R._render_env(rb, cm, s, 256, 256, 90.0, None, True, 0,
                                False, True)
    )(st)
    assert ctx is not None
    assert not bool(overflow)
    full = jax.jit(
        lambda c, s: R._finish_reveal_full(rb, c, s, 256, 256, True, 0, "xla")
    )(ctx, st)
    np.testing.assert_array_equal(np.asarray(rgb_cmp), np.asarray(full))


def test_atlas_flag_words_match_table():
    """flag_words is the host-packed int mirror of the table's f32
    repeat/filter columns (the in-graph f32-compare chain miscompiles on
    XLA:TPU when fused with the z-pass scan; see TextureAtlas)."""
    px = np.random.default_rng(0).random((8, 8, 4)).astype(np.float32)
    texs = [_Tex(px, repeat=r, filter=f) for r in (False, True) for f in (False, True)]
    atlas = build_atlas(texs)
    t = np.asarray(atlas.table)
    fw = np.asarray(atlas.flag_words)
    np.testing.assert_array_equal((fw >> 21) & 1, (t[:, 4] > 0.5).astype(np.int64))
    np.testing.assert_array_equal((fw >> 22) & 1, (t[:, 5] > 0.5).astype(np.int64))
