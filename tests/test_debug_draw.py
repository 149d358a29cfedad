"""Debug overlays: collision wireframes through the raster pipeline
(JoltDebugRenderer counterpart) and the FrameGrapher-style rate graph."""

import jax
import jax.numpy as jnp
import numpy as np

from c_game_engine_tpu.core.state import reset
from c_game_engine_tpu.render.bundle import build_render_bundle
from c_game_engine_tpu.render.debug_draw import (
    box_edge_segments,
    collect_segments,
    graph_overlay,
)
from c_game_engine_tpu.render.raster import render


def test_box_edges_shape():
    pos = jnp.zeros((2, 3))
    quat = jnp.asarray([[0, 0, 0, 1.0]] * 2)
    he = jnp.ones((2, 3))
    segs = box_edge_segments(pos, quat, he, jnp.zeros((2, 3)))
    assert segs.shape == (2, 12, 2, 3)
    lens = np.linalg.norm(np.asarray(segs[:, :, 1] - segs[:, :, 0]), axis=-1)
    np.testing.assert_allclose(lens, 2.0, atol=1e-6)  # unit box edges


def test_collect_segments_masks(rig):
    st = reset(rig)
    segs, cols, valid = collect_segments(rig, st)
    assert segs.shape[0] == cols.shape[0] == valid.shape[0]
    assert bool(valid.any())  # physbox + sensors + capsule present


def test_wireframe_overlay_renders(rig):
    rb = build_render_bundle(rig)
    st = reset(rig)
    base = np.asarray(render(rb, rig, st, 128, 128))
    dbg = np.asarray(render(rb, rig, st, 128, 128, debug_wireframe=True))
    diff = np.abs(dbg - base).max(-1)
    n_painted = int((diff > 0.05).sum())
    # wireframes paint a visible but sparse set of pixels
    assert 20 < n_painted < 128 * 128 // 4
    # jit + vmap composability
    f = jax.jit(lambda s: render(rb, rig, s, 64, 64, debug_wireframe=True))
    assert f(st).shape == (64, 64, 3)


def test_graph_overlay_draws_line_and_panel():
    frame = jnp.full((128, 128, 3), 0.5)
    vals = jnp.asarray(np.linspace(10, 60, 30), jnp.float32)
    out = np.asarray(graph_overlay(frame, vals, lo=0.0, hi=60.0))
    assert out.shape == (128, 128, 3)
    # panel dimming bottom-left
    assert out[120, 12, 0] < 0.5
    # some yellow-ish line pixels (r,g high, b low)
    line_px = (out[..., 0] > 0.8) & (out[..., 1] > 0.8) & (out[..., 2] < 0.2)
    assert int(line_px.sum()) > 30
    # untouched top-right corner
    np.testing.assert_allclose(out[4, -4], 0.5)
