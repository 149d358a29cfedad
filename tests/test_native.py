"""Native library tests: asset codec parity + character-controller oracle
cross-validation (C++ double precision vs JAX float32)."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c_game_engine_tpu.assets.container import read_asset

native = pytest.importorskip("c_game_engine_tpu.native")


def test_native_asset_decode_parity():
    for p in sorted(glob.glob("/root/reference/assets/game/map/*.gmap"))[:4]:
        t, tv, data = native.read_asset_native(p)
        ref = read_asset(p)
        assert t == int(ref.type)
        assert tv == ref.type_version
        assert data == ref.data


def test_character_oracle_agrees_with_jax():
    """Walk the capsule around a synthetic room; C++ oracle and the JAX
    controller must stay within a small tolerance of each other."""
    from tests.worldgen import actor, make_map
    from c_game_engine_tpu.physics import character

    cmap = make_map([])
    tris = np.asarray(cmap.tris)[np.asarray(cmap.tri_valid)]

    upd = jax.jit(
        lambda actors, pos, vel, grounded: character.update_character(
            cmap, actors, pos, vel, 1.0 / 60, grounded, False, False
        )
    )
    from c_game_engine_tpu.core.state import reset

    st = reset(cmap)

    pos_j = jnp.array([0.0, -0.4, 0.0])
    pos_c = np.array([0.0, -0.4, 0.0])
    vel = np.array([2.0, -1.0, -3.0])
    g_j = jnp.array(False)
    g_c = False
    for i in range(90):
        pos_j, _, g_j, _ = upd(st.actors, pos_j, jnp.asarray(vel, jnp.float32), g_j)
        pos_c, _, g_c = native.character_step_oracle(tris, pos_c, vel, 1 / 60, g_c)
        assert np.allclose(np.asarray(pos_j), pos_c, atol=0.06), (i, pos_j, pos_c)
    # both settle on the floor, sliding along the walls
    assert bool(g_j) and g_c
    assert abs(float(pos_j[1]) - (-0.55)) < 0.02


def test_actions_stream_roundtrip_native_and_python(tmp_path):
    """CGAS recorder/replayer: native C++ codec and the pure-Python
    fallback must produce interchangeable (byte-identical payload) files."""
    import numpy as np
    import jax.numpy as jnp

    from c_game_engine_tpu.core.actions import NUM_BUTTONS, Actions
    from c_game_engine_tpu.core.actions_io import load_actions, save_actions

    rng = np.random.default_rng(7)
    t, b = 5, 3
    acts = Actions(
        move=jnp.asarray(rng.standard_normal((t, b, 2)), jnp.float32),
        look=jnp.asarray(rng.standard_normal((t, b, 2)), jnp.float32),
        buttons=jnp.asarray(rng.random((t, b, NUM_BUTTONS)) > 0.5),
    )
    p_native = tmp_path / "n.cgas"
    p_python = tmp_path / "p.cgas"
    save_actions(p_native, acts, native=True)
    save_actions(p_python, acts, native=False)
    assert p_native.read_bytes() == p_python.read_bytes()

    for reader_native in (True, False):
        for path in (p_native, p_python):
            out = load_actions(path, native=reader_native)
            np.testing.assert_array_equal(np.asarray(out.move), np.asarray(acts.move))
            np.testing.assert_array_equal(np.asarray(out.look), np.asarray(acts.look))
            np.testing.assert_array_equal(
                np.asarray(out.buttons), np.asarray(acts.buttons)
            )


def test_action_recorder(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from c_game_engine_tpu.core.actions import Actions
    from c_game_engine_tpu.core.actions_io import ActionRecorder, load_actions

    rec = ActionRecorder()
    for i in range(4):
        rec.record(Actions.zeros((2,)).replace(
            move=jnp.full((2, 2), float(i), jnp.float32)))
    assert len(rec) == 4
    rec.save(tmp_path / "r.cgas")
    out = load_actions(tmp_path / "r.cgas")
    assert out.move.shape == (4, 2, 2)
    np.testing.assert_allclose(np.asarray(out.move[3]), 3.0)
