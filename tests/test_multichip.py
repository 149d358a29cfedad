"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from c_game_engine_tpu.core.actions import Actions
from c_game_engine_tpu.models.sim import reset_batch, step_batch


def test_eight_fake_devices():
    assert jax.device_count() == 8


def test_dryrun_multichip(monkeypatch):
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_equals_single_device(rig):
    """The same batch stepped on 1 device and sharded over 8 devices must
    produce identical results (per-env state never crosses chips)."""
    batch = 16
    state = reset_batch(rig, batch)
    actions = Actions.zeros((batch,)).replace(
        move=jnp.broadcast_to(jnp.array([0.3, -1.0]), (batch, 2))
    )
    f = jax.jit(lambda s, a: step_batch(rig, s, a))
    ref = state
    for _ in range(10):
        ref = f(ref, actions)

    mesh = Mesh(np.array(jax.devices()), ("env",))
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P("env", *([None] * (x.ndim - 1))))
    )
    sstate = jax.tree.map(shard, state)
    sact = jax.tree.map(shard, actions)
    out = sstate
    for _ in range(10):
        out = f(out, sact)

    np.testing.assert_allclose(
        np.asarray(out.player.pos), np.asarray(ref.player.pos), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.actors.pos), np.asarray(ref.actors.pos), atol=1e-6
    )
