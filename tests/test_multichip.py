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
    """The same batch stepped on 1 device and sharded over 8 devices must be
    identical: bitwise for every integer/bool leaf, and within 2 ulp for
    float leaves (XLA:CPU emits shape-dependent FMA/vectorization for a
    2-env shard vs the 16-env array, so the last bit of float math can
    legitimately differ; on a real TPU mesh the shapes match per-core and
    the comparison is exact). Per-env actions are all distinct so a
    batch-transpose/shard-axis bug cannot cancel out."""
    batch = 16
    state = reset_batch(rig, batch)
    i = jnp.arange(batch, dtype=jnp.float32)
    actions = Actions.zeros((batch,)).replace(
        move=jnp.stack([jnp.sin(i), -jnp.cos(i * 0.7)], -1),
        look=jnp.stack([0.01 * i, 0.002 * (i - 8.0)], -1),
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

    # every per-env array in the state pytree
    ref_leaves = jax.tree.leaves(ref)
    out_leaves = jax.tree.leaves(out)
    assert len(ref_leaves) == len(out_leaves)
    for r, o in zip(ref_leaves, out_leaves):
        r, o = np.asarray(r), np.asarray(o)
        if np.issubdtype(r.dtype, np.floating):
            np.testing.assert_array_max_ulp(o, r, maxulp=2)
        else:
            np.testing.assert_array_equal(o, r)
    # sanity: the distinct action streams actually diverged the envs
    p = np.asarray(ref.player.pos)
    assert len(np.unique(p[:, 0])) > 8
