"""Batch-state checkpoint/resume.

The reference persists only options.kvl + in-RAM SaveData (SURVEY.md §5);
for long batched runs the whole EnvState pytree checkpoints through orbax
(with a pickle fallback when orbax is unavailable)."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
    # Multi-process (jax.distributed) runs hold only addressable shards per
    # process: gather the GLOBAL value of every leaf to the host, write once
    # from process 0, and barrier so no process returns before the file is
    # durable (docs/MULTIHOST.md; exercised by tests/test_multihost.py).
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        host_state = multihost_utils.process_allgather(state, tiled=True)
        if jax.process_index() == 0:
            # the pickle container, not orbax: PyTreeCheckpointer runs its
            # own every-process barrier protocol, which deadlocks/mismatches
            # when only process 0 writes the (already fully gathered) tree
            import pickle

            flat, treedef = jax.tree.flatten(host_state)
            Path(path).parent.mkdir(parents=True, exist_ok=True)
            with open(path, "wb") as f:
                pickle.dump(([np.asarray(x) for x in flat], treedef), f)
        multihost_utils.sync_global_devices(f"cge_ckpt_save:{path}")
        return
    _save_host(path, jax.tree.map(np.asarray, state))


def _save_host(path: str, state) -> None:
    # pickle is used only when orbax is absent from the environment
    # (ImportError); real save failures propagate so a partial orbax write
    # is never silently shadowed by a second on-disk format.
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        import pickle

        flat, treedef = jax.tree.flatten(state)
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(([np.asarray(x) for x in flat], treedef), f)
        return

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(Path(path).absolute(), jax.tree.map(np.asarray, state), force=True)


def load_checkpoint(path: str, like):
    """Restore into the structure of `like` (an EnvState template).

    Trust note: the pickle fallback path executes code embedded in the file;
    only load checkpoints this process (or a trusted one) wrote. The orbax
    directory format has no such hazard.
    """
    p = Path(path)
    if p.is_dir():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(p.absolute(), item=jax.tree.map(np.asarray, like))
        return jax.tree.map(lambda r, l: jax.numpy.asarray(r, l.dtype), restored, like)
    import pickle

    with open(path, "rb") as f:
        flat, treedef = pickle.load(f)
    restored = jax.tree.unflatten(treedef, flat)
    return jax.tree.map(lambda r, l: jax.numpy.asarray(r, l.dtype), restored, like)
