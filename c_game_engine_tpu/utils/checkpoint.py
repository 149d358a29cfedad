"""Batch-state checkpoint/resume.

The reference persists only options.kvl + in-RAM SaveData (SURVEY.md §5);
for long batched runs the whole EnvState pytree checkpoints through orbax
(with a pickle fallback when orbax is unavailable)."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_checkpoint(path: str, state) -> None:
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
