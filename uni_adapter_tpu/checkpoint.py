"""Checkpoint / resume of adaptation state and model params.

A capability the reference lacks entirely (SURVEY.md §5.4: load-only, no
save — adaptation state dies with the process).  Because the engine's
EngineState is an explicit pytree, checkpointing is a flat save/restore:
orbax when available, npz fallback otherwise.  Mid-stream resume is exact —
the carry includes the PRNG key and step counter.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any) -> None:
    """Save any pytree (EngineState, model params, …) to `path`.

    Arrays go into an .npz; the treedef is pickled alongside (the treedef
    contains no array data, only structure).  Both files are written to
    temp names and os.replace'd so a crash mid-save — the exact scenario
    elastic recovery exists for — can never truncate the previous good
    checkpoint or leave the pair out of sync (os.replace is atomic on
    POSIX; treedef lands first so a reader of the new .npz, the resume
    gate, always finds a matching-or-newer treedef)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(l))
              for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # temp name must end in .npz or np.savez appends another suffix
    tmp_npz, tmp_tree = path + ".tmp.npz", path + ".treedef.tmp"
    np.savez(tmp_npz, **arrays)
    with open(tmp_tree, "wb") as f:
        pickle.dump(treedef, f)
    os.replace(tmp_tree, path + ".treedef")
    os.replace(tmp_npz, path + ".npz")


def restore_state(path: str) -> Any:
    """Restore a pytree saved by save_state."""
    with np.load(path + ".npz") as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    with open(path + ".treedef", "rb") as f:
        treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, leaves)


def save_state_orbax(path: str, state: Any) -> None:
    """Orbax variant (async-capable, multi-host-safe) when orbax is present."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def restore_state_orbax(path: str, template: Any = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), item=template)
        return ckptr.restore(os.path.abspath(path))


class AsyncSnapshotter:
    """Non-blocking orbax snapshots: `save` returns immediately while the
    device→host fetch and serialisation run on orbax's background thread —
    the serving tick never stalls on checkpoint IO.  Call `wait()` (or use
    as a context manager) to drain before reading the files back."""

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, path: str, state: Any) -> None:
        self._ckptr.save(os.path.abspath(path), state, force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def restore(self, path: str, template: Any = None) -> Any:
        self.wait()
        return restore_state_orbax(path, template)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.wait()
        self._ckptr.close()
