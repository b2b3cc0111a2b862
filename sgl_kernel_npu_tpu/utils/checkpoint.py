"""Checkpoint / resume for training state (beyond reference — it ships none).

The reference is a stateless kernel library (SURVEY §5: "Checkpoint / resume:
none"); a production framework needs one.  TPU-native mechanics: orbax
(the JAX ecosystem's checkpointer — async-capable, handles sharded arrays by
gathering per-shard metadata) with a numpy-npz fallback when orbax is
unavailable.  State is any pytree (params, optimizer state, step counter);
sharded arrays restore onto the SAME mesh/sharding the caller passes via
``restore_args_like`` (give the target pytree of shardings or an abstract
example).

Usage:

    save_checkpoint("/ckpt/dir", {"params": params, "step": 100})
    state = restore_checkpoint("/ckpt/dir", like={"params": params0, "step": 0})
"""

from __future__ import annotations

import os
import pathlib

import jax
import numpy as np

try:  # orbax is in the base image; keep the fallback for minimal installs
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, state, *, force: bool = True) -> None:
    """Write ``state`` (any pytree of arrays / scalars) to ``path``."""
    path = os.fspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(pathlib.Path(path).absolute(), state, force=force)
        ckptr.wait_until_finished()
        return
    flat, treedef = jax.tree.flatten(state)  # pragma: no cover
    np.savez(path + ".npz", treedef=str(treedef),
             **{f"a{i}": np.asarray(v) for i, v in enumerate(flat)})


def restore_checkpoint(path: str, *, like):
    """Restore the pytree written by :func:`save_checkpoint`.

    ``like``: example pytree with the target structure/dtypes (and shardings,
    for sharded restores) — e.g. the freshly-initialized state.
    """
    path = os.fspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(pathlib.Path(path).absolute(), abstract)
    data = np.load(path + ".npz")  # pragma: no cover
    flat, treedef = jax.tree.flatten(like)
    return jax.tree.unflatten(
        jax.tree.structure(like),
        [np.asarray(data[f"a{i}"]) for i in range(len(flat))])
