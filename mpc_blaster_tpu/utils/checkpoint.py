"""Checkpoint/resume for long batched sweeps.

The reference has no checkpointing at all (SURVEY.md §5); its nearest
analog is the acados codegen cache. Two paths with the same call shape:

- `save_pytree`/`load_pytree`: any pytree (RTIState batches, closed-loop
  carry, sweep accumulators) round-trips through a single .npz with
  structure preserved — the zero-dependency single-host path.
- `save_pytree_orbax`/`load_pytree_orbax`: the multi-host path — orbax
  writes each host's shards of `jax.sharding`-annotated global arrays
  and restores them onto a (possibly different) mesh, which is what a
  pod-scale sweep resume actually needs. Restore takes the `like` tree
  for structure and (if present) target shardings.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax


def save_pytree(path: str, tree: Any) -> None:
    """Serialize a pytree of arrays to one .npz (+ treedef json)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    tmp = path + ".tmp"
    np.savez(tmp, __treedef__=json.dumps(str(treedef)), **arrays)
    # np.savez appends .npz to the filename it's given
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_pytree(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (shape/dtype-checked)."""
    with np.load(path, allow_pickle=False) as data:
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = []
        for i, ref in enumerate(leaves_like):
            arr = data[f"leaf_{i}"]
            ref_np = np.asarray(ref)
            if arr.shape != ref_np.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != "
                    f"expected {ref_np.shape}")
            leaves.append(arr.astype(ref_np.dtype))
        return jax.tree.unflatten(treedef, leaves)


def save_pytree_orbax(path: str, tree: Any) -> None:
    """Orbax checkpoint: per-host shard writes for global sharded arrays.

    `path` is a directory (created; must be absolute for orbax). Works
    for plain single-host arrays too — but then `save_pytree` is lighter.
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_pytree_orbax(path: str, like: Any) -> Any:
    """Restore an orbax checkpoint into `like`'s structure.

    Leaves of `like` that are jax.Arrays with shardings are restored
    directly onto those shardings (each host reads only its shards —
    the resume path for pod-scale sweeps).
    """
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
