"""Checkpoint/resume for long batched sweeps.

The reference has no checkpointing at all (SURVEY.md §5); its nearest
analog is the acados codegen cache. Here any pytree (RTIState batches,
closed-loop carry, sweep accumulators) round-trips through a single .npz
with structure preserved — enough to resume a pod-scale sweep mid-way.
Orbax remains the right answer for multi-host sharded arrays; this gives a
zero-dependency single-host path with the same call shape.
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
