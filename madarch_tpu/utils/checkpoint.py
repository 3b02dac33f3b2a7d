"""Checkpoint / resume for scene and frame state.

The reference has no persistence (SURVEY.md §5: all state rebuilt at
startup).  Here scene data, probe feedback state, and camera are pytrees, so
checkpointing is a flat .npz of leaves keyed by treedef paths — resumable
across processes and robust to device placement.
"""
from __future__ import annotations

import json

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save(path: str, **trees):
    """save('ckpt.npz', scene=data, state=frame_state, camera=camera)."""
    payload = {}
    meta = {}
    for name, tree in trees.items():
        leaves, _ = _flatten_with_paths(tree)
        meta[name] = sorted(leaves.keys())
        for k, v in leaves.items():
            payload[f"{name}|{k}"] = v
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load(path: str, **templates):
    """load('ckpt.npz', scene=template_data, ...) -> dict of restored trees.

    Templates supply the pytree structure (e.g. ``spec.empty_data()``);
    leaves are filled positionally by matching flatten paths.
    """
    archive = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(archive["__meta__"]).decode())
    out = {}
    for name, template in templates.items():
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in flat:
            key = "/".join(str(q) for q in p)
            stored = archive[f"{name}|{key}"]
            leaves.append(stored.astype(np.asarray(leaf).dtype))
        out[name] = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves)
    return out
