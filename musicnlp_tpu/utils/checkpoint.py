"""Pytree checkpointing: flat-npz default, orbax backend for multi-host.

Replaces the reference's HF `save_strategy='epoch'` + `from_pretrained`
checkpoint flow (reference musicnlp/trainer/train.py:171-189, eval.py:37-95).
The default format is one .npz per checkpoint with '/'-joined pytree-path
keys -- dependency-light, debuggable, and fine on a single host (sharded
arrays gather on save; model sizes here are far below host RAM).  For
multi-host / multi-slice runs pass `backend='orbax'`: orbax writes each
shard from its owning process and restores with the template's shardings.
Restore always takes a template pytree (e.g. `model.init(...)`) so structure
never lives in the file.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ['save_pytree', 'restore_pytree', 'save_meta', 'load_meta']


def _path_key(p) -> str:
    """Stringify any pytree path entry (DictKey / SequenceKey / GetAttrKey)."""
    for attr in ('key', 'idx', 'name'):
        if hasattr(p, attr):
            return str(getattr(p, attr))
    return str(p)


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = '/'.join(_path_key(p) for p in path)
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def save_pytree(path: str, tree, backend: str = 'npz') -> str:
    """Save a pytree of arrays (.npz appended for the npz backend)."""
    if backend == 'orbax':
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, tree, force=True)
        return path
    assert backend == 'npz', backend
    if not path.endswith('.npz'):
        path = path + '.npz'
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    # atomic: a crash mid-write must not leave a truncated .npz where
    # restore_pytree / load_trained expects a checkpoint
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez(f, **_flatten(tree))
    os.replace(tmp, path)
    return path


def restore_pytree(path: str, template, backend: str = None) -> Any:
    """Restore into the structure of `template` (dtypes preserved from file).
    Backend auto-detected: a directory is an orbax checkpoint."""
    if backend is None:
        backend = 'orbax' if os.path.isdir(path) else 'npz'
    if backend == 'orbax':
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(os.path.abspath(path), template)
    if not path.endswith('.npz'):
        path = path + '.npz'
    z = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in paths:
        key = '/'.join(_path_key(q) for q in p)
        arr = z[key]
        assert arr.shape == np.shape(leaf), \
            f'checkpoint mismatch at {key}: {arr.shape} vs {np.shape(leaf)}'
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_meta(path: str, meta: Dict):
    """Atomic (tmp + rename), like save_pytree: a kill mid-write must never
    leave a truncated JSON for load_trained/resume to crash on."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(meta, f, indent=2, default=str)
    os.replace(tmp, path)


def load_meta(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)
