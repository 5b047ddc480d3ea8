"""Pytree <-> flat-dict serialization for params and states.

Gives artifacts a plain ``.npz`` weight format (the role model.pth plays in
the reference's artifact contract, ref: backend/main.py:98) without pickling
code objects: keys are '/'-joined tree paths, values are numpy arrays.
Tuples/lists are keyed by index and restored by shape of the key set.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def flatten_params(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        flat["/".join(parts)] = np.asarray(leaf)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild nested dicts/tuples. A level whose keys are all ints becomes
    a tuple; otherwise a dict."""
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        node = root
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def materialize(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        # tuples round-trip as contiguous 0..n-1 digit keys; anything else
        # (including non-contiguous digit keys a user might create) stays a
        # dict, rather than KeyError-ing or silently changing the treedef
        if keys and all(k.isdigit() for k in keys):
            if sorted(int(k) for k in keys) == list(range(len(keys))):
                return tuple(materialize(node[str(i)]) for i in range(len(keys)))
        return {k: materialize(v) for k, v in node.items()}

    return materialize(root)


def save_params_npz(path: str | Path, tree: Any) -> None:
    np.savez(path, **flatten_params(tree))


def load_params_npz(path: str | Path) -> Any:
    with np.load(path) as data:
        return unflatten_params({k: data[k] for k in data.files})
