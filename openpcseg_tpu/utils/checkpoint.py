"""Shape-tolerant partial parameter restore (fine-tune workflows).

Reference: pcseg/model/segmentor/base_segmentors.py:16-37
(load_params_from_file): keep every saved tensor whose name AND shape match
the freshly-built model, skip and report the rest (e.g. a classifier head
of a different width). Pure pytree logic, no IO — callers restore the raw
orbax payload themselves.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=()) -> Dict[tuple, object]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[tuple, object]) -> dict:
    root: dict = {}
    for k, v in flat.items():
        d = root
        for part in k[:-1]:
            d = d.setdefault(part, {})
        d[k[-1]] = v
    return root


def merge_matching(target_tree, saved_tree) -> Tuple[dict, int, List[str]]:
    """Returns (merged_tree, n_loaded, skipped_names).

    merged_tree has target_tree's structure; every leaf whose path exists in
    saved_tree with the same shape is replaced by the saved value.
    """
    cur = _flatten(target_tree)
    saved = _flatten(saved_tree)
    merged = {}
    loaded = 0
    skipped: List[str] = []
    for k, v in cur.items():
        if k in saved and np.shape(saved[k]) == np.shape(v):
            merged[k] = jnp.asarray(saved[k])
            loaded += 1
        else:
            merged[k] = v
            skipped.append("/".join(k))
    return _unflatten(merged), loaded, skipped
