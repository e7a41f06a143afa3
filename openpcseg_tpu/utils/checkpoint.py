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


def _scan_layout_mismatch(cur_keys, saved_keys) -> List[str]:
    """Detect scan-vs-unrolled block layout mismatches.

    repeated_blocks (models/layers.py) stores blocks 2..n either as ONE
    axis-0-stacked `StackedBlocks_*` subtree (OPENPCSEG_SCAN_BLOCKS=1, the
    default) or as unrolled `ResidualBlock_1..n` / `Bottleneck_1..n`
    modules (=0). A checkpoint from one layout silently restores almost
    nothing into the other (every repeated block shape-skips), so loading
    must fail loudly instead.
    """
    def marks(keys):
        stacked, unrolled = set(), set()
        for k in keys:
            for i, part in enumerate(k):
                if part.startswith("StackedBlocks"):
                    stacked.add(k[:i])
                elif (part.startswith(("ResidualBlock_", "Bottleneck_"))
                        and not part.endswith("_0")):
                    unrolled.add(k[:i])
        return stacked, unrolled

    cs, cu = marks(cur_keys)
    ss, su = marks(saved_keys)
    bad = (cs & su) | (ss & cu)
    return sorted("/".join(p) for p in bad)


def merge_matching(target_tree, saved_tree) -> Tuple[dict, int, List[str]]:
    """Returns (merged_tree, n_loaded, skipped_names).

    merged_tree has target_tree's structure; every leaf whose path exists in
    saved_tree with the same shape is replaced by the saved value.
    Raises ValueError when the repeated-block layout (nn.scan stacked vs
    unrolled) differs between checkpoint and model — a silent skip there
    would leave most of the network freshly initialized.
    """
    cur = _flatten(target_tree)
    saved = _flatten(saved_tree)
    bad = _scan_layout_mismatch(cur.keys(), saved.keys())
    if bad:
        raise ValueError(
            "checkpoint block layout mismatch (scan-stacked vs unrolled) "
            f"under: {bad}. The checkpoint was written with the opposite "
            "OPENPCSEG_SCAN_BLOCKS setting — rerun with the matching value "
            "(1 = nn.scan stacked blocks, 0 = unrolled).")
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
