"""Shape-checked partial parameter loading (reference
`Instance_Segmentation_Model/utils/weight.py:6-38`): copy matching-shape
leaves from a source tree into a target tree, report mismatches."""
from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import jax
import numpy as np


def load_partial(target: Dict, source: Dict) -> Tuple[Dict, Dict]:
    """Returns (merged tree, report) where report maps "/"-joined paths to
    'loaded' | 'shape_mismatch' | 'missing_in_source'."""
    report: Dict[str, str] = {}

    t_flat = jax.tree_util.tree_flatten_with_path(target)[0]
    s_paths = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_flatten_with_path(source)[0]}

    merged_leaves = []
    for path, t_leaf in t_flat:
        key = jax.tree_util.keystr(path)
        s_leaf = s_paths.get(key)
        if s_leaf is None:
            report[key] = "missing_in_source"
            merged_leaves.append(t_leaf)
        elif np.shape(s_leaf) != np.shape(t_leaf):
            report[key] = "shape_mismatch"
            merged_leaves.append(t_leaf)
        else:
            report[key] = "loaded"
            merged_leaves.append(s_leaf)
    treedef = jax.tree_util.tree_structure(target)
    n_loaded = sum(1 for v in report.values() if v == "loaded")
    logging.info("load_partial: %d/%d leaves loaded", n_loaded, len(report))
    return jax.tree_util.tree_unflatten(treedef, merged_leaves), report
