"""Checkpoint IO: orbax for train state, npz caches for template onboarding.

Replaces the reference's gorilla per-epoch checkpoints (+ resume by iter,
`utils/solver.py:34-68`) and the `.pth` template-descriptor caches with
`reset_descriptors` invalidation (`model/detector.py:76-128`).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_train_state(ckpt_dir: str, step: int, state) -> str:
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state._asdict()), force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state(path: str, abstract_state):
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             abstract_state._asdict())
    return type(abstract_state)(**restored)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


# ----------------------------------------------------------- template caches

def save_template_cache(cache_path: str, **arrays) -> None:
    """Cache onboarding artifacts (descriptors / pointclouds / template
    features) keyed by file; np.savez for portability."""
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    np.savez(cache_path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_template_cache(cache_path: str) -> Optional[Dict[str, np.ndarray]]:
    if not os.path.exists(cache_path):
        return None
    data = np.load(cache_path)
    return {k: data[k] for k in data.files}
