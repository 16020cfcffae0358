"""Device mesh + sharding helpers.

The reference scales via PyTorch-Lightning DDP / torch DataParallel with a
rank-0 filesystem merge (SURVEY §2.11). Here scaling is a single-controller
JAX mesh: data-parallel batch sharding over ICI with `jax.sharding`
NamedSharding; gradients sync through XLA's reduction of the pjit-ed
training step (no explicit collectives needed), and evaluation shards
frames/instances across the same axis.

Axes:
  dp — data parallel (batch dimension)
  tp — reserved tensor-parallel axis for latency-sharding the big ViT
       encoders (1 by default)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in `tree` with its batch axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
