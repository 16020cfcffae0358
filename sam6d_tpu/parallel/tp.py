"""Tensor-parallel (latency) sharding for the ViT encoders.

The reference has no tensor parallelism (SURVEY §2.11); this is the
TPU-native extension it plans for: Megatron-style column/row-parallel
sharding of the transformer GEMMs over the mesh `tp` axis, expressed purely
as GSPMD weight shardings — pick a mesh, annotate the parameters, and XLA
inserts the (ICI) collectives. No module code changes and no manual
psum/all_gather: correctness is GSPMD-guaranteed for any annotation, and
the chosen specs give the standard one-all-reduce-per-block comm pattern
(qkv/fc1 column-parallel, proj/fc2 row-parallel).

Works for every ViT family in the repo (SAM ViT-H `attn_qkv/attn_proj` +
`mlp/lin1|lin2`, DINOv2/MAE `qkv/proj` + `fc1/fc2`), including nn.scan
block stacks (leading depth axis detected from kernel rank). Params that
match no rule are replicated.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: shard the OUTPUT features (last kernel axis); their
# biases shard the same way
_COL = ("qkv", "attn_qkv", "fc1", "lin1")
# row-parallel: shard the INPUT features (second-to-last kernel axis);
# their biases stay replicated (added after the all-reduce)
_ROW = ("proj", "attn_proj", "fc2", "lin2")


def _spec_for(path, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if len(names) < 2:
        return P()
    owner, kind = names[-2], names[-1]
    nd = leaf.ndim
    if kind == "kernel" and owner in _COL and nd >= 2:
        return P(*([None] * (nd - 1)), "tp")
    if kind == "bias" and owner in _COL and nd >= 1:
        return P(*([None] * (nd - 1)), "tp")
    if kind == "kernel" and owner in _ROW and nd >= 2:
        return P(*([None] * (nd - 2)), "tp", None)
    return P()


def tp_param_specs(variables: Any):
    """PartitionSpec tree mirroring `variables` (column/row-parallel rules
    by param name; everything else replicated)."""
    return jax.tree_util.tree_map_with_path(_spec_for, variables)


def shard_params_tp(mesh: Mesh, variables: Any):
    """Place `variables` on `mesh` with tensor-parallel shardings — the
    big encoder weight matrices are split over the tp axis (ViT-H:
    ~2.5 GB / tp_degree per device)."""
    specs = tp_param_specs(variables)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        variables, specs)


def jit_tp(apply_fn, mesh: Mesh, variables: Any):
    """jit `apply_fn(variables, *args)` against TP-sharded params.

    Returns (jitted_fn, sharded_variables): the params are committed to
    their tensor-parallel placements (jit honors committed shardings and
    GSPMD partitions the whole program around them); outputs are forced
    replicated so callers see ordinary single-device semantics."""
    v_sharded = shard_params_tp(mesh, variables)
    rep = NamedSharding(mesh, P())
    fn = jax.jit(apply_fn, out_shardings=rep)
    return fn, v_sharded
