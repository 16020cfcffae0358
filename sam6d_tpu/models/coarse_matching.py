"""Coarse point matching head (reference model/coarse_point_matching.py).

The flax module is pure: it returns the per-block similarity matrices;
pose init (inference) or correspondence loss (training) are applied outside
by `sam6d_tpu.pose.solvers` / `sam6d_tpu.train.losses`.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .geo_transformer import GeometricTransformer


class _ScanGeoBlock(nn.Module):
    """GeometricTransformer wrapped for nn.scan over the nblock loop:
    carry (f1, f2), per-step outputs (f1, f2) stacked for the similarity
    heads (the embeddings are broadcast constants)."""
    hidden_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        f1, f2, geo1, geo2 = carry
        f1, f2 = GeometricTransformer(self.hidden_dim, self.num_heads,
                                      dtype=self.dtype, name="block")(
            f1, geo1, f2, geo2)
        return (f1, f2, geo1, geo2), (f1, f2)


def cosine_similarity_matrix(f1, f2, temp: float, normalize: bool = True):
    """(B, N, C) x (B, M, C) -> (B, N, M) cosine similarity / temp
    (reference model_utils.compute_feature_similarity :114-136)."""
    if normalize:
        f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-12)
        f2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("...nc,...mc->...nm", f1, f2) / temp


class CoarsePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    normalize_feat: bool = True
    dtype: jnp.dtype = jnp.float32
    unroll: bool = False  # flatten the block scan at lowering

    @nn.compact
    def __call__(self, f1, geo1, f2, geo2, all_blocks: bool = False):
        """f1: (B, N1, input_dim) observed feats, geo1: (B, N1+1, N1+1, C)
        embeddings incl. bg; returns list of (B, N1+1, N2+1) similarities
        (one per block if all_blocks — the training path — else last only).
        """
        B = f1.shape[0]
        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")
        bg = self.param("bg_token", nn.initializers.normal(0.02),
                        (1, 1, self.hidden_dim))
        bg_b = jnp.broadcast_to(bg, (B, 1, self.hidden_dim)).astype(f1.dtype)
        f1 = jnp.concatenate([bg_b, in_proj(f1)], axis=1)
        f2 = jnp.concatenate([bg_b, in_proj(f2)], axis=1)

        Scanned = nn.scan(_ScanGeoBlock, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=self.nblock,
                          unroll=self.nblock if self.unroll else 1)
        _, (f1_all, f2_all) = Scanned(self.hidden_dim, self.num_heads,
                                      dtype=self.dtype, name="transformers")(
            (f1, f2, geo1, geo2), None)
        if not all_blocks:
            f1_all = f1_all[-1:]
            f2_all = f2_all[-1:]
        # per-step similarities, vectorized over the stacked step axis
        sims = cosine_similarity_matrix(
            out_proj(f1_all), out_proj(f2_all), self.temp, self.normalize_feat)
        return [sims[i] for i in range(sims.shape[0])]
