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


def cosine_similarity_matrix(f1, f2, temp: float, normalize: bool = True):
    """(B, N, C) x (B, M, C) -> (B, N, M) cosine similarity / temp
    (reference model_utils.compute_feature_similarity :114-136)."""
    if normalize:
        f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-12)
        f2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-12)
    return jnp.einsum("bnc,bmc->bnm", f1, f2) / temp


class CoarsePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    normalize_feat: bool = True
    dtype: jnp.dtype = jnp.float32

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

        attens = []
        for i in range(self.nblock):
            f1, f2 = GeometricTransformer(self.hidden_dim, self.num_heads,
                                          dtype=self.dtype,
                                          name=f"transformers_{i}")(
                f1, geo1, f2, geo2)
            if all_blocks or i == self.nblock - 1:
                attens.append(cosine_similarity_matrix(
                    out_proj(f1), out_proj(f2), self.temp, self.normalize_feat))
        return attens
