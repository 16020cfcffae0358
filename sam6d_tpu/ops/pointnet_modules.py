"""PointNet++ set-abstraction / feature-propagation building blocks.

Functional equivalents of the reference `model/pointnet2/pointnet2_modules.py`
(:22-168, SA/FP modules — available in the reference, exercised only through
QueryAndGroup). Provided for API completeness of the pointnet2 replacement.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .ball_query import query_and_group, three_nn_interpolate
from .sampling import farthest_point_sample, gather_points


class SharedMLPStack(nn.Module):
    channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """FPS + ball-query grouping + shared MLP + max-pool (PointnetSAModule)."""
    npoint: int
    radius: float
    nsample: int
    mlp_channels: Sequence[int]
    use_xyz: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        """xyz: (B, N, 3); features: (B, N, C) -> (new_xyz (B, npoint, 3),
        new_feats (B, npoint, mlp[-1]))."""
        idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, idx)
        grouped = query_and_group(self.radius, self.nsample, xyz, new_xyz,
                                  features, self.use_xyz)
        h = SharedMLPStack(self.mlp_channels, dtype=self.dtype,
                           name="mlp")(grouped, train)
        return new_xyz, jnp.max(h, axis=2)


class FeaturePropagation(nn.Module):
    """3-NN interpolation + shared MLP (PointnetFPModule)."""
    mlp_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats,
                 train: bool = False):
        interp = three_nn_interpolate(unknown_xyz, known_xyz, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLPStack(self.mlp_channels, dtype=self.dtype,
                              name="mlp")(interp, train)
