"""Fine point matching head (reference model/fine_point_matching.py).

Dense 2048(+bg)-token matching with sparse-to-dense transformers and a
multi-scale ball-query positional encoding. Pure module: returns similarity
matrices; solvers/losses applied outside.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from flax import linen as _nn

from .geo_transformer import SparseToDenseTransformer
from .coarse_matching import cosine_similarity_matrix
from ..ops.ball_query import group_points, two_scale_ball_query


class _ScanS2DBlock(_nn.Module):
    """SparseToDenseTransformer wrapped for nn.scan over nblock."""
    hidden_dim: int
    num_heads: int
    focusing_factor: int
    dtype: jnp.dtype = jnp.float32

    @_nn.compact
    def __call__(self, carry, _):
        f1, f2, geo1, fps_idx1, geo2, fps_idx2 = carry
        f1, f2 = SparseToDenseTransformer(
            self.hidden_dim, self.num_heads, self.focusing_factor,
            dtype=self.dtype, name="block")(
            f1, geo1, fps_idx1, f2, geo2, fps_idx2)
        return (f1, f2, geo1, fps_idx1, geo2, fps_idx2), (f1, f2)


class SharedMLP(nn.Module):
    """Conv2d(1x1)+BN+ReLU stack over (B, M, S, C) grouped features
    (reference pytorch_utils.SharedMLP — BN in eval mode folds to scale+bias)."""
    channels: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class PositionalEncoding(nn.Module):
    """Two-scale ball-query PE (reference fine_point_matching.py:90-125):
    QueryAndGroup(r1, 32) and (r2, 64) with [rel_xyz, abs_xyz] channels,
    SharedMLP [6,32,64,128] each, max over samples, concat -> Dense 256."""
    out_dim: int = 256
    r1: float = 0.1
    r2: float = 0.2
    nsample1: int = 32
    nsample2: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pts, train: bool = False):
        import jax
        # one distance matrix serves both scales (the reference runs two
        # independent CUDA ball queries; same results). On TPU the fused
        # Pallas kernel keeps distances/ranks in VMEM (the XLA formulation
        # streams ~6 GB of (B, N, N) intermediates at PEM shapes).
        if jax.default_backend() == "tpu" and pts.shape[1] % 64 == 0:
            from ..kernels.ball_query import two_scale_ball_query_pallas
            idx1, idx2 = two_scale_ball_query_pallas(
                pts, pts, self.r1, self.nsample1, self.r2, self.nsample2)
        else:
            idx1, idx2 = two_scale_ball_query(
                self.r1, self.nsample1, self.r2, self.nsample2, pts, pts)

        def rel_abs(idx):
            # QueryAndGroup semantics with use_xyz=True and features=pts:
            # [grouped_xyz - center, grouped_xyz] channels
            grouped = group_points(pts, idx)  # (B, N, S, 3)
            return jnp.concatenate(
                [grouped - pts[:, :, None, :], grouped], axis=-1)

        f1 = SharedMLP((32, 64, 128), dtype=self.dtype, name="mlp1")(
            rel_abs(idx1), train)
        f1 = jnp.max(f1, axis=2)
        f2 = SharedMLP((32, 64, 128), dtype=self.dtype, name="mlp2")(
            rel_abs(idx2), train)
        f2 = jnp.max(f2, axis=2)
        f = jnp.concatenate([f1, f2], axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="mlp3")(f)


class FinePointMatching(nn.Module):
    nblock: int = 3
    input_dim: int = 256
    hidden_dim: int = 256
    out_dim: int = 256
    num_heads: int = 4
    temp: float = 0.1
    normalize_feat: bool = True
    focusing_factor: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pe1, f1, geo1, fps_idx1, pe2, f2, geo2, fps_idx2,
                 all_blocks: bool = False, train: bool = False):
        """pe1/pe2: (B, N, hidden) positional encodings of the init-posed
        observed cloud / template cloud (computed by the owning PEMNet via
        PositionalEncoding — pe2 is pose-independent and cacheable at
        onboarding); f1/f2 dense feats (B, N, input_dim); geo*:
        (B, S+1, S+1, C) sparse embeddings.
        Returns list of (B, N1+1, N2+1) similarity matrices.
        """
        B = f1.shape[0]
        in_proj = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")
        out_proj = nn.Dense(self.out_dim, dtype=self.dtype, name="out_proj")
        bg = self.param("bg_token", nn.initializers.normal(0.02),
                        (1, 1, self.hidden_dim))
        bg_b = jnp.broadcast_to(bg, (B, 1, self.hidden_dim)).astype(f1.dtype)

        f1 = in_proj(f1)
        f1 = f1 + pe1.astype(f1.dtype)
        f1 = jnp.concatenate([bg_b.astype(f1.dtype), f1], axis=1)
        f2 = in_proj(f2)
        f2 = f2 + pe2.astype(f2.dtype)
        f2 = jnp.concatenate([bg_b.astype(f2.dtype), f2], axis=1)

        Scanned = nn.scan(_ScanS2DBlock, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=self.nblock)
        _, (f1_all, f2_all) = Scanned(
            self.hidden_dim, self.num_heads, self.focusing_factor,
            dtype=self.dtype, name="transformers")(
            (f1, f2, geo1, fps_idx1, geo2, fps_idx2), None)
        if not all_blocks:
            f1_all = f1_all[-1:]
            f2_all = f2_all[-1:]
        sims = cosine_similarity_matrix(
            out_proj(f1_all), out_proj(f2_all), self.temp, self.normalize_feat)
        return [sims[i] for i in range(sims.shape[0])]
