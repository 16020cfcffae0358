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
    (reference pytorch_utils.SharedMLP — BN in eval mode folds to scale+bias).

    `first_linear` / `after_first` split the stack around the first (bias-
    free) projection so callers can apply conv_0 algebraically BEFORE a
    gather (PositionalEncoding pre-projects the cloud and gathers 32-wide
    rows instead of 3-wide ones); `__call__` == after_first(first_linear)."""
    channels: tuple
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.convs = [nn.Dense(c, use_bias=False, dtype=self.dtype,
                               name=f"conv_{i}")
                      for i, c in enumerate(self.channels)]
        self.bns = [nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn_{i}")
                    for i in range(len(self.channels))]

    def first_linear(self, x):
        return self.convs[0](x)

    def after_first(self, h, train: bool = False):
        x = nn.relu(self.bns[0](h, use_running_average=not train))
        for conv, bn in zip(self.convs[1:], self.bns[1:]):
            x = nn.relu(bn(conv(x), use_running_average=not train))
        return x

    def __call__(self, x, train: bool = False):
        return self.after_first(self.first_linear(x), train)


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

        mlp1 = SharedMLP((32, 64, 128), dtype=self.dtype, name="mlp1")
        mlp2 = SharedMLP((32, 64, 128), dtype=self.dtype, name="mlp2")

        # QueryAndGroup feeds [grouped_xyz - center, grouped_xyz] (6 ch) to
        # the bias-free conv_0, which is linear — so project the CLOUD first
        # and gather 32-wide rows instead of 3-wide ones:
        #   conv0([p_j - p_i, p_j]) = conv0([p_j, p_j]) - conv0([p_i, 0])
        # Same values (fp associativity aside); the (B, N, S, 3) coordinate
        # gather (~20 ms at PEM shapes, rows too thin for the TPU gather
        # path) becomes a lane-aligned 32-channel row gather, and the
        # minor-dim-6 GEMM over the grouped tensor disappears.
        pp = jnp.concatenate([pts, pts], axis=-1)
        p0 = jnp.concatenate([pts, jnp.zeros_like(pts)], axis=-1)

        def scale_feats(mlp, idx):
            u = mlp.first_linear(pp)            # (B, N, 32)  "abs+rel" part
            v = mlp.first_linear(p0)[:, :, None, :]  # center part
            h = group_points(u, idx) - v        # (B, N, S, 32)
            return jnp.max(mlp.after_first(h, train), axis=2)

        f = jnp.concatenate(
            [scale_feats(mlp1, idx1), scale_feats(mlp2, idx2)], axis=-1)
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
    unroll: bool = False  # flatten the block scan at lowering

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
                          split_rngs={"params": True}, length=self.nblock,
                          unroll=self.nblock if self.unroll else 1)
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
