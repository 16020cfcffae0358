"""Independent torch oracle implementations of the PEM building blocks.

Written from the behavioral spec of the reference (SURVEY.md §2.7) as a
numerical parity oracle for the JAX stack: both sides get identical weights
via the converter's naming convention, so a passing test validates the
converter mapping AND the model math simultaneously. This is NOT the
reference code — it is a from-spec reimplementation used only in tests.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.ModuleDict({})
        self.attn_qkv = nn.Linear(dim, dim * 3)
        self.attn_proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp_fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.heads = heads
        self.dim = dim

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        a = torch.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(C // self.heads)
        a = a.softmax(-1)
        o = torch.einsum("bhnm,bmhd->bnhd", a, v).reshape(B, N, C)
        x = x + self.attn_proj(o)
        h = self.norm2(x)
        x = x + self.mlp_fc2(F.gelu(self.mlp_fc1(h)))
        return x

    def state_into(self, sd, prefix):
        sd[f"{prefix}.norm1.weight"] = self.norm1.weight
        sd[f"{prefix}.norm1.bias"] = self.norm1.bias
        sd[f"{prefix}.attn.qkv.weight"] = self.attn_qkv.weight
        sd[f"{prefix}.attn.qkv.bias"] = self.attn_qkv.bias
        sd[f"{prefix}.attn.proj.weight"] = self.attn_proj.weight
        sd[f"{prefix}.attn.proj.bias"] = self.attn_proj.bias
        sd[f"{prefix}.norm2.weight"] = self.norm2.weight
        sd[f"{prefix}.norm2.bias"] = self.norm2.bias
        sd[f"{prefix}.mlp.fc1.weight"] = self.mlp_fc1.weight
        sd[f"{prefix}.mlp.fc1.bias"] = self.mlp_fc1.bias
        sd[f"{prefix}.mlp.fc2.weight"] = self.mlp_fc2.weight
        sd[f"{prefix}.mlp.fc2.bias"] = self.mlp_fc2.bias


class TorchViT(nn.Module):
    """timm-like ViT with pyramid outputs (4 normed block outputs)."""

    def __init__(self, img_size=64, patch=16, dim=64, depth=4, heads=4):
        super().__init__()
        self.patch = nn.Conv2d(3, dim, patch, stride=patch)
        g = img_size // patch
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, g * g + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.depth = depth

    def forward(self, x):
        # x: (B, 3, H, W)
        B = x.shape[0]
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1) + self.pos_embed
        d, n = self.depth, self.depth // 4
        keep = {d - 1, d - n - 1, d - 2 * n - 1, d - 3 * n - 1}
        outs = []
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in keep:
                outs.append(self.norm(x))
        return outs

    def state_into(self, sd, prefix):
        sd[f"{prefix}.cls_token"] = self.cls_token
        sd[f"{prefix}.pos_embed"] = self.pos_embed
        sd[f"{prefix}.patch_embed.proj.weight"] = self.patch.weight
        sd[f"{prefix}.patch_embed.proj.bias"] = self.patch.bias
        sd[f"{prefix}.norm.weight"] = self.norm.weight
        sd[f"{prefix}.norm.bias"] = self.norm.bias
        for i, blk in enumerate(self.blocks):
            blk.state_into(sd, f"{prefix}.blocks.{i}")


class TorchViTAE(nn.Module):
    """ViT + linear pixel-shuffle upscaling to (B, out_dim, H, W)."""

    def __init__(self, img_size=64, patch=16, dim=64, depth=4, heads=4, out_dim=32):
        super().__init__()
        self.vit = TorchViT(img_size, patch, dim, depth, heads)
        self.output_upscaling = nn.Linear(dim * 4, 16 * out_dim)
        self.out_dim = out_dim

    def forward(self, x):
        B, _, H, W = x.shape
        outs = self.vit(x)
        cls = outs[-1][:, 0]
        feats = torch.cat([o[:, 1:] for o in outs], dim=2)
        g = int(math.isqrt(feats.shape[1]))
        y = self.output_upscaling(feats)
        y = y.reshape(B, g, g, 4, 4, self.out_dim).permute(0, 5, 1, 3, 2, 4)
        y = y.reshape(B, self.out_dim, 4 * g, 4 * g)
        y = F.interpolate(y, (H, W), mode="bilinear", align_corners=False)
        return y, cls

    def state_dict_flat(self, prefix="feature_extraction.rgb_net"):
        sd = {}
        self.vit.state_into(sd, f"{prefix}.vit")
        sd[f"{prefix}.output_upscaling.weight"] = self.output_upscaling.weight
        sd[f"{prefix}.output_upscaling.bias"] = self.output_upscaling.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def torch_sinusoid(x, d):
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    om = x.unsqueeze(-1) * div
    return torch.stack([om.sin(), om.cos()], dim=-1).reshape(*x.shape, d)


class TorchGeoEmbedding(nn.Module):
    def __init__(self, dim=32, sigma_d=0.2, sigma_a=15.0, k=3):
        super().__init__()
        self.proj_d = nn.Linear(dim, dim)
        self.proj_a = nn.Linear(dim, dim)
        self.dim, self.sigma_d, self.sigma_a, self.k = dim, sigma_d, sigma_a, k

    def forward(self, pts):
        B, N, _ = pts.shape
        dmat = torch.cdist(pts, pts)
        d_idx = dmat / self.sigma_d
        knn = dmat.topk(self.k + 1, dim=2, largest=False)[1][:, :, 1:]
        knn_pts = torch.gather(
            pts.unsqueeze(1).expand(B, N, N, 3), 2,
            knn.unsqueeze(-1).expand(B, N, self.k, 3))
        ref = (knn_pts - pts.unsqueeze(2)).unsqueeze(2).expand(B, N, N, self.k, 3)
        anc = (pts.unsqueeze(1) - pts.unsqueeze(2)).unsqueeze(3).expand(B, N, N, self.k, 3)
        sin_v = torch.cross(ref, anc, dim=-1).norm(dim=-1)
        cos_v = (ref * anc).sum(-1)
        a_idx = torch.atan2(sin_v, cos_v) * (180.0 / (self.sigma_a * math.pi))
        d_emb = self.proj_d(torch_sinusoid(d_idx, self.dim))
        a_emb = self.proj_a(torch_sinusoid(a_idx, self.dim)).max(dim=3)[0]
        return d_emb + a_emb

    def state_dict_flat(self, prefix="geo_embedding"):
        return {f"{prefix}.proj_d.weight": self.proj_d.weight.detach().numpy(),
                f"{prefix}.proj_d.bias": self.proj_d.bias.detach().numpy(),
                f"{prefix}.proj_a.weight": self.proj_a.weight.detach().numpy(),
                f"{prefix}.proj_a.bias": self.proj_a.bias.detach().numpy()}


class TorchAttnLayer(nn.Module):
    """(RPE)AttentionLayer + AttentionOutput."""

    def __init__(self, dim, heads, rpe):
        super().__init__()
        self.rpe = rpe
        self.heads = heads
        self.dim = dim
        self.proj_q = nn.Linear(dim, dim)
        self.proj_k = nn.Linear(dim, dim)
        self.proj_v = nn.Linear(dim, dim)
        if rpe:
            self.proj_p = nn.Linear(dim, dim)
        self.linear = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim)
        self.expand = nn.Linear(dim, dim * 2)
        self.squeeze = nn.Linear(dim * 2, dim)
        self.norm2 = nn.LayerNorm(dim)

    def forward(self, x, mem, embed=None):
        B, N, C = x.shape
        M = mem.shape[1]
        H, dh = self.heads, C // self.heads
        q = self.proj_q(x).reshape(B, N, H, dh)
        k = self.proj_k(mem).reshape(B, M, H, dh)
        v = self.proj_v(mem).reshape(B, M, H, dh)
        s = torch.einsum("bnhc,bmhc->bhnm", q, k)
        if self.rpe:
            p = self.proj_p(embed).reshape(B, N, M, H, dh)
            s = s + torch.einsum("bnhc,bnmhc->bhnm", q, p)
        a = (s / math.sqrt(dh)).softmax(-1)
        o = torch.einsum("bhnm,bmhc->bnhc", a, v).reshape(B, N, C)
        h = self.norm(self.linear(o) + x)
        return self.norm2(h + self.squeeze(F.relu(self.expand(h))))

    def state_into(self, sd, prefix):
        for n in ["proj_q", "proj_k", "proj_v"] + (["proj_p"] if self.rpe else []):
            m = getattr(self, n)
            sd[f"{prefix}.attention.attention.{n}.weight"] = m.weight
            sd[f"{prefix}.attention.attention.{n}.bias"] = m.bias
        sd[f"{prefix}.attention.linear.weight"] = self.linear.weight
        sd[f"{prefix}.attention.linear.bias"] = self.linear.bias
        sd[f"{prefix}.attention.norm.weight"] = self.norm.weight
        sd[f"{prefix}.attention.norm.bias"] = self.norm.bias
        sd[f"{prefix}.output.expand.weight"] = self.expand.weight
        sd[f"{prefix}.output.expand.bias"] = self.expand.bias
        sd[f"{prefix}.output.squeeze.weight"] = self.squeeze.weight
        sd[f"{prefix}.output.squeeze.bias"] = self.squeeze.bias
        sd[f"{prefix}.output.norm.weight"] = self.norm2.weight
        sd[f"{prefix}.output.norm.bias"] = self.norm2.bias


class TorchGeoTransformer(nn.Module):
    """['self','cross'] with sequential cross update."""

    def __init__(self, dim, heads):
        super().__init__()
        self.self_layer = TorchAttnLayer(dim, heads, rpe=True)
        self.cross_layer = TorchAttnLayer(dim, heads, rpe=False)

    def forward(self, f0, e0, f1, e1):
        f0 = self.self_layer(f0, f0, e0)
        f1 = self.self_layer(f1, f1, e1)
        f0 = self.cross_layer(f0, f1)
        f1 = self.cross_layer(f1, f0)
        return f0, f1

    def state_into(self, sd, prefix):
        self.self_layer.state_into(sd, f"{prefix}.layers.0")
        self.cross_layer.state_into(sd, f"{prefix}.layers.1")


class TorchLinearAttnLayer(nn.Module):
    """LinearTransformerLayer: focused linear attention + out FFN."""

    def __init__(self, dim, heads, ff=3):
        super().__init__()
        self.proj_q = nn.Linear(dim, dim)
        self.proj_k = nn.Linear(dim, dim)
        self.proj_v = nn.Linear(dim, dim)
        self.scale = nn.Parameter(torch.zeros(1, 1, dim))
        self.linear = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim)
        self.expand = nn.Linear(dim, dim * 2)
        self.squeeze = nn.Linear(dim * 2, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.heads, self.ff, self.dim = heads, ff, dim

    def forward(self, x, mem):
        q = F.relu(self.proj_q(x)) + 1e-6
        k = F.relu(self.proj_k(mem)) + 1e-6
        v = self.proj_v(mem)
        scale = F.softplus(self.scale)
        q, k = q / scale, k / scale
        qn = q.norm(dim=-1, keepdim=True)
        kn = k.norm(dim=-1, keepdim=True)
        q = q ** self.ff
        k = k ** self.ff
        q = q / q.norm(dim=-1, keepdim=True) * qn
        k = k / k.norm(dim=-1, keepdim=True) * kn
        B, N, C = q.shape
        M = k.shape[1]
        H, dh = self.heads, C // self.heads
        q = q.reshape(B, N, H, dh)
        k = k.reshape(B, M, H, dh)
        vv = v.reshape(B, M, H, dh)
        z = 1.0 / (torch.einsum("bnhc,bhc->bnh", q, k.sum(1)) + 1e-6)
        kv = torch.einsum("bmhc,bmhd->bhcd", k, vv)
        o = torch.einsum("bnhc,bhcd,bnh->bnhd", q, kv, z).reshape(B, N, C)
        h = self.norm(self.linear(o) + x)
        return self.norm2(h + self.squeeze(F.relu(self.expand(h))))

    def state_into(self, sd, prefix):
        for n in ["proj_q", "proj_k", "proj_v"]:
            m = getattr(self, n)
            sd[f"{prefix}.attention.attention.{n}.weight"] = m.weight
            sd[f"{prefix}.attention.attention.{n}.bias"] = m.bias
        sd[f"{prefix}.attention.attention.scale"] = self.scale
        sd[f"{prefix}.attention.linear.weight"] = self.linear.weight
        sd[f"{prefix}.attention.linear.bias"] = self.linear.bias
        sd[f"{prefix}.attention.norm.weight"] = self.norm.weight
        sd[f"{prefix}.attention.norm.bias"] = self.norm.bias
        sd[f"{prefix}.output.expand.weight"] = self.expand.weight
        sd[f"{prefix}.output.expand.bias"] = self.expand.bias
        sd[f"{prefix}.output.squeeze.weight"] = self.squeeze.weight
        sd[f"{prefix}.output.squeeze.bias"] = self.squeeze.bias
        sd[f"{prefix}.output.norm.weight"] = self.norm2.weight
        sd[f"{prefix}.output.norm.bias"] = self.norm2.bias
