"""Independent torch oracles for the SAM components (from-spec test-only
reimplementations, same role as tests/torch_ref.py)."""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchSAMAttention(nn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        hd = dim // heads
        self.rel_pos_h = nn.Parameter(torch.randn(2 * input_size[0] - 1, hd) * 0.1)
        self.rel_pos_w = nn.Parameter(torch.randn(2 * input_size[1] - 1, hd) * 0.1)
        self.heads = heads

    def forward(self, x):
        B, H, W, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(x).reshape(B, H * W, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.reshape(3, B * self.heads, H * W, hd).unbind(0)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        # decomposed rel pos
        idx_h = torch.arange(H)[:, None] - torch.arange(H)[None, :] + H - 1
        idx_w = torch.arange(W)[:, None] - torch.arange(W)[None, :] + W - 1
        Rh = self.rel_pos_h[idx_h]
        Rw = self.rel_pos_w[idx_w]
        r_q = q.reshape(B * self.heads, H, W, hd)
        rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
        attn = (attn.view(-1, H, W, H, W) + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).view(-1, H * W, H * W)
        attn = attn.softmax(-1)
        x = (attn @ v).view(B, self.heads, H, W, hd).permute(0, 2, 3, 1, 4).reshape(B, H, W, C)
        return self.proj(x)

    def state_into(self, sd, prefix):
        sd[f"{prefix}.qkv.weight"] = self.qkv.weight
        sd[f"{prefix}.qkv.bias"] = self.qkv.bias
        sd[f"{prefix}.proj.weight"] = self.proj.weight
        sd[f"{prefix}.proj.bias"] = self.proj.bias
        sd[f"{prefix}.rel_pos_h"] = self.rel_pos_h
        sd[f"{prefix}.rel_pos_w"] = self.rel_pos_w


class TorchSAMBlock(nn.Module):
    def __init__(self, dim, heads, window, grid):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        size = (window, window) if window > 0 else (grid, grid)
        self.attn = TorchSAMAttention(dim, heads, size)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.lin1 = nn.Linear(dim, dim * 4)
        self.lin2 = nn.Linear(dim * 4, dim)
        self.window = window

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window > 0:
            B, H, W, C = x.shape
            ws = self.window
            ph = (ws - H % ws) % ws
            pw = (ws - W % ws) % ws
            x = F.pad(x, (0, 0, 0, pw, 0, ph))
            Hp, Wp = H + ph, W + pw
            x = x.view(B, Hp // ws, ws, Wp // ws, ws, C).permute(0, 1, 3, 2, 4, 5)
            x = x.reshape(-1, ws, ws, C)
        x = self.attn(x)
        if self.window > 0:
            x = x.view(B, Hp // ws, Wp // ws, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, Hp, Wp, C)[:, :H, :W]
        x = shortcut + x
        return x + self.lin2(F.gelu(self.lin1(self.norm2(x))))

    def state_into(self, sd, prefix):
        sd[f"{prefix}.norm1.weight"] = self.norm1.weight
        sd[f"{prefix}.norm1.bias"] = self.norm1.bias
        self.attn.state_into(sd, f"{prefix}.attn")
        sd[f"{prefix}.norm2.weight"] = self.norm2.weight
        sd[f"{prefix}.norm2.bias"] = self.norm2.bias
        sd[f"{prefix}.mlp.lin1.weight"] = self.lin1.weight
        sd[f"{prefix}.mlp.lin1.bias"] = self.lin1.bias
        sd[f"{prefix}.mlp.lin2.weight"] = self.lin2.weight
        sd[f"{prefix}.mlp.lin2.bias"] = self.lin2.bias


class TorchLN2d(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.weight = nn.Parameter(torch.rand(ch))
        self.bias = nn.Parameter(torch.rand(ch))

    def forward(self, x):  # (B, C, H, W)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TorchSAMEncoder(nn.Module):
    def __init__(self, img=64, patch=16, dim=32, depth=3, heads=4, window=3,
                 global_idx=(1,), out_ch=16):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)
        g = img // patch
        self.pos_embed = nn.Parameter(torch.randn(1, g, g, dim) * 0.02)
        self.blocks = nn.ModuleList([
            TorchSAMBlock(dim, heads, 0 if i in global_idx else window, g)
            for i in range(depth)])
        self.neck0 = nn.Conv2d(dim, out_ch, 1, bias=False)
        self.neck1 = TorchLN2d(out_ch)
        self.neck2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.neck3 = TorchLN2d(out_ch)

    def forward(self, x):  # (B, 3, H, W)
        x = self.proj(x).permute(0, 2, 3, 1) + self.pos_embed
        for b in self.blocks:
            x = b(x)
        x = self.neck1(self.neck0(x.permute(0, 3, 1, 2)))
        x = self.neck3(self.neck2(x))
        return x  # (B, C, g, g)

    def state_dict_flat(self):
        sd = {"image_encoder.patch_embed.proj.weight": self.proj.weight,
              "image_encoder.patch_embed.proj.bias": self.proj.bias,
              "image_encoder.pos_embed": self.pos_embed,
              "image_encoder.neck.0.weight": self.neck0.weight,
              "image_encoder.neck.1.weight": self.neck1.weight,
              "image_encoder.neck.1.bias": self.neck1.bias,
              "image_encoder.neck.2.weight": self.neck2.weight,
              "image_encoder.neck.3.weight": self.neck3.weight,
              "image_encoder.neck.3.bias": self.neck3.bias}
        for i, b in enumerate(self.blocks):
            b.state_into(sd, f"image_encoder.blocks.{i}")
        return {k: v.detach().numpy() for k, v in sd.items()}


class TorchPromptEncoder(nn.Module):
    def __init__(self, dim=32, input_size=(64, 64), mask_in_chans=16):
        super().__init__()
        self.gauss = nn.Parameter(torch.randn(2, dim // 2))
        self.point_embeddings = nn.Parameter(torch.randn(4, dim))
        self.not_a_point = nn.Parameter(torch.randn(1, dim))
        self.no_mask = nn.Parameter(torch.randn(1, dim))
        self.input_size = input_size
        # reference mask_downscaling (prompt_encoder.py:51-59)
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, mask_in_chans // 4, kernel_size=2, stride=2),
            TorchLN2d(mask_in_chans // 4),
            nn.GELU(),
            nn.Conv2d(mask_in_chans // 4, mask_in_chans, kernel_size=2, stride=2),
            TorchLN2d(mask_in_chans),
            nn.GELU(),
            nn.Conv2d(mask_in_chans, dim, kernel_size=1),
        )

    def pe(self, coords01):
        c = 2 * coords01 - 1
        c = c @ self.gauss
        c = 2 * math.pi * c
        return torch.cat([c.sin(), c.cos()], dim=-1)

    def embed_points(self, points, labels):
        B, N, _ = points.shape
        points = torch.cat([points, torch.zeros(B, 1, 2)], 1) + 0.5
        labels = torch.cat([labels, -torch.ones(B, 1, dtype=labels.dtype)], 1)
        coords = points.clone()
        coords[..., 0] /= self.input_size[1]
        coords[..., 1] /= self.input_size[0]
        emb = self.pe(coords)
        emb[labels == -1] = 0.0
        emb[labels == -1] += self.not_a_point[0]
        emb[labels == 0] += self.point_embeddings[0]
        emb[labels == 1] += self.point_embeddings[1]
        return emb

    def embed_boxes(self, boxes):
        # reference _embed_boxes (prompt_encoder.py:96-103)
        coords = (boxes + 0.5).reshape(-1, 2, 2).clone()
        coords[..., 0] /= self.input_size[1]
        coords[..., 1] /= self.input_size[0]
        emb = self.pe(coords)
        emb[:, 0, :] += self.point_embeddings[2]
        emb[:, 1, :] += self.point_embeddings[3]
        return emb

    def embed_masks(self, masks):  # (B, 1, H, W)
        return self.mask_downscaling(masks)

    def dense_pe(self, size):
        h, w = size
        y = (torch.arange(h).float() + 0.5) / h
        x = (torch.arange(w).float() + 0.5) / w
        grid = torch.stack(torch.meshgrid(x, y, indexing="xy"), -1)
        return self.pe(grid)

    def state_dict_flat(self):
        sd = {
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": self.gauss,
            "prompt_encoder.not_a_point_embed.weight": self.not_a_point,
            "prompt_encoder.no_mask_embed.weight": self.no_mask,
        }
        for i in range(4):
            sd[f"prompt_encoder.point_embeddings.{i}.weight"] = self.point_embeddings[i:i + 1]
        for i, m in enumerate(self.mask_downscaling):
            if hasattr(m, "weight"):
                sd[f"prompt_encoder.mask_downscaling.{i}.weight"] = m.weight
                sd[f"prompt_encoder.mask_downscaling.{i}.bias"] = m.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


class TorchDSAttn(nn.Module):
    def __init__(self, dim, heads, rate=1):
        super().__init__()
        d = dim // rate
        self.q_proj = nn.Linear(dim, d)
        self.k_proj = nn.Linear(dim, d)
        self.v_proj = nn.Linear(dim, d)
        self.out_proj = nn.Linear(d, dim)
        self.heads = heads
        self.d = d

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        B, N, _ = q.shape
        M = k.shape[1]
        hd = self.d // self.heads
        q = q.reshape(B, N, self.heads, hd).transpose(1, 2)
        k = k.reshape(B, M, self.heads, hd).transpose(1, 2)
        v = v.reshape(B, M, self.heads, hd).transpose(1, 2)
        a = (q @ k.transpose(-2, -1) / math.sqrt(hd)).softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, self.d)
        return self.out_proj(o)

    def state_into(self, sd, prefix):
        for n in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            m = getattr(self, n)
            sd[f"{prefix}.{n}.weight"] = m.weight
            sd[f"{prefix}.{n}.bias"] = m.bias


class TorchTwoWayBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_pe):
        super().__init__()
        self.self_attn = TorchDSAttn(dim, heads, 1)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_t2i = TorchDSAttn(dim, heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)
        self.norm3 = nn.LayerNorm(dim)
        self.cross_i2t = TorchDSAttn(dim, heads, 2)
        self.norm4 = nn.LayerNorm(dim)
        self.skip_pe = skip_pe

    def forward(self, queries, keys, qpe, kpe):
        if self.skip_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + qpe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + qpe
        k = keys + kpe
        queries = self.norm2(queries + self.cross_t2i(q, k, keys))
        queries = self.norm3(queries + self.lin2(F.relu(self.lin1(queries))))
        q = queries + qpe
        k = keys + kpe
        keys = self.norm4(keys + self.cross_i2t(k, q, queries))
        return queries, keys

    def state_into(self, sd, prefix):
        self.self_attn.state_into(sd, f"{prefix}.self_attn")
        self.cross_t2i.state_into(sd, f"{prefix}.cross_attn_token_to_image")
        self.cross_i2t.state_into(sd, f"{prefix}.cross_attn_image_to_token")
        for n in ["norm1", "norm2", "norm3", "norm4"]:
            m = getattr(self, n)
            sd[f"{prefix}.{n}.weight"] = m.weight
            sd[f"{prefix}.{n}.bias"] = m.bias
        sd[f"{prefix}.mlp.lin1.weight"] = self.lin1.weight
        sd[f"{prefix}.mlp.lin1.bias"] = self.lin1.bias
        sd[f"{prefix}.mlp.lin2.weight"] = self.lin2.weight
        sd[f"{prefix}.mlp.lin2.bias"] = self.lin2.bias


class TorchMaskDecoder(nn.Module):
    def __init__(self, dim=32, heads=4, mlp_dim=64):
        super().__init__()
        self.layers = nn.ModuleList([
            TorchTwoWayBlock(dim, heads, mlp_dim, i == 0) for i in range(2)])
        self.final_attn = TorchDSAttn(dim, heads, 2)
        self.norm_final = nn.LayerNorm(dim)
        self.iou_token = nn.Parameter(torch.randn(1, dim))
        self.mask_tokens = nn.Parameter(torch.randn(4, dim))
        self.up1 = nn.ConvTranspose2d(dim, dim // 4, 2, stride=2)
        self.upln = TorchLN2d(dim // 4)
        self.up2 = nn.ConvTranspose2d(dim // 4, dim // 8, 2, stride=2)
        self.hyper = nn.ModuleList([
            nn.ModuleList([nn.Linear(dim, dim), nn.Linear(dim, dim),
                           nn.Linear(dim, dim // 8)]) for _ in range(4)])
        self.iou_head = nn.ModuleList(
            [nn.Linear(dim, 256), nn.Linear(256, 256), nn.Linear(256, 4)])

    def run_mlp(self, layers, x):
        for i, l in enumerate(layers):
            x = F.relu(l(x)) if i < len(layers) - 1 else l(x)
        return x

    def forward(self, img_emb, img_pe, sparse, dense):
        """img_emb/img_pe/dense: (H, W, C); sparse: (B, N, C)."""
        B = sparse.shape[0]
        H, W, C = img_emb.shape
        tokens = torch.cat([
            torch.cat([self.iou_token, self.mask_tokens], 0).unsqueeze(0).expand(B, -1, -1),
            sparse], dim=1)
        src = (img_emb + dense).reshape(1, H * W, C).expand(B, -1, -1)
        pos = img_pe.reshape(1, H * W, C).expand(B, -1, -1)
        queries, keys = tokens, src
        for layer in self.layers:
            queries, keys = layer(queries, keys, tokens, pos)
        q = queries + tokens
        k = keys + pos
        queries = self.norm_final(queries + self.final_attn(q, k, keys))
        iou_out = queries[:, 0]
        mask_out = queries[:, 1:5]
        x = keys.transpose(1, 2).reshape(B, C, H, W)
        x = F.gelu(self.upln(self.up1(x)))
        x = F.gelu(self.up2(x))
        hyper = torch.stack([self.run_mlp(self.hyper[i], mask_out[:, i])
                             for i in range(4)], 1)
        masks = (hyper @ x.reshape(B, C // 8, -1)).reshape(B, 4, H * 4, W * 4)
        iou_pred = self.run_mlp(self.iou_head, iou_out)
        return masks, iou_pred

    def state_dict_flat(self):
        sd = {"mask_decoder.iou_token.weight": self.iou_token,
              "mask_decoder.mask_tokens.weight": self.mask_tokens,
              "mask_decoder.output_upscaling.0.weight": self.up1.weight,
              "mask_decoder.output_upscaling.0.bias": self.up1.bias,
              "mask_decoder.output_upscaling.1.weight": self.upln.weight,
              "mask_decoder.output_upscaling.1.bias": self.upln.bias,
              "mask_decoder.output_upscaling.3.weight": self.up2.weight,
              "mask_decoder.output_upscaling.3.bias": self.up2.bias}
        for i, b in enumerate(self.layers):
            b.state_into(sd, f"mask_decoder.transformer.layers.{i}")
        self.final_attn.state_into(sd, "mask_decoder.transformer.final_attn_token_to_image")
        sd["mask_decoder.transformer.norm_final_attn.weight"] = self.norm_final.weight
        sd["mask_decoder.transformer.norm_final_attn.bias"] = self.norm_final.bias
        for i in range(4):
            for j in range(3):
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.weight"] = self.hyper[i][j].weight
                sd[f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}.bias"] = self.hyper[i][j].bias
        for j in range(3):
            sd[f"mask_decoder.iou_prediction_head.layers.{j}.weight"] = self.iou_head[j].weight
            sd[f"mask_decoder.iou_prediction_head.layers.{j}.bias"] = self.iou_head[j].bias
        return {k: v.detach().numpy() for k, v in sd.items()}
