#!/usr/bin/env python
"""Emit the honest per-stage MFU table (VERDICT r4 item 7).

Analytic model FLOPs per stage (matmul FLOPs only — the quantity the MXU
peak is defined over) + measured stage times -> achieved TF/s and % of the
v5e bf16 peak (197 TF/s), next to each stage's measured same-shape GEMM
floor from the probe battery. Run with the BENCH_r*.json numbers:

    python scripts/mfu_table.py --seg 137.8 --match 153.5 --match48 60.8 \
        --pem 68.9

The FLOP counts come from the production configs (core/config.py) so the
table stays correct when shapes change.
"""
from __future__ import annotations

import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFS = 197.0


def gemm(m, k, n):
    return 2.0 * m * k * n


def sam_encoder_flops():
    from sam6d_tpu.core.config import SAMConfig
    c = SAMConfig()
    g = c.img_size // c.patch_size          # 64
    N = g * g                               # 4096 tokens
    C = c.encoder_embed_dim                 # 1280
    hd = C // c.encoder_num_heads
    f = gemm(N, c.patch_size ** 2 * 3, C)   # patch embed
    n_global = len(c.encoder_global_attn_indexes)
    n_win = c.encoder_depth - n_global
    ws = c.window_size
    nW = (-(-g // ws)) ** 2                 # 25 windows (padded 64->70)
    # qkv/proj/mlp counted on the REAL 4096 tokens (the 64->70 window pad
    # is implementation waste and must count against MFU, not inflate the
    # model FLOPs); window attention counted on the padded 196-token
    # windows (zero-pad attention IS the ViTDet semantics)
    blk = (gemm(N, C, 3 * C) + gemm(N, C, C) + 2 * gemm(N, C, 4 * C))
    for depth, tokens, batches in ((n_global, N, 1), (n_win, ws * ws, nW)):
        attn = 2 * c.encoder_num_heads * batches * gemm(tokens, hd, tokens)
        f += depth * (blk + attn)
    f += gemm(N, C, c.prompt_embed_dim)     # neck conv1 1x1
    f += gemm(N, 9 * c.prompt_embed_dim, c.prompt_embed_dim)  # neck conv2 3x3
    return f


def amg_decode_flops():
    """Mask-decoder score pass over the full grid: two-way transformer +
    upscale tail + hypernetwork per 128-prompt chunk x 8 + resize."""
    from sam6d_tpu.core.config import SAMConfig
    c = SAMConfig()
    g = c.img_size // c.patch_size
    N_img = g * g
    C = c.prompt_embed_dim                  # 256
    P = c.points_per_side ** 2              # 1024 prompts
    T = 7                                   # tokens: iou + 4 mask + point + pad
    # two-way transformer: 2 layers x (self attn T, cross TxN, mlp, cross NxT)
    per_prompt = 0.0
    for _ in range(2):
        per_prompt += 2 * gemm(T, C, C) * 4            # t2t qkv-ish + proj
        per_prompt += 2 * 2 * gemm(T, C // 2, N_img)   # t2i scores+pv (128 inner)
        per_prompt += 2 * 2 * gemm(N_img, C // 2, T)   # i2t
        per_prompt += 2 * gemm(T, C, 8 * C)            # mlp
        per_prompt += (gemm(T, C, C) + gemm(N_img, C, C)) * 2  # projections
    # upscale tail: N_img x C -> 4N x C/4 -> 16N x C/8 GEMMs + hyper matmul
    per_prompt += gemm(N_img, C, 4 * (C // 4))
    per_prompt += gemm(4 * N_img, C // 4, 4 * (C // 8))
    per_prompt += gemm(16 * N_img, C // 8, 1) * 4      # 4 mask channels
    return P * per_prompt


def dino_describe_flops(n_crops):
    from sam6d_tpu.core.config import DINOv2Config
    c = DINOv2Config()
    g = c.img_size // c.patch_size
    N = g * g + 1
    C = c.embed_dim
    hd = C // c.num_heads
    f = gemm(n_crops * g * g, c.patch_size ** 2 * 3, C)
    blk = (gemm(n_crops * N, C, 3 * C) + gemm(n_crops * N, C, C)
           + 2 * gemm(n_crops * N, C, 4 * C))
    attn = 2 * c.num_heads * n_crops * gemm(N, hd, N)
    return f + c.depth * (blk + attn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seg", type=float, required=True, help="seg_ms")
    ap.add_argument("--enc", type=float, default=None,
                    help="encoder-only ms (probe segi.enc_perblock)")
    ap.add_argument("--match", type=float, required=True, help="match_ms cap128")
    ap.add_argument("--match48", type=float, required=True)
    ap.add_argument("--pem", type=float, required=True, help="pem B=16 ms")
    a = ap.parse_args()

    enc = sam_encoder_flops()
    rows = []
    if a.enc:
        rows.append(("SAM encoder (ViT-H 1024^2)", a.enc, enc, 27.8))
        # the AMG tail after the iou-prefix pass is bandwidth-bound
        # (decode transients, round-2/4 cost analyses) — an MFU number
        # there would mislead; report measured ms only
        rows.append(("AMG tail (iou pass + prefix decode + select)",
                     a.seg - a.enc, None, None))
    else:
        rows.append(("seg (encoder + AMG tail; tail bandwidth-bound)",
                     a.seg, None, None))
    rows += [
        ("match describe cap-128", a.match, dino_describe_flops(128), 110.1),
        ("match describe 48-valid", a.match48, dino_describe_flops(48),
         110.1 * 48 / 128),
        # PEM mixes GEMM stages with solver/gather stages whose cost is
        # not FLOP-bound; an aggregate MFU number would mislead — report
        # measured time only (stage decomposition: PERFORMANCE.md round 3)
        ("pem (B=16)", a.pem, None, None),
    ]
    print("| stage | measured ms | model matmul TF | achieved TF/s | % bf16 peak | same-shape GEMM floor ms |")
    print("|---|---|---|---|---|---|")
    for name, ms, fl, floor in rows:
        if fl is None:
            print(f"| {name} | {ms:.1f} | — | — | — | — |")
            continue
        tfs = fl / (ms * 1e-3) / 1e12
        print(f"| {name} | {ms:.1f} | {fl/1e12:.2f} | {tfs:.1f} | "
              f"{100*tfs/V5E_BF16_PEAK_TFS:.0f}% | {floor:.1f} |")


if __name__ == "__main__":
    main()
