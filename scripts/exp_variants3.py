#!/usr/bin/env python
"""Experiment matrix #3: head-batched fused attention + decode decomposition."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import timed, init_like, _log
from sam6d_tpu.core.params import cast_float_params

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def exp_dino():
    from sam6d_tpu.core.config import ISMConfig
    from sam6d_tpu.models.dinov2 import DINOv2

    d = ISMConfig().dinov2
    rng = np.random.RandomState(0)
    crops = jnp.asarray(rng.rand(128, d.img_size, d.img_size, 3).astype(np.float32))
    model = DINOv2(img_size=d.img_size, patch_size=d.patch_size,
                   embed_dim=d.embed_dim, depth=d.depth,
                   num_heads=d.num_heads, use_flash=True, dtype=jnp.bfloat16)
    v = cast_float_params(init_like(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, d.img_size, d.img_size, 3)))),
        jnp.bfloat16)

    for chunk in (32, 64, 128):
        def chunked(vv, x, c=chunk):
            xs = x.reshape(-1, c, *x.shape[1:])
            cls, _ = jax.lax.map(lambda q: model.apply(vv, q), xs)
            return jnp.sum(cls)
        f = jax.jit(chunked)
        report(f"dino.hb_flash_c{chunk}", timed(lambda i: f(v, crops + i * 1e-6)))


def exp_pemvit():
    import dataclasses
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet

    cfg = PEMConfig()
    cfg = dataclasses.replace(cfg, vit=dataclasses.replace(cfg.vit, use_flash=True))
    net = PEMNet(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    B, S, NF = 16, cfg.img_size, cfg.fine_npoint
    inputs = dict(
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.1),
        model=jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32) * 0.1),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5) * 0.1),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32)),
        pe_o=jnp.asarray(rng.rand(B, NF, cfg.fine.hidden_dim).astype(np.float32)),
    )
    v = cast_float_params(init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, inputs, jax.random.PRNGKey(0))),
        jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    full = jax.jit(lambda vv, i, k: jnp.sum(net.apply(vv, i, k)["pred_R"]))
    report("pem.infer_hb", timed(lambda i: full(
        v, dict(inputs, rgb=inputs["rgb"] + i * 1e-6), jax.random.fold_in(key, i))))


def exp_seg():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from flax import linen as nn

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    canvas_j = jnp.asarray(canvas[None])
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    enc = jax.jit(lambda v, c: jnp.sum(seg.encoder.apply(v["image_encoder"], c)))
    report("seg.encoder_hb", timed(lambda i: enc(seg.vars, canvas_j + i * 1e-6)))

    # decode chunk sweep
    for chunk in (64, 128, 256):
        def decode_only(v, e, c=chunk):
            dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"],
                                                method="dense_pe")
            P = pts.shape[0]

            def one(p):
                m, iou = seg._decode_chunk(v, e, dense_pe, p)
                return jnp.sum(m), jnp.sum(iou)
            ms, io = jax.lax.map(one, pts.reshape(P // c, c, 2))
            return jnp.sum(ms) + jnp.sum(io)
        f2 = jax.jit(decode_only)
        report(f"seg.decode_c{chunk}", timed(lambda i: f2(seg.vars, emb + i * 1e-6)))

    # upscale + hypernetwork tail alone at one chunk's shapes
    dec = seg.mask_decoder
    dv = seg.vars["mask_decoder"]
    src = jnp.asarray(rng.rand(128, 64, 64, 256).astype(np.float32)).astype(jnp.bfloat16)
    hyper_in = jnp.asarray(rng.rand(128, 4, 256).astype(np.float32)).astype(jnp.bfloat16)

    class UpscaleTail(nn.Module):
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, tok):
            from sam6d_tpu.models.sam import LayerNorm2d, HyperMLP
            B = x.shape[0]
            x = nn.ConvTranspose(64, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 name="upscale_conv1")(x)
            x = LayerNorm2d(64, dtype=self.dtype, name="upscale_ln")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.ConvTranspose(32, (2, 2), strides=(2, 2), dtype=self.dtype,
                                 name="upscale_conv2")(x)
            x = nn.gelu(x, approximate=False)
            hyper = jnp.stack(
                [HyperMLP(256, 32, dtype=self.dtype, name=f"hyper_mlps_{i}")(
                    tok[:, i]) for i in range(4)], axis=1)
            return jnp.einsum("bkc,bhwc->bkhw", hyper, x)

    ut = UpscaleTail()
    keys = {k: dv["params"][k] for k in dv["params"]
            if k.startswith("upscale") or k.startswith("hyper")}
    f3 = jax.jit(lambda p, x: jnp.sum(ut.apply({"params": p}, x, hyper_in)))
    report("seg.upscale_tail128", timed(lambda i: f3(keys, src + i * 1e-6)))


def main():
    groups = sys.argv[1:] or ["dino", "pemvit", "seg"]
    for g in groups:
        _log(f"=== {g} ===")
        try:
            dict(dino=exp_dino, pemvit=exp_pemvit, seg=exp_seg)[g]()
        except Exception as e:
            _log(f"{g} FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
