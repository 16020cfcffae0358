#!/usr/bin/env python
"""Experiment matrix #10: decode-chunk A/B — shared layer-1 vs broadcast-up-front."""
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

from bench import timed, _log
from sam6d_tpu.core.params import cast_float_params

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def main():
    import dataclasses
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.models.sam import MaskDecoder

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))
    dense_pe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                        method="dense_pe")
    dense = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                     method="no_mask_dense")
    p128 = pts[:128]
    labels = jnp.ones(p128.shape[0], jnp.int32)[:, None]
    sparse, _ = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                         p128[:, None, :], labels)
    sparse = jax.block_until_ready(sparse)

    dec_old = MaskDecoder(transformer_dim=cfg.prompt_embed_dim,
                          block_layout=True, shared_l1=False,
                          dtype=jnp.bfloat16)
    dec_new = seg.mask_decoder  # shared_l1=True

    dv = seg.vars["mask_decoder"]

    f_old = jax.jit(lambda v, e: jnp.sum(dec_old.apply(
        v, e, dense_pe, sparse, dense)[0]))
    report("ab.decode_broadcast", timed(lambda i: f_old(dv, emb + i * 1e-6)))

    f_new = jax.jit(lambda v, e: jnp.sum(dec_new.apply(
        v, e, dense_pe, sparse, dense)[0]))
    report("ab.decode_sharedl1", timed(lambda i: f_new(dv, emb + i * 1e-6)))

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
