#!/usr/bin/env python
"""Experiment matrix #6: preranked AMG decode (shared layer-1 + rank pass)."""
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

RESULTS = {}


def report(name, seconds):
    RESULTS[name] = round(seconds * 1e3, 2)
    _log(f"{name}: {seconds*1e3:.1f} ms")


def exp_seg():
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    g = cfg.img_size // cfg.patch_size
    emb = jnp.asarray(rng.rand(g, g, cfg.prompt_embed_dim).astype(np.float32))

    # rank pass alone (3072 prompts, frozen image side)
    rk = jax.jit(lambda v, e: jnp.sum(seg._rank_all_impl(
        v, e, pts, h_in, w_in)[0]))
    report("seg.rank3072", timed(lambda i: rk(seg.vars, emb + i * 1e-6)))

    # exact score_all on 1024 prompts (shared layer-1)
    pts1k = pts[:1024]
    sa = jax.jit(lambda v, e: jnp.sum(seg._score_all_impl(
        v, e, pts1k, Ry, Rx, hs, ws, h_in, w_in)[2]))
    report("seg.score1024_sharedL1", timed(lambda i: sa(seg.vars, emb + i * 1e-6)))

    # exact score_all on the FULL grid (shared layer-1, no prerank)
    sa_full = jax.jit(lambda v, e: jnp.sum(seg._score_all_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[2]))
    report("seg.score3072_sharedL1", timed(lambda i: sa_full(seg.vars, emb + i * 1e-6)))

    # fused propose (rank + exact-1024 + NMS + pass B)
    pr = jax.jit(lambda v, e: jnp.sum(seg._propose_impl(
        v, e, pts, Ry, Rx, hs, ws, h_in, w_in)[1]))
    report("seg.propose_preranked", timed(lambda i: pr(seg.vars, emb + i * 1e-6)))


def main():
    _log("=== seg ===")
    try:
        exp_seg()
    except Exception as e:
        import traceback
        traceback.print_exc()
        _log(f"seg FAILED: {type(e).__name__}: {e}")
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
