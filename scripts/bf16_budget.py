#!/usr/bin/env python
"""Per-stage bf16-vs-fp32 error budget at FULL scale (VERDICT r2 item 3).

Runs every pipeline stage twice on the chip — once in the production bf16
configuration, once in fp32 — with IDENTICAL random synthetic weights and
inputs, and reports error statistics on the stage outputs. With --assert,
exits nonzero if any stage exceeds its recorded tolerance (the regression
gate; tolerances were recorded from this script's first run and carry ~2x
headroom). Results are documented in NUMERICS.md.

Error metric: q99 of |bf16 - fp32| / (|fp32| + eps) on the flattened output
(max-rel is dominated by near-zero crossings; q99 tracks the carry error of
the deep scans, which is what bit r1's b733f4e bf16-carry bug).
"""
from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

# recorded budgets (q99 relative error, see NUMERICS.md)
BUDGETS = {
    "sam_encode": 0.06,
    "amg_decode_masks": 0.08,
    "amg_decode_iou": 0.04,
    "dinov2_cls": 0.04,
    "dinov2_patch": 0.10,
    "ism_scores": 0.05,
    "pem_R": 0.02,
    "pem_t": 0.05,
    "pem_score": 0.05,
}


def rand_like_tree(shapes, seed=0):
    """Random-normal tree matching an eval_shape tree, generated on device.

    Weight leaves use fan-in scaling (1/sqrt(prod(shape[:-1]))) — the
    standard init statistics a trained checkpoint roughly matches. A flat
    small scale (the first version used 0.02) makes 1280-dim matmuls apply
    a ~0.7x gain per layer while LayerNorm re-normalizes the signal, so
    bf16 rounding noise compounds chaotically through 32-block stacks and
    the measured "error" is harness conditioning, not production numerics
    (q99 0.44 on sam_encode vs 0.03 with fan-in scaling).
    """
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = []
    for k, s in zip(keys, leaves):
        if not np.issubdtype(s.dtype, np.floating):
            vals.append(jnp.zeros(s.shape, s.dtype))
        elif len(s.shape) <= 1:
            # norm scales / biases: keep O(1) so deep stacks stay
            # well-conditioned (all-small weights would collapse signals)
            vals.append(1.0 + jax.random.normal(k, s.shape, jnp.float32) * 0.05)
        else:
            fan_in = 1
            for d in s.shape[:-1]:
                fan_in *= d
            scale = float(fan_in) ** -0.5
            vals.append(jax.random.normal(k, s.shape, jnp.float32) * scale)
    return jax.tree_util.tree_unflatten(treedef, vals)


def q99_rel(bf, fp):
    """q99 of |bf - fp| in units of the fp32 tensor's RMS.

    Scale-invariant: with fan-in-scaled weights the activations of deep
    stacks are legitimately small (RMS ~0.03 at the SAM encoder output),
    and a per-element denominator with a fixed absolute floor (the first
    version used |fp| + 1e-3) turns ordinary bf16 rounding on near-zero
    entries into O(1) "relative" errors that measure the harness, not the
    model. Error/RMS reads directly as "bf16 perturbs the signal by X% of
    its own scale".
    """
    bf = np.asarray(bf, np.float32).ravel()
    fp = np.asarray(fp, np.float32).ravel()
    rms = float(np.sqrt(np.mean(fp * fp))) + 1e-12
    return float(np.quantile(np.abs(bf - fp), 0.99) / rms)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def stage_sam(results, rng):
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.core.params import cast_float_params

    cfg = SAMConfig(max_proposals=128, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg32 = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.float32)
    vars32 = rand_like_tree(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), seg32.vars),
        seed=1)
    seg16 = SAMSegmentor(cfg, variables="eval_shape", dtype=jnp.bfloat16)
    vars16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, vars32)

    x = jnp.asarray(rng.rand(1, 1024, 1024, 3).astype(np.float32))
    e32 = jax.jit(lambda v, x: seg32.encoder.apply(v, x))(
        vars32["image_encoder"], x)
    e16 = jax.jit(lambda v, x: seg16.encoder.apply(v, x))(
        vars16["image_encoder"], x.astype(jnp.bfloat16))
    results["sam_encode"] = q99_rel(e16, e32)
    log(f"sam_encode: {results['sam_encode']:.4f}")

    # AMG decode chunk: 128 prompts through prompt-encoder + decoder
    pts = jnp.asarray(rng.rand(128, 2).astype(np.float32) * 1024)
    lbl = jnp.ones((128, 1), jnp.int32)

    def decode(seg, v, emb, pts):
        dense_pe = seg.prompt_encoder.apply(v["prompt_encoder"],
                                            method="dense_pe")
        sparse, dense = seg.prompt_encoder.apply(
            v["prompt_encoder"], pts[:, None, :], lbl)
        return seg.mask_decoder.apply(
            v["mask_decoder"], emb[0], dense_pe, sparse, dense)

    m32, iou32 = jax.jit(lambda v, e, p: decode(seg32, v, e, p))(
        vars32, e32, pts)
    m16, iou16 = jax.jit(lambda v, e, p: decode(seg16, v, e, p))(
        vars16, e16.astype(jnp.bfloat16), pts)
    results["amg_decode_masks"] = q99_rel(m16, m32)
    results["amg_decode_iou"] = q99_rel(iou16, iou32)
    log(f"amg_decode: masks {results['amg_decode_masks']:.4f} "
        f"iou {results['amg_decode_iou']:.4f}")

def stage_describe(results, rng, want_scores):
    from sam6d_tpu.core.config import DINOv2Config
    from sam6d_tpu.models.dinov2 import DINOv2

    c = DINOv2Config()
    crops = jnp.asarray(rng.rand(32, 224, 224, 3).astype(np.float32))

    def build(dtype):
        net = DINOv2(patch_size=c.patch_size, embed_dim=c.embed_dim,
                     depth=c.depth, num_heads=c.num_heads, dtype=dtype)
        return net
    net32, net16 = build(jnp.float32), build(jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: net32.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3))))
    v32 = rand_like_tree(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), shapes), seed=2)
    v16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x, v32)
    cls32, p32 = jax.jit(net32.apply)(v32, crops)
    cls16, p16 = jax.jit(net16.apply)(v16, crops.astype(jnp.bfloat16))
    results["dinov2_cls"] = q99_rel(cls16, cls32)
    results["dinov2_patch"] = q99_rel(p16, p32)
    log(f"dinov2: cls {results['dinov2_cls']:.4f} "
        f"patch {results['dinov2_patch']:.4f}")

    if want_scores:
        from sam6d_tpu.models import ism_scoring
        K, T = 128, 42
        valid = jnp.ones((K,), bool)

        def score(cls_desc, ref):
            sem = ism_scoring.semantic_scores(cls_desc, ref, valid,
                                              "avg_5", 0.2)
            return sem["score"]
        ref32 = jnp.stack([cls32[:T]])  # (1, T, C) object stack
        s32 = jax.jit(score)(jnp.concatenate([cls32] * 4)[:K], ref32)
        s16 = jax.jit(score)(
            jnp.concatenate([cls16] * 4)[:K].astype(jnp.bfloat16),
            ref32.astype(jnp.bfloat16))
        results["ism_scores"] = q99_rel(s16, s32)
        log(f"ism_scores: {results['ism_scores']:.4f}")

def stage_pem(results, rng):
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet

    cfg = PEMConfig()
    B, S, NF = 16, cfg.img_size, cfg.fine_npoint
    inputs = dict(
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.1),
        model=jnp.asarray(
            (rng.rand(B, cfg.n_sample_model_point, 3) - 0.5).astype(np.float32) * 0.2),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5) * 0.2),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32)),
    )
    key = jax.random.PRNGKey(0)
    net32 = PEMNet(cfg, dtype=jnp.float32)
    net16 = PEMNet(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: net32.init({"params": key}, inputs, key))
    v32 = rand_like_tree(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), shapes), seed=3)
    v16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x, v32)
    o32 = jax.jit(lambda v, i, k: net32.apply(v, i, k))(v32, inputs, key)
    o16 = jax.jit(lambda v, i, k: net16.apply(v, i, k))(v16, inputs, key)
    # rotations compared via geodesic angle (rel error is meaningless
    # for orthonormal matrices near zero entries)
    R32, R16 = np.asarray(o32["pred_R"]), np.asarray(o16["pred_R"])
    tr = np.clip((np.einsum("bij,bij->b", R16, R32) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr))
    results["pem_R"] = float(np.quantile(ang, 0.99) / 180.0)
    results["pem_t"] = q99_rel(o16["pred_t"], o32["pred_t"])
    results["pem_score"] = q99_rel(o16["pred_pose_score"],
                                   o32["pred_pose_score"])
    log(f"pem: R(q99 deg/180) {results['pem_R']:.4f} "
        f"t {results['pem_t']:.4f} score {results['pem_score']:.4f}")

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--assert", dest="assert_", action="store_true")
    ap.add_argument("--stages", default="sam,describe,scores,pem")
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    results = {}
    rng = np.random.RandomState(0)

    # each stage runs in its own function scope so its device buffers
    # (fp32 + bf16 full-size weight trees — the SAM pair alone is ~4 GB)
    # are freed before the next stage allocates; keeping them all alive in
    # one scope exhausted HBM at the PEM stage
    if "sam" in stages:
        stage_sam(results, rng)
    if "describe" in stages or "scores" in stages:
        stage_describe(results, rng, "scores" in stages)
    if "pem" in stages:
        stage_pem(results, rng)

    print(json.dumps(results))
    if args.assert_:
        bad = {k: (v, BUDGETS[k]) for k, v in results.items()
               if k in BUDGETS and v > BUDGETS[k]}
        if bad:
            log(f"BUDGET EXCEEDED: {bad}")
            sys.exit(1)
        log("all stages within budget")


if __name__ == "__main__":
    main()
