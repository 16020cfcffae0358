"""End-to-end frame benchmark on one TPU chip.

Simulates the full SAM-6D inference frame at the reference operating point
(BASELINE.md): SAM ViT-H encoder on the 640-width frame, AMG scoring of the
full 32x32 prompt grid (3072 mask candidates), top-K mask recompute,
DINOv2-L descriptors for the proposal capacity, and the PEM pose network for
a 16-instance batch — all with random weights (latency is weight-independent).

Prints ONE json line:
  {"metric": "e2e_frame_ms", "value": ..., "unit": "ms", "vs_baseline": ...}
vs_baseline = (150 ms target from BASELINE.json north star) / measured.

Env knobs: BENCH_MODE=full|pem (default full), BENCH_PROPOSALS (default 128),
BENCH_INSTANCES (default 16), BENCH_DTYPE=bf16|f32 (default bf16).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, n=3):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench_pem(dtype, instances: int):
    from sam6d_tpu.core.config import PEMConfig
    from sam6d_tpu.models.pem import PEMNet

    cfg = PEMConfig()
    net = PEMNet(cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    B, S, NF = instances, cfg.img_size, cfg.fine_npoint
    inputs = dict(
        rgb=jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(0, S * S, (B, NF))),
        pts=jnp.asarray(rng.rand(B, NF, 3).astype(np.float32) * 0.1),
        model=jnp.asarray(rng.rand(B, cfg.n_sample_model_point, 3).astype(np.float32) * 0.1),
        dense_po=jnp.asarray((rng.rand(B, NF, 3).astype(np.float32) - 0.5) * 0.1),
        dense_fo=jnp.asarray(rng.rand(B, NF, cfg.vit.out_dim).astype(np.float32)),
    )
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda: net.init({"params": key}, inputs, key))()
    fwd = jax.jit(lambda v, i, k: net.apply(v, i, k))
    return _timeit(lambda: fwd(variables, inputs, key)["pred_R"])


def bench_full(dtype, proposals: int, instances: int):
    import dataclasses
    from sam6d_tpu.core.config import SAMConfig, DINOv2Config
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.models.dinov2 import DINOv2

    t_pem = bench_pem(dtype, instances)

    sam_cfg = SAMConfig(max_proposals=proposals,
                        pred_iou_thresh=-10.0, stability_score_thresh=0.0)
    seg = SAMSegmentor(sam_cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)

    t_seg = _timeit(lambda: jnp.asarray(
        seg.generate_masks(frame)["boxes"]), n=3)

    dcfg = DINOv2Config()
    dino = DINOv2(img_size=dcfg.img_size, patch_size=dcfg.patch_size,
                  embed_dim=dcfg.embed_dim, depth=dcfg.depth,
                  num_heads=dcfg.num_heads, dtype=dtype)
    crops = jnp.asarray(rng.rand(dcfg.chunk_size, dcfg.img_size,
                                 dcfg.img_size, 3).astype(np.float32))
    dvars = jax.jit(lambda: dino.init(jax.random.PRNGKey(0), crops))()
    dfwd = jax.jit(lambda v, x: dino.apply(v, x))
    t_chunk = _timeit(lambda: dfwd(dvars, crops)[0])
    n_chunks = -(-proposals // dcfg.chunk_size)
    t_dino = t_chunk * n_chunks

    total = t_seg + t_dino + t_pem
    return total, dict(seg_ms=t_seg * 1e3, dino_ms=t_dino * 1e3,
                       pem_ms=t_pem * 1e3)


def main():
    mode = os.environ.get("BENCH_MODE", "full")
    proposals = int(os.environ.get("BENCH_PROPOSALS", "128"))
    instances = int(os.environ.get("BENCH_INSTANCES", "16"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    if mode == "pem":
        t = bench_pem(dtype, instances)
        extra = {}
        metric = "pem_batch16_ms"
    else:
        t, extra = bench_full(dtype, proposals, instances)
        metric = "e2e_frame_ms"

    ms = t * 1e3
    line = {"metric": metric, "value": round(ms, 2), "unit": "ms",
            "vs_baseline": round(150.0 / ms, 3)}
    line.update({k: round(v, 2) for k, v in extra.items()})
    print(json.dumps(line))


if __name__ == "__main__":
    main()
