#!/usr/bin/env python
"""Training dress rehearsal at the reference scale (one chip).

Runs the dp-pjit PEM training step at the reference batch size (28,
Pose_Estimation_Model/README + config/base.yaml:71-74) on synthetic
MegaPose-shaped data with gradient checkpointing on the ViT scan, and
reports median step time + HBM usage — the numbers behind the v5e-8
training claim (per-chip batch 28 here == per-chip batch at global 224
on a v5e-8 dp mesh; gradients sync over ICI with one psum).

Usage: python scripts/train_rehearsal.py [--batch 28] [--steps 4] [--no_remat]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=28)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--no_remat", action="store_true")
    args = p.parse_args()

    from sam6d_tpu.core.config import default_config
    from sam6d_tpu.parallel.mesh import make_mesh, shard_batch
    from sam6d_tpu.train.trainer import PEMTrainer, make_dummy_batch

    cfg = default_config()
    cfg = dataclasses.replace(
        cfg,
        pem=dataclasses.replace(
            cfg.pem, vit=dataclasses.replace(cfg.pem.vit,
                                             remat=not args.no_remat)),
        train=dataclasses.replace(cfg.train, batch_size=args.batch))

    mesh = make_mesh()  # all local devices (1 on the real chip)
    trainer = PEMTrainer(cfg, mesh)
    batch = make_dummy_batch(cfg, args.batch)
    t0 = time.time()
    state = trainer.init_state(batch)
    print(f"[rehearsal] init: {time.time()-t0:.1f}s", file=sys.stderr)
    sharded = shard_batch(mesh, {k: v for k, v in batch.items() if k != "K"})

    t0 = time.time()
    state, metrics = trainer.step(state, sharded, jax.random.PRNGKey(0))
    loss0 = float(metrics["loss"])
    print(f"[rehearsal] compile+step0: {time.time()-t0:.1f}s "
          f"loss={loss0:.4f}", file=sys.stderr)

    ts = []
    for i in range(args.steps):
        t0 = time.time()
        state, metrics = trainer.step(state, sharded, jax.random.PRNGKey(i + 1))
        loss = float(metrics["loss"])  # forces sync
        ts.append(time.time() - t0)
        print(f"[rehearsal] step {i+1}: {ts[-1]*1e3:.0f} ms loss={loss:.4f}",
              file=sys.stderr)

    med = sorted(ts)[len(ts) // 2]
    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {k: int(v) for k, v in stats.items()
               if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception:
        pass
    line = dict(metric="train_step_bs%d_ms" % args.batch,
                value=round(med * 1e3, 1), unit="ms",
                remat=not args.no_remat, loss_finite=bool(np.isfinite(loss)),
                **{k: round(v / 2**30, 2) for k, v in mem.items()})
    print(json.dumps(line))


if __name__ == "__main__":
    main()
