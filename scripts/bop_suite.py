#!/usr/bin/env python
"""Seven-core BOP suite driver (reference exp.sh equivalent).

Runs ISM + PEM evaluation over the BOP-19/23 core datasets and writes the
official submission files per dataset. Scenes are embarrassingly parallel;
shard across hosts with --shard/--num_shards (the reference distributed via
SLURM + PL-DDP with a rank-0 file merge — same contract, explicit here).

Usage:
  python scripts/bop_suite.py --bop_root /data/BOP --template_root /data/BOP-Templates \
      --output_dir outputs/bop_suite [--datasets lmo ycbv] \
      [--sam_ckpt ...] [--dinov2_ckpt ...] [--pem_ckpt ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sam6d_tpu.cli.main import cmd_bop_eval  # noqa: E402
from sam6d_tpu.data.bop import BOP_DATASETS  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bop_root", required=True)
    p.add_argument("--template_root", required=True)
    p.add_argument("--output_dir", default="outputs/bop_suite")
    p.add_argument("--datasets", nargs="*", default=BOP_DATASETS)
    p.add_argument("--stage", default="all", choices=["ism", "pem", "all"])
    p.add_argument("--onboarding", default="pbr", choices=["pbr", "render"])
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--merge_shards", action="store_true")
    p.add_argument("--reset_descriptors", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--sam_ckpt", default=os.environ.get("SAM_CKPT"))
    p.add_argument("--dinov2_ckpt", default=os.environ.get("DINOV2_CKPT"))
    p.add_argument("--pem_ckpt", default=os.environ.get("PEM_CKPT"))
    args = p.parse_args()

    for name in args.datasets:
        ns = argparse.Namespace(
            dataset_dir=os.path.join(args.bop_root, name),
            dataset_name=name,
            template_dir=args.template_root,
            models_dir="models_cad" if name == "tless" else "models",
            output_dir=os.path.join(args.output_dir, name),
            stage=args.stage, seg_path=None, max_frames=args.max_frames,
            shard=args.shard, num_shards=args.num_shards,
            merge_shards=args.merge_shards,
            onboarding=args.onboarding,
            reset_descriptors=args.reset_descriptors,
            sam_ckpt=args.sam_ckpt, dinov2_ckpt=args.dinov2_ckpt,
            pem_ckpt=args.pem_ckpt)
        print(f"=== {name} ===", flush=True)
        cmd_bop_eval(ns)


if __name__ == "__main__":
    main()
