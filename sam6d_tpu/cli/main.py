"""Unified CLI (replaces the reference's demo.sh + per-stage argparse/hydra
CLIs, SURVEY §2.1). Subcommands mirror the reference entry points:

  python -m sam6d_tpu.cli.main render   --cad_path ... --output_dir ...
  python -m sam6d_tpu.cli.main demo     --cad_path ... --rgb_path ... \
      --depth_path ... --cam_path ... --output_dir ...
  python -m sam6d_tpu.cli.main ism      (ISM only, writes detection_ism.json)
  python -m sam6d_tpu.cli.main pem      (PEM only, consumes a seg json)
  python -m sam6d_tpu.cli.main train    (PEM training)

Checkpoints: --sam_ckpt/--dinov2_ckpt/--pem_ckpt accept the reference torch
checkpoint files and are converted on load; without them the models run
randomly initialized (pipeline smoke only).
"""
from __future__ import annotations

import argparse
import os
import sys


def _load_pem_params(path):
    if not path:
        return None
    from ..weights.convert_pem import load_torch_checkpoint, convert_pem_state_dict
    return convert_pem_state_dict(load_torch_checkpoint(path))


def _load_sam_params(path, depth=32):
    if not path:
        return None
    from ..weights.convert_pem import load_torch_checkpoint
    from ..weights.convert_sam import convert_sam_state_dict
    return convert_sam_state_dict(load_torch_checkpoint(path), depth=depth)


def _load_dinov2_params(path, depth=24):
    if not path:
        return None
    from ..weights.convert_pem import load_torch_checkpoint
    from ..weights.convert_dinov2 import convert_dinov2_state_dict
    return convert_dinov2_state_dict(load_torch_checkpoint(path), depth=depth)


def cmd_render(args):
    from ..render.templates import render_custom_templates
    out = render_custom_templates(args.cad_path, args.output_dir)
    print(f"templates written to {out}")


def cmd_render_bop(args):
    from ..render.templates import render_bop_templates
    obj_ids = [int(x) for x in args.obj_ids] if args.obj_ids else None
    dirs = render_bop_templates(args.dataset_dir, args.output_dir,
                                args.dataset_name, level=args.level,
                                obj_ids=obj_ids)
    print(f"{len(dirs)} objects -> {args.output_dir}/{args.dataset_name}")


def cmd_render_training(args):
    from ..render.templates import (render_gso_templates,
                                    render_shapenet_templates)
    idx = [int(x) for x in args.obj_indices] if args.obj_indices else None
    fn = render_gso_templates if args.source == "gso" else render_shapenet_templates
    dirs = fn(args.data_dir, obj_indices=idx)
    print(f"{len(dirs)} template dirs rendered ({args.source})")


def cmd_demo(args):
    import dataclasses
    from ..core.config import default_config
    from ..pipelines.demo import run_demo

    cfg = default_config()
    if args.segmentor_model != "sam":
        cfg = dataclasses.replace(
            cfg, ism=dataclasses.replace(cfg.ism, segmentor=args.segmentor_model))
    results = run_demo(
        cfg, args.cad_path, args.rgb_path, args.depth_path, args.cam_path,
        args.output_dir,
        ism_variables=_load_dinov2_params(args.dinov2_ckpt),
        sam_variables=_load_sam_params(args.sam_ckpt),
        pem_variables=_load_pem_params(args.pem_ckpt),
        det_score_thresh=args.det_score_thresh,
        skip_render=args.skip_render,
        stability_score_thresh=args.stability_score_thresh,
    )
    print(f"{len(results['ism'])} detections, {len(results['pem'])} poses "
          f"-> {args.output_dir}/sam6d_results/")


def cmd_stream(args):
    """Multi-object streaming serving (BASELINE config 5): render+onboard
    every CAD once, then one fused ISM + one batched PEM dispatch per
    frame; writes results.jsonl + a throughput summary."""
    import glob as _glob
    import json as _json

    import numpy as np
    from PIL import Image

    from ..core.config import default_config
    from ..data.mesh import load_ply
    from ..pipelines.ism import ISMPipeline
    from ..pipelines.pem import PEMPipeline
    from ..pipelines.sam_amg import SAMSegmentor
    from ..pipelines.streaming import MultiObjectStream
    from ..render.templates import render_templates

    cfg = default_config()
    if args.proposals:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, ism=dataclasses.replace(
                cfg.ism, sam=dataclasses.replace(
                    cfg.ism.sam, max_proposals=args.proposals)))
    os.makedirs(args.output_dir, exist_ok=True)
    ism = ISMPipeline(cfg.ism,
                      segmentor=SAMSegmentor(
                          cfg.ism.sam, variables=_load_sam_params(args.sam_ckpt)),
                      dinov2_variables=_load_dinov2_params(args.dinov2_ckpt))
    pem = PEMPipeline(cfg.pem, params=_load_pem_params(args.pem_ckpt))
    stream = MultiObjectStream(ism, pem,
                               det_score_thresh=args.det_score_thresh)
    rng = np.random.RandomState(0)
    for i, cad in enumerate(args.cad_paths):
        obj_dir = os.path.join(args.output_dir, f"obj_{i}")
        tdir = os.path.join(obj_dir, "templates")
        mesh = load_ply(cad)
        if not os.path.isdir(tdir):
            render_templates(mesh, obj_dir, level=cfg.ism.template_level,
                             image_size=cfg.render.image_size)
        stream.onboard_object(
            i, tdir, mesh.sample(cfg.pem.n_sample_model_point, rng),
            ism_points=mesh.sample(cfg.ism.matching.pointcloud_sample_num,
                                   rng))

    cam = _json.load(open(args.cam_path))
    K = np.array(cam["cam_K"], np.float32).reshape(3, 3)
    depth_scale = float(cam.get("depth_scale", 1.0))
    rgbs = sorted(_glob.glob(os.path.join(args.frames_dir, "rgb*.png")))
    if args.max_frames:
        rgbs = rgbs[:args.max_frames]
    out_path = os.path.join(args.output_dir, "results.jsonl")

    def frames():
        # PNG decode runs in the prefetch thread, overlapping device compute
        for rp in rgbs:
            dp = os.path.join(
                os.path.dirname(rp),
                os.path.basename(rp).replace("rgb", "depth", 1))
            rgb = np.array(Image.open(rp).convert("RGB"))
            depth = np.array(Image.open(dp)).astype(np.float32)
            yield rp, rgb, depth

    from ..data.prefetch import iter_prefetched

    names = []

    def items():
        # PNG decode in the prefetch thread; device work double-buffered by
        # process_stream (frame t+1's AMG+scoring run while the host drives
        # frame t's PEM tail)
        for rp, rgb, depth in iter_prefetched(frames(), depth=2):
            names.append(rp)
            yield rgb, depth, K, depth_scale

    with open(out_path, "w") as f:
        pipelined = stream.process_stream(
            items(), depth_in_flight=0 if args.no_overlap else 1)
        for j, res in enumerate(pipelined):
            f.write(_json.dumps(dict(frame=os.path.basename(names[j]),
                                     poses=res["poses"],
                                     ms=round(res["ms"], 1))) + "\n")
    tp = stream.throughput()
    tail = (f", p50 {tp['p50_ms']} / p95 {tp['p95_ms']} ms"
            if "p95_ms" in tp else "")
    print(f"{tp['frames']} frames, {tp['poses']} poses, "
          f"{tp['ms_per_frame']} ms/frame{tail} -> {out_path}")


def cmd_pem(args):
    from ..core.config import default_config
    from ..pipelines.pem import run_demo_pem

    cfg = default_config().pem
    results = run_demo_pem(
        cfg, args.output_dir, args.cad_path, args.rgb_path, args.depth_path,
        args.cam_path, args.seg_path, params=_load_pem_params(args.pem_ckpt),
        det_score_thresh=args.det_score_thresh)
    print(f"{len(results)} poses -> {args.output_dir}/sam6d_results/detection_pem.json")


def cmd_verify_weights(args):
    import json as _json
    from ..eval.golden import run_golden_verification
    report = run_golden_verification(
        args.weights_dir, args.output_dir, example_dir=args.example_dir,
        record=args.record, golden=args.golden)
    print(_json.dumps(report, indent=2, default=str))
    raise SystemExit(0 if report.get("ok") else 1)


def cmd_train(args):
    import jax
    import numpy as np
    from ..core.config import default_config
    from ..parallel.mesh import make_mesh, shard_batch
    from ..train.trainer import PEMTrainer
    from ..data.megapose import MegaPoseDataset
    from ..core.checkpoint import (save_train_state, latest_checkpoint,
                                   load_train_state)
    from ..core.profiling import LogBuffer, StageTimer

    cfg = default_config()
    ds = MegaPoseDataset(args.data_dir, img_size=cfg.pem.img_size,
                         n_sample_observed=cfg.pem.n_sample_observed_point,
                         n_sample_template=cfg.pem.n_sample_template_point)
    if len(ds) == 0:
        print(f"no MegaPose shards found under {args.data_dir}", file=sys.stderr)
        raise SystemExit(2)
    mesh = make_mesh()
    trainer = PEMTrainer(cfg, mesh, seed=cfg.train.seed)
    rng = np.random.RandomState(cfg.train.seed)
    batch = ds.sample_batch(cfg.train.batch_size, rng)
    pretrained = None
    if args.mae_ckpt:
        from ..weights.convert_pem import load_torch_checkpoint, convert_mae_vit
        pretrained = convert_mae_vit(load_torch_checkpoint(args.mae_ckpt))
    state = trainer.init_state(batch, pretrained_vit=pretrained)
    buf = LogBuffer()
    timer = StageTimer()
    # multi-worker prefetch (reference trains with 24 DataLoader workers,
    # config/base.yaml:71): batch assembly overlaps the device step
    from ..data.prefetch import PrefetchLoader
    loader = PrefetchLoader(
        lambda r: ds.sample_batch(cfg.train.batch_size, r),
        num_workers=args.data_workers, depth=2 * args.data_workers,
        seed=cfg.train.seed + 1)
    for it in range(args.iters):
        with timer.stage("data"):
            batch = loader.get()
            batch = shard_batch(mesh, {k: jax.numpy.asarray(v)
                                       for k, v in batch.items() if k != "K"})
        with timer.stage("step"):
            state, metrics = trainer.step(state, batch,
                                          jax.random.PRNGKey(it))
        buf.update({k: float(v) for k, v in metrics.items()})
        if (it + 1) % cfg.train.log_every == 0:
            print(f"iter {it+1}: " + " ".join(
                f"{k}={v:.4f}" for k, v in sorted(buf.average().items())),
                flush=True)
            buf.clear()
        if (it + 1) % cfg.train.checkpoint_every == 0:
            save_train_state(args.ckpt_dir, it + 1, state)
    loader.close()
    save_train_state(args.ckpt_dir, args.iters, state)


def cmd_bop_eval(args):
    """BOP evaluation (reference run_inference.py + test_bop.py)."""
    if getattr(args, "merge_shards", False):
        from ..pipelines.bop_eval import merge_ism_shards, merge_pem_shards
        n = args.num_shards
        if args.stage in ("ism", "all"):
            p = os.path.join(args.output_dir, f"ism_{args.dataset_name}.json")
            merge_ism_shards(p, n)
            print(f"merged {n} ISM shards -> {p}")
        if args.stage in ("pem", "all"):
            p = os.path.join(args.output_dir,
                             f"sam6dtpu_{args.dataset_name}-test.csv")
            merge_pem_shards(p, n)
            print(f"merged {n} PEM shards -> {p}")
        return
    from ..core.config import default_config
    from ..data.bop import load_bop_objects
    from ..pipelines.ism import ISMPipeline
    from ..pipelines.pem import PEMPipeline
    from ..pipelines.sam_amg import SAMSegmentor
    from ..pipelines.bop_eval import run_ism_bop_eval, run_pem_bop_eval
    import json

    cfg = default_config()
    objects = load_bop_objects(
        os.path.join(args.dataset_dir, args.models_dir),
        template_root=args.template_dir, dataset_name=args.dataset_name)
    out_dir = args.output_dir
    os.makedirs(out_dir, exist_ok=True)

    if args.stage in ("ism", "all"):
        seg = SAMSegmentor(cfg.ism.sam, variables=_load_sam_params(args.sam_ckpt))
        ism = ISMPipeline(cfg.ism, dinov2_variables=_load_dinov2_params(args.dinov2_ckpt),
                          segmentor=seg)
        onboarding = getattr(args, "onboarding", "pbr")
        reset = getattr(args, "reset_descriptors", False)
        if onboarding == "pbr":
            ism.onboard_bop_objects_pbr(
                args.dataset_dir, [o.obj_id for o in objects],
                cache_path=os.path.join(out_dir, "descriptors_pbr.npz"),
                reset_descriptors=reset)
        else:
            ism.onboard_bop_objects(
                objects, cache_path=os.path.join(out_dir, "descriptors.npz"),
                reset_descriptors=reset)
        ism_json = os.path.join(out_dir, f"ism_{args.dataset_name}.json")
        run_ism_bop_eval(ism, args.dataset_dir, objects, ism_json,
                         dataset_name=args.dataset_name,
                         max_frames=args.max_frames,
                         shard=getattr(args, "shard", 0),
                         num_shards=getattr(args, "num_shards", 1))
        print(f"ISM results -> {ism_json}")
    if args.stage in ("pem", "all"):
        seg_json = args.seg_path or os.path.join(
            out_dir, f"ism_{args.dataset_name}.json")
        detections = json.load(open(seg_json))
        pem = PEMPipeline(cfg.pem, params=_load_pem_params(args.pem_ckpt))
        out_csv = os.path.join(
            out_dir, f"sam6dtpu_{args.dataset_name}-test.csv")
        run_pem_bop_eval(pem, args.dataset_dir, objects, detections, out_csv,
                         max_frames=args.max_frames,
                         shard=getattr(args, "shard", 0),
                         num_shards=getattr(args, "num_shards", 1))
        print(f"PEM results -> {out_csv}")


def build_parser():
    p = argparse.ArgumentParser(prog="sam6d_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--output_dir", required=True)
    common.add_argument("--cad_path", required=True)

    pr = sub.add_parser("render", parents=[common])
    pr.set_defaults(fn=cmd_render)

    prb = sub.add_parser("render-bop")
    prb.add_argument("--dataset_dir", required=True)
    prb.add_argument("--dataset_name", required=True)
    prb.add_argument("--output_dir", required=True)
    prb.add_argument("--level", type=int, default=0)
    prb.add_argument("--obj_ids", nargs="*", default=None)
    prb.set_defaults(fn=cmd_render_bop)

    prt = sub.add_parser("render-training")
    prt.add_argument("--data_dir", required=True,
                     help="MegaPose root (contains MegaPose-GSO / "
                          "MegaPose-ShapeNetCore)")
    prt.add_argument("--source", choices=["gso", "shapenet"], required=True)
    prt.add_argument("--obj_indices", nargs="*", default=None)
    prt.set_defaults(fn=cmd_render_training)

    io = argparse.ArgumentParser(add_help=False)
    io.add_argument("--rgb_path", required=True)
    io.add_argument("--depth_path", required=True)
    io.add_argument("--cam_path", required=True)
    io.add_argument("--det_score_thresh", type=float, default=0.2)
    io.add_argument("--sam_ckpt", default=os.environ.get("SAM_CKPT"))
    io.add_argument("--dinov2_ckpt", default=os.environ.get("DINOV2_CKPT"))
    io.add_argument("--pem_ckpt", default=os.environ.get("PEM_CKPT"))

    pd = sub.add_parser("demo", parents=[common, io])
    pd.add_argument("--skip_render", action="store_true")
    pd.add_argument("--segmentor_model", default="sam",
                    choices=["sam", "fastsam"])
    pd.add_argument("--stability_score_thresh", type=float, default=0.97)
    pd.set_defaults(fn=cmd_demo)

    pp = sub.add_parser("pem", parents=[common, io])
    pp.add_argument("--seg_path", required=True)
    pp.set_defaults(fn=cmd_pem)

    pb = sub.add_parser("bop-eval")
    pb.add_argument("--dataset_dir", required=True)
    pb.add_argument("--dataset_name", required=True)
    pb.add_argument("--template_dir", default=None)
    pb.add_argument("--models_dir", default="models")
    pb.add_argument("--output_dir", default="outputs/bop")
    pb.add_argument("--stage", default="all", choices=["ism", "pem", "all"])
    pb.add_argument("--seg_path", default=None)
    pb.add_argument("--max_frames", type=int, default=None)
    pb.add_argument("--sam_ckpt", default=os.environ.get("SAM_CKPT"))
    pb.add_argument("--dinov2_ckpt", default=os.environ.get("DINOV2_CKPT"))
    pb.add_argument("--pem_ckpt", default=os.environ.get("PEM_CKPT"))
    pb.add_argument("--shard", type=int, default=0)
    pb.add_argument("--num_shards", type=int, default=1)
    pb.add_argument("--merge_shards", action="store_true",
                    help="merge existing rank files instead of evaluating")
    pb.add_argument("--onboarding", default="pbr", choices=["pbr", "render"],
                    help="ISM template source: mined train_pbr crops (the "
                         "reference default, ISM_sam.yaml:28) or rendered "
                         "templates")
    pb.add_argument("--reset_descriptors", action="store_true")
    pb.set_defaults(fn=cmd_bop_eval)

    ps = sub.add_parser("stream",
                        help="multi-object continuous-feed serving: onboard "
                             "N CAD models, then process every rgb/depth "
                             "frame pair in --frames_dir")
    ps.add_argument("--cad_paths", nargs="+", required=True)
    ps.add_argument("--frames_dir", required=True,
                    help="directory of rgb*.png with matching depth*.png")
    ps.add_argument("--cam_path", required=True)
    ps.add_argument("--output_dir", default="outputs/stream")
    ps.add_argument("--max_frames", type=int, default=None)
    ps.add_argument("--no_overlap", action="store_true",
                    help="disable the double-buffered frame pipeline "
                         "(synchronous per-frame processing)")
    ps.add_argument("--proposals", type=int, default=None,
                    help="override the AMG proposal capacity (serving "
                         "latency scales with it; bench.py uses 128)")
    ps.add_argument("--det_score_thresh", type=float, default=0.2)
    ps.add_argument("--sam_ckpt", default=os.environ.get("SAM_CKPT"))
    ps.add_argument("--dinov2_ckpt", default=os.environ.get("DINOV2_CKPT"))
    ps.add_argument("--pem_ckpt", default=os.environ.get("PEM_CKPT"))
    ps.set_defaults(fn=cmd_stream)

    pv = sub.add_parser("verify-weights")
    pv.add_argument("--weights_dir", required=True)
    pv.add_argument("--output_dir", default="outputs/verify_weights")
    pv.add_argument("--example_dir",
                    default="/root/reference/SAM-6D/Data/Example")
    pv.add_argument("--record", default=None,
                    help="record a golden npz from this (trusted) run")
    pv.add_argument("--golden", default=None,
                    help="compare against a recorded golden npz")
    pv.set_defaults(fn=cmd_verify_weights)

    pt = sub.add_parser("train")
    pt.add_argument("--data_dir", required=True)
    pt.add_argument("--ckpt_dir", default="checkpoints/pem")
    pt.add_argument("--iters", type=int, default=600_000)
    pt.add_argument("--mae_ckpt", default=os.environ.get("MAE_CKPT"))
    pt.add_argument("--data_workers", type=int, default=8)
    pt.set_defaults(fn=cmd_train)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
