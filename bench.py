"""End-to-end frame benchmark on one TPU chip.

Simulates the full SAM-6D inference frame at the reference operating point
(BASELINE.md): SAM ViT-H encode + fused AMG tail (3072 candidates -> top-K
masks), DINOv2-L descriptors + three-score matching, and the PEM pose
network for a 16-instance batch — random weights (latency is
weight-independent).

Timing methodology: the tunnel adds variable per-dispatch overhead and
wrapping models in repetition loops explodes the remote compile, so each
stage is timed as median(dispatch + checksum sync) with the independently
measured sync overhead of a trivial kernel subtracted.

Prints ONE json line:
  {"metric": "e2e_frame_ms", "value": ..., "unit": "ms", "vs_baseline": ...}
vs_baseline = (150 ms target from BASELINE.json north star) / measured.
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: the tunnel makes on-device compiles slow;
# cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REPS = int(os.environ.get("BENCH_REPS", "9"))


def init_like(init_fn):
    """Shapes from eval_shape, constant-filled params (latency benchmarking
    only cares about shapes; skips the init program's remote compile)."""
    shapes = jax.eval_shape(init_fn)
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)
_T0 = time.time()


def _log(msg):
    import sys
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_overhead_s = None


def _dispatch_overhead():
    """Median cost of dispatching + syncing a trivial kernel."""
    global _overhead_s
    if _overhead_s is None:
        x = jnp.ones((8, 128))
        tiny = jax.jit(lambda x, i: jnp.sum(x) + i)
        float(tiny(x, 0.0))
        ts = []
        for i in range(12):
            t0 = time.perf_counter()
            float(tiny(x, float(i)))
            ts.append(time.perf_counter() - t0)
        _overhead_s = sorted(ts)[len(ts) // 2]
        _log(f"dispatch overhead: {_overhead_s*1e3:.1f} ms")
    return _overhead_s


def timed(body_fn, n=REPS):
    """body_fn(i) -> device scalar; returns median seconds per evaluation
    with the measured dispatch/sync overhead subtracted."""
    overhead = _dispatch_overhead()
    _log("compiling...")
    float(jnp.asarray(body_fn(0)))
    _log("compiled + warm")
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(jnp.asarray(body_fn(i + 1)))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    return max(med - overhead, 1e-6)


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
        # production pipelines cache the template PE + coarse trunk at
        # onboarding (batch-1, broadcast lazily inside the program)
        pe_o=jnp.asarray(rng.rand(1, NF, cfg.fine.hidden_dim).astype(np.float32)),
        sparse_po=jnp.asarray((rng.rand(1, cfg.coarse_npoint, 3) - 0.5).astype(np.float32)),
        sparse_fo=jnp.asarray(rng.rand(1, cfg.coarse_npoint, cfg.vit.out_dim).astype(np.float32)),
        fps_idx_o=jnp.asarray(rng.randint(0, NF, (1, cfg.coarse_npoint)).astype(np.int32)),
        geo_o=jnp.asarray(rng.rand(
            1, cfg.coarse_npoint + 1, cfg.coarse_npoint + 1,
            cfg.geo_embedding.hidden_dim).astype(np.float32)),
    )
    variables = init_like(lambda: net.init(
        {"params": jax.random.PRNGKey(0)}, inputs, jax.random.PRNGKey(0)))
    if dtype == jnp.bfloat16:
        from sam6d_tpu.core.params import cast_float_params
        variables = cast_float_params(variables, dtype)
    key = jax.random.PRNGKey(0)
    fwd = jax.jit(lambda v, i, k: jnp.sum(net.apply(v, i, k)["pred_R"]))

    def body(i):
        inp = dict(inputs, rgb=inputs["rgb"] + i * 1e-6)
        return fwd(variables, inp, jax.random.fold_in(key, i))

    return timed(body)


def bench_seg(dtype, proposals: int):
    from sam6d_tpu.core.config import SAMConfig
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor

    cfg = SAMConfig(max_proposals=proposals, pred_iou_thresh=-10.0,
                    stability_score_thresh=0.0)
    seg = SAMSegmentor(cfg, variables="eval_shape", dtype=dtype)
    rng = np.random.RandomState(0)
    frame = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    canvas, _, (hs, ws), (h_in, w_in) = seg.preprocess_frame(frame)
    Ry, Rx, pts = seg.frame_constants(hs, ws, h_in, w_in)
    canvas_j = jnp.asarray(canvas[None])

    def run(v, c):
        # consume EVERY output: summing only boxes lets XLA dead-code the
        # (K, Hs, Ws) mask materialization and under-reports the stage by
        # ~90 ms (discovered round 3 — probe programs must consume all
        # outputs to measure the production program)
        masks, boxes, valid, iou = seg._propose_impl(
            v, seg.encoder.apply(v["image_encoder"], c)[0],
            pts, Ry, Rx, hs, ws, h_in, w_in)
        return (jnp.sum(masks) + jnp.sum(boxes) + jnp.sum(valid)
                + jnp.sum(iou))
    prog = jax.jit(run)

    def body(i):
        return prog(seg.vars, canvas_j + i * 1e-6)

    return timed(body)


def bench_fastsam(dtype):
    """The reference's fast segmentor backend (FastSAM-x / YOLOv8x-seg):
    fused predict + NMS + proto-mask assembly, consume-everything."""
    from sam6d_tpu.pipelines.fastsam import FastSAMSegmentor

    seg = FastSAMSegmentor(dtype=dtype)
    rng = np.random.RandomState(0)
    canvas = jnp.asarray(rng.rand(1, seg.cfg.imgsz, seg.cfg.imgsz, 3)
                         .astype(np.float32))

    def run(v, c):
        boxes, scores, keep, m = seg._predict_impl(v, c, h_in=480, w_in=640)
        return (jnp.sum(boxes) + jnp.sum(scores) + jnp.sum(keep)
                + jnp.sum(m))

    prog = jax.jit(run)

    def body(i):
        return prog(seg.vars, canvas + i * 1e-6)

    return timed(body)


def bench_dino_match(dtype, proposals: int):
    from sam6d_tpu.core.config import ISMConfig, SAMConfig
    from sam6d_tpu.pipelines.ism import ISMPipeline

    cfg = ISMConfig(sam=SAMConfig(max_proposals=proposals))
    pipe = ISMPipeline(cfg, dinov2_variables="eval_shape", dtype=dtype)
    rng = np.random.RandomState(0)
    H, W = 480, 640
    rgb01 = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    masks = jnp.asarray((rng.rand(proposals, H, W) > 0.9).astype(np.float32))
    boxes = np.zeros((proposals, 4), np.float32)
    boxes[:, 0] = rng.randint(0, W // 2, proposals)
    boxes[:, 1] = rng.randint(0, H // 2, proposals)
    boxes[:, 2] = boxes[:, 0] + rng.randint(20, W // 2, proposals)
    boxes[:, 3] = boxes[:, 1] + rng.randint(20, H // 2, proposals)
    boxes = jnp.asarray(boxes)
    valid = jnp.ones((proposals,), bool)
    depth = jnp.asarray((rng.rand(H, W) * 1000).astype(np.float32))
    K = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32))
    d = cfg.dinov2
    ref_desc = jnp.asarray(rng.rand(1, 42, d.embed_dim).astype(np.float32))
    n_patch = (d.img_size // d.patch_size) ** 2
    ref_appe = jnp.asarray(rng.rand(1, 42, n_patch, d.embed_dim).astype(np.float32))
    poses_R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (42, 1, 1)))
    clouds = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 0.05)

    prog = jax.jit(lambda v, r, va: jnp.sum(pipe._score_frame_impl(
        v, r, masks, boxes, va, depth, K, jnp.float32(1.0),
        ref_desc, ref_appe, poses_R, clouds, apply_nms=True)["scores"]))

    t_full = timed(lambda i: prog(pipe.dinov2_vars, rgb01 + i * 1e-6, valid))
    # realistic load: the describe cost scales with the valid-proposal count
    # (dynamic-trip-count chunks; the reference's cost model) — report the
    # 48-detection point as a diagnostic extra
    valid48 = jnp.asarray(np.arange(proposals) < 48)
    t_48 = timed(lambda i: prog(pipe.dinov2_vars, rgb01 + i * 1e-6, valid48))
    return t_full, t_48


def bench_e2e_measured(dtype, proposals: int = 128, pinned_valid: int = 48,
                       pem_dets: int = 16, frames: int = 8):
    """Measured TRUE end-to-end frame + streaming cadence (VERDICT r4 item 2).

    One synchronous whole-frame path — device AMG (encoder + fused tail) ->
    fused describe/score -> host transfer + RLE + instance prep -> batched
    PEM — timed as raw wall-clock per frame, like the reference's per-frame
    instrumentation (model/detector.py:391-398, test_bop.py:160-165). Then
    the same stack through MultiObjectStream.process_stream (1 frame in
    flight) for the steady-state completion-to-completion p50/p95.

    Load pinning (weights here are eval-shape constants; latency is
    weight-independent but DETECTION COUNTS are not, so the load is pinned
    to the benchmark operating point instead of letting degenerate
    constant-weight masks collapse the host tail): the describe/score pass
    runs on the first `pinned_valid` proposal slots (typical-48), and the
    PEM stage receives `pem_dets` detections whose masks are synthetic
    random blobs at full resolution (realistic RLE/instance-prep content).
    Every device program and every host component still runs at its real
    production shape.

    Returns (e2e_median_s, stream dict)."""
    import jax
    from sam6d_tpu.core.config import ISMConfig, PEMConfig, SAMConfig
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.pipelines.ism import ISMPipeline
    from sam6d_tpu.pipelines.pem import PEMPipeline
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.pipelines.streaming import MultiObjectStream
    from sam6d_tpu.render.poses import template_obj_poses

    rng = np.random.RandomState(0)
    H, W = 480, 640

    sam_cfg = SAMConfig(max_proposals=proposals, pred_iou_thresh=-10.0,
                        stability_score_thresh=0.0)
    seg = SAMSegmentor(sam_cfg, variables="eval_shape", dtype=dtype)
    cfg = ISMConfig(sam=sam_cfg)
    ism = ISMPipeline(cfg, dinov2_variables="eval_shape", segmentor=seg,
                      dtype=dtype)

    pc = PEMConfig()
    S, NF = pc.img_size, pc.fine_npoint
    net = PEMNet(pc, dtype=dtype)
    dummy = dict(
        rgb=jnp.zeros((1, S, S, 3), jnp.float32),
        rgb_choose=jnp.zeros((1, NF), jnp.int32),
        pts=jnp.ones((1, NF, 3), jnp.float32),
        model=jnp.ones((1, pc.n_sample_model_point, 3), jnp.float32),
        dense_po=jnp.ones((1, NF, 3), jnp.float32),
        dense_fo=jnp.ones((1, NF, pc.vit.out_dim), jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    params = init_like(lambda: net.init({"params": key}, dummy, key))
    pem = PEMPipeline(pc, params=params, dtype=dtype)

    # ---- onboarding (one object; excluded from per-frame timing, as in
    # production serving)
    d = cfg.dinov2
    n_patch = (d.img_size // d.patch_size) ** 2
    desc = jnp.asarray(rng.rand(1, 42, d.embed_dim).astype(np.float32))
    appe = jnp.asarray(
        rng.rand(1, 42, n_patch, d.embed_dim).astype(np.float32))
    poses_R = jnp.asarray(
        template_obj_poses(0)[:, :3, :3].astype(np.float32))
    cloud = jnp.asarray(rng.rand(1, 2048, 3).astype(np.float32) * 0.05)
    V = pc.n_template_view
    tem = dict(
        rgb=rng.rand(V, S, S, 3).astype(np.float32),
        choose=rng.randint(0, S * S, (V, NF)).astype(np.int32),
        pts=((rng.rand(V, NF, 3) - 0.5) * 0.1).astype(np.float32),
    )
    _log("e2e: onboarding templates (one-time)")
    templates = pem.onboard_templates(tem)
    model_pts = jnp.asarray(
        ((rng.rand(pc.n_sample_model_point, 3) - 0.5) * 0.08)
        .astype(np.float32))

    stream = MultiObjectStream(ism, pem, det_score_thresh=-1.0)
    stream._objs.append(dict(obj_id=1, cls=desc[0], appe=appe[0],
                             poses_R=poses_R, templates=templates,
                             model=model_pts, cloud=cloud[0]))

    # ---- load pinning (see docstring)
    pin = jnp.asarray(np.arange(proposals) < pinned_valid)
    orig_score = ism._score_frame

    def pinned_score(v, rgb01, masks, boxes, valid, *rest, **kw):
        return orig_score(v, rgb01, masks, boxes, pin, *rest, **kw)

    ism._score_frame = pinned_score

    synth = np.zeros((proposals, H, W), np.float32)
    for i in range(proposals):
        y0, x0 = rng.randint(0, H - 80), rng.randint(0, W - 80)
        h, w = rng.randint(40, 80), rng.randint(40, 80)
        blob = (rng.rand(h, w) > 0.15).astype(np.float32)  # holes: real RLE
        synth[i, y0:y0 + h, x0:x0 + w] = blob
    synth_dev = jax.device_put(jnp.asarray(synth))
    det_valid = jnp.asarray(np.arange(proposals) < pem_dets)
    orig_mfd = ism.match_frame_device

    def pinned_mfd(*a, **kw):
        out = orig_mfd(*a, **kw)
        out["valid"] = det_valid
        out["masks"] = synth_dev  # same shape/dtype/bytes as the real stack
        return out

    ism.match_frame_device = pinned_mfd

    # ---- frames
    frame_data = []
    for f in range(4):
        rgb = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        depth = (rng.rand(H, W) * 400 + 400).astype(np.float32)
        frame_data.append((rgb, depth))
    Kmat = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]],
                    np.float32)

    _log("e2e: compiling (first frame)")
    stream.process_frame(*frame_data[0], Kmat, 1.0, seed=0)
    _log("e2e: warm; measuring synchronous frames")
    times = []
    for i in range(frames):
        rgb, depth = frame_data[i % len(frame_data)]
        t0 = time.perf_counter()
        stream.process_frame(rgb, depth, Kmat, 1.0, seed=i + 1)
        times.append(time.perf_counter() - t0)
    e2e_s = sorted(times)[len(times) // 2]
    _log(f"e2e measured (sync): {e2e_s*1e3:.1f} ms")
    tmg = getattr(stream, "last_timing", {})
    if tmg:
        _log("e2e host-tail breakdown: " + ", ".join(
            f"{k}={v:.1f}" for k, v in tmg.items()))

    # ---- streaming steady state (fresh stats); depth 2 overlaps frame
    # t's transfers/host tail with frame t+1's device compute (depth 1
    # leaves the pull of t blocking out t's whole device time)
    best = None
    for depth in (1, 2):
        stream.stats = dict(frames=0, detections=0, poses=0, seconds=0.0)
        stream._frame_s = []
        stream._last_done = None
        feed = [(frame_data[i % len(frame_data)][0],
                 frame_data[i % len(frame_data)][1], Kmat, 1.0)
                for i in range(frames + 4)]
        for _ in stream.process_stream(feed, depth_in_flight=depth):
            pass
        tp = stream.throughput()
        tp["depth_in_flight"] = depth
        _log(f"stream depth={depth}: p50 {tp.get('p50_ms')} ms, "
             f"p95 {tp.get('p95_ms')} ms")
        if best is None or (tp.get("p50_ms") or 1e9) < (best.get("p50_ms")
                                                        or 1e9):
            best = tp
    return e2e_s, best


def main():
    mode = os.environ.get("BENCH_MODE", "full")
    proposals = int(os.environ.get("BENCH_PROPOSALS", "128"))
    instances = int(os.environ.get("BENCH_INSTANCES", "16"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))

    _log("stage: pem")
    t_pem = bench_pem(dtype, instances)
    _log(f"pem: {t_pem*1e3:.1f} ms")
    if mode == "pem" or time.time() - _T0 > budget:
        ms = t_pem * 1e3
        print(json.dumps({"metric": "pem_batch16_ms", "value": round(ms, 2),
                          "unit": "ms", "vs_baseline": round(150.0 / ms, 3)}))
        return

    extras = {"pem_ms": round(t_pem * 1e3, 2)}
    total = t_pem
    covered = "pem"
    for name, fn in [("seg", lambda: bench_seg(dtype, proposals)),
                     ("match", lambda: bench_dino_match(dtype, proposals))]:
        if time.time() - _T0 > budget:
            _log(f"budget exceeded before {name}")
            break
        _log(f"stage: {name}")
        try:
            t = fn()
        except Exception as e:  # always emit a metric line for the driver
            _log(f"{name} FAILED: {type(e).__name__}: {e}")
            break
        if name == "match":
            t, t48 = t
            extras["match_valid48_ms"] = round(t48 * 1e3, 2)
            _log(f"match (48 valid): {t48*1e3:.1f} ms")
        _log(f"{name}: {t*1e3:.1f} ms")
        extras[f"{name}_ms"] = round(t * 1e3, 2)
        total += t
        covered += f"+{name}"

    if (covered == "pem+seg+match" and time.time() - _T0 < budget
            and os.environ.get("BENCH_E2E", "1") == "1"):
        _log("stage: e2e measured + streaming")
        try:
            e2e_s, tp = bench_e2e_measured(dtype, proposals)
            extras["e2e_measured_ms"] = round(e2e_s * 1e3, 2)
            if tp.get("p50_ms"):
                extras["stream_p50_ms"] = tp["p50_ms"]
                extras["stream_p95_ms"] = tp["p95_ms"]
                extras["stream_vs_sync"] = round(
                    tp["p50_ms"] / (e2e_s * 1e3), 3)
        except Exception as e:
            _log(f"e2e measured FAILED: {type(e).__name__}: {e}")

    if covered == "pem+seg+match" and time.time() - _T0 < budget:
        _log("stage: fastsam (diagnostic)")
        try:
            t_fs = bench_fastsam(dtype)
            extras["seg_fastsam_ms"] = round(t_fs * 1e3, 2)
            _log(f"fastsam: {t_fs*1e3:.1f} ms")
        except Exception as e:
            _log(f"fastsam FAILED: {type(e).__name__}: {e}")

    metric = "e2e_frame_ms" if covered == "pem+seg+match" else f"{covered}_ms"
    ms = total * 1e3
    line = {"metric": metric, "value": round(ms, 2), "unit": "ms",
            "vs_baseline": round(150.0 / ms, 3)}
    line.update(extras)
    if covered == "pem+seg+match" and "match_valid48_ms" in extras:
        # representative BOP-scene load: the describe cost scales with the
        # dynamic detection count (48 here), like the reference's own
        # per-frame cost model; seg and pem are capacity-fixed
        line["e2e_frame_typical48_ms"] = round(
            extras["pem_ms"] + extras["seg_ms"]
            + extras["match_valid48_ms"], 2)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
