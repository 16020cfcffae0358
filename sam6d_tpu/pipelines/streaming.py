"""Multi-object streaming serving: N CAD models x a continuous RGB-D feed.

BASELINE config 5. The reference pipeline processes one object per run
(`run_inference_custom.py` takes a single --cad_path); production serving
wants every onboarded object matched and posed per frame. Here:

- onboarding stacks every object's ISM template descriptors
  (`ISMPipeline.set_reference_data` — the scoring program is natively
  multi-object, reference detector.set_reference_objects) and the PEM
  template features/positional encodings into (O, ...) arrays;
- per frame: one AMG pass, one fused multi-object ISM scoring dispatch
  (argmax over objects + per-object NMS), then ONE batched PEM dispatch
  with per-detection templates gathered on device by object index
  (`PEMPipeline.run_frame_multi`).

Frame cost is therefore independent of the number of onboarded objects
everywhere except the (O-indexed) score matrix and the template gathers.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


def _pow2_bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)

from .ism import ISMPipeline
from .pem import PEMPipeline
from ..ops.masks import rle_encode_coco


class MultiObjectStream:
    """Onboard-once, stream-frames serving driver."""

    def __init__(self, ism: ISMPipeline, pem: PEMPipeline,
                 det_score_thresh: float = 0.2):
        self.ism = ism
        self.pem = pem
        self.det_score_thresh = det_score_thresh
        self._objs: List[Dict] = []
        self._finalized = False
        self.stats = dict(frames=0, detections=0, poses=0, seconds=0.0)
        self._frame_s: List[float] = []  # steady-state per-frame cadence
        self._pending: List = []         # submitted, not yet completed
        self._last_done: Optional[float] = None

    # ------------------------------------------------------------ onboarding

    def onboard_object(self, obj_id, template_dir: str,
                       model_points: np.ndarray,
                       num_templates: int = 42,
                       poses: Optional[np.ndarray] = None,
                       ism_points: Optional[np.ndarray] = None) -> None:
        """Register one object from its rendered template dir (demo-style
        rgb_*.png / mask_*.png / xyz_*.npy views) + CAD sample points
        (meters, n_sample_model_point rows). `ism_points` optionally uses
        a different (usually denser) cloud for the ISM geometric score."""
        assert not self._finalized, "onboard before the first frame"
        ref = self.ism.onboard_templates_from_dir(
            template_dir, num_templates=num_templates, poses=poses)
        tem = self.pem.load_template_views(template_dir)
        templates = self.pem.onboard_templates(tem)
        ism_pts = model_points if ism_points is None else ism_points
        self._objs.append(dict(
            obj_id=obj_id,
            cls=ref["descriptors"][0],
            appe=ref["appe_descriptors"][0],
            poses_R=ref["poses_R"],
            templates=templates,
            model=jnp.asarray(model_points.astype(np.float32)),
            cloud=jnp.asarray(ism_pts.astype(np.float32)),
        ))

    def _finalize(self) -> None:
        if self._finalized:
            return
        assert self._objs, "no objects onboarded"
        # per-object template pose sets: collapse to (T,3,3) when every
        # object shares one set, else pass the (O,T,3,3) stack so the
        # viewpoint-dependent geometric score uses each object's own poses
        poses = [np.asarray(o["poses_R"]) for o in self._objs]
        if all(p.shape == poses[0].shape and np.array_equal(p, poses[0])
               for p in poses[1:]):
            poses_R = self._objs[0]["poses_R"]
        else:
            assert all(p.shape == poses[0].shape for p in poses), \
                "onboarded objects must use the same number of template views"
            poses_R = jnp.stack([jnp.asarray(p) for p in poses])
        self.ism.set_reference_data(
            jnp.stack([o["cls"] for o in self._objs]),
            jnp.stack([o["appe"] for o in self._objs]),
            poses_R)
        self._clouds = jnp.stack([o["cloud"] for o in self._objs])
        self._model_all = jnp.stack([o["model"] for o in self._objs])
        self._templates_all = {
            k: jnp.stack([o["templates"][k] for o in self._objs])
            for k in self._objs[0]["templates"]}
        self._finalized = True

    # --------------------------------------------------------------- serving

    def submit_frame(self, rgb: np.ndarray, depth: np.ndarray,
                     K: np.ndarray, depth_scale: float = 1.0,
                     seed: int = 1) -> None:
        """Dispatch the device-side chain (AMG + fused multi-object
        scoring) for one frame and enqueue it for complete_frame(). JAX
        dispatch is asynchronous: this returns once the programs are
        enqueued, before any result exists — the device crunches this
        frame while the host completes the previous one."""
        self._finalize()
        t0 = time.time()
        dev = self.ism.match_frame_device(rgb, depth, K, depth_scale,
                                          self._clouds,
                                          apply_nms_per_object=True)
        self._pending.append((dev, rgb, depth, K, depth_scale, seed, t0))

    def complete_frame(self) -> Dict:
        """Block on the oldest submitted frame's device results, run the
        host-side tail (detection assembly, RLE, PEM batch) and account
        stats. Returns dict(detections, poses, ms)."""
        dev, rgb, depth, K, depth_scale, seed, t0 = self._pending.pop(0)
        # transfer the small outputs first, then gather ONLY the surviving
        # masks on device before pulling them across: the full capacity
        # stack is ~39 MB/frame (128 x 480 x 640) while typical frames keep
        # a few dozen — the gather is bucketed (power of two) so its
        # program compiles once per bucket, not per count
        result = {k: np.asarray(v) for k, v in dev.items() if k != "masks"}
        idx = np.where(result["valid"])[0]
        if len(idx):
            bucket = _pow2_bucket(len(idx), int(dev["masks"].shape[0]))
            idx_pad = np.zeros(bucket, np.int32)
            idx_pad[:len(idx)] = idx
            sel = np.asarray(jnp.take(dev["masks"], jnp.asarray(idx_pad),
                                      axis=0))[:len(idx)]
        else:
            sel = np.zeros((0, *dev["masks"].shape[1:]), np.uint8)
        dets = []
        for j, i in enumerate(idx):
            mask = (sel[j] > 0.5).astype(np.uint8)
            dets.append(dict(
                object_id=int(result["object_ids"][i]),
                score=float(result["scores"][i]),
                bbox=[float(x) for x in result["boxes"][i]],
                segmentation=rle_encode_coco(mask),
                mask=mask,  # raw mask rides along so PEM skips the decode
            ))
        poses, _ = self.pem.run_frame_multi(
            rgb, depth, K, depth_scale, dets,
            self._model_all, self._templates_all,
            det_score_thresh=self.det_score_thresh, seed=seed)
        now = time.time()
        # steady-state cadence: completion-to-completion interval (the
        # serving metric under pipelining; equals per-frame latency in the
        # synchronous path); first frame = compile warm-up
        if self.stats["frames"] == 0:
            self.stats["first_frame_s"] = now - t0
            self.stats["seconds"] += now - t0
        else:
            self._frame_s.append(now - self._last_done)
            self.stats["seconds"] += self._frame_s[-1]
        self._last_done = now
        self.stats["frames"] += 1
        self.stats["detections"] += len(dets)
        self.stats["poses"] += len(poses)
        for p in poses:
            p["object_id"] = self._objs[p["object_id"]]["obj_id"]
        return dict(detections=dets, poses=poses, ms=(now - t0) * 1e3)

    def process_frame(self, rgb: np.ndarray, depth: np.ndarray,
                      K: np.ndarray, depth_scale: float = 1.0,
                      seed: int = 1) -> Dict:
        """One RGB-D frame -> dict(detections, poses, ms), synchronous
        (submit + complete back to back). Detections carry the onboarded
        object ids; poses are one dict per surviving detection (R
        row-major, t in mm, fused ISM*PEM score)."""
        self.submit_frame(rgb, depth, K, depth_scale, seed)
        return self.complete_frame()

    def process_stream(self, frames, depth_in_flight: int = 1):
        """Pipelined serving over an iterable of (rgb, depth, K,
        depth_scale) tuples: keeps `depth_in_flight` frames' device work
        in flight, so frame t+1's AMG + scoring run on-device while the
        host blocks on frame t's transfers and drives its PEM tail.
        Steady-state cadence approaches max(device, host) instead of
        their sum. Yields one result dict per frame, in order."""
        for item in frames:
            self.submit_frame(*item)
            while len(self._pending) > depth_in_flight:
                yield self.complete_frame()
        while self._pending:
            yield self.complete_frame()

    def throughput(self) -> Dict:
        """Steady-state stats exclude the first frame (compile warm-up)."""
        s = self.stats
        warm_frames = max(s["frames"] - 1, 0)
        warm_s = s["seconds"] - s.get("first_frame_s", 0.0)
        out = dict(frames=s["frames"], poses=s["poses"],
                   first_frame_ms=round(1e3 * s.get("first_frame_s", 0.0), 1))
        if warm_frames:
            out["fps"] = round(warm_frames / max(warm_s, 1e-9), 3)
            out["ms_per_frame"] = round(1e3 * warm_s / warm_frames, 2)
        else:
            out["fps"] = 0.0
            out["ms_per_frame"] = 0.0
        # latency SLO percentiles over the steady-state frames (serving
        # contracts are per-frame tail latency, not throughput)
        if self._frame_s:
            ms = np.sort(np.asarray(self._frame_s)) * 1e3
            out["p50_ms"] = round(float(np.percentile(ms, 50)), 2)
            out["p95_ms"] = round(float(np.percentile(ms, 95)), 2)
            out["p99_ms"] = round(float(np.percentile(ms, 99)), 2)
        return out

    def check_latency_slo(self, p95_budget_ms: float) -> Dict:
        """Assertable SLO summary: steady-state p95 against a budget."""
        tp = self.throughput()
        p95 = tp.get("p95_ms")
        return dict(p95_ms=p95, budget_ms=p95_budget_ms,
                    ok=p95 is not None and p95 <= p95_budget_ms)
