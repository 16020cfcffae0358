"""BOP benchmark evaluation drivers.

- ISM: per-frame proposal+matching over a dataset's test scenes, emitting
  BOP-23 coco json (reference `Instance_Segmentation_Model/run_inference.py`
  + detector.test_step/test_epoch_end :324-462). The reference distributes
  frames via PL-DDP and merges rank files; here frames stream through one
  jitted pipeline (shard across hosts by scene for multi-host sweeps —
  embarrassingly parallel, same merge contract).
- PEM: per-frame instance batches -> BOP19 csv (reference test_bop.py:99-241),
  with per-object template features onboarded once.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.bop import (BOPTestScene, discover_test_scenes, load_bop_objects,
                        PEMTestFrameLoader, BOPObject)
from ..ops.pointcloud import depth_to_pointcloud
from ..eval.bop_writer import (save_json_bop23, format_pose_row,
                               save_bop19_csv, category_id_for)
from .ism import ISMPipeline, detections_to_bop_json
from .pem import PEMPipeline, _bucket


def shard_path(path: str, shard: int, num_shards: int) -> str:
    """Per-rank output file (reference DDP rank files, detector.py:409-416:
    each rank writes its own npz set; rank 0 merges in test_epoch_end)."""
    if num_shards <= 1:
        return path
    base, ext = os.path.splitext(path)
    return f"{base}.shard{shard}of{num_shards}{ext}"


def merge_ism_shards(out_json: str, num_shards: int) -> List[Dict]:
    """Rank-0 merge of ISM shard jsons -> final json (reference
    test_epoch_end gather, detector.py:425-462)."""
    records: List[Dict] = []
    for i in range(num_shards):
        records.extend(json.load(open(shard_path(out_json, i, num_shards))))
    records.sort(key=lambda r: (r["scene_id"], r["image_id"]))
    save_json_bop23(out_json, records)
    return records


def merge_pem_shards(out_csv: str, num_shards: int) -> List[str]:
    """Rank-0 merge of PEM shard csvs -> final BOP19 csv."""
    rows: List[str] = []
    for i in range(num_shards):
        with open(shard_path(out_csv, i, num_shards)) as f:
            rows.extend(line.strip() for line in f.readlines()[1:] if line.strip())
    rows.sort(key=lambda r: (int(r.split(",")[0]), int(r.split(",")[1])))
    save_bop19_csv(out_csv, rows)
    return rows


def _owns(index: int, shard: int, num_shards: int) -> bool:
    return num_shards <= 1 or index % num_shards == shard


def run_ism_bop_eval(
    pipeline: ISMPipeline,
    dataset_dir: str,
    objects: List[BOPObject],
    out_json: str,
    dataset_name: str = "",
    max_frames: Optional[int] = None,
    shard: int = 0,
    num_shards: int = 1,
) -> List[Dict]:
    """Evaluate ISM on a BOP dataset split; returns + writes the records.
    With num_shards > 1 this rank processes frames whose global index
    i %% num_shards == shard and writes a rank file (merge_ism_shards
    combines them — the reference's PL-DDP rank-file contract)."""
    clouds = jnp.asarray(np.stack([
        o.sample_points(pipeline.cfg.matching.pointcloud_sample_num)
        for o in objects]))
    scenes = discover_test_scenes(dataset_dir)
    records: List[Dict] = []

    def frames():
        n = 0
        for scene in scenes:
            for im_id in scene.frame_ids():
                if max_frames is not None and n >= max_frames:
                    return
                if _owns(n, shard, num_shards):
                    yield im_id, scene.load_frame(im_id)
                n += 1

    # double-buffered frame IO: decode the next frame while the device
    # scores the current one (reference uses 16 DataLoader workers)
    from ..data.prefetch import iter_prefetched
    for im_id, frame in iter_prefetched(frames(), depth=2):
        t0 = time.time()
        result = pipeline.match_frame(
            frame["rgb"], frame["depth"], frame["K"],
            frame["depth_scale"], clouds, apply_nms_per_object=True)
        runtime = time.time() - t0
        recs = detections_to_bop_json(
            result, scene_id=frame["scene_id"], image_id=im_id,
            runtime=runtime)
        for r in recs:  # dataset-specific category remap (lmo)
            r["category_id"] = category_id_for(
                dataset_name, r["category_id"] - 1)
        records.extend(recs)
    save_json_bop23(shard_path(out_json, shard, num_shards), records)
    return records


def run_pem_bop_eval(
    pipeline: PEMPipeline,
    dataset_dir: str,
    objects: List[BOPObject],
    detections: List[Dict],
    out_csv: str,
    chunk_size: int = 16,
    max_frames: Optional[int] = None,
    shard: int = 0,
    num_shards: int = 1,
) -> List[str]:
    """Evaluate PEM given ISM detections; writes BOP19 csv rows (a rank
    file when num_shards > 1 — merge with merge_pem_shards)."""
    cfg = pipeline.cfg
    loader = PEMTestFrameLoader(
        objects, img_size=cfg.img_size,
        n_sample_observed=cfg.n_sample_observed_point,
        n_sample_template=cfg.n_sample_template_point,
        n_template_view=cfg.n_template_view,
        seg_filter_score=cfg.seg_filter_score,
        minimum_n_point=cfg.minimum_n_point)

    # onboard template features per object once (reference test_bop.py:117-119)
    obj_feats = []
    for obj in objects:
        tem = loader.template_views(obj)
        obj_feats.append(pipeline.onboard_templates(tem))

    grouped = loader.group_detections(detections)
    scenes = {s.scene_id: s for s in discover_test_scenes(dataset_dir)}
    rows: List[str] = []

    def frames():
        n = 0
        for fidx, ((scene_id, im_id), dets) in enumerate(sorted(grouped.items())):
            if max_frames is not None and n >= max_frames:
                return
            if not _owns(fidx, shard, num_shards):
                continue
            scene = scenes.get(scene_id)
            if scene is None:
                continue
            frame = scene.load_frame(im_id)
            # host preprocessing (RLE decode, crops, clouds) in the
            # prefetch thread so it overlaps the device forward
            whole_pts = np.asarray(depth_to_pointcloud(
                jnp.asarray(frame["depth"] * frame["depth_scale"] / 1000.0),
                jnp.asarray(frame["K"])))
            insts, kept = loader.assemble_instances(frame, dets, whole_pts)
            if not insts:
                continue
            yield scene_id, im_id, insts, kept
            n += 1

    from ..data.prefetch import iter_prefetched
    for scene_id, im_id, insts, kept in iter_prefetched(frames(), depth=2):
        # time from the moment the frame is in hand (prefetch lead excluded),
        # matching run_ism_bop_eval's convention for the BOP19 time column
        t0 = time.time()
        # chunk instances (reference test_bop.py:130-135)
        for c0 in range(0, len(insts), chunk_size):
            chunk = insts[c0:c0 + chunk_size]
            kept_chunk = kept[c0:c0 + chunk_size]
            B = _bucket(len(chunk), cap=chunk_size)
            pad = B - len(chunk)

            def stack(key_, dtype=np.float32):
                arr = np.stack([i[key_] for i in chunk]).astype(dtype)
                if pad:
                    arr = np.concatenate([arr, np.repeat(arr[-1:], pad, 0)])
                return jnp.asarray(arr)

            model_pts = np.stack([
                objects[i["obj_idx"]].sample_points(cfg.n_sample_model_point)
                for i in chunk])
            if pad:
                model_pts = np.concatenate(
                    [model_pts, np.repeat(model_pts[-1:], pad, 0)])
            def tem_stack(key_):
                return jnp.stack(
                    [obj_feats[i["obj_idx"]][key_] for i in chunk]
                    + [obj_feats[chunk[-1]["obj_idx"]][key_]] * pad)

            inputs = dict(
                rgb=stack("rgb"), rgb_choose=stack("rgb_choose", np.int32),
                pts=stack("pts"), model=jnp.asarray(model_pts),
                **{k: tem_stack(k) for k in obj_feats[0]})
            out = pipeline.infer_batch(inputs, seed=1)
            dt = time.time() - t0
            R = np.asarray(out["pred_R"])[:len(chunk)]
            t = np.asarray(out["pred_t"])[:len(chunk)] * 1000.0
            score = np.asarray(out["pred_pose_score"])[:len(chunk)]
            for i, det in enumerate(kept_chunk):
                rows.append(format_pose_row(
                    scene_id, im_id, int(det["category_id"]),
                    float(score[i] * det["score"]), R[i], t[i],
                    dt + float(det.get("time", 0.0))))
    save_bop19_csv(shard_path(out_csv, shard, num_shards), rows)
    return rows
