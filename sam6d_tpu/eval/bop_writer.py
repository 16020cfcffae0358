"""BOP result writers, byte-compatible with the reference outputs.

- ISM: BOP-23 coco-style json (reference utils/inout.py save_json_bop23 :56-58
  + model/utils.py convert_npz_to_json :199-216) — see
  pipelines/ism.detections_to_bop_json for record assembly.
- PEM: BOP19 csv rows `scene_id,im_id,obj_id,score,R,t,time`
  (reference test_bop.py:166-176).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

# lmo skips object ids {3, 7}; category remap (reference model/utils.py)
LMO_OBJECT_IDS = [1, 5, 6, 8, 9, 10, 11, 12]


def category_id_for(dataset_name: str, object_index: int) -> int:
    if dataset_name == "lmo":
        return LMO_OBJECT_IDS[object_index]
    return object_index + 1


def save_json_bop23(path: str, detections: List[Dict]) -> None:
    """Sorted-by-score json list (reference inout.py:56-58 keeps the raw
    list; ordering preserved)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(detections, f)


def format_pose_row(scene_id: int, im_id: int, obj_id: int, score: float,
                    R: np.ndarray, t: np.ndarray, time_s: float) -> str:
    """One BOP19 csv row. R row-major 9 floats (space-separated), t in mm."""
    R = np.asarray(R).reshape(9)
    t = np.asarray(t).reshape(3)
    return "{},{},{},{},{},{},{}".format(
        scene_id, im_id, obj_id, float(score),
        " ".join(f"{v:.8f}" for v in R),
        " ".join(f"{v:.8f}" for v in t),
        time_s)


def save_bop19_csv(path: str, rows: List[str]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("scene_id,im_id,obj_id,score,R,t,time\n")
        for r in rows:
            f.write(r + "\n")
