"""Mask utilities: RLE codecs (host), boxes, IoU, fixed-capacity NMS.

Parity targets:
- `Instance_Segmentation_Model/model/utils.py` mask_to_rle (:25-43) — BOP
  Fortran-order uncompressed counts.
- pycocotools-compatible compressed RLE strings (the ISM→PEM json boundary,
  `run_inference_custom.py:199-203`) — implemented natively since pycocotools
  is not a dependency.
- compute_iou (`utils/bbox_utils.py:197-222`), per-object NMS
  (`model/utils.py:107-119`) — the NMS here is a fixed-capacity masked
  formulation that jits (no data-dependent survivor counts).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ RLE host

def mask_to_rle_counts(mask: np.ndarray) -> Dict:
    """Binary (H, W) -> {'counts': [...], 'size': [H, W]} in Fortran order,
    starting with the zero-run (BOP json format; reference model/utils.py:25-43).
    """
    flat = np.asarray(mask, bool).flatten(order="F")
    # run-length encode with leading zero-count
    diffs = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], diffs, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return {"counts": counts, "size": list(mask.shape)}


def rle_counts_to_mask(rle: Dict) -> np.ndarray:
    """Inverse of mask_to_rle_counts (reference data_utils.py:72-89)."""
    h, w = rle["size"]
    counts = rle["counts"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos:pos + c] = True
        pos += c
        val = not val
    return flat.reshape((h, w), order="F")


def rle_encode_coco(mask: np.ndarray) -> Dict:
    """Binary (H, W) -> COCO compressed RLE {'counts': str, 'size': [H, W]}
    (pycocotools LEB128-variant; 5 bits/char, +48, delta for i>2)."""
    rle = mask_to_rle_counts(mask)
    cnts = rle["counts"]
    out = []
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return {"counts": "".join(out), "size": rle["size"]}


def rle_decode_coco(rle: Dict) -> np.ndarray:
    """Decode COCO RLE: compressed string or uncompressed counts list."""
    counts = rle["counts"]
    if isinstance(counts, (list, tuple)):
        return rle_counts_to_mask(rle)
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    cnts: List[int] = []
    i = 0
    while i < len(counts):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(counts[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k + 5)
            k += 1
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return rle_counts_to_mask({"counts": cnts, "size": rle["size"]})


# ------------------------------------------------------------- device masked

def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) binary -> (N, 4) xyxy boxes; empty masks -> zeros
    (reference amg.batched_mask_to_box semantics)."""
    N, H, W = masks.shape
    m = masks > 0
    any_row = jnp.any(m, axis=2)  # (N, H)
    any_col = jnp.any(m, axis=1)  # (N, W)
    rows = jnp.arange(H)
    cols = jnp.arange(W)
    y1 = jnp.min(jnp.where(any_row, rows, H), axis=1)
    y2 = jnp.max(jnp.where(any_row, rows, -1), axis=1)
    x1 = jnp.min(jnp.where(any_col, cols, W), axis=1)
    x2 = jnp.max(jnp.where(any_col, cols, -1), axis=1)
    empty = ~jnp.any(any_row, axis=1)
    box = jnp.stack([x1, y1, x2 + 1, y2 + 1], axis=1).astype(jnp.float32)
    return jnp.where(empty[:, None], 0.0, box)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) xyxy -> (N, M) IoU (reference bbox_utils.compute_iou)."""
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def mask_iou_matrix(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) binary -> (N, N) mask IoU (used by per-object NMS)."""
    m = (masks > 0).astype(jnp.float32).reshape(masks.shape[0], -1)
    inter = m @ m.T
    area = jnp.sum(m, axis=1)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


@partial(jax.jit, static_argnames=("unroll_rounds",))
def nms_masked(
    iou: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    same_group: jnp.ndarray,
    thresh: float,
    unroll_rounds: int = 0,
) -> jnp.ndarray:
    """Greedy NMS over a fixed-capacity set, returning a keep mask.

    iou: (N, N) pairwise overlap; same_group: (N, N) bool (e.g. same
    object id — reference applies NMS per object id, model/utils.py:107-119).

    Exactly reproduces sequential greedy NMS, but NOT as an N-step
    sequential loop (3072 tiny fori_loop steps cost ~100 ms on TPU —
    measured as the dominant term of the AMG tail). Instead a parallel
    fixed-point over decision states in score-rank space: each round, a
    candidate is KEPT if every higher-ranked overlapping candidate is
    already suppressed, and SUPPRESSED if some higher-ranked kept
    candidate overlaps it. The highest-ranked undecided candidate always
    has all its predecessors decided, so every round decides at least one
    candidate and the loop terminates in at most `longest suppression
    chain` rounds (typically < 10); each round is one (N, N) masked
    reduction on the VPU.
    """
    N = scores.shape[0]
    # precedence DIRECTLY in unsorted space: j precedes i iff
    # (score_j, -j) > (score_i, -i) lexicographically — identical to the
    # stable argsort(-score) rank order, with zero gathers. (The sorted
    # formulation's iou[order][:, order] double gather cost ~90 ms at
    # N=3072 inside the fused AMG program; probe amg.fused_score_nms.)
    s = jnp.where(valid, scores, -jnp.inf)
    idx = jnp.arange(N)
    beats = (s[None, :] > s[:, None]) | (
        (s[None, :] == s[:, None]) & (idx[None, :] < idx[:, None]))
    O = (iou > thresh) & same_group & beats
    # the per-round reductions run as ONE (N, N) @ (N, 2) matmul: inside
    # large fused programs the boolean any(O & mask) reduction picks up a
    # pathological layout (~11 ms/round at N=3072 vs ~0.1 standalone,
    # probe amg.fused_fori16); the MXU matvec is layout-robust. Exact:
    # 0/1 products accumulated in fp32, and only the sign is used.
    # (bf16 on TPU only: the XLA CPU emitter rejects bf16 dot.)
    mm_dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    Of = O.astype(mm_dt)

    def cond(state):
        kept, supp = state
        return jnp.any(~kept & ~supp)

    def body(state):
        kept, supp = state
        und = ~kept & ~supp
        S = jnp.stack([(~supp).astype(mm_dt),
                       kept.astype(mm_dt)], axis=1)
        R = jax.lax.dot_general(Of, S, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        higher_unsupp = R[:, 0] > 0
        higher_kept = R[:, 1] > 0
        return kept | (und & ~higher_unsupp), supp | (und & higher_kept)

    # invalid slots start suppressed: they are never kept and must not
    # block other candidates from deciding
    state = (jnp.zeros((N,), bool), ~valid)
    # `unroll_rounds` Python-unrolled rounds run first: inside large fused
    # programs a while_loop whose body carries (N, N) operands drags the
    # whole program into the scan-coexistence slow mode (PERFORMANCE.md
    # round 3); typical suppression chains resolve in < 10 rounds, so the
    # while_loop below almost always sees trip count 0. The fixed point is
    # unchanged — body() is idempotent on decided candidates.
    for _ in range(unroll_rounds):
        state = body(state)
    kept, _ = jax.lax.while_loop(cond, body, state)
    return kept


# ---------------------------------------------------- host-side small regions

def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Remove small disconnected regions ('islands') or holes ('holes') —
    reference `segment_anything/utils/amg.py:267-291` with
    scipy.ndimage.label (8-connectivity) replacing cv2. Returns
    (mask, changed)."""
    from scipy import ndimage

    assert mode in ("holes", "islands")
    correct_holes = mode == "holes"
    working = (correct_holes ^ mask.astype(bool)).astype(np.uint8)
    regions, n_labels = ndimage.label(working, structure=np.ones((3, 3), int))
    sizes = np.bincount(regions.ravel(), minlength=n_labels + 1)[1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask.astype(bool), False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels + 1) if i not in fill]
        if not fill:  # every region below threshold: keep largest
            fill = [int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True


def postprocess_small_regions(masks: np.ndarray, valid: np.ndarray,
                              min_area: int, nms_thresh: float):
    """Host-side AMG postprocess (reference automatic_mask_generator.py
    :323-372): fill small holes, drop small islands, then box-NMS the
    edited set preferring UNCHANGED masks (score 1 vs 0). Operates on the
    fixed-capacity (K, H, W) mask buffer + validity mask instead of a
    dynamic RLE list. Returns (masks, boxes, valid)."""
    masks = masks.copy()
    K = masks.shape[0]
    unchanged = np.ones((K,), np.float32)
    for i in range(K):
        if not valid[i]:
            continue
        m = masks[i] > 0
        m, ch1 = remove_small_regions(m, min_area, "holes")
        m, ch2 = remove_small_regions(m, min_area, "islands")
        masks[i] = m.astype(masks.dtype)
        unchanged[i] = float(not (ch1 or ch2))

    boxes = np.asarray(masks_to_boxes(jnp.asarray((masks > 0).astype(np.float32))))
    # greedy box NMS preferring unchanged masks (all one category)
    order = np.argsort(-(unchanged + np.where(valid, 0.0, -10.0)),
                       kind="stable")
    keep = np.asarray(valid).copy()
    for oi, i in enumerate(order):
        if not keep[i]:
            continue
        for j in order[oi + 1:]:
            if not keep[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(a + b - inter, 1e-9) > nms_thresh:
                keep[j] = False
    return masks, boxes, keep
