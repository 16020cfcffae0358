"""TPU-native SAM automatic mask generation.

Functional equivalent of reference `CustomSamAutomaticMaskGenerator`
(`model/sam.py:52-148`) + `SamAutomaticMaskGenerator._process_batch`
(`segment_anything/automatic_mask_generator.py:266-321`), re-architected:

- the 32x32 prompt grid is decoded in fixed chunks inside ONE jitted
  program (`lax.map`), not a 64-point Python loop;
- mask postprocessing (256^2 logits -> 1024^2 -> crop -> segmentor size)
  is a COMPOSED pair of separable bilinear matrices, so each mask is two
  MXU matmuls instead of two materialized resizes;
- filtering (pred-IoU, stability, box NMS) is a two-pass fixed-capacity
  scheme: pass A scores all 3072 candidates and discards masks, pass B
  recomputes masks only for the top-K survivors. No dynamic shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..core.config import SAMConfig
from ..models.sam import SAMImageEncoder, PromptEncoder, MaskDecoder
from ..ops.masks import masks_to_boxes, box_iou, nms_masked
from ..data.preprocess import bilinear_resize

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) grid in [0,1]^2, xy order (reference amg.py:179-187)."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    x = np.tile(pts[None, :], (n_per_side, 1))
    y = np.tile(pts[:, None], (1, n_per_side))
    return np.stack([x, y], axis=-1).reshape(-1, 2)


def bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) separable bilinear weights, half-pixel convention
    (= F.interpolate mode='bilinear', align_corners=False)."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    i0c = np.clip(i0, 0, in_size - 1)
    i1c = np.clip(i0 + 1, 0, in_size - 1)
    M = np.zeros((out_size, in_size), np.float32)
    M[np.arange(out_size), i0c] += (1 - frac).astype(np.float32)
    M[np.arange(out_size), i1c] += frac.astype(np.float32)
    return M


def get_preprocess_shape(oldh: int, oldw: int, long_side: int):
    """ResizeLongestSide target (reference transforms.py)."""
    scale = long_side / max(oldh, oldw)
    newh, neww = oldh * scale, oldw * scale
    return int(newh + 0.5), int(neww + 0.5)


class SAMSegmentor:
    """SAM AMG over a fixed proposal capacity."""

    def __init__(self, cfg: SAMConfig, variables: Optional[Dict] = None,
                 seed: int = 0, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        grid = cfg.img_size // cfg.patch_size
        use_flash = (jax.default_backend() == "tpu"
                     and cfg.img_size // cfg.patch_size >= 32)
        self.encoder = SAMImageEncoder(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.encoder_embed_dim, depth=cfg.encoder_depth,
            num_heads=cfg.encoder_num_heads, window_size=cfg.window_size,
            global_attn_indexes=cfg.encoder_global_attn_indexes,
            out_chans=cfg.prompt_embed_dim, use_flash=use_flash,
            carry_windows=cfg.encoder_carry_windows, dtype=dtype)
        self.prompt_encoder = PromptEncoder(
            embed_dim=cfg.prompt_embed_dim,
            input_image_size=(cfg.img_size, cfg.img_size),
            image_embedding_size=(grid, grid), dtype=dtype)
        # block-layout masks everywhere: the upscale tail runs as GEMMs in
        # (p,q,r,s)-block pixel order and the postprocess matrices consume
        # that order via a free reshape. The factored image-side mode
        # (MaskDecoder.factored_keys — exact, carries keys as a*S + P@U)
        # measured 6.7 vs 6.1 ms/chunk on v5e: its extra mid-rank einsums
        # cost more than the saved materializations, so it stays off.
        self.mask_decoder = MaskDecoder(transformer_dim=cfg.prompt_embed_dim,
                                        block_layout=True, block_masks=True,
                                        factored_kernel=(
                                            jax.default_backend() == "tpu"
                                            and dtype == jnp.bfloat16),
                                        dtype=dtype)
        if variables is None:
            variables = self._random_init(seed)
        elif variables == "eval_shape":
            # shapes only (constant fill): skips the init-program compile;
            # for latency benchmarking with weight-independent timings
            shapes = jax.eval_shape(lambda: self._random_init(seed))
            variables = jax.tree.map(
                lambda sh: jnp.full(sh.shape, 0.01, sh.dtype), shapes)
        if dtype == jnp.bfloat16:
            from ..core.params import cast_float_params
            variables = cast_float_params(variables, dtype)
        self.vars = variables
        self.points = build_point_grid(cfg.points_per_side)
        self._encode = jax.jit(
            lambda v, x: self.encoder.apply(v["image_encoder"], x))

        def _encode_u8(v, u8):
            # device-side SAM normalization + canvas padding: the host
            # uploads the resized uint8 image (2.4 MB) instead of the
            # normalized fp32 1024^2 canvas (12.6 MB) — uploads through
            # the tunnel were ~25 ms/MB (bench e2e breakdown, round 5).
            # Identical numbers: same fp32 arithmetic, just on device.
            h_in, w_in = u8.shape[0], u8.shape[1]
            x = (u8.astype(jnp.float32)
                 - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
            S = self.cfg.img_size
            x = jnp.pad(x, ((0, S - h_in), (0, S - w_in), (0, 0)))
            return self.encoder.apply(v["image_encoder"], x[None])

        self._encode_u8 = jax.jit(_encode_u8)
        # NOTE: all jitted entry points take the variables pytree as an
        # explicit argument — closing over it would embed the weights as
        # compile-time constants (catastrophic for compile time/size).
        self._score_all = jax.jit(
            self._score_all_impl,
            static_argnames=("hs", "ws", "h_in", "w_in", "keep_low"))
        self._masks_for = jax.jit(self._masks_for_impl,
                                  static_argnames=("hs", "ws", "h_in", "w_in"))
        # fused single-dispatch per-frame program (encoder output -> proposals)
        self._propose = jax.jit(self._propose_impl,
                                static_argnames=("hs", "ws", "h_in", "w_in"))
        self._rank_all = jax.jit(self._rank_all_impl,
                                 static_argnames=("h_in", "w_in"))

    def _random_init(self, seed: int):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        g = self.cfg.img_size // self.cfg.patch_size
        C = self.cfg.prompt_embed_dim
        enc = self.encoder.init(k1, jnp.zeros((1, self.cfg.img_size,
                                               self.cfg.img_size, 3)))
        # init over every prompt type so the variable tree carries the box
        # corner path and the mask_downscaling stack (checkpoint parity)
        pe = self.prompt_encoder.init(k2, jnp.zeros((1, 1, 2)),
                                      jnp.ones((1, 1), jnp.int32),
                                      jnp.zeros((1, 4)),
                                      jnp.zeros((1, 4 * g, 4 * g, 1)))
        dec = self.mask_decoder.init(
            k3, jnp.zeros((g, g, C)), jnp.zeros((g, g, C)),
            jnp.zeros((1, 2, C)), jnp.zeros((g, g, C)))
        return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": dec}

    # -------------------------------------------------------------- internals

    def _decode_chunk(self, v, embedding, dense_pe, pts, rank_only=False,
                      sel_channel=None, iou_only=False):
        """pts: (chunk, 2) coords in the 1024-frame. Returns
        (block-layout masks (chunk, 3*4, 4*grid^2) — rows (k, rs), channel
        0 dropped (multimask slice, reference mask_decoder.py:101-107) —
        and iou (chunk, 3)). With `sel_channel` (chunk,) in {0,1,2}, only
        that multimask channel is decoded: masks (chunk, 4, 4*grid^2).
        With `iou_only`, masks is None and only iou (chunk, 3) is
        computed — exact (factored keys), no mask tail."""
        labels = jnp.ones(pts.shape[0], jnp.int32)[:, None]
        sparse, dense = self.prompt_encoder.apply(
            v["prompt_encoder"], pts[:, None, :], labels)
        masks, iou = self.mask_decoder.apply(
            v["mask_decoder"], embedding, dense_pe, sparse, dense,
            rank_only=rank_only, iou_only=iou_only,
            sel_channel=None if sel_channel is None else sel_channel + 1)
        if iou_only:
            return None, iou[:, 1:]
        if sel_channel is not None:
            return masks, iou[:, 1:]
        return masks[:, 4:, :], iou[:, 1:]

    def _resize_logits(self, masks, Ry, Rx):
        """(..., 256, 256) -> (..., Hs, Ws) via composed bilinear matrices."""
        out = jnp.einsum("ah,...hw->...aw", Ry, masks)
        return jnp.einsum("bw,...aw->...ab", Rx, out)

    def _resize_logits_block(self, mb, Ry, Rx):
        """Block-layout masks (B, 4K, 4*g*g) -> (B, K, Hs, Ws). The
        low-res row index is 4i+2p+r (col: 4j+2q+s).

        Unpacks the block layout with ONE transpose to (B, K, 4g, 4g) and
        resizes with two plain GEMMs against the composed bilinear
        matrices. The earlier formulation factored the matrices to
        (a, g, 2, 2) and contracted without unpacking — "no relayout" —
        but its (b, k, a, s, j, q) intermediate has minor dim 2, which
        tiles 2 of 128 TPU lanes; composed into the fused propose program
        that einsum materialized at ~64x effective bandwidth and dominated
        the whole AMG tail (~95 ms across 8 chunks)."""
        B, K4, N4 = mb.shape
        K = K4 // 4
        g = int(round((N4 // 4) ** 0.5))
        m = mb.reshape(B, K, 2, 2, g, g, 2, 2)   # b, k, r, s, i, j, p, q
        # -> (b, k, [i,p,r], [j,q,s]) = (B, K, 4g, 4g), minor dim 4g=256
        m = m.transpose(0, 1, 4, 6, 2, 5, 7, 3).reshape(B, K, 4 * g, 4 * g)
        # matrices in the mask dtype: the fp32 promotion materialized the
        # (chunk, 3, Hs, Ws) logits at 2x the bytes for no extra precision
        # (the logits themselves are bf16 on TPU)
        RyB = Ry.astype(mb.dtype)                # (Hs, 4g)
        RxB = Rx.astype(mb.dtype)                # (Ws, 4g)
        t = jnp.einsum("ah,bkhw->bkaw", RyB, m)
        return jnp.einsum("cw,bkaw->bkac", RxB, t)

    def _score_all_impl(self, v, embedding, points, Ry, Rx, hs, ws, h_in,
                        w_in, keep_low: bool = False):
        """Score all prompts. Returns (iou (3P,), stability (3P,),
        boxes (3P, 4)) in segmentor-resolution coords; with `keep_low`,
        also the low-res block logits (3P, 4, 4g^2) in candidate order —
        kept so the selected proposals' masks come from a GATHER instead
        of a re-decode (the re-decode cost ~70 ms in composition, round-4
        probes amgz/amgw/amgv; the 402 MB bf16 transient is ~free)."""
        cfg = self.cfg
        dense_pe = self.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        chunk = cfg.points_per_batch

        def one(pts):
            masks, iou = self._decode_chunk(v, embedding, dense_pe, pts)
            hi = self._resize_logits_block(masks, Ry, Rx)  # (chunk, 3, Hs, Ws)
            inter = jnp.sum(hi > cfg.stability_score_offset, axis=(-1, -2))
            union = jnp.sum(hi > -cfg.stability_score_offset, axis=(-1, -2))
            stability = inter / jnp.maximum(union, 1)
            flat = hi.reshape(-1, hs, ws)
            boxes = masks_to_boxes((flat > 0.0).astype(jnp.float32))
            low = None
            if keep_low:
                N4 = masks.shape[-1]
                low = masks.reshape(-1, 3, 4, N4).reshape(-1, 4, N4)
            return iou.reshape(-1), stability.reshape(-1), boxes, low

        P = points.shape[0]
        # Python-unrolled chunk loop, NOT lax.map: an XLA scan coexisting
        # with any (T, T)-sized op elsewhere in the program (the NMS tail)
        # drops the whole program into a ~3x slower mode (score+NMS fused:
        # 141 ms scanned vs 46 unrolled — probe amgy.unrolled_outer3072).
        # The unrolled HLO is ~8x larger and compiles minutes cold; the
        # persistent compilation cache amortizes that.
        assert P % chunk == 0, (P, chunk)  # the reshape this replaced errored
        iou_l, stab_l, box_l, low_l = [], [], [], []
        for c in range(P // chunk):
            i_c, s_c, b_c, l_c = one(
                jax.lax.dynamic_slice_in_dim(points, c * chunk, chunk, 0))
            iou_l.append(i_c)
            stab_l.append(s_c)
            box_l.append(b_c)
            low_l.append(l_c)
        out = (jnp.concatenate(iou_l), jnp.concatenate(stab_l),
               jnp.concatenate(box_l))
        if keep_low:
            return out + (jnp.concatenate(low_l),)
        return out

    def _rank_all_impl(self, v, embedding, points, h_in, w_in):
        """Cheap pre-rank pass over ALL grid prompts: frozen-image decode
        (MaskDecoder rank_only — the upscale chain runs once, each prompt is
        a hypernetwork contraction) + stability counted on the ACTIVE slice
        of the 256^2 low-res logits. Approximate by construction; used only
        to pick which prompts get the exact decode. Returns
        (iou (P, 3), stability (P, 3))."""
        cfg = self.cfg
        dense_pe = self.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        off = cfg.stability_score_offset
        # active low-res region at block granularity: block row i covers
        # input rows 16i..16i+15 (rank scores only — the exact pass counts
        # at full resolution with reference semantics)
        g = self.cfg.img_size // self.cfg.patch_size
        hb = min(-(-((h_in + 3) // 4) // 4), g)
        wb = min(-(-((w_in + 3) // 4) // 4), g)

        def one(pts):
            masks, iou = self._decode_chunk(v, embedding, dense_pe, pts,
                                            rank_only=True)
            m8 = masks.reshape(masks.shape[0], 3, 2, 2, g, g, 2, 2)
            lo = m8[:, :, :, :, :hb, :wb]      # (c, k, r, s, i<, j<, p, q)
            inter = jnp.sum(lo > off, axis=(2, 3, 4, 5, 6, 7))
            union = jnp.sum(lo > -off, axis=(2, 3, 4, 5, 6, 7))
            return iou, inter / jnp.maximum(union, 1)

        P = points.shape[0]
        chunk = min(cfg.amg_rank_chunk, P)
        if P % chunk:
            chunk = P  # non-divisible grids: single chunk
        # unrolled chunk loop (see _score_all_impl)
        pairs = [one(jax.lax.dynamic_slice_in_dim(points, c * chunk, chunk, 0))
                 for c in range(P // chunk)]
        iou = jnp.concatenate([p[0] for p in pairs])
        stab = jnp.concatenate([p[1] for p in pairs])
        return iou.reshape(P, -1), stab.reshape(P, -1)

    def _iou_all_impl(self, v, embedding, dense_pe, points):
        """Exact predicted-IoU for every grid prompt — factored image side,
        no mask tail (MaskDecoder iou_only). Returns (P, 3)."""
        chunk = self.cfg.points_per_batch
        P = points.shape[0]
        assert P % chunk == 0, (P, chunk)
        ious = []
        for c in range(P // chunk):
            pc = jax.lax.dynamic_slice_in_dim(points, c * chunk, chunk, 0)
            _, iou = self._decode_chunk(v, embedding, dense_pe, pc,
                                        iou_only=True)
            ious.append(iou)
        return jnp.concatenate(ious)

    def _masks_for_impl(self, v, embedding, sel_points, sel_channel, Ry, Rx,
                        hs, ws, h_in, w_in):
        """Recompute masks for selected (point, channel) pairs ->
        (K, Hs, Ws) bool."""
        dense_pe = self.prompt_encoder.apply(
            v["prompt_encoder"], method="dense_pe")
        chunk = min(self.cfg.points_per_batch, sel_points.shape[0])
        K = sel_points.shape[0]

        def one(args):
            pts, ch = args
            # channel-selected decode: the hypernetwork contracts only the
            # chosen channel (selection on the tiny (chunk, 4, 32) hyper
            # vectors), so the (chunk, 12, 4N) mask tensor and the row
            # gather that picked 4 of its 12 rows never exist
            low, _ = self._decode_chunk(v, embedding, dense_pe, pts,
                                        sel_channel=ch)
            hi = self._resize_logits_block(low, Ry, Rx)[:, 0]
            return hi > 0.0

        # unrolled chunk loop (see _score_all_impl: scans coexist badly
        # with the NMS tail's (T, T) ops in the same program)
        assert K % chunk == 0, (K, chunk)  # the reshape this replaced errored
        outs = [one((jax.lax.dynamic_slice_in_dim(sel_points, c * chunk,
                                                  chunk, 0),
                     jax.lax.dynamic_slice_in_dim(sel_channel, c * chunk,
                                                  chunk, 0)))
                for c in range(K // chunk)]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return out.reshape(K, hs, ws)

    def _propose_impl(self, v, embedding, points, Ry, Rx, hs, ws, h_in, w_in):
        """Fused AMG tail: score all candidates, filter (pred-IoU,
        stability), box-NMS, select top-K, recompute masks for the
        selection — one device program, zero host round-trips.
        Returns (masks (K, hs, ws) bool, boxes (K, 4), valid (K,), iou (K,)).
        """
        cfg = self.cfg
        if cfg.amg_prerank and cfg.amg_prerank < points.shape[0]:
            # cheap frozen-image pass ranks the full grid; only the top
            # slice (8x the final capacity by default) gets exact scoring
            iou_a, stab_a = self._rank_all_impl(v, embedding, points,
                                                h_in, w_in)
            valid_a = ((iou_a > cfg.pred_iou_thresh)
                       & (stab_a >= cfg.stability_score_thresh))
            key = jnp.max(iou_a + 10.0 * valid_a, axis=1)
            _, top = jax.lax.top_k(key, cfg.amg_prerank)
            points = points[top]
        elif cfg.amg_iou_prefix_factor > 0:
            # EXACT iou-prefix pass (see SAMConfig.amg_iou_prefix_factor):
            # every prompt's predicted IoU from the factored token-side
            # pass, then full decode + stability/boxes for the top points
            # only. The prefix scales with the proposal capacity.
            chunk = cfg.points_per_batch
            pref = -(-int(cfg.max_proposals * cfg.amg_iou_prefix_factor)
                     // chunk) * chunk
            if pref < points.shape[0] and points.shape[0] % chunk == 0:
                dense_pe0 = self.prompt_encoder.apply(
                    v["prompt_encoder"], method="dense_pe")
                iou_a = self._iou_all_impl(v, embedding, dense_pe0, points)
                key = jnp.max(iou_a, axis=1)
                _, top = jax.lax.top_k(key, pref)
                points = points[top]
        P = points.shape[0]
        pad = (-P) % cfg.points_per_batch
        pts_pad = points if pad == 0 else jnp.concatenate(
            [points, jnp.broadcast_to(points[:1], (pad, 2))])
        iou, stab, boxes, lows = self._score_all_impl(
            v, embedding, pts_pad, Ry, Rx, hs, ws, h_in, w_in, keep_low=True)
        iou, stab, boxes = iou[:3 * P], stab[:3 * P], boxes[:3 * P]
        valid = (iou > cfg.pred_iou_thresh) & (stab >= cfg.stability_score_thresh)
        n_cand = iou.shape[0]
        T = min(cfg.amg_nms_topk or n_cand, n_cand)
        if T < n_cand:
            # exact prefix truncation: greedy NMS keep decisions depend
            # only on higher-scored candidates, so NMS over the top-T
            # score prefix equals the full run restricted to that prefix
            _, top = jax.lax.top_k(jnp.where(valid, iou, -jnp.inf), T)
            iou_t, valid_t, boxes_t = iou[top], valid[top], boxes[top]
        else:
            top = jnp.arange(n_cand)
            iou_t, valid_t, boxes_t = iou, valid, boxes
        iou_mat = box_iou(boxes_t, boxes_t)
        same = jnp.ones((T, T), bool)
        keep = nms_masked(iou_mat, iou_t, valid_t, same, cfg.box_nms_thresh)

        K = cfg.max_proposals
        score = jnp.where(keep, iou_t, -jnp.inf)
        # top_k == stable argsort(-score)[:K] (ties broken by lower index)
        # without sorting the full candidate list
        _, order_t = jax.lax.top_k(score, min(K, score.shape[0]))
        sel_valid = keep[order_t]
        if order_t.shape[0] < K:
            # fewer candidates than capacity (coarse crop-cascade grids):
            # pad with candidate 0 marked invalid
            padn = K - order_t.shape[0]
            order_t = jnp.concatenate(
                [order_t, jnp.zeros((padn,), order_t.dtype)])
            sel_valid = jnp.concatenate([sel_valid, jnp.zeros((padn,), bool)])
        order = top[order_t]
        # masks for the selection: GATHER the kept low-res logits and
        # resize — identical numbers to re-decoding the selected (point,
        # channel) pairs (the decode is deterministic), ~70 ms cheaper in
        # composition (round-4 probes amgz/amgw/amgv; _masks_for_impl
        # remains as the standalone channel-selected decode used by the
        # probe battery)
        sel_low = lows[order]
        masks = self._resize_logits_block(sel_low, Ry, Rx)[:, 0] > 0.0
        return masks, boxes[order], sel_valid, iou[order]

    # ------------------------------------------------------------------ API

    def preprocess_frame(self, image: np.ndarray):
        """Host preprocessing: pre-resize to segmentor width (reference
        model/sam.py:77-83), ResizeLongestSide with PIL bilinear (reference
        transforms.apply_image), SAM normalization, padding. Returns the
        encoder canvas + geometry."""
        cfg = self.cfg
        H0, W0 = image.shape[:2]
        hs = int(cfg.segmentor_width_size * H0 / W0)
        ws = cfg.segmentor_width_size
        img_s = bilinear_resize(image, hs, ws)
        h_in, w_in = get_preprocess_shape(hs, ws, cfg.img_size)
        resized = np.array(
            Image.fromarray(img_s).resize((w_in, h_in), Image.BILINEAR),
            np.float32)
        x = (resized - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        canvas = np.zeros((cfg.img_size, cfg.img_size, 3), np.float32)
        canvas[:h_in, :w_in] = x
        return canvas, (H0, W0), (hs, ws), (h_in, w_in)

    def preprocess_frame_u8(self, image: np.ndarray):
        """Like preprocess_frame but stops at the resized uint8 image —
        normalization + padding run on device (_encode_u8), cutting the
        per-frame upload 12.6 -> 2.4 MB. Same PIL resizes, same numbers."""
        cfg = self.cfg
        H0, W0 = image.shape[:2]
        hs = int(cfg.segmentor_width_size * H0 / W0)
        ws = cfg.segmentor_width_size
        img_s = bilinear_resize(image, hs, ws)
        h_in, w_in = get_preprocess_shape(hs, ws, cfg.img_size)
        resized = np.array(
            Image.fromarray(img_s).resize((w_in, h_in), Image.BILINEAR),
            np.uint8)
        return resized, (H0, W0), (hs, ws), (h_in, w_in)

    def frame_constants(self, hs, ws, h_in, w_in, grid01=None):
        """Per-geometry constants (cached by shape): composed postprocess
        matrices + prompt coordinates in the encoder frame. `grid01`
        overrides the [0,1]^2 prompt grid (crop-cascade layers use coarser
        grids)."""
        cfg = self.cfg
        low = cfg.img_size // 4
        R1y = bilinear_matrix(cfg.img_size, low)[:h_in]
        R1x = bilinear_matrix(cfg.img_size, low)[:w_in]
        Ry = jnp.asarray(bilinear_matrix(hs, h_in) @ R1y)
        Rx = jnp.asarray(bilinear_matrix(ws, w_in) @ R1x)
        grid = self.points if grid01 is None else grid01
        pts_img = grid * np.array([ws, hs], np.float32)
        scale = np.array([w_in / ws, h_in / hs], np.float32)
        pts_in = jnp.asarray(pts_img * scale)
        return Ry, Rx, pts_in

    def generate_masks_device(self, image: np.ndarray, grid01=None):
        """Device-resident AMG: two dispatches (encoder + fused tail), no
        host round-trips. Returns device arrays
        (masks (K, hs, ws) bool, boxes (K, 4) segmentor-res, valid, iou)
        plus the frame geometry."""
        resized, (H0, W0), (hs, ws), (h_in, w_in) = \
            self.preprocess_frame_u8(image)
        Ry, Rx, pts_in = self.frame_constants(hs, ws, h_in, w_in, grid01)
        embedding = self._encode_u8(self.vars, jnp.asarray(resized))[0]
        masks, boxes, valid, iou = self._propose(
            self.vars, embedding, pts_in, Ry, Rx, hs=hs, ws=ws, h_in=h_in,
            w_in=w_in)
        return dict(masks=masks, boxes=boxes, valid=valid, iou_preds=iou,
                    orig_size=(H0, W0), seg_size=(hs, ws))

    def truncation_divergence(self, image: np.ndarray, grid01=None) -> Dict:
        """Degradation counter for the AMG truncations (VERDICT r4 item 4):
        run this segmentor's configured (possibly truncated) proposal pass
        AND the exact full-grid pass (amg_iou_prefix_factor=0,
        amg_nms_topk=0, amg_prerank=0) on one image, and count kept-mask
        differences. The truncation argument says the sets are identical
        whenever the NMS-relevant candidates fit the selected prefix; this
        measures how often that assumption breaks on a real frame.

        Returns dict(n_kept_trunc, n_kept_full, n_differing, exact) where
        n_differing counts kept (mask, box) pairs of the full run with no
        bit-identical counterpart in the truncated run."""
        from dataclasses import replace

        dev_t = self.generate_masks_device(image, grid01)
        # cache the exact twin: its jit wrappers survive across calls (the
        # stress battery sweeps many weight seeds through one instance)
        full = getattr(self, "_exact_twin", None)
        if full is None:
            exact_cfg = replace(self.cfg, amg_iou_prefix_factor=0.0,
                                amg_nms_topk=0, amg_prerank=0)
            full = SAMSegmentor(exact_cfg, variables=self.vars,
                                dtype=self.dtype)
            self._exact_twin = full
        full.vars = self.vars
        dev_f = full.generate_masks_device(image, grid01)

        vt = np.asarray(dev_t["valid"])
        vf = np.asarray(dev_f["valid"])
        mt = np.asarray(dev_t["masks"])[vt]
        mf = np.asarray(dev_f["masks"])[vf]
        bt = np.asarray(dev_t["boxes"])[vt]
        bf = np.asarray(dev_f["boxes"])[vf]
        n_diff = 0
        for i in range(len(mf)):
            hit = False
            for j in range(len(mt)):
                if np.array_equal(bf[i], bt[j]) and np.array_equal(
                        mf[i], mt[j]):
                    hit = True
                    break
            if not hit:
                n_diff += 1
        return dict(n_kept_trunc=int(vt.sum()), n_kept_full=int(vf.sum()),
                    n_differing=n_diff, exact=(n_diff == 0
                                               and vt.sum() == vf.sum()))

    def generate_masks_cropped(self, image: np.ndarray) -> Dict[str, np.ndarray]:
        """Crop-cascade AMG (reference automatic_mask_generator.py:196-264,
        off at the reference operating point crop_n_layers=0): the full
        image plus (2^i)^2 overlapping crops per layer each run the device
        AMG with a per-layer point grid; detections are uncropped and
        merged by cross-crop NMS preferring smaller crops
        (scores = 1/crop_area), then capped at max_proposals."""
        cfg = self.cfg
        H0, W0 = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            (H0, W0), cfg.crop_n_layers, cfg.crop_overlap_ratio)
        masks_l, boxes_l, iou_l, areas_l = [], [], [], []
        for cbox, layer in zip(crop_boxes, layer_idxs):
            x0, y0, x1, y1 = cbox
            n = max(1, int(cfg.points_per_side
                           // (cfg.crop_n_points_downscale_factor ** layer)))
            # always pass an explicit grid: grid01=None would re-enter the
            # crop dispatch in generate_masks
            out = self.generate_masks(image[y0:y1, x0:x1],
                                      grid01=build_point_grid(n))
            keep = np.where(out["valid"])[0]
            for i in keep:
                canvas = np.zeros((H0, W0), np.float32)
                canvas[y0:y1, x0:x1] = out["masks"][i]
                masks_l.append(canvas)
                boxes_l.append(out["boxes"][i]
                               + np.array([x0, y0, x0, y0], np.float32))
                iou_l.append(out["iou_preds"][i])
                areas_l.append(float((x1 - x0) * (y1 - y0)))
        K = cfg.max_proposals
        res = dict(masks=np.zeros((K, H0, W0), np.float32),
                   boxes=np.zeros((K, 4), np.float32),
                   valid=np.zeros((K,), bool),
                   iou_preds=np.zeros((K,), np.float32))
        if masks_l:
            boxes_a = np.stack(boxes_l)
            keep = _host_greedy_nms(boxes_a,
                                    1.0 / np.asarray(areas_l, np.float32),
                                    cfg.crop_nms_thresh)
            # fixed capacity: top-K survivors by predicted IoU
            keep = sorted(keep, key=lambda i: -iou_l[i])[:K]
            for slot, i in enumerate(keep):
                res["masks"][slot] = masks_l[i]
                res["boxes"][slot] = boxes_a[i]
                res["valid"][slot] = True
                res["iou_preds"][slot] = iou_l[i]
        return res

    def generate_masks(self, image: np.ndarray,
                       grid01=None) -> Dict[str, np.ndarray]:
        """image: (H0, W0, 3) uint8 RGB. Returns dict(masks (K, H0, W0)
        float, boxes (K, 4) xyxy in original coords, valid (K,) bool,
        iou_preds (K,)) with K = cfg.max_proposals. Masks are bilinearly
        resized to the original resolution (float coverage, reference
        postprocess_resize model/sam.py:85-100)."""
        if self.cfg.crop_n_layers > 0 and grid01 is None:
            return self.generate_masks_cropped(image)
        dev = self.generate_masks_device(image, grid01)
        H0, W0 = dev["orig_size"]
        hs, ws = dev["seg_size"]
        masks = dev["masks"]
        if self.cfg.min_mask_region_area > 0:
            # host-side hole/island cleanup + re-NMS (reference
            # automatic_mask_generator.py:323-372; disabled at the reference
            # operating point min_mask_region_area=0)
            from ..ops.masks import postprocess_small_regions
            m_np, boxes_np, keep = postprocess_small_regions(
                np.asarray(masks).astype(np.float32), np.asarray(dev["valid"]),
                self.cfg.min_mask_region_area, self.cfg.box_nms_thresh)
            masks = jnp.asarray(m_np)
            dev = dict(dev, boxes=jnp.asarray(boxes_np),
                       valid=jnp.asarray(keep))
        if (H0, W0) != (hs, ws):
            My = jnp.asarray(bilinear_matrix(H0, hs))
            Mx = jnp.asarray(bilinear_matrix(W0, ws))
            masks_out = np.asarray(
                self._resize_logits(masks.astype(jnp.float32), My, Mx))
        else:
            masks_out = np.asarray(masks).astype(np.float32)
        boxes_out = np.asarray(dev["boxes"]) * (W0 / ws)
        boxes_out[:, [0, 2]] = boxes_out[:, [0, 2]].clip(0, W0 - 1)
        boxes_out[:, [1, 3]] = boxes_out[:, [1, 3]].clip(0, H0 - 1)
        return dict(masks=masks_out, boxes=boxes_out.astype(np.float32),
                    valid=np.asarray(dev["valid"]),
                    iou_preds=np.asarray(dev["iou_preds"]))


def generate_crop_boxes(im_size, n_layers: int, overlap_ratio: float):
    """Crop boxes per cascade layer: layer i has (2^i)^2 overlapping crops
    (reference segment_anything/utils/amg.py:200-234). Returns
    (crop_boxes xyxy, layer_idxs)."""
    import math

    crop_boxes, layer_idxs = [], []
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes.append([0, 0, im_w, im_h])
    layer_idxs.append(0)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_per_side))
        crop_w = crop_len(im_w, n_per_side, overlap)
        crop_h = crop_len(im_h, n_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_per_side)]
        for x0 in x0s:
            for y0 in y0s:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_w),
                                   min(y0 + crop_h, im_h)])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def _host_greedy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float):
    """Plain greedy box NMS on host (small candidate counts: the
    cross-crop merge). Returns indices kept, score-descending."""
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            b1, b2 = boxes[i], boxes[j]
            xx0 = max(b1[0], b2[0]); yy0 = max(b1[1], b2[1])
            xx1 = min(b1[2], b2[2]); yy1 = min(b1[3], b2[3])
            inter = max(0.0, xx1 - xx0) * max(0.0, yy1 - yy0)
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / max(a1 + a2 - inter, 1e-9) > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep
