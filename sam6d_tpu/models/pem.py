"""PEM: the full pose-estimation network as one jittable flax module.

Composite parity with reference `model/pose_estimation_model.py:11-53` +
`model/feature_extraction.py:122-181`, re-architected for TPU: the whole
forward (ViT per-pixel features -> FPS -> geometric embeddings -> coarse
matching -> hypothesis solve -> fine matching -> weighted SVD) is one traced
program over static shapes; the three stages of the reference (templates /
observation / solve) become explicit pure methods so template features
compile once per object set and are reused as cached arrays.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.config import PEMConfig
from .vit import ViTEncoder, gather_pixel_feats, sample_pixel_feats
from .geo_transformer import GeometricStructureEmbedding
from .coarse_matching import CoarsePointMatching
from .fine_matching import FinePointMatching, PositionalEncoding
from ..ops.sampling import sample_pts_feats
from ..ops.geometry import inverse_transform_points
from ..pose.solvers import compute_coarse_Rt, compute_fine_Rt


class PEMNet(nn.Module):
    """Pose Estimation Model.

    Usage (inference):
      feats = net.apply(params, rgb, rgb_choose, method='extract_img_feats')
      out   = net.apply(params, inputs, key, method='infer')

    `inputs` dict (all batched, fixed shapes):
      rgb         (B, S, S, 3) normalized crops
      rgb_choose  (B, N_fine) flat pixel indices of observed points
      pts         (B, N_fine, 3) observed cloud (meters, camera frame)
      model       (B, N_model, 3) CAD sample points (meters)
      dense_po    (B, N_fine, 3) template cloud (model frame, meters)
      dense_fo    (B, N_fine, C) template features
    """
    cfg: PEMConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.feature_extraction = ViTEncoder(
            img_size=c.vit.img_size, patch_size=c.vit.patch_size,
            embed_dim=c.vit.embed_dim, depth=c.vit.depth,
            num_heads=c.vit.num_heads, mlp_ratio=c.vit.mlp_ratio,
            out_dim=c.vit.out_dim, use_pyramid_feat=c.vit.use_pyramid_feat,
            remat=c.vit.remat, use_flash=c.vit.use_flash, unroll=c.vit.unroll,
            dtype=self.dtype)
        g = c.geo_embedding
        self.geo_embedding = GeometricStructureEmbedding(
            hidden_dim=g.hidden_dim, sigma_d=g.sigma_d, sigma_a=g.sigma_a,
            angle_k=g.angle_k, reduction_a=g.reduction_a, dtype=self.dtype)
        cm = c.coarse
        self.coarse_point_matching = CoarsePointMatching(
            nblock=cm.nblock, input_dim=cm.input_dim, hidden_dim=cm.hidden_dim,
            out_dim=cm.out_dim, num_heads=cm.num_heads, temp=cm.temp,
            normalize_feat=cm.normalize_feat, unroll=cm.unroll, dtype=self.dtype)
        fm = c.fine
        self.fine_point_matching = FinePointMatching(
            nblock=fm.nblock, input_dim=fm.input_dim, hidden_dim=fm.hidden_dim,
            out_dim=fm.out_dim, num_heads=fm.num_heads, temp=fm.temp,
            normalize_feat=fm.normalize_feat, focusing_factor=fm.focusing_factor,
            unroll=fm.unroll, dtype=self.dtype)
        # PE lives at net scope so the (pose-independent) template encoding
        # can be precomputed once at onboarding
        self.fine_pe = PositionalEncoding(
            fm.hidden_dim, fm.pe_radius1, fm.pe_radius2,
            fm.pe_nsample1, fm.pe_nsample2, dtype=self.dtype)

    # ----------------------------------------------------------------- utils

    def extract_img_feats(self, rgb, rgb_choose):
        """Per-pixel features at observed pixels (reference
        ViTEncoder.get_img_feats). The reference bilinearly upsamples the
        56^2 map to 224^2 and gathers; here the upsample+gather is fused
        (sample_pixel_feats) — same values, ~GBs less HBM traffic."""
        fmap_low, _ = self.feature_extraction(rgb, full_res=False)
        return sample_pixel_feats(fmap_low, rgb_choose,
                                  (rgb.shape[1], rgb.shape[2]))

    def template_pe(self, dense_po_normalized):
        """Positional encoding of the (radius-normalized) template cloud —
        pose-independent, cache alongside dense_fo at onboarding."""
        return self.fine_pe(dense_po_normalized)

    def template_trunk(self, dense_po_normalized, dense_fo):
        """Pose-independent template-side coarse trunk: FPS + geometric
        structure embedding of the NORMALIZED template cloud. The reference
        recomputes this for every test batch (feature_extraction.py:135-142);
        it depends only on onboarding outputs, so the pipeline caches it once
        per object and the per-frame program skips one full
        GeometricStructureEmbedding call (~22 ms at B=16)."""
        c = self.cfg
        B = dense_po_normalized.shape[0]
        bg_point = jnp.full((B, 1, 3), 100.0, dense_po_normalized.dtype)
        sparse_po, sparse_fo, fps_idx_o = sample_pts_feats(
            dense_po_normalized, dense_fo, c.coarse_npoint)
        geo_o = self.geo_embedding(
            jnp.concatenate([bg_point, sparse_po], axis=1))
        return dict(sparse_po=sparse_po, sparse_fo=sparse_fo,
                    fps_idx_o=fps_idx_o, geo_o=geo_o)

    def extract_template_feats(self, tem_rgb, tem_choose, tem_pts,
                               valid_mask=None, npoint: int | None = None):
        """Onboard templates: per-view pixel feats, concat views, FPS to
        `npoint` (reference get_obj_feats :170-181).

        tem_rgb: (V, S, S, 3), tem_choose/tem_pts: (V, P)/(V, P, 3) for one
        object. Returns (dense_po (npoint, 3), dense_fo (npoint, C)).
        NOTE: points must already be normalized by the template radius.
        """
        npoint = npoint or self.cfg.fine_npoint
        feats = self.extract_img_feats(tem_rgb, tem_choose)  # (V, P, C)
        V, P, C = feats.shape
        pts = tem_pts.reshape(1, V * P, 3)
        feats = feats.reshape(1, V * P, C)
        vm = None if valid_mask is None else valid_mask.reshape(1, V * P)
        po, fo, _ = sample_pts_feats(pts, feats, npoint, vm)
        return po[0], fo[0]

    # ------------------------------------------------------------- main path

    def _shared_trunk(self, inputs: Dict[str, Any]):
        """Feature extraction + normalization + FPS + geometric embeddings —
        the part common to train and inference (reference Net.forward :23-37)."""
        c = self.cfg
        dense_fm = self.extract_img_feats(inputs["rgb"], inputs["rgb_choose"])
        dense_pm = inputs["pts"]
        dense_po = inputs["dense_po"]
        dense_fo = inputs["dense_fo"]

        radius = jnp.max(jnp.linalg.norm(dense_po, axis=2), axis=1)  # (B,)
        denom = radius[:, None, None] + 1e-6
        dense_pm = dense_pm / denom
        dense_po = dense_po / denom

        B = dense_pm.shape[0]
        bg_point = jnp.full((B, 1, 3), 100.0, dense_pm.dtype)

        sparse_pm, sparse_fm, fps_idx_m = sample_pts_feats(
            dense_pm, dense_fm, c.coarse_npoint)
        geo_m = self.geo_embedding(
            jnp.concatenate([bg_point, sparse_pm], axis=1))
        if "geo_o" in inputs:
            # onboarding-cached template trunk (template_trunk); batch-1
            # caches broadcast lazily — XLA fuses the broadcast into the
            # attention contractions, so the (B, N, N, C) replica is never
            # materialized for the single-object path
            def bcast(x):
                if x.shape[0] == B:
                    return x
                return jnp.broadcast_to(x, (B, *x.shape[1:]))
            sparse_po = bcast(inputs["sparse_po"])
            sparse_fo = bcast(inputs["sparse_fo"])
            fps_idx_o = bcast(inputs["fps_idx_o"])
            geo_o = bcast(inputs["geo_o"])
        else:
            sparse_po, sparse_fo, fps_idx_o = sample_pts_feats(
                dense_po, dense_fo, c.coarse_npoint)
            geo_o = self.geo_embedding(
                jnp.concatenate([bg_point, sparse_po], axis=1))
        return dict(
            dense_pm=dense_pm, dense_fm=dense_fm, dense_po=dense_po,
            dense_fo=dense_fo, radius=radius,
            sparse_pm=sparse_pm, sparse_fm=sparse_fm, fps_idx_m=fps_idx_m,
            geo_m=geo_m, sparse_po=sparse_po, sparse_fo=sparse_fo,
            fps_idx_o=fps_idx_o, geo_o=geo_o,
        )

    def infer(self, inputs: Dict[str, Any], key: jax.Array):
        """Full inference: returns dict with pred_R, pred_t (meters),
        pred_pose_score."""
        c = self.cfg
        tr = self._shared_trunk(inputs)
        radius = tr["radius"]
        model_n = inputs["model"] / (radius[:, None, None] + 1e-6)

        coarse_atten = self.coarse_point_matching(
            tr["sparse_fm"], tr["geo_m"], tr["sparse_fo"], tr["geo_o"])[-1]
        init_R, init_t = compute_coarse_Rt(
            key, coarse_atten, tr["sparse_pm"], tr["sparse_po"], model_n,
            c.coarse.nproposal1, c.coarse.nproposal2)

        p1_init = inverse_transform_points(tr["dense_pm"], init_R, init_t)
        pe1 = self.fine_pe(p1_init)
        pe_o = inputs.get("pe_o")
        if pe_o is None:
            pe_o = self.fine_pe(tr["dense_po"])
        elif pe_o.shape[0] != pe1.shape[0]:
            pe_o = jnp.broadcast_to(pe_o, (pe1.shape[0], *pe_o.shape[1:]))
        fine_atten = self.fine_point_matching(
            pe1, tr["dense_fm"], tr["geo_m"], tr["fps_idx_m"],
            pe_o, tr["dense_fo"], tr["geo_o"], tr["fps_idx_o"])[-1]
        pred_R, pred_t, pose_score = compute_fine_Rt(
            fine_atten, tr["dense_pm"], tr["dense_po"], model_n,
            dis_thres=c.dis_thres)
        return dict(
            init_R=init_R, init_t=init_t * (radius[:, None] + 1e-6),
            pred_R=pred_R, pred_t=pred_t * (radius[:, None] + 1e-6),
            pred_pose_score=pose_score,
        )

    def train_forward(self, inputs: Dict[str, Any], init_R, init_t):
        """Training forward: returns (coarse_attens, fine_attens, aux) where
        aux carries normalized points + radius for the correspondence loss.
        `init_R/init_t` is the noisy GT pose (aug_pose_noise) in NORMALIZED
        translation units; templates are onboarded per batch from tem1/tem2
        (reference feature_extraction.py:144-163).
        """
        c = self.cfg
        # onboard the two training template views per sample
        tem_pts = jnp.concatenate([inputs["tem1_pts"], inputs["tem2_pts"]], axis=1)
        radius = jnp.max(jnp.linalg.norm(tem_pts, axis=2), axis=1)
        denom = radius[:, None, None] + 1e-6

        B = inputs["rgb"].shape[0]
        f1 = self.extract_img_feats(inputs["tem1_rgb"], inputs["tem1_choose"])
        f2 = self.extract_img_feats(inputs["tem2_rgb"], inputs["tem2_choose"])
        tem_feats = jnp.concatenate([f1, f2], axis=1)
        dense_po, dense_fo, _ = sample_pts_feats(
            tem_pts / denom, tem_feats, c.fine_npoint)

        dense_fm = self.extract_img_feats(inputs["rgb"], inputs["rgb_choose"])
        dense_pm = inputs["pts"] / denom

        bg_point = jnp.full((B, 1, 3), 100.0, dense_pm.dtype)
        sparse_pm, sparse_fm, fps_idx_m = sample_pts_feats(
            dense_pm, dense_fm, c.coarse_npoint)
        geo_m = self.geo_embedding(jnp.concatenate([bg_point, sparse_pm], axis=1))
        sparse_po, sparse_fo, fps_idx_o = sample_pts_feats(
            dense_po, dense_fo, c.coarse_npoint)
        geo_o = self.geo_embedding(jnp.concatenate([bg_point, sparse_po], axis=1))

        coarse_attens = self.coarse_point_matching(
            sparse_fm, geo_m, sparse_fo, geo_o, all_blocks=True)

        p1_init = inverse_transform_points(dense_pm, init_R, init_t)
        pe1 = self.fine_pe(p1_init, train=True)
        pe2 = self.fine_pe(dense_po, train=True)
        fine_attens = self.fine_point_matching(
            pe1, dense_fm, geo_m, fps_idx_m,
            pe2, dense_fo, geo_o, fps_idx_o,
            all_blocks=True, train=True)
        aux = dict(sparse_pm=sparse_pm, sparse_po=sparse_po,
                   dense_pm=dense_pm, dense_po=dense_po, radius=radius)
        return coarse_attens, fine_attens, aux

    def __call__(self, inputs: Dict[str, Any], key: jax.Array):
        return self.infer(inputs, key)
