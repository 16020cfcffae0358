"""Full-scale converter hardening (VERDICT r2 item 2): synthetic state
dicts with the EXACT reference naming at REAL model dimensions (SAM ViT-H,
DINOv2 ViT-L/14, released-PEM) run through every converter, and the
resulting trees must match the model init trees structure-and-shape exactly;
the forward is then shape-traced end-to-end at full size (jax.eval_shape —
this environment has one CPU core, so tracing replaces executing; the
tiny-config torch-oracle tests cover value-level transposes).

Reference naming sources: segment_anything/build_sam.py:55-107 +
modeling/{image_encoder,prompt_encoder,mask_decoder,transformer}.py;
Instance_Segmentation_Model/model/vision_transformer.py:336-392 (dinov2);
Pose_Estimation_Model/model/feature_extraction.py:78-95.

State-dict values are zeros (allocation-cheap at 632M params); naming/shape
drift — the failure mode this guards — is value-independent.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat}


def _assert_same_structure(got, want):
    g, w = _tree_shapes(got), _tree_shapes(want)
    only_got = set(g) - set(w)
    only_want = set(w) - set(g)
    mismatched = {k: (g[k], w[k]) for k in set(g) & set(w) if g[k] != w[k]}
    assert not (only_got or only_want or mismatched), (
        f"extra={sorted(only_got)[:8]} missing={sorted(only_want)[:8]} "
        f"shape_mismatch={dict(list(mismatched.items())[:8])}")


def _lin(sd, name, i, o):
    sd[name + ".weight"] = np.zeros((o, i), np.float32)
    sd[name + ".bias"] = np.zeros(o, np.float32)


def _norm(sd, name, d):
    sd[name + ".weight"] = np.ones(d, np.float32)
    sd[name + ".bias"] = np.zeros(d, np.float32)


# ------------------------------------------------------------------ SAM ViT-H

def synth_sam_vit_h():
    """sam_vit_h_4b8939.pth layout (build_sam.py:55-78 with
    encoder_embed_dim=1280, depth=32, heads=16, global at 7/15/23/31)."""
    sd = {}
    D, depth, heads = 1280, 32, 16
    hd = D // heads
    grid, ws = 64, 14
    glob = (7, 15, 23, 31)

    p = "image_encoder"
    sd[f"{p}.pos_embed"] = np.zeros((1, grid, grid, D), np.float32)
    sd[f"{p}.patch_embed.proj.weight"] = np.zeros((D, 3, 16, 16), np.float32)
    sd[f"{p}.patch_embed.proj.bias"] = np.zeros(D, np.float32)
    for i in range(depth):
        b = f"{p}.blocks.{i}"
        _norm(sd, f"{b}.norm1", D)
        _norm(sd, f"{b}.norm2", D)
        _lin(sd, f"{b}.attn.qkv", D, 3 * D)
        _lin(sd, f"{b}.attn.proj", D, D)
        L = (2 * grid - 1) if i in glob else (2 * ws - 1)
        sd[f"{b}.attn.rel_pos_h"] = np.zeros((L, hd), np.float32)
        sd[f"{b}.attn.rel_pos_w"] = np.zeros((L, hd), np.float32)
        _lin(sd, f"{b}.mlp.lin1", D, 4 * D)
        _lin(sd, f"{b}.mlp.lin2", 4 * D, D)
    sd[f"{p}.neck.0.weight"] = np.zeros((256, D, 1, 1), np.float32)
    _norm(sd, f"{p}.neck.1", 256)
    sd[f"{p}.neck.2.weight"] = np.zeros((256, 256, 3, 3), np.float32)
    _norm(sd, f"{p}.neck.3", 256)

    p = "prompt_encoder"
    C = 256
    sd[f"{p}.pe_layer.positional_encoding_gaussian_matrix"] = np.zeros((2, C // 2), np.float32)
    for i in range(4):
        sd[f"{p}.point_embeddings.{i}.weight"] = np.zeros((1, C), np.float32)
    sd[f"{p}.not_a_point_embed.weight"] = np.zeros((1, C), np.float32)
    sd[f"{p}.no_mask_embed.weight"] = np.zeros((1, C), np.float32)
    md = [(1, 4, 2), (4, None, None), (4, 16, 2), (16, None, None), (16, C, 1)]
    for idx, (ci, co, k) in zip((0, 1, 3, 4, 6), md):
        if co is None:  # LayerNorm2d
            _norm(sd, f"{p}.mask_downscaling.{idx}", ci)
        else:
            sd[f"{p}.mask_downscaling.{idx}.weight"] = np.zeros(
                (co, ci, k, k), np.float32)
            sd[f"{p}.mask_downscaling.{idx}.bias"] = np.zeros(co, np.float32)

    p = "mask_decoder"
    sd[f"{p}.iou_token.weight"] = np.zeros((1, C), np.float32)
    sd[f"{p}.mask_tokens.weight"] = np.zeros((4, C), np.float32)
    tr = f"{p}.transformer"
    for i in range(2):
        L = f"{tr}.layers.{i}"
        for attn, rate in [("self_attn", 1), ("cross_attn_token_to_image", 2),
                           ("cross_attn_image_to_token", 2)]:
            d = C // rate
            _lin(sd, f"{L}.{attn}.q_proj", C, d)
            _lin(sd, f"{L}.{attn}.k_proj", C, d)
            _lin(sd, f"{L}.{attn}.v_proj", C, d)
            _lin(sd, f"{L}.{attn}.out_proj", d, C)
        for n in range(1, 5):
            _norm(sd, f"{L}.norm{n}", C)
        _lin(sd, f"{L}.mlp.lin1", C, 2048)
        _lin(sd, f"{L}.mlp.lin2", 2048, C)
    d = C // 2
    _lin(sd, f"{tr}.final_attn_token_to_image.q_proj", C, d)
    _lin(sd, f"{tr}.final_attn_token_to_image.k_proj", C, d)
    _lin(sd, f"{tr}.final_attn_token_to_image.v_proj", C, d)
    _lin(sd, f"{tr}.final_attn_token_to_image.out_proj", d, C)
    _norm(sd, f"{tr}.norm_final_attn", C)
    sd[f"{p}.output_upscaling.0.weight"] = np.zeros((C, C // 4, 2, 2), np.float32)
    sd[f"{p}.output_upscaling.0.bias"] = np.zeros(C // 4, np.float32)
    _norm(sd, f"{p}.output_upscaling.1", C // 4)
    sd[f"{p}.output_upscaling.3.weight"] = np.zeros((C // 4, C // 8, 2, 2), np.float32)
    sd[f"{p}.output_upscaling.3.bias"] = np.zeros(C // 8, np.float32)
    for i in range(4):
        m = f"{p}.output_hypernetworks_mlps.{i}"
        _lin(sd, f"{m}.layers.0", C, C)
        _lin(sd, f"{m}.layers.1", C, C)
        _lin(sd, f"{m}.layers.2", C, C // 8)
    h = f"{p}.iou_prediction_head"
    _lin(sd, f"{h}.layers.0", C, C)
    _lin(sd, f"{h}.layers.1", C, C)
    _lin(sd, f"{h}.layers.2", C, 4)
    return sd


@pytest.mark.slow
def test_convert_sam_vit_h_full_scale():
    from sam6d_tpu.weights.convert_sam import convert_sam_state_dict
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from sam6d_tpu.core.config import SAMConfig

    sd = synth_sam_vit_h()
    variables = convert_sam_state_dict(sd, depth=32, grid=64)

    cfg = SAMConfig()  # vit_h defaults
    seg = SAMSegmentor(cfg, variables="eval_shape")
    _assert_same_structure(variables, seg.vars)

    # end-to-end shape trace of the encoder + one decode chunk at full size
    variables = jax.tree.map(jnp.asarray, variables)
    emb = jax.eval_shape(
        lambda v, x: seg.encoder.apply(v, x),
        variables["image_encoder"], jnp.zeros((1, 1024, 1024, 3)))
    assert emb.shape == (1, 64, 64, 256)


# -------------------------------------------------------------- DINOv2 ViT-L

def synth_dinov2_vit_l():
    """dinov2_vitl14_pretrain.pth layout (vision_transformer.py:336-392):
    518-input pos embed (37x37 grid + cls), fused qkv, LayerScale."""
    sd = {}
    D, depth = 1024, 24
    sd["cls_token"] = np.zeros((1, 1, D), np.float32)
    sd["pos_embed"] = np.random.RandomState(0).randn(
        1, 1 + 37 * 37, D).astype(np.float32) * 0.02
    sd["patch_embed.proj.weight"] = np.zeros((D, 3, 14, 14), np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(D, np.float32)
    sd["mask_token"] = np.zeros((1, D), np.float32)  # present, unused
    for i in range(depth):
        b = f"blocks.{i}"
        _norm(sd, f"{b}.norm1", D)
        _norm(sd, f"{b}.norm2", D)
        _lin(sd, f"{b}.attn.qkv", D, 3 * D)
        _lin(sd, f"{b}.attn.proj", D, D)
        sd[f"{b}.ls1.gamma"] = np.ones(D, np.float32)
        sd[f"{b}.ls2.gamma"] = np.ones(D, np.float32)
        _lin(sd, f"{b}.mlp.fc1", D, 4 * D)
        _lin(sd, f"{b}.mlp.fc2", 4 * D, D)
    _norm(sd, "norm", D)
    return sd


@pytest.mark.slow
def test_convert_dinov2_vit_l_full_scale():
    from sam6d_tpu.weights.convert_dinov2 import convert_dinov2_state_dict
    from sam6d_tpu.models.dinov2 import DINOv2
    from sam6d_tpu.core.config import DINOv2Config

    sd = synth_dinov2_vit_l()
    variables = convert_dinov2_state_dict(sd, depth=24, target_grid=16)
    # real interpolation 37x37 -> 16x16 must have happened
    assert variables["params"]["pos_embed"].shape == (1, 1 + 16 * 16, 1024)

    c = DINOv2Config()
    net = DINOv2(patch_size=c.patch_size, embed_dim=c.embed_dim,
                 depth=c.depth, num_heads=c.num_heads)
    want = jax.eval_shape(
        lambda: net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, c.img_size, c.img_size, 3))))
    _assert_same_structure(variables, want)

    out = jax.eval_shape(
        lambda v, x: net.apply(v, x),
        jax.tree.map(jnp.asarray, variables),
        jnp.zeros((2, 224, 224, 3)))
    cls, patch = out
    assert cls.shape == (2, 1024) and patch.shape == (2, 256, 1024)


# ----------------------------------------------------------- released PEM

@pytest.mark.slow
def test_convert_pem_full_scale():
    """The released sam-6d-pem-base checkpoint dimensions: MAE ViT-base
    backbone (feature_extraction.py:50-57) + 3-block coarse/fine matching."""
    from sam6d_tpu.weights.convert_pem import convert_pem_state_dict
    from sam6d_tpu.models.pem import PEMNet
    from sam6d_tpu.core.config import PEMConfig
    from tests.test_convert_full import synth_state_dict

    cfg = PEMConfig()
    sd = synth_state_dict(cfg, np.random.RandomState(0))
    variables = convert_pem_state_dict(
        sd, vit_depth=cfg.vit.depth, coarse_nblock=cfg.coarse.nblock,
        fine_nblock=cfg.fine.nblock)

    net = PEMNet(cfg)
    B, S, NF = 1, cfg.img_size, cfg.fine_npoint
    inputs = dict(
        rgb=jnp.zeros((B, S, S, 3)),
        rgb_choose=jnp.zeros((B, NF), jnp.int32),
        pts=jnp.zeros((B, NF, 3)),
        model=jnp.zeros((B, cfg.n_sample_model_point, 3)),
        dense_po=jnp.zeros((B, NF, 3)),
        dense_fo=jnp.zeros((B, NF, cfg.vit.out_dim)),
    )
    key = jax.random.PRNGKey(0)
    want = jax.eval_shape(lambda: net.init({"params": key}, inputs, key))
    _assert_same_structure(variables, want)

    out = jax.eval_shape(
        lambda v, i, k: net.apply(v, i, k),
        jax.tree.map(jnp.asarray, variables), inputs, key)
    assert out["pred_R"].shape == (B, 3, 3)
    assert out["pred_t"].shape == (B, 3)
