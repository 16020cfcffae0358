"""Deployment export (deploy/export.py): StableHLO round-trip fidelity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam6d_tpu.deploy import (export_fn, export_pem_infer, load_exported,
                              pem_example_inputs, save_exported,
                              export_sam_decode, export_dinov2_describe)
from sam6d_tpu.models.pem import PEMNet
from tests.test_pem_pipeline import tiny_pem_cfg


def test_export_roundtrip_simple(tmp_path):
    def f(x, y):
        return {"s": jnp.sin(x) @ y, "n": jnp.linalg.norm(x)}

    x = jnp.asarray(np.random.RandomState(0).rand(8, 16).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(16, 4).astype(np.float32))
    data = export_fn(f, (x, y), platforms=("cpu",))
    path = save_exported(data, str(tmp_path / "f.bin"))

    runner = load_exported(path)
    out = runner(x, y)
    ref = f(x, y)
    np.testing.assert_allclose(out["s"], ref["s"], atol=1e-6)
    np.testing.assert_allclose(out["n"], ref["n"], atol=1e-6)
    assert runner.platforms == ("cpu",)


def test_export_rejects_wrong_shape():
    f = lambda x: x * 2
    data = export_fn(f, (jnp.zeros((4, 4)),), platforms=("cpu",))
    runner = load_exported(data)
    with pytest.raises(Exception):
        runner(jnp.zeros((5, 4)))


@pytest.mark.slow
def test_export_pem_infer_matches_direct_apply(tmp_path):
    cfg = tiny_pem_cfg()
    net = PEMNet(cfg)
    B = 2
    rng = np.random.RandomState(0)
    inputs = pem_example_inputs(cfg, B)
    # realistic values (zeros would degenerate the solvers)
    inputs = dict(
        inputs,
        rgb=jnp.asarray(rng.rand(*inputs["rgb"].shape).astype(np.float32)),
        rgb_choose=jnp.asarray(rng.randint(
            0, cfg.img_size ** 2, inputs["rgb_choose"].shape, dtype=np.int32)),
        pts=jnp.asarray(rng.rand(*inputs["pts"].shape).astype(np.float32) * 0.1),
        model=jnp.asarray(rng.rand(*inputs["model"].shape).astype(np.float32) * 0.1),
        dense_po=jnp.asarray(
            (rng.rand(*inputs["dense_po"].shape).astype(np.float32) - 0.5) * 0.1),
        dense_fo=jnp.asarray(rng.rand(*inputs["dense_fo"].shape).astype(np.float32)),
        pe_o=jnp.asarray(rng.rand(*inputs["pe_o"].shape).astype(np.float32)),
    )
    key = jax.random.PRNGKey(7)
    variables = net.init({"params": jax.random.PRNGKey(0)}, inputs, key)

    data = export_pem_infer(cfg, variables, batch_size=B,
                            path=str(tmp_path / "pem.bin"),
                            platforms=("cpu",))
    runner = load_exported(str(tmp_path / "pem.bin"))
    out = runner(inputs, key)
    # compare against the JIT-COMPILED program (the production contract):
    # eager op-by-op dispatch can reassociate fp differently, which flips
    # the coarse solver's discrete hypothesis argmax on tiny random configs
    ref = jax.jit(lambda i, k: net.apply(variables, i, k))(inputs, key)
    for k in ("pred_R", "pred_t", "pred_pose_score"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-4, err_msg=k)
    # self-contained: artifact alone reproduces a valid rotation
    R = np.asarray(out["pred_R"][0])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)


@pytest.mark.slow
def test_export_sam_decode_matches_predictor_program(tmp_path, rng):
    """The exported prompt-encoder+decoder artifact (the reference
    SamOnnxModel scope) loads and reproduces the jitted decode program."""
    from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
    from tests.test_ism_pipeline import tiny_sam_cfg

    cfg = tiny_sam_cfg()
    seg = SAMSegmentor(cfg, seed=3)
    g = cfg.img_size // cfg.patch_size
    C = cfg.prompt_embed_dim

    export_sam_decode(cfg, seg.vars, num_prompts=2,
                      path=str(tmp_path / "sam_decode.bin"),
                      platforms=("cpu",))
    runner = load_exported(str(tmp_path / "sam_decode.bin"))

    emb = jnp.asarray(rng.randn(g, g, C).astype(np.float32) * 0.1)
    pts = jnp.asarray((rng.rand(2, 1, 2) * cfg.img_size).astype(np.float32))
    lbl = jnp.ones((2, 1), jnp.int32)
    mask_in = jnp.asarray(rng.randn(2, 4 * g, 4 * g, 1).astype(np.float32))

    for has_mask in (0.0, 1.0):
        masks, iou = runner(emb, pts, lbl, mask_in,
                            jnp.asarray(has_mask, jnp.float32))
        assert masks.shape == (2, 4, 4 * g, 4 * g)
        assert iou.shape == (2, 4)
        assert np.isfinite(np.asarray(masks)).all()

    # no-mask case must agree with the predictor's point-decode program
    dense_pe = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                        method="dense_pe")
    sparse, dense = seg.prompt_encoder.apply(seg.vars["prompt_encoder"],
                                             pts, lbl)
    want_b, want_iou = jax.jit(lambda *a: seg.mask_decoder.apply(
        seg.vars["mask_decoder"], *a))(emb, dense_pe, sparse, dense)
    got_m, got_iou = runner(emb, pts, lbl, mask_in, jnp.asarray(0.0))
    want = np.asarray(want_b).reshape(2, 4, 2, 2, g, g, 2, 2).transpose(
        0, 1, 4, 6, 2, 5, 7, 3).reshape(2, 4, 4 * g, 4 * g)
    np.testing.assert_allclose(np.asarray(got_m), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_iou), np.asarray(want_iou),
                               atol=1e-4)


@pytest.mark.slow
def test_export_dinov2_describe(tmp_path, rng):
    from sam6d_tpu.models.dinov2 import DINOv2
    from sam6d_tpu.core.config import DINOv2Config

    cfg = DINOv2Config(model_name="tiny", patch_size=14, embed_dim=32,
                       depth=2, num_heads=4, img_size=28)
    net = DINOv2(img_size=cfg.img_size, patch_size=cfg.patch_size,
                 embed_dim=cfg.embed_dim, depth=cfg.depth,
                 num_heads=cfg.num_heads)
    x0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    variables = net.init(jax.random.PRNGKey(0), x0)

    export_dinov2_describe(cfg, variables, batch=3,
                           path=str(tmp_path / "dinov2.bin"),
                           platforms=("cpu",))
    runner = load_exported(str(tmp_path / "dinov2.bin"))
    crops = jnp.asarray(rng.rand(3, cfg.img_size, cfg.img_size, 3)
                        .astype(np.float32))
    cls, patch = runner(crops)
    want_cls, want_patch = jax.jit(net.apply)(variables, crops)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(want_cls),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(patch), np.asarray(want_patch),
                               atol=1e-5)
