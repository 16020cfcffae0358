"""Full-checkpoint converter test: a synthetic state_dict with the exact
reference module names/shapes converts into a tree that matches PEMNet.init
structure-and-shape exactly, and the network runs with it."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from sam6d_tpu.weights.convert_pem import convert_pem_state_dict
from sam6d_tpu.models.pem import PEMNet
from tests.test_pem_model import tiny_cfg
import dataclasses


def synth_state_dict(cfg, rng):
    """Reference-named random state dict for the tiny config."""
    sd = {}
    D = cfg.vit.embed_dim
    G = cfg.vit.img_size // cfg.vit.patch_size
    H = cfg.geo_embedding.hidden_dim

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.05

    def ln(name, d):
        sd[name + ".weight"] = np.ones(d, np.float32)
        sd[name + ".bias"] = np.zeros(d, np.float32)

    fx = "feature_extraction.rgb_net"
    sd[f"{fx}.vit.cls_token"] = rng.randn(1, 1, D).astype(np.float32) * 0.02
    sd[f"{fx}.vit.pos_embed"] = rng.randn(1, G * G + 1, D).astype(np.float32) * 0.02
    sd[f"{fx}.vit.patch_embed.proj.weight"] = rng.randn(
        D, 3, cfg.vit.patch_size, cfg.vit.patch_size).astype(np.float32) * 0.05
    sd[f"{fx}.vit.patch_embed.proj.bias"] = np.zeros(D, np.float32)
    ln(f"{fx}.vit.norm", D)
    for i in range(cfg.vit.depth):
        b = f"{fx}.vit.blocks.{i}"
        ln(b + ".norm1", D)
        lin(b + ".attn.qkv", D, 3 * D)
        lin(b + ".attn.proj", D, D)
        ln(b + ".norm2", D)
        lin(b + ".mlp.fc1", D, 4 * D)
        lin(b + ".mlp.fc2", 4 * D, D)
    lin(f"{fx}.output_upscaling", 4 * D, 16 * cfg.vit.out_dim)

    lin("geo_embedding.proj_d", H, H)
    lin("geo_embedding.proj_a", H, H)

    def attn_layer(prefix, dim, rpe):
        names = ["proj_q", "proj_k", "proj_v"] + (["proj_p"] if rpe else [])
        for n in names:
            lin(f"{prefix}.attention.attention.{n}", dim, dim)
        lin(f"{prefix}.attention.linear", dim, dim)
        ln(f"{prefix}.attention.norm", dim)
        lin(f"{prefix}.output.expand", dim, 2 * dim)
        lin(f"{prefix}.output.squeeze", 2 * dim, dim)
        ln(f"{prefix}.output.norm", dim)

    hc = cfg.coarse.hidden_dim
    lin("coarse_point_matching.in_proj", cfg.coarse.input_dim, hc)
    lin("coarse_point_matching.out_proj", hc, cfg.coarse.out_dim)
    sd["coarse_point_matching.bg_token"] = rng.randn(1, 1, hc).astype(np.float32) * 0.02
    for i in range(cfg.coarse.nblock):
        attn_layer(f"coarse_point_matching.transformers.{i}.layers.0", hc, True)
        attn_layer(f"coarse_point_matching.transformers.{i}.layers.1", hc, False)

    hf = cfg.fine.hidden_dim
    lin("fine_point_matching.in_proj", cfg.fine.input_dim, hf)
    lin("fine_point_matching.out_proj", hf, cfg.fine.out_dim)
    sd["fine_point_matching.bg_token"] = rng.randn(1, 1, hf).astype(np.float32) * 0.02
    for m, chans in [("mlp1", (6, 32, 64, 128)), ("mlp2", (6, 32, 64, 128))]:
        for i in range(3):
            sd[f"fine_point_matching.PE.{m}.layer{i}.conv.weight"] = (
                rng.randn(chans[i + 1], chans[i], 1, 1).astype(np.float32) * 0.05)
            sd[f"fine_point_matching.PE.{m}.layer{i}.normlayer.bn.weight"] = np.ones(chans[i + 1], np.float32)
            sd[f"fine_point_matching.PE.{m}.layer{i}.normlayer.bn.bias"] = np.zeros(chans[i + 1], np.float32)
            sd[f"fine_point_matching.PE.{m}.layer{i}.normlayer.bn.running_mean"] = np.zeros(chans[i + 1], np.float32)
            sd[f"fine_point_matching.PE.{m}.layer{i}.normlayer.bn.running_var"] = np.ones(chans[i + 1], np.float32)
    sd["fine_point_matching.PE.mlp3.conv.weight"] = rng.randn(hf, 256, 1).astype(np.float32) * 0.05
    sd["fine_point_matching.PE.mlp3.conv.bias"] = np.zeros(hf, np.float32)
    for i in range(cfg.fine.nblock):
        base = f"fine_point_matching.transformers.{i}"
        attn_layer(f"{base}.sparse_layer.layers.0", hf, True)
        attn_layer(f"{base}.sparse_layer.layers.1", hf, False)
        for n in ["proj_q", "proj_k", "proj_v"]:
            lin(f"{base}.dense_layer.attention.attention.{n}", hf, hf)
        sd[f"{base}.dense_layer.attention.attention.scale"] = np.zeros((1, 1, hf), np.float32)
        lin(f"{base}.dense_layer.attention.linear", hf, hf)
        ln(f"{base}.dense_layer.attention.norm", hf)
        lin(f"{base}.dense_layer.output.expand", hf, 2 * hf)
        lin(f"{base}.dense_layer.output.squeeze", 2 * hf, hf)
        ln(f"{base}.dense_layer.output.norm", hf)
    return sd


@pytest.mark.slow
def test_convert_full_matches_init_tree(rng):
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg, geo_embedding=dataclasses.replace(cfg.geo_embedding, hidden_dim=32))
    sd = synth_state_dict(cfg, rng)
    variables = convert_pem_state_dict(
        sd, vit_depth=cfg.vit.depth, coarse_nblock=cfg.coarse.nblock,
        fine_nblock=cfg.fine.nblock)
    variables = jax.tree.map(jnp.asarray, variables)

    net = PEMNet(cfg)
    B, S, NF = 1, cfg.img_size, cfg.fine_npoint
    inputs = dict(
        rgb=jnp.array(rng.rand(B, S, S, 3), jnp.float32),
        rgb_choose=jnp.array(rng.randint(0, S * S, (B, NF))),
        pts=jnp.array(rng.rand(B, NF, 3), jnp.float32),
        model=jnp.array(rng.rand(B, cfg.n_sample_model_point, 3), jnp.float32),
        dense_po=jnp.array(rng.rand(B, NF, 3), jnp.float32),
        dense_fo=jnp.array(rng.rand(B, NF, cfg.vit.out_dim), jnp.float32),
    )
    key = jax.random.PRNGKey(0)
    ref_vars = net.init({"params": key}, inputs, key)

    # structural identity: same tree paths, same leaf shapes
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_vars)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    got_paths = {jax.tree_util.keystr(p): v.shape for p, v in got_flat}
    assert ref_paths == got_paths, (
        set(ref_paths) ^ set(got_paths),
        {k: (ref_paths.get(k), got_paths.get(k))
         for k in ref_paths if got_paths.get(k) != ref_paths[k]},
    )

    out = net.apply(variables, inputs, key)
    assert np.isfinite(np.asarray(out["pred_R"])).all()


def test_load_partial(rng):
    from sam6d_tpu.weights.partial import load_partial
    target = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4), "d": np.zeros(5)}}
    source = {"a": np.ones((2, 3)), "b": {"c": np.ones(9)}}
    merged, report = load_partial(target, source)
    np.testing.assert_array_equal(merged["a"], 1.0)
    np.testing.assert_array_equal(merged["b"]["c"], 0.0)  # shape mismatch
    assert report["['a']"] == "loaded"
    assert report["['b']['c']"] == "shape_mismatch"
    assert report["['b']['d']"] == "missing_in_source"
