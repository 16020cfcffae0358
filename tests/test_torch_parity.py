"""Numerical parity: JAX modules vs independent torch oracles with shared
weights routed through the checkpoint converter. Validates converter naming
conventions and model math together."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests.torch_ref import (
    TorchViTAE,
    TorchGeoEmbedding,
    TorchGeoTransformer,
    TorchLinearAttnLayer,
)
from sam6d_tpu.weights.convert_pem import (
    convert_vit,
    _geometric_transformer,
    _linear_transformer_layer,
    _linear,
)
from sam6d_tpu.models.vit import ViTEncoder
from sam6d_tpu.models.geo_transformer import (
    GeometricStructureEmbedding,
    GeometricTransformer,
    LinearTransformerLayer,
)

torch.manual_seed(0)


def test_vit_encoder_parity(rng):
    tref = TorchViTAE(img_size=64, patch=16, dim=64, depth=4, heads=4, out_dim=32).eval()
    sd = tref.state_dict_flat()
    params = {
        "vit": convert_vit(sd, "feature_extraction.rgb_net.vit", 4),
        "decoder": {"output_upscaling": _linear(sd, "feature_extraction.rgb_net.output_upscaling")},
    }
    enc = ViTEncoder(img_size=64, patch_size=16, embed_dim=64, depth=4,
                     num_heads=4, out_dim=32)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want_fmap, want_cls = tref(torch.from_numpy(x).permute(0, 3, 1, 2))
    got_fmap, got_cls = enc.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_fmap), want_fmap.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_geo_embedding_parity(rng):
    tref = TorchGeoEmbedding(dim=32).eval()
    sd = tref.state_dict_flat()
    params = {"proj_d": _linear(sd, "geo_embedding.proj_d"),
              "proj_a": _linear(sd, "geo_embedding.proj_a")}
    mod = GeometricStructureEmbedding(hidden_dim=32)
    pts = rng.rand(2, 17, 3).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(pts)).numpy()
    got = np.asarray(mod.apply({"params": params}, jnp.array(pts)))
    # knn near-ties can flip between torch.cdist and the matmul-based
    # distance, perturbing a handful of angle entries — compare robustly
    err = np.abs(got - want)
    assert np.quantile(err, 0.99) < 1e-3
    assert np.median(err) < 1e-4


def test_geometric_transformer_parity(rng):
    dim, heads, N = 32, 4, 9
    tref = TorchGeoTransformer(dim, heads).eval()
    sd = {}
    tref.state_into(sd, "gt")
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = _geometric_transformer(sd, "gt")
    mod = GeometricTransformer(dim, heads)
    f0 = rng.randn(2, N, dim).astype(np.float32)
    f1 = rng.randn(2, N, dim).astype(np.float32)
    e0 = rng.randn(2, N, N, dim).astype(np.float32)
    e1 = rng.randn(2, N, N, dim).astype(np.float32)
    with torch.no_grad():
        w0, w1 = tref(*map(torch.from_numpy, (f0, e0, f1, e1)))
    g0, g1 = mod.apply({"params": params}, *map(jnp.array, (f0, e0, f1, e1)))
    np.testing.assert_allclose(np.asarray(g0), w0.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), w1.numpy(), atol=2e-4)


def test_linear_transformer_layer_parity(rng):
    dim, heads = 32, 4
    tref = TorchLinearAttnLayer(dim, heads).eval()
    sd = {}
    tref.state_into(sd, "lt")
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = _linear_transformer_layer(sd, "lt")
    mod = LinearTransformerLayer(dim, heads)
    x = rng.randn(2, 11, dim).astype(np.float32)
    m = rng.randn(2, 7, dim).astype(np.float32)
    with torch.no_grad():
        want = tref(torch.from_numpy(x), torch.from_numpy(m)).numpy()
    got = np.asarray(mod.apply({"params": params}, jnp.array(x), jnp.array(m)))
    np.testing.assert_allclose(got, want, atol=2e-4)
