"""Deployment export (deploy/export.py): StableHLO round-trip fidelity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sam6d_tpu.deploy import (export_fn, export_pem_infer, load_exported,
                              pem_example_inputs, save_exported)
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
