"""Multi-object streaming serving (BASELINE config 5): onboard two objects,
stream two synthetic RGB-D frames, get per-object detections + poses from
one batched PEM dispatch per frame."""
import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from sam6d_tpu.core.config import (
    ISMConfig, SAMConfig, DINOv2Config, ISMMatchingConfig, PEMConfig,
    ViTConfig, PointMatchingConfig, GeoEmbeddingConfig)
from sam6d_tpu.pipelines.ism import ISMPipeline
from sam6d_tpu.pipelines.pem import PEMPipeline
from sam6d_tpu.pipelines.streaming import MultiObjectStream

from sam6d_tpu.pipelines.sam_amg import SAMSegmentor
from tests.test_ism_pipeline import tiny_ism_cfg, tiny_sam_cfg
from tests.test_pem_pipeline import tiny_pem_cfg


def _make_template_dir(path, rng, n=42, size=32):
    os.makedirs(path, exist_ok=True)
    for i in range(n):
        rgb = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        m = np.zeros((size, size), np.uint8)
        m[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = 255
        xyz = (rng.rand(size, size, 3).astype(np.float32) - 0.5) * 100  # mm
        Image.fromarray(rgb).save(f"{path}/rgb_{i}.png")
        Image.fromarray(m).save(f"{path}/mask_{i}.png")
        np.save(f"{path}/xyz_{i}.npy", xyz)


@pytest.mark.slow
def test_multi_object_stream(tmp_path, rng):
    ism_cfg = tiny_ism_cfg()
    ism = ISMPipeline(ism_cfg, segmentor=SAMSegmentor(tiny_sam_cfg(), seed=0),
                      seed=0)
    pem = PEMPipeline(tiny_pem_cfg(), seed=0)
    stream = MultiObjectStream(ism, pem, det_score_thresh=-1.0)

    for oid in (7, 11):
        tdir = str(tmp_path / f"obj_{oid}")
        _make_template_dir(tdir, rng)
        model_pts = (rng.rand(64, 3).astype(np.float32) - 0.5) * 0.08
        stream.onboard_object(oid, tdir, model_pts)

    H, W = 48, 64
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    for f in range(2):
        rgb = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        depth = (rng.rand(H, W) * 400 + 400).astype(np.float32)
        out = stream.process_frame(rgb, depth, K, depth_scale=1.0, seed=f)
        assert set(out) == {"detections", "poses", "ms"}
        for d in out["detections"]:
            assert d["object_id"] in (0, 1)  # onboarded indices
        for p in out["poses"]:
            assert p["object_id"] in (7, 11)  # external ids mapped back
            R = np.array(p["R"])
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-2)
            assert np.isfinite(p["score"])

    tp = stream.throughput()
    assert tp["frames"] == 2
    assert tp["ms_per_frame"] > 0


@pytest.mark.slow
def test_pipelined_stream_matches_sync(tmp_path, rng):
    """process_stream (double-buffered device dispatch) yields the same
    per-frame detections/poses as the synchronous path, in order."""
    def build():
        ism = ISMPipeline(tiny_ism_cfg(),
                          segmentor=SAMSegmentor(tiny_sam_cfg(), seed=0),
                          seed=0)
        pem = PEMPipeline(tiny_pem_cfg(), seed=0)
        return MultiObjectStream(ism, pem, det_score_thresh=-1.0)

    tdir = str(tmp_path / "obj")
    _make_template_dir(tdir, rng)
    model_pts = (rng.rand(64, 3).astype(np.float32) - 0.5) * 0.08

    H, W = 48, 64
    K = np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    frame_rng = np.random.RandomState(3)
    items = []
    for _ in range(3):
        rgb = (frame_rng.rand(H, W, 3) * 255).astype(np.uint8)
        depth = (frame_rng.rand(H, W) * 400 + 400).astype(np.float32)
        items.append((rgb, depth, K, 1.0))

    s_sync = build()
    s_sync.onboard_object(7, tdir, model_pts)
    ref = [s_sync.process_frame(*it) for it in items]

    s_pipe = build()
    s_pipe.onboard_object(7, tdir, model_pts)
    out = list(s_pipe.process_stream(iter(items), depth_in_flight=1))

    assert len(out) == len(ref) == 3
    assert s_pipe.throughput()["frames"] == 3
    for a, b in zip(out, ref):
        assert len(a["detections"]) == len(b["detections"])
        assert len(a["poses"]) == len(b["poses"])
        for pa, pb in zip(a["poses"], b["poses"]):
            np.testing.assert_allclose(pa["R"], pb["R"], atol=1e-5)
            np.testing.assert_allclose(pa["t"], pb["t"], atol=1e-3)
