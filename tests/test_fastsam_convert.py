"""FastSAM-x converter hardening (VERDICT r2 weak #5): a synthetic
state dict written in the REAL ultralytics YOLOv8x-seg layout — key names
and channel arithmetic derived independently from the ultralytics yaml
rules (w=1.25, max 512, depth 1.0), not from this repo's model — must
convert into exactly the FastSAMNet init tree, every model.* tensor must
be consumed (no silently-ignored layers), and the real checkpoint's extra
keys (dfl.conv, the non-trainable DFL arange) must be tolerated.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sam6d_tpu.weights.convert_fastsam import convert_fastsam_state_dict
from sam6d_tpu.models.fastsam import FastSAMNet


def _conv_bn(sd, p, cin, cout, k):
    sd[f"{p}.conv.weight"] = np.zeros((cout, cin, k, k), np.float32)
    sd[f"{p}.bn.weight"] = np.ones(cout, np.float32)
    sd[f"{p}.bn.bias"] = np.zeros(cout, np.float32)
    sd[f"{p}.bn.running_mean"] = np.zeros(cout, np.float32)
    sd[f"{p}.bn.running_var"] = np.ones(cout, np.float32)
    # real ultralytics checkpoints also carry num_batches_tracked
    sd[f"{p}.bn.num_batches_tracked"] = np.zeros((), np.int64)


def _c2f(sd, p, cin, cout, n, ):
    c = cout // 2  # e=0.5
    _conv_bn(sd, f"{p}.cv1", cin, 2 * c, 1)
    _conv_bn(sd, f"{p}.cv2", (2 + n) * c, cout, 1)
    for j in range(n):
        _conv_bn(sd, f"{p}.m.{j}.cv1", c, c, 3)
        _conv_bn(sd, f"{p}.m.{j}.cv2", c, c, 3)


def synth_fastsam_x():
    """FastSAM-x.pt state dict layout (ultralytics yolov8x-seg.yaml,
    width 1.25 capped at 512 -> channels 80/160/320/640/640; n=1 class)."""
    sd = {}
    W = [80, 160, 320, 640, 640]
    m = "model.model"
    # backbone
    _conv_bn(sd, f"{m}.0", 3, W[0], 3)
    _conv_bn(sd, f"{m}.1", W[0], W[1], 3)
    _c2f(sd, f"{m}.2", W[1], W[1], 3)
    _conv_bn(sd, f"{m}.3", W[1], W[2], 3)
    _c2f(sd, f"{m}.4", W[2], W[2], 6)
    _conv_bn(sd, f"{m}.5", W[2], W[3], 3)
    _c2f(sd, f"{m}.6", W[3], W[3], 6)
    _conv_bn(sd, f"{m}.7", W[3], W[4], 3)
    _c2f(sd, f"{m}.8", W[4], W[4], 3)
    # SPPF: hidden = c1 // 2
    _conv_bn(sd, f"{m}.9.cv1", W[4], W[4] // 2, 1)
    _conv_bn(sd, f"{m}.9.cv2", W[4] // 2 * 4, W[4], 1)
    # PAN neck (10/13 Upsample and 11/14/17/20 Concat carry no params)
    _c2f(sd, f"{m}.12", W[4] + W[3], W[3], 3)
    _c2f(sd, f"{m}.15", W[3] + W[2], W[2], 3)
    _conv_bn(sd, f"{m}.16", W[2], W[2], 3)
    _c2f(sd, f"{m}.18", W[2] + W[3], W[3], 3)
    _conv_bn(sd, f"{m}.19", W[3], W[3], 3)
    _c2f(sd, f"{m}.21", W[3] + W[4], W[4], 3)
    # Segment head (module 22): nc=1, reg_max=16, nm=32
    nc, reg_max, nm = 1, 16, 32
    ch = (W[2], W[3], W[4])
    c2 = max(16, ch[0] // 4, reg_max * 4)
    c3 = max(ch[0], min(nc, 100))
    c4 = max(ch[0] // 4, nm)
    for i, c_in in enumerate(ch):
        for branch, mid, out in (("cv2", c2, 4 * reg_max),
                                 ("cv3", c3, nc), ("cv4", c4, nm)):
            p = f"{m}.22.{branch}.{i}"
            _conv_bn(sd, f"{p}.0", c_in, mid, 3)
            _conv_bn(sd, f"{p}.1", mid, mid, 3)
            sd[f"{p}.2.weight"] = np.zeros((out, mid, 1, 1), np.float32)
            sd[f"{p}.2.bias"] = np.zeros(out, np.float32)
    # Proto: mid = 256 * 1.25
    pm = int(256 * 1.25)
    _conv_bn(sd, f"{m}.22.proto.cv1", ch[0], pm, 3)
    sd[f"{m}.22.proto.upsample.weight"] = np.zeros((pm, pm, 2, 2), np.float32)
    sd[f"{m}.22.proto.upsample.bias"] = np.zeros(pm, np.float32)
    _conv_bn(sd, f"{m}.22.proto.cv2", pm, pm, 3)
    _conv_bn(sd, f"{m}.22.proto.cv3", pm, nm, 1)
    # non-trainable DFL conv present in the real file — must be tolerated
    sd[f"{m}.22.dfl.conv.weight"] = np.arange(
        reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    return sd


@pytest.mark.slow
def test_convert_fastsam_x_full_layout():
    sd = synth_fastsam_x()
    variables = convert_fastsam_state_dict(sd)

    # structural identity vs the model's init tree
    net = FastSAMNet()
    want = jax.eval_shape(lambda: net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3))))

    def shapes(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat}

    g, w = shapes(variables), shapes(want)
    mismatch = {k: (g.get(k), w.get(k)) for k in set(g) | set(w)
                if g.get(k) != w.get(k)}
    assert not mismatch, dict(list(mismatch.items())[:10])

    # no silently-ignored layers: every consumable checkpoint tensor maps
    # 1:1 onto a converted leaf (conv weight -> kernel, each bn stat -> one
    # leaf), so the leaf count must equal the consumable key count exactly
    ignorable = {k for k in sd
                 if k.endswith("num_batches_tracked") or ".dfl." in k}
    n_leaves = len(jax.tree_util.tree_leaves(variables))
    assert n_leaves == len(sd) - len(ignorable), (
        n_leaves, len(sd) - len(ignorable))
