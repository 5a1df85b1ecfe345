"""Full-model golden test: the flax ResNet18-1D + FCNHead segmentor with
weights transplanted into a torch replica must produce the same eval-mode
logits. This pins the *composition* (stem geometry, stage wiring, BN eval
semantics, head, final interpolation) — component parity is covered in
test_torch_parity.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from semi_seg_ecg_tpu.models import build_model_from_config  # noqa: E402

CFG = {
    "precision": "fp32",
    "backbone": {
        "resnet18": {
            "num_leads": 1, "num_stages": 4, "out_indices": [0, 1, 2, 3],
            "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
            "deep_stem": False, "avg_down": False, "contract_dilation": False,
        }
    },
    "decode_head": {
        "FCNHead": {
            "in_channels": 512, "in_index": 3, "channels": 128,
            "num_convs": 1, "concat_input": False, "dropout_ratio": 0.1,
            "num_classes": 4, "align_corners": False,
        }
    },
}


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.c1 = tnn.Conv1d(cin, cout, 3, stride=stride, padding=1,
                             bias=False)
        self.b1 = tnn.BatchNorm1d(cout)
        self.c2 = tnn.Conv1d(cout, cout, 3, padding=1, bias=False)
        self.b2 = tnn.BatchNorm1d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = tnn.Sequential(
                tnn.Conv1d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm1d(cout),
            )

    def forward(self, x):
        y = F.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        idn = self.down(x) if self.down is not None else x
        return F.relu(y + idn)


class TorchSegModel(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stem_conv = tnn.Conv1d(1, 64, 7, stride=2, padding=3, bias=False)
        self.stem_bn = tnn.BatchNorm1d(64)
        blocks = []
        cin = 64
        for cout, stride in [(64, 1), (128, 2), (256, 2), (512, 2)]:
            blocks += [TorchBasicBlock(cin, cout, stride),
                       TorchBasicBlock(cout, cout, 1)]
            cin = cout
        self.blocks = tnn.ModuleList(blocks)
        self.head_conv = tnn.Conv1d(512, 128, 3, padding=1, bias=False)
        self.head_bn = tnn.BatchNorm1d(128)
        self.cls = tnn.Conv1d(128, 4, 1)

    def forward(self, x):
        t = x.shape[-1]
        y = F.max_pool1d(F.relu(self.stem_bn(self.stem_conv(x))), 3,
                         stride=2, padding=1)
        for blk in self.blocks:
            y = blk(y)
        y = F.relu(self.head_bn(self.head_conv(y)))
        y = self.cls(y)
        return F.interpolate(y, size=t, mode="linear", align_corners=False)


def _copy_convbn(tconv, tbn, convbn_params, convbn_stats):
    # flax conv kernel (k, in, out) -> torch (out, in, k)
    w = np.asarray(convbn_params["Conv_0"]["kernel"]).transpose(2, 1, 0)
    tconv.weight.data = torch.from_numpy(w.copy())
    bn_p, bn_s = convbn_params["BatchNorm_0"], convbn_stats["BatchNorm_0"]
    tbn.weight.data = torch.from_numpy(np.asarray(bn_p["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(bn_p["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(bn_s["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(bn_s["var"]).copy())


def test_full_forward_matches_torch_transplant(rng):
    model = build_model_from_config(CFG, train=False)
    x = rng.standard_normal((2, 1, 2500)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    params = variables["params"]
    stats = variables["batch_stats"]

    tm = TorchSegModel()
    bb_p, bb_s = params["backbone"], stats["backbone"]
    _copy_convbn(tm.stem_conv, tm.stem_bn, bb_p["stem_0"], bb_s["stem_0"])
    for i, blk in enumerate(tm.blocks):
        stage, j = i // 2 + 1, i % 2
        name = f"layer{stage}_block{j}"
        _copy_convbn(blk.c1, blk.b1, bb_p[name]["ConvBN_0"],
                     bb_s[name]["ConvBN_0"])
        _copy_convbn(blk.c2, blk.b2, bb_p[name]["ConvBN_1"],
                     bb_s[name]["ConvBN_1"])
        if blk.down is not None:
            down_p = bb_p[name]["Downsample_0"]["ConvBN_0"]
            down_s = bb_s[name]["Downsample_0"]["ConvBN_0"]
            _copy_convbn(blk.down[0], blk.down[1], down_p, down_s)
    head_p, head_s = params["decode_head"], stats["decode_head"]
    _copy_convbn(tm.head_conv, tm.head_bn, head_p["conv0"], head_s["conv0"])
    cls_w = np.asarray(head_p["cls_seg"]["kernel"]).transpose(2, 1, 0)
    tm.cls.weight.data = torch.from_numpy(cls_w.copy())
    tm.cls.bias.data = torch.from_numpy(
        np.asarray(head_p["cls_seg"]["bias"]).copy())

    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        model.apply(variables, jnp.asarray(x), train=False)["seg_logits"]
    )
    assert ours.shape == ref.shape == (2, 4, 2500)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
