"""Full-model golden test for the second backbone family: the flax
ViT-tiny-1D + FCNHead segmentor with weights transplanted into a torch
replica must produce the same eval-mode logits.

This pins the ViT *composition* against the reference semantics
(src/models/backbones/vision_transformer.py:197-366): patchify '(p c)'
element order + LN/Linear/LN embedding, cls+pos addition, pre-norm blocks
(LN→QKV→softmax→proj, LN→MLP with exact GELU), head-major QKV split,
cls-token drop at out_indices, and the head + final linear interpolation.
Component parity is covered in test_torch_parity.py; the ResNet composition
in test_full_model_parity.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from semi_seg_ecg_tpu.models import build_model_from_config  # noqa: E402

WIDTH, HEADS, DIM_HEAD, MLP, DEPTH = 192, 3, 64, 768, 12
PATCH, SEQ = 25, 200

CFG = {
    "precision": "fp32",
    "backbone": {
        "vit_tiny": {
            "num_leads": 1, "seq_len": SEQ, "patch_size": PATCH,
            "out_indices": [11], "qkv_bias": True,
        }
    },
    "decode_head": {
        "FCNHead": {
            "in_channels": WIDTH, "in_index": 0, "channels": 32,
            "num_convs": 1, "concat_input": False, "dropout_ratio": 0.0,
            "num_classes": 4, "align_corners": False,
        }
    },
}


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        inner = HEADS * DIM_HEAD
        self.ln1 = tnn.LayerNorm(WIDTH)
        self.qkv = tnn.Linear(WIDTH, inner * 3)
        self.proj = tnn.Linear(inner, WIDTH)
        self.ln2 = tnn.LayerNorm(WIDTH)
        self.fc1 = tnn.Linear(WIDTH, MLP)
        self.fc2 = tnn.Linear(MLP, WIDTH)

    def forward(self, x):
        b, n, _ = x.shape
        q, k, v = self.qkv(self.ln1(x)).chunk(3, dim=-1)
        shp = (b, n, HEADS, DIM_HEAD)
        q, k, v = (t.view(shp).transpose(1, 2) for t in (q, k, v))
        attn = torch.softmax(q @ k.transpose(-2, -1) * DIM_HEAD**-0.5, -1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, HEADS * DIM_HEAD)
        x = x + self.proj(out)
        x = x + self.fc2(F.gelu(self.fc1(self.ln2(x))))
        return x


class TorchViTSeg(tnn.Module):
    def __init__(self):
        super().__init__()
        n = SEQ // PATCH
        self.ln_pre = tnn.LayerNorm(PATCH)
        self.embed = tnn.Linear(PATCH, WIDTH)
        self.ln_post = tnn.LayerNorm(WIDTH)
        self.cls_emb = tnn.Parameter(torch.zeros(WIDTH))
        self.pos_emb = tnn.Parameter(torch.zeros(1, n + 1, WIDTH))
        self.blocks = tnn.ModuleList(TorchBlock() for _ in range(DEPTH))
        self.head_conv = tnn.Conv1d(WIDTH, 32, 3, padding=1, bias=False)
        self.head_bn = tnn.BatchNorm1d(32)
        self.cls_seg = tnn.Conv1d(32, 4, 1)

    def forward(self, x):  # (B, 1, T)
        b, c, t = x.shape
        n = t // PATCH
        # patchify keeping '(p c)' element order (reference einops
        # Rearrange('b c (n p) -> b n (p c)'))
        y = x.transpose(1, 2).reshape(b, n, PATCH * c)
        y = self.ln_post(self.embed(self.ln_pre(y)))
        cls = self.cls_emb.expand(b, 1, WIDTH)
        y = torch.cat([cls, y], dim=1) + self.pos_emb[:, : n + 1]
        for blk in self.blocks:
            y = blk(y)
        z = y[:, 1:, :].transpose(1, 2)  # drop cls → NCW
        z = self.cls_seg(F.relu(self.head_bn(self.head_conv(z))))
        return F.interpolate(z, size=t, mode="linear", align_corners=False)


def _lin(tmod, p):
    tmod.weight.data = torch.from_numpy(np.asarray(p["kernel"]).T.copy())
    tmod.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def _ln(tmod, p):
    tmod.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    tmod.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def test_full_vit_forward_matches_torch_transplant(rng):
    model = build_model_from_config(CFG, train=False)
    x = rng.standard_normal((2, 1, SEQ)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    params = variables["params"]
    bb = params["backbone"]

    tm = TorchViTSeg()
    _ln(tm.ln_pre, bb["LayerNorm_0"])
    _lin(tm.embed, bb["Dense_0"])
    _ln(tm.ln_post, bb["LayerNorm_1"])
    tm.cls_emb.data = torch.from_numpy(np.asarray(bb["cls_embedding"]).copy())
    tm.pos_emb.data = torch.from_numpy(np.asarray(bb["pos_embedding"]).copy())
    for i, blk in enumerate(tm.blocks):
        attn = bb[f"block{i}"]["Attention_0"]
        ff = bb[f"block{i}"]["FeedForward_0"]
        _ln(blk.ln1, attn["LayerNorm_0"])
        _lin(blk.qkv, attn["Dense_0"])
        _lin(blk.proj, attn["Dense_1"])
        _ln(blk.ln2, ff["LayerNorm_0"])
        _lin(blk.fc1, ff["Dense_0"])
        _lin(blk.fc2, ff["Dense_1"])

    head_p = params["decode_head"]
    head_s = variables["batch_stats"]["decode_head"]
    conv_w = np.asarray(head_p["conv0"]["Conv_0"]["kernel"]).transpose(2, 1, 0)
    tm.head_conv.weight.data = torch.from_numpy(conv_w.copy())
    bn_p, bn_s = head_p["conv0"]["BatchNorm_0"], head_s["conv0"]["BatchNorm_0"]
    tm.head_bn.weight.data = torch.from_numpy(np.asarray(bn_p["scale"]).copy())
    tm.head_bn.bias.data = torch.from_numpy(np.asarray(bn_p["bias"]).copy())
    tm.head_bn.running_mean.data = torch.from_numpy(
        np.asarray(bn_s["mean"]).copy())
    tm.head_bn.running_var.data = torch.from_numpy(
        np.asarray(bn_s["var"]).copy())
    cls_w = np.asarray(head_p["cls_seg"]["kernel"]).transpose(2, 1, 0)
    tm.cls_seg.weight.data = torch.from_numpy(cls_w.copy())
    tm.cls_seg.bias.data = torch.from_numpy(
        np.asarray(head_p["cls_seg"]["bias"]).copy())

    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        model.apply(variables, jnp.asarray(x), train=False)["seg_logits"]
    )
    assert ours.shape == ref.shape == (2, 4, SEQ)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
