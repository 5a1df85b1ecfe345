"""Model contracts: feature shapes, out_indices/in_index wiring, dtype
policy, EncoderDecoder surface."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.models.backbones.resnet import resnet18, resnet50
from semi_seg_ecg_tpu.models.backbones.vision_transformer import vit_tiny


RESNET_CFG = {
    "precision": "fp32",
    "backbone": {
        "resnet18": {
            "num_leads": 1,
            "num_stages": 4,
            "out_indices": [0, 1, 2, 3],
            "dilations": [1, 1, 1, 1],
            "strides": [1, 2, 2, 2],
            "deep_stem": False,
            "avg_down": False,
            "contract_dilation": False,
        }
    },
    "decode_head": {
        "FCNHead": {
            "in_channels": 512,
            "in_index": 3,
            "channels": 128,
            "num_convs": 1,
            "concat_input": False,
            "dropout_ratio": 0.1,
            "num_classes": 4,
            "align_corners": False,
        }
    },
}

VIT_CFG = {
    "precision": "fp32",
    "backbone": {
        "vit_tiny": {
            "seq_len": 2500,
            "patch_size": 25,
            "num_leads": 1,
            "fp16_enabled": True,
        }
    },
    "decode_head": {
        "FCNHead": {
            "in_channels": 192,
            "in_index": 3,
            "channels": 128,
            "num_convs": 1,
            "concat_input": False,
            "dropout_ratio": 0.1,
            "num_classes": 4,
            "align_corners": False,
        }
    },
}


def _init_and_apply(model, x, train=False, **kwargs):
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = model.init(rngs, x, train=train, **kwargs)
    out = model.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.key(3), "droppath": jax.random.key(4)},
        mutable=["batch_stats"] if train else False, **kwargs,
    )
    if train:
        return out[0], variables
    return out, variables


def test_resnet18_stage_shapes():
    # stem /2, maxpool /2, stages strides 1,2,2,2 → lengths 625,313,157,79
    model = resnet18(num_leads=1, dtype=jnp.float32)
    x = jnp.zeros((2, 2500, 1))
    feats, _ = _init_and_apply(model, x)
    lengths = [f.shape[1] for f in feats]
    chans = [f.shape[2] for f in feats]
    assert lengths == [625, 313, 157, 79]
    assert chans == [64, 128, 256, 512]
    assert model.feat_dim == 512


def test_resnet50_bottleneck_channels():
    model = resnet50(num_leads=1, out_indices=(3,), dtype=jnp.float32)
    x = jnp.zeros((1, 512, 1))
    feats, _ = _init_and_apply(model, x)
    assert feats[0].shape[2] == 2048
    assert model.feat_dim == 2048


def test_resnet_out_indices_subset():
    model = resnet18(num_leads=1, out_indices=(1, 3), dtype=jnp.float32)
    feats, _ = _init_and_apply(model, jnp.zeros((1, 1000, 1)))
    assert len(feats) == 2
    assert feats[0].shape[2] == 128 and feats[1].shape[2] == 512


def test_resnet_deep_stem_and_avg_down():
    model = resnet18(num_leads=1, deep_stem=True, avg_down=True,
                     dtype=jnp.float32)
    feats, _ = _init_and_apply(model, jnp.zeros((1, 800, 1)))
    assert feats[-1].shape[2] == 512


def test_resnet_dilations_preserve_length():
    # mmseg os=8 style: stride 1 + dilation in later stages keeps length
    model = resnet18(num_leads=1, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                     dtype=jnp.float32)
    feats, _ = _init_and_apply(model, jnp.zeros((1, 1600, 1)))
    assert feats[1].shape[1] == feats[2].shape[1] == feats[3].shape[1]


def test_vit_tiny_feature_shapes():
    model = vit_tiny(num_leads=1, seq_len=2500, patch_size=25,
                     dtype=jnp.float32)
    x = jnp.zeros((2, 2500, 1))
    feats, _ = _init_and_apply(model, x)
    assert len(feats) == 4  # out_indices (3,5,7,11)
    for f in feats:
        assert f.shape == (2, 100, 192)
    assert model.no_weight_decay() == {"cls_embedding", "pos_embedding"}


def test_vit_final_norm_and_cls_token():
    model = vit_tiny(num_leads=1, seq_len=500, patch_size=25,
                     final_norm=True, output_cls_token=True,
                     out_indices=(11,), dtype=jnp.float32)
    feats, _ = _init_and_apply(model, jnp.zeros((1, 500, 1)))
    patches, cls = feats[0]
    assert patches.shape == (1, 20, 192)
    assert cls.shape == (1, 192)


def test_vit_droppath_and_dropout_train_mode():
    model = vit_tiny(num_leads=1, seq_len=500, patch_size=25,
                     drop_path_rate=0.5, drop_out_rate=0.1,
                     dtype=jnp.float32)
    x = jnp.ones((4, 500, 1))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "droppath": jax.random.key(2)}
    variables = model.init(rngs, x, train=False)
    a = model.apply(variables, x, train=True,
                    rngs={"dropout": jax.random.key(3),
                          "droppath": jax.random.key(4)})
    b = model.apply(variables, x, train=True,
                    rngs={"dropout": jax.random.key(5),
                          "droppath": jax.random.key(6)})
    assert not np.allclose(np.asarray(a[0]), np.asarray(b[0]))
    # eval is deterministic
    c = model.apply(variables, x, train=False)
    d = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(c[0]), np.asarray(d[0]))


def test_encoder_decoder_resnet_contract():
    model = build_model_from_config(RESNET_CFG)
    x = jnp.zeros((2, 1, 2500))
    labels = jnp.zeros((2, 2500), dtype=jnp.int32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    out = model.apply(variables, x, labels=labels, return_loss=True,
                      train=False)
    assert out["seg_logits"].shape == (2, 4, 2500)
    assert out["loss"].shape == ()
    assert np.isfinite(float(out["loss"]))


def test_encoder_decoder_vit_contract():
    model = build_model_from_config(VIT_CFG)
    x = jnp.zeros((2, 1, 2500))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["seg_logits"].shape == (2, 4, 2500)


def test_encoder_decoder_latent_projection():
    cfg = {**RESNET_CFG, "use_latent_projection": True,
           "projection_in_dim": 512, "projection_out_dim": 128}
    model = build_model_from_config(cfg)
    x = jnp.zeros((2, 1, 2500))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False, return_latent=True)
    out = model.apply(variables, x, return_latent=True, train=False)
    assert out["latent"].shape == (2, 128, 2500)


def test_encoder_decoder_auxiliary_heads():
    cfg = {
        **RESNET_CFG,
        "auxiliary_heads": [
            {"FCNHead": {"in_channels": 256, "in_index": 2, "channels": 64,
                         "num_convs": 1, "concat_input": False,
                         "dropout_ratio": 0.0, "num_classes": 4,
                         "align_corners": False}},
        ],
    }
    model = build_model_from_config(cfg)
    x = jnp.zeros((2, 1, 2500))
    labels = jnp.zeros((2, 2500), dtype=jnp.int32)
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, labels=labels, return_loss=True, train=True)
    out, _ = model.apply(
        variables, x, labels=labels, return_loss=True, train=True,
        rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"],
    )
    # correctly-implemented aux path: one logits + one loss per head
    assert len(out["aux_seg_logits"]) == 1
    assert out["aux_seg_logits"][0].shape == (2, 4, 2500)
    assert len(out["loss_aux"]) == 1
    # eval-mode model drops aux heads (base.py:47, train=False)
    model_eval = build_model_from_config(cfg, train=False)
    assert not model_eval.with_auxiliary_heads


def test_bf16_compute_policy_keeps_fp32_params():
    cfg = {**RESNET_CFG, "precision": "bf16"}
    model = build_model_from_config(cfg)
    x = jnp.zeros((1, 1, 2500))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = model.apply(variables, x, train=False)
    assert out["seg_logits"].dtype == jnp.bfloat16


def test_batchnorm_stats_update_only_in_train():
    model = build_model_from_config(RESNET_CFG)
    x = jax.random.normal(jax.random.key(9), (4, 1, 2500))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1)}
    variables = model.init(rngs, x, train=False)
    _, mutated = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_unsupported_names_raise():
    with pytest.raises(AssertionError):
        build_model_from_config(
            {**RESNET_CFG, "backbone": {"nope": {"num_leads": 1}}}
        )
    with pytest.raises(AssertionError):
        build_model_from_config(
            {**RESNET_CFG, "decode_head": {"nope": {}}}
        )

