"""Torch-checkpoint interop: the converter must map the ACTUAL reference
models' state_dicts onto this framework's trees (and back) such that
eval-mode forwards agree.

This is stronger than the hand-rolled-replica goldens
(test_full_model_parity.py): the torch side here is the reference's own
``EncoderDecoder`` / ``ResNet`` / ``VisionTransformer`` / ``FCNHead`` code
imported from /root/reference/src."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_compat import import_reference_module  # noqa: E402
from semi_seg_ecg_tpu.models import build_model_from_config  # noqa: E402
from semi_seg_ecg_tpu.utils.torch_interop import (  # noqa: E402
    torch_sd_to_trees,
    trees_to_torch_sd,
)

RESNET_CFG = {
    "precision": "fp32",
    "backbone": {
        "resnet18": {"num_leads": 1, "num_stages": 4,
                     "out_indices": [0, 1, 2, 3], "dilations": [1, 1, 1, 1],
                     "strides": [1, 2, 2, 2], "deep_stem": False,
                     "avg_down": False, "contract_dilation": False}
    },
    "decode_head": {
        "FCNHead": {"in_channels": 512, "in_index": 3, "channels": 128,
                    "num_convs": 1, "concat_input": False,
                    "dropout_ratio": 0.0, "num_classes": 4,
                    "align_corners": False}
    },
}

VIT_CFG = {
    "precision": "fp32",
    "backbone": {
        "vit_tiny": {"num_leads": 1, "seq_len": 2500, "patch_size": 25,
                     "out_indices": [3, 5, 7, 11], "layer_scale": 1e-5,
                     "final_norm": True}
    },
    "decode_head": {
        "FCNHead": {"in_channels": 192, "in_index": 3, "channels": 128,
                    "num_convs": 1, "concat_input": True,
                    "dropout_ratio": 0.0, "num_classes": 4,
                    "align_corners": False}
    },
}


def _reference_model(cfg, train=False):
    base = import_reference_module("algorithms.base")
    return base.init_model_from_cfg(cfg, train=train)


def _init_flax(cfg, with_projection=False):
    model = build_model_from_config(cfg, train=False)
    dummy = jnp.zeros((1, 1, 2500), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        dummy, train=False, return_latent=with_projection,
    )
    return model, variables["params"], variables.get("batch_stats", {})


@pytest.mark.parametrize("cfg", [RESNET_CFG, VIT_CFG],
                         ids=["resnet18", "vit_tiny"])
def test_reference_state_dict_transplants(rng, cfg):
    tmodel = _reference_model(cfg)
    tmodel.eval()
    model, params_t, stats_t = _init_flax(cfg)
    params, stats = torch_sd_to_trees(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        params_t, stats_t,
    )

    x = rng.standard_normal((2, 1, 2500)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x))["seg_logits"].numpy()
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False,
    )["seg_logits"])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("cfg", [RESNET_CFG, VIT_CFG],
                         ids=["resnet18", "vit_tiny"])
def test_roundtrip_and_key_set(cfg):
    """flax -> torch sd -> flax is the identity, and the exported key set is
    exactly what the reference model's load_state_dict(strict=True) needs."""
    _, params, stats = _init_flax(cfg)
    sd = trees_to_torch_sd(params, stats)

    tmodel = _reference_model(cfg)
    result = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not result.missing_keys and not result.unexpected_keys

    params2, stats2 = torch_sd_to_trees(sd, params, stats)
    jax.tree.map(np.testing.assert_array_equal, params, params2)
    jax.tree.map(np.testing.assert_array_equal, stats, stats2)


def test_backbone_only_contract(rng):
    """Pretrained-backbone checkpoints hold a bare backbone state_dict
    (reference base.py:289-300); backbone_only maps that contract."""
    backbones = import_reference_module("models.backbones")
    tbackbone = backbones.resnet18(num_leads=1, **{
        k: v for k, v in RESNET_CFG["backbone"]["resnet18"].items()
        if k != "num_leads"
    })
    tbackbone.eval()
    _, params, stats = _init_flax(RESNET_CFG)
    bb_params, bb_stats = torch_sd_to_trees(
        {k: v.numpy() for k, v in tbackbone.state_dict().items()},
        params["backbone"], stats["backbone"], backbone_only=True,
    )
    x = rng.standard_normal((2, 1, 2500)).astype(np.float32)
    with torch.no_grad():
        ref = tbackbone(torch.from_numpy(x))[-1].numpy()
    from semi_seg_ecg_tpu.models.backbones import resnet as frn

    fb = frn.resnet18(num_leads=1, dtype=jnp.float32, **{
        k: v for k, v in RESNET_CFG["backbone"]["resnet18"].items()
        if k != "num_leads"
    })
    ours = np.asarray(fb.apply(
        {"params": bb_params, "batch_stats": bb_stats},
        jnp.asarray(x.transpose(0, 2, 1)), train=False,
    )[-1]).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_pretrained_backbone_pth_e2e(e2e_data, tmp_path, rng):
    """`pretrained_backbone:` pointing at a reference-format torch .pth
    warm-starts the backbone (base.py:289-300 contract) and trains e2e."""
    from test_algorithms_e2e import make_config
    from semi_seg_ecg_tpu.algorithms import get_algorithm
    from semi_seg_ecg_tpu.algorithms.common import (
        init_model_state, load_pretrained_backbone,
    )

    backbones = import_reference_module("models.backbones")
    tbackbone = backbones.resnet18(num_leads=1)
    pth = str(tmp_path / "pretrain.pth")
    torch.save({"model": tbackbone.state_dict()}, pth)

    config = make_config(e2e_data, tmp_path, "base", epochs=1)
    config["mode"] = "finetune"
    config["pretrained_backbone"] = pth

    model = build_model_from_config(config, train=True)
    state = init_model_state(model, config, seed=0)
    loaded = load_pretrained_backbone(config, state)
    stem = np.asarray(
        loaded.params["backbone"]["stem_0"]["Conv_0"]["kernel"])
    ref_stem = tbackbone.state_dict()["stem.0.weight"].numpy()
    np.testing.assert_allclose(stem, ref_stem.transpose(2, 1, 0), atol=1e-7)

    get_algorithm("base").train(config)
    exp = os.path.join(config["output_dir"], config["exp_name"])
    assert os.path.exists(os.path.join(exp, "best-loss.ckpt"))


def test_convert_checkpoint_cli_roundtrip(e2e_data, tmp_path):
    """Train -> export .pth (loads strictly into the reference model) ->
    re-import -> identical test metrics; and test entry consumes the .pth
    directly via model_path."""
    from test_algorithms_e2e import make_config
    from tools.convert_checkpoint import main as convert_main
    from semi_seg_ecg_tpu.algorithms import get_algorithm

    config = make_config(e2e_data, tmp_path, "base", epochs=1)
    algo = get_algorithm("base")
    algo.train(config)
    exp = os.path.join(config["output_dir"], config["exp_name"])
    src = os.path.join(exp, "best-MeanIoU.ckpt")
    pth = str(tmp_path / "exported.pth")
    back = str(tmp_path / "reimported.ckpt")
    convert_main(["to-torch", src, pth])
    convert_main(["to-framework", pth, back])

    # exported .pth loads strictly into the reference's eval model
    base_mod = import_reference_module("algorithms.base")
    tmodel = base_mod.init_model_from_cfg(config, train=False)
    sd = torch.load(pth, map_location="cpu", weights_only=False)["model"]
    tmodel.load_state_dict(sd, strict=True)

    metrics_direct = algo.test(config)
    config_pth = {**config, "test": {**config["test"], "model_path": pth}}
    metrics_pth = algo.test(config_pth)
    config_back = {**config, "test": {**config["test"], "model_path": back}}
    metrics_back = algo.test(config_back)
    for k, v in metrics_direct.items():
        np.testing.assert_allclose(metrics_pth[k], v, atol=1e-5)
        np.testing.assert_allclose(metrics_back[k], v, atol=1e-5)


def test_url_resume_resolution(tmp_path, monkeypatch):
    from semi_seg_ecg_tpu.utils.checkpoint import resolve_checkpoint_url

    local = tmp_path / "ckpt.bin"
    local.write_bytes(b"x")
    assert resolve_checkpoint_url(f"file://{local}") == str(local)

    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch_home"))
    cache = tmp_path / "torch_home" / "hub" / "checkpoints"
    cache.mkdir(parents=True)
    (cache / "model.pth").write_bytes(b"x")
    assert resolve_checkpoint_url(
        "https://example.com/weights/model.pth?dl=1"
    ) == str(cache / "model.pth")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint_url("https://example.com/absent.pth")


def test_reco_latent_projection_transplants(rng):
    cfg = {
        **RESNET_CFG,
        "use_latent_projection": True,
        "projection_in_dim": 512,
        "projection_out_dim": 256,
    }
    tmodel = _reference_model(cfg)
    tmodel.eval()
    model, params_t, stats_t = _init_flax(cfg, with_projection=True)
    params, stats = torch_sd_to_trees(
        {k: v.numpy() for k, v in tmodel.state_dict().items()},
        params_t, stats_t,
    )
    x = rng.standard_normal((2, 1, 2500)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), return_latent=True)["latent"].numpy()
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False, return_latent=True,
    )["latent"])
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)
