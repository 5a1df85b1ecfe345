"""Int8 dynamic-quantization serving path (ops/quant.py, models/quant_layers.py).

Contracts:
- the int8 conv/dense contraction tracks the float op closely (the int32
  accumulator is exact; only two rounding steps differ);
- ``quantize: int8`` changes the compute, NOT the param tree — a float
  checkpoint restores into the quantized model unchanged;
- full quantized models agree with their float counterparts on almost all
  argmax decisions (the serving-relevant output);
- training builds ignore the flag (quantization is inference-only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.models import build_model_from_config
from semi_seg_ecg_tpu.ops.quant import int8_conv, int8_dense, \
    quantize_symmetric

from tests.test_models import RESNET_CFG, VIT_CFG, _init_and_apply


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    q, s = quantize_symmetric(t)
    assert q.dtype == jnp.int8
    recon = q.astype(jnp.float32) * s
    # symmetric linear quant: error bounded by half a step
    assert float(jnp.max(jnp.abs(recon - t))) <= float(s[0, 0]) / 2 + 1e-7


def test_quantize_symmetric_zero_tensor():
    q, s = quantize_symmetric(jnp.zeros((4, 4)))
    assert int(jnp.sum(jnp.abs(q))) == 0 and np.isfinite(float(s[0, 0]))


def test_int8_conv_tracks_float_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 128, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 16, 32)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"))
    out = int8_conv(x, k, (1,), [(1, 1)], (1,), out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # two rounding steps only


def test_int8_dense_tracks_float_matmul():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 7, 48)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((48, 24)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)), jnp.float32)
    ref = x @ k + b
    out = int8_dense(x, k, bias=b, out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


@pytest.mark.parametrize("cfg", [RESNET_CFG, VIT_CFG], ids=["resnet", "vit"])
def test_quantized_param_tree_identical(cfg):
    """A float checkpoint must restore into the int8 model unchanged."""
    x = jnp.zeros((1, 1, 2500))  # NCW external contract
    fp = build_model_from_config(dict(cfg), train=False)
    q = build_model_from_config({**cfg, "quantize": "int8"}, train=False,
                                serving=True)
    v_fp = fp.init({"params": jax.random.key(0)}, x, train=False)
    v_q = q.init({"params": jax.random.key(0)}, x, train=False)
    flat_fp = jax.tree_util.tree_leaves_with_path(v_fp["params"])
    flat_q = jax.tree_util.tree_leaves_with_path(v_q["params"])
    tree_fp = [(jax.tree_util.keystr(p), l.shape, str(l.dtype))
               for p, l in flat_fp]
    tree_q = [(jax.tree_util.keystr(p), l.shape, str(l.dtype))
              for p, l in flat_q]
    assert tree_fp == tree_q


@pytest.mark.parametrize("cfg", [RESNET_CFG, VIT_CFG], ids=["resnet", "vit"])
def test_quantized_model_argmax_agreement(cfg):
    """Int8 serving must make (nearly) the float model's decisions when
    fed the float model's weights."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 1, 2500)), jnp.float32)  # NCW
    fp = build_model_from_config(dict(cfg), train=False)
    q = build_model_from_config({**cfg, "quantize": "int8"}, train=False,
                                serving=True)
    out_fp, variables = _init_and_apply(fp, x)
    out_q = q.apply(variables, x, train=False)
    logits_fp = np.asarray(out_fp["seg_logits"], np.float32)
    logits_q = np.asarray(out_q["seg_logits"], np.float32)
    pred_fp, pred_q = logits_fp.argmax(1), logits_q.argmax(1)
    agreement = float((pred_fp == pred_q).mean())
    # untrained weights produce near-tie logits everywhere, so global
    # agreement is a loose floor; the sharp contract is that decisions
    # with a real margin never flip
    assert agreement > 0.9, agreement
    top2 = np.sort(logits_fp, axis=1)[:, -2:, :]
    margin = top2[:, 1] - top2[:, 0]
    confident = margin > np.median(margin)
    conf_agreement = float((pred_fp == pred_q)[confident].mean())
    assert conf_agreement > 0.995, conf_agreement
    rel = (np.linalg.norm(logits_q - logits_fp)
           / np.linalg.norm(logits_fp))
    assert rel < 0.1, rel


@pytest.mark.parametrize("cfg", [RESNET_CFG, VIT_CFG], ids=["resnet", "vit"])
def test_static_scales_track_dynamic(cfg):
    """Calibrated static activation scales (utils/calibrate.py): the quant
    collection holds one absmax per int8 layer, and serving with it bound
    tracks dynamic quantization closely when calibration saw the same
    distribution (the static path only clips what the dynamic path would
    have rescaled)."""
    from semi_seg_ecg_tpu.utils.calibrate import calibrate_quant

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 1, 2500)), jnp.float32)
    q = build_model_from_config({**cfg, "quantize": "int8"}, train=False,
                                serving=True)
    _, variables = _init_and_apply(q, x)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    quant = calibrate_quant(
        q, params, stats,
        [jnp.asarray(rng.standard_normal((2, 1, 2500)), jnp.float32)
         for _ in range(3)] + [x])
    absmaxes = jax.tree.leaves(quant)
    assert absmaxes and all(a.shape == () for a in absmaxes)
    assert all(float(a) > 0 for a in absmaxes)

    base = {"params": params, "batch_stats": stats}
    out_dyn = q.apply(base, x, train=False)["seg_logits"]
    out_sta = q.apply({**base, "quant": quant}, x, train=False)["seg_logits"]
    l_dyn = np.asarray(out_dyn, np.float32)
    l_sta = np.asarray(out_sta, np.float32)
    rel = np.linalg.norm(l_sta - l_dyn) / np.linalg.norm(l_dyn)
    assert rel < 0.1, rel
    agreement = float((l_dyn.argmax(1) == l_sta.argmax(1)).mean())
    assert agreement > 0.9, agreement


def test_static_scale_graph_has_no_activation_reductions():
    """The point of calibration: the compiled static graph must not reduce
    over activation tensors to find scales. Proxy: it contains strictly
    fewer reduce ops than the dynamic graph."""
    from semi_seg_ecg_tpu.utils.calibrate import calibrate_quant

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 1, 2500)), jnp.float32)
    q = build_model_from_config({**RESNET_CFG, "quantize": "int8"},
                                train=False, serving=True)
    _, variables = _init_and_apply(q, x)
    base = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    quant = calibrate_quant(q, base["params"], base["batch_stats"], [x])

    def n_reduces(variables):
        fn = lambda v, x: q.apply(v, x, train=False)["seg_logits"]
        txt = jax.jit(fn).lower(variables, x).as_text()
        return txt.count("reduce(")
    dyn, sta = n_reduces(base), n_reduces({**base, "quant": quant})
    assert sta < dyn, (sta, dyn)


def test_training_build_ignores_quantize():
    model = build_model_from_config({**RESNET_CFG, "quantize": "int8"},
                                    train=True)
    assert model.backbone.quantize is None


def test_nonserving_eval_build_ignores_quantize():
    """Eval-mode builds inside the training pipeline (in-loop evaluation,
    ST++ snapshot reliability ranking) must stay float even when the config
    carries a quantize key — only serving=True entries quantize."""
    model = build_model_from_config({**RESNET_CFG, "quantize": "int8"},
                                    train=False)
    assert model.backbone.quantize is None


def test_unknown_quantize_rejected():
    with pytest.raises(AssertionError):
        build_model_from_config({**RESNET_CFG, "quantize": "int4"},
                                train=False, serving=True)
