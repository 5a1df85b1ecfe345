"""`remat: true` (per-block activation checkpointing via jax.checkpoint)
must be numerically invisible: identical param trees, outputs, and
gradients for both backbone families. The knob has no reference
counterpart (torch offers torch.utils.checkpoint but the reference never
uses it) — it's this framework's HBM-for-FLOPs lever for deep/wide or
long-sequence variants."""

import numpy as np

import jax
import jax.numpy as jnp

from semi_seg_ecg_tpu.models import build_model_from_config


def _cfg(backbone):
    head_ch = {"resnet18": 512, "vit_tiny": 192}[next(iter(backbone))]
    return {
        "precision": "fp32",
        "backbone": backbone,
        "decode_head": {
            "FCNHead": {"in_channels": head_ch, "in_index": 3,
                        "channels": 16, "num_convs": 1,
                        "concat_input": False, "dropout_ratio": 0.0,
                        "num_classes": 4, "align_corners": False}
        },
    }


def _compare_remat(rng, backbone_name, backbone_kwargs, length):
    x = jnp.asarray(rng.standard_normal((2, 1, length)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 4, (2, length)))
    models, variables = {}, {}
    for remat in (False, True):
        cfg = _cfg({backbone_name: {**backbone_kwargs, "remat": remat}})
        m = build_model_from_config(cfg, train=True)
        v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, train=False)
        models[remat], variables[remat] = m, v
    assert (jax.tree_util.tree_structure(variables[False])
            == jax.tree_util.tree_structure(variables[True]))

    def loss(params, remat):
        m, v = models[remat], variables[False]
        out = m.apply({**v, "params": params}, x, labels=y,
                      train=True, return_loss=True,
                      rngs={"dropout": jax.random.key(2)},
                      mutable=["batch_stats"])[0]
        return out["loss"]

    params = variables[False]["params"]
    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_resnet_remat_identical(rng):
    _compare_remat(rng, "resnet18", {
        "num_leads": 1, "num_stages": 4, "out_indices": [0, 1, 2, 3],
        "dilations": [1, 1, 1, 1], "strides": [1, 2, 2, 2],
        "deep_stem": False, "avg_down": False, "contract_dilation": False,
    }, length=256)


def test_vit_remat_identical(rng):
    _compare_remat(rng, "vit_tiny", {
        "num_leads": 1, "seq_len": 256, "patch_size": 16,
        "out_indices": [0, 1, 2, 3],
    }, length=256)


def test_vit_remat_composes_with_flash_attention(rng):
    """remat wraps blocks whose interior runs the Pallas kernel through
    its custom_vjp — jax.checkpoint must recompute through it cleanly."""
    from semi_seg_ecg_tpu.models.backbones.vision_transformer import vit_tiny

    x = jnp.asarray(rng.standard_normal((2, 256, 1)), jnp.float32)
    outs = {}
    for remat in (False, True):
        m = vit_tiny(num_leads=1, seq_len=256, patch_size=16,
                     attention_impl="flash", remat=remat, depth=2,
                     out_indices=[1], dtype=jnp.float32)
        v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   x, train=False)

        def loss(params, m=m, v=v):
            return jnp.sum(m.apply({**v, "params": params}, x,
                                   train=False)[-1] ** 2)

        outs[remat] = jax.grad(loss)(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(outs[False]),
                    jax.tree_util.tree_leaves(outs[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
