"""Numerical parity of conv/BN/pool building blocks against torch.

These pin the layout + padding + statistics conventions: NWC flax modules
with transplanted weights must reproduce torch's NCW ops (the reference's
compute substrate) bit-closely.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("k,s,d,t", [(7, 2, 1, 2500), (3, 1, 1, 625),
                                     (3, 2, 1, 625), (3, 1, 2, 100),
                                     (1, 1, 1, 64), (3, 1, 4, 200)])
def test_conv1d_matches_torch(rng, k, s, d, t):
    cin, cout = 3, 5
    x = rng.standard_normal((2, cin, t)).astype(np.float32)
    w = rng.standard_normal((cout, cin, k)).astype(np.float32)

    pad = (k // 2) * d
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), stride=s,
                   padding=pad, dilation=d).numpy()

    conv = nn.Conv(cout, (k,), strides=(s,), padding=[(pad, pad)],
                   kernel_dilation=(d,), use_bias=False, dtype=jnp.float32,
                   param_dtype=jnp.float32)
    # flax kernel layout: (k, in, out); torch: (out, in, k)
    kernel = jnp.asarray(w.transpose(2, 1, 0))
    out = conv.apply({"params": {"kernel": kernel}},
                     jnp.asarray(x.transpose(0, 2, 1)))
    out = np.asarray(out).transpose(0, 2, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((2, 4, 1250)).astype(np.float32)
    ref = torch.nn.functional.max_pool1d(torch.from_numpy(x), 3, stride=2,
                                         padding=1).numpy()
    out = nn.max_pool(jnp.asarray(x.transpose(0, 2, 1)), (3,), strides=(2,),
                      padding=[(1, 1)])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-6)


def test_avgpool_ceil_mode_matches_torch(rng):
    # the avg_down path (resnet.py:271-279): AvgPool1d(ceil_mode=True,
    # count_include_pad=False)
    x = rng.standard_normal((2, 4, 313)).astype(np.float32)
    ref = torch.nn.AvgPool1d(2, stride=2, ceil_mode=True,
                             count_include_pad=False)(
        torch.from_numpy(x)).numpy()
    out = nn.avg_pool(jnp.asarray(x.transpose(0, 2, 1)), (2,), strides=(2,),
                      padding=[(0, 1)], count_include_pad=False)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref,
                               atol=1e-6)


def test_batchnorm_train_and_eval_match_torch(rng):
    from semi_seg_ecg_tpu.models.norm import TorchBatchNorm

    c, t = 8, 100
    x = rng.standard_normal((4, c, t)).astype(np.float32)
    tbn = torch.nn.BatchNorm1d(c, momentum=0.1, eps=1e-5)
    tbn.train()
    ref_train = tbn(torch.from_numpy(x)).detach().numpy()

    fbn = TorchBatchNorm(use_running_average=False, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    variables = fbn.init(jax.random.key(0), jnp.asarray(x.transpose(0, 2, 1)))
    out, mutated = fbn.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out).transpose(0, 2, 1), ref_train,
                               atol=2e-5, rtol=1e-4)

    # running stats after several batches must agree exactly: torch updates
    # running_var with the UNBIASED batch variance (momentum 0.1 ==
    # flax-convention 0.9) and TorchBatchNorm replicates that
    stats = mutated["batch_stats"]
    for _ in range(3):
        x2 = rng.standard_normal((4, c, t)).astype(np.float32)
        tbn(torch.from_numpy(x2))
        _, mutated = fbn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x2.transpose(0, 2, 1)), mutable=["batch_stats"],
        )
        stats = mutated["batch_stats"]
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), rtol=1e-5)

    # eval mode with the accumulated running stats
    tbn.eval()
    ref_eval = tbn(torch.from_numpy(x)).detach().numpy()
    fbn_eval = TorchBatchNorm(use_running_average=True, momentum=0.9,
                              epsilon=1e-5, dtype=jnp.float32,
                              param_dtype=jnp.float32)
    out_eval = fbn_eval.apply(
        {"params": variables["params"], "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 1)),
    )
    np.testing.assert_allclose(np.asarray(out_eval).transpose(0, 2, 1),
                               ref_eval, atol=2e-5, rtol=1e-4)


def test_gelu_matches_torch(rng):
    x = rng.standard_normal((128,)).astype(np.float32)
    ref = F.gelu(torch.from_numpy(x)).numpy()
    out = np.asarray(nn.gelu(jnp.asarray(x), approximate=False))
    np.testing.assert_allclose(out, ref, atol=1e-6)
