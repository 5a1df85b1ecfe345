"""Batch normalization with torch-exact running-statistics semantics.

``flax.linen.BatchNorm`` folds the *biased* batch variance into the running
EMA; ``torch.nn.BatchNorm1d`` normalizes with the biased variance but updates
``running_var`` with the *unbiased* one (Bessel ``n/(n-1)``) — see
torch/nn/modules/batchnorm.py. The reference trains every BN this way, and
eval-mode forwards (FixMatch/MeanTeacher pseudo-label passes, validation)
consume the running stats, so the rebuild matches the convention exactly
rather than approximately.

Stats are computed in fp32 over all non-feature axes of an NWC tensor. Under
``jit`` with the batch sharded on the ``data`` mesh axis, the ``jnp.mean``
reductions are global (GSPMD inserts the cross-replica collectives), which is
SyncBatchNorm for free — reference base.py:323-324 parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class TorchBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` (same param / batch_stats leaves) with
    torch's unbiased running-variance update.

    ``momentum`` follows the flax convention (0.9 here == torch 0.1):
    ``new = momentum * old + (1 - momentum) * batch_stat``.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", self.scale_init, (feat,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (feat,), self.param_dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var * bessel
                )

        mul = (scale * lax.rsqrt(var + self.epsilon)).astype(self.dtype)
        sub = (mean * scale * lax.rsqrt(var + self.epsilon) - bias).astype(
            self.dtype
        )
        return x.astype(self.dtype) * mul - sub
