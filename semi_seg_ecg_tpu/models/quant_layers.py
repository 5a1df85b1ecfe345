"""flax modules running their contraction in int8 (serving path).

Drop-in stand-ins for ``nn.Conv`` / ``nn.Dense`` with byte-identical param
trees (same param names, shapes, fp32 dtype), so a checkpoint trained with
the float modules restores into the quantized model unchanged — quantized
serving is a config flip (``quantize: int8``), not a conversion step.
See :mod:`semi_seg_ecg_tpu.ops.quant` for the numerics.

Activation scales are dynamic by default (absmax of the live batch). An
optional calibration pass (``model.apply(..., mutable=["quant"])`` over a
few representative batches — ``utils/calibrate.calibrate_quant``) records
per-layer running absmax into a ``quant`` variable collection; serving
with that collection present switches every layer to *static* scales,
removing the per-layer absmax reductions (~20% of the int8 serving step's
device time, profile_step --inference --int8).
"""

from __future__ import annotations

from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops.quant import int8_conv, int8_dense


def _act_scale(mod: nn.Module, x: jnp.ndarray):
    """Calibrating: record running absmax, return None (dynamic quant this
    pass). Calibrated (a ``quant`` collection is bound): the static scale.
    Neither: None — plain dynamic quantization."""
    if mod.is_mutable_collection("quant"):
        absmax = mod.variable("quant", "act_absmax",
                              lambda: jnp.zeros((), jnp.float32))
        absmax.value = jnp.maximum(
            absmax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
        return None
    if mod.has_variable("quant", "act_absmax"):
        return mod.get_variable("quant", "act_absmax") / 127.0
    return None


class Int8Conv(nn.Module):
    """1-D conv with the contraction in s8 x s8 -> s32 (NWC/WIO layout).

    Mirrors the ``nn.Conv`` hyperparameters the model zoo uses; the fp32
    ``kernel`` (and optional ``bias``) params match ``nn.Conv``'s exactly.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1,)
    padding: Union[str, Sequence] = "SAME"
    kernel_dilation: Sequence[int] = (1,)
    use_bias: bool = False
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32)
                if self.use_bias else None)
        return int8_conv(
            x, kernel, self.strides, self.padding, self.kernel_dilation,
            bias=bias, out_dtype=self.dtype, act_scale=_act_scale(self, x),
        )


class Int8Dense(nn.Module):
    """Dense layer with the matmul in s8 x s8 -> s32 (param tree matches
    ``nn.Dense``)."""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           jnp.float32)
                if self.use_bias else None)
        return int8_dense(x, kernel, bias=bias, out_dtype=self.dtype,
                          act_scale=_act_scale(self, x))
