"""FCN decode head (flax.linen, NWC).

Parity with the reference FCNHead (src/models/decode_heads/fcn_head.py:9-97):
pick feature ``inputs[in_index]``, ``num_convs`` Conv-BN-ReLU blocks (k=3,
dilation-aware padding), optional concat-input fusion conv, dropout, then a
1×1 classifier conv. ``align_corners`` is carried as an attribute consumed by
the EncoderDecoder's logit interpolation (encoder_decoder.py:101-107).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ConvBN


class FCNHead(nn.Module):
    in_channels: int
    channels: int
    num_classes: int
    num_convs: int
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1
    in_index: int = -1
    dropout_ratio: float = 0.1
    align_corners: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False) -> jnp.ndarray:
        assert self.num_convs >= 0 and self.dilation > 0
        if self.num_convs == 0:
            assert self.in_channels == self.channels
        x = inputs[self.in_index]
        out = x
        for i in range(self.num_convs):
            out = nn.relu(
                ConvBN(
                    self.channels,
                    kernel_size=self.kernel_size,
                    dilation=self.dilation,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    name=f"conv{i}",
                )(out, train)
            )
        if self.concat_input:
            out = nn.relu(
                ConvBN(
                    self.channels,
                    kernel_size=self.kernel_size,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    name="conv_cat",
                )(jnp.concatenate([x, out], axis=-1), train)
            )
        if self.dropout_ratio > 0:
            out = nn.Dropout(self.dropout_ratio, deterministic=not train)(out)
        # the classifier stays float: it is tiny (C_out = num_classes) and
        # its logits feed an argmax/softmax where quantization error is
        # the one place it would show
        out = nn.Conv(
            self.num_classes, (1,), dtype=self.dtype, param_dtype=jnp.float32,
            name="cls_seg",
        )(out)
        return out
