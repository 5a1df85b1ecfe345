"""1-D ResNet backbone (flax.linen, NWC layout, bf16-compute ready).

Capability parity with the reference's mmseg-style 1-D ResNet
(src/models/backbones/resnet.py:19-428): stem (plain k7/s2 or deep 3×k3) +
maxpool k3/s2, four stages of BasicBlock/Bottleneck with configurable
strides / dilations / multi-grid / avg-down / contract-dilation,
Kaiming-normal conv init (resnet.py:326-333), optional zero-init of the last
block BN (resnet.py:334-339), multi-scale ``out_indices`` feature tuple
(resnet.py:353-363), and factories resnet18/34/50/101/152.

TPU-first choices:
- **NWC layout** ``(B, T, C)`` — channels ride the 128-lane dimension, so
  XLA lowers Conv1d to MXU matmuls without transposes (the reference's NCW
  layout is a CUDA/cuDNN convention).
- **BatchNorm = SyncBN for free.** Batch statistics are plain ``jnp`` means
  over the batch axis; under ``jit`` with the batch sharded on the ``data``
  mesh axis, GSPMD turns them into cross-replica reductions — exactly what
  ``SyncBatchNorm.convert_sync_batchnorm`` bolts on in torch (base.py:323).
- **bf16 compute / fp32 params + stats** via ``dtype``/``param_dtype``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.pooling import max_pool_k3s2
from ..norm import TorchBatchNorm

# Reference init: conv weights ~ N(0, sqrt(2 / (k * out_ch)))
# (resnet.py:326-333) == variance_scaling(2, fan_out, normal) in NWC.
KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBN(nn.Module):
    """Conv1d (no bias) + BatchNorm, the fusion unit XLA folds together.

    ``quantize='int8'`` (inference only) runs the conv contraction in
    s8 x s8 -> s32 on the MXU with dynamic activation scales — same param
    tree, ~2x MXU rate (ops/quant.py)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    scale_init: nn.initializers.Initializer = nn.initializers.ones
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = (self.kernel_size // 2) * self.dilation
        if self.quantize:
            assert self.quantize == "int8", self.quantize
            assert not train, "int8 quantization is inference-only"
            from ..quant_layers import Int8Conv

            conv = Int8Conv(
                self.features,
                (self.kernel_size,),
                strides=(self.stride,),
                padding=[(pad, pad)],
                kernel_dilation=(self.dilation,),
                use_bias=False,
                kernel_init=KAIMING,
                dtype=self.dtype,
                name="Conv_0",  # == nn.Conv's auto-name: same param tree
            )
        else:
            conv = nn.Conv(
                self.features,
                (self.kernel_size,),
                strides=(self.stride,),
                padding=[(pad, pad)],
                kernel_dilation=(self.dilation,),
                use_bias=False,
                kernel_init=KAIMING,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="Conv_0",
            )
        x = conv(x)
        # name pinned so checkpoints keep the BatchNorm_0 leaf path
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,  # == torch BatchNorm1d momentum 0.1
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            scale_init=self.scale_init,
            name="BatchNorm_0",
        )(x)
        return x


class Downsample(nn.Module):
    """Identity-path projection; ``avg_down`` replaces strided 1×1 conv with
    AvgPool+conv (resnet.py:267-293)."""

    features: int
    stride: int
    avg_down: bool
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        stride = self.stride
        if self.avg_down and stride != 1:
            # torch AvgPool1d(ceil_mode=True, count_include_pad=False)
            x = nn.avg_pool(
                x, (stride,), strides=(stride,), padding=[(0, stride - 1)],
                count_include_pad=False,
            )
            stride = 1
        return ConvBN(self.features, kernel_size=1, stride=stride,
                      dtype=self.dtype, quantize=self.quantize)(x, train)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    zero_init_residual: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = ConvBN(self.planes, 3, self.stride, self.dilation,
                     dtype=self.dtype, quantize=self.quantize)(x, train)
        out = nn.relu(out)
        last_scale = (
            nn.initializers.zeros if self.zero_init_residual
            else nn.initializers.ones
        )
        out = ConvBN(self.planes, 3, dtype=self.dtype,
                     scale_init=last_scale,
                     quantize=self.quantize)(out, train)
        if self.has_downsample:
            identity = Downsample(self.planes, self.stride, self.avg_down,
                                  dtype=self.dtype,
                                  quantize=self.quantize)(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    avg_down: bool = False
    zero_init_residual: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(ConvBN(self.planes, 1, dtype=self.dtype,
                             quantize=self.quantize)(x, train))
        out = nn.relu(
            ConvBN(self.planes, 3, self.stride, self.dilation,
                   dtype=self.dtype, quantize=self.quantize)(out, train)
        )
        last_scale = (
            nn.initializers.zeros if self.zero_init_residual
            else nn.initializers.ones
        )
        out = ConvBN(self.planes * self.expansion, 1, dtype=self.dtype,
                     scale_init=last_scale,
                     quantize=self.quantize)(out, train)
        if self.has_downsample:
            identity = Downsample(
                self.planes * self.expansion, self.stride, self.avg_down,
                dtype=self.dtype, quantize=self.quantize,
            )(x, train)
        return nn.relu(out + identity)


class ResNet1D(nn.Module):
    """Returns a tuple of per-stage NWC features selected by ``out_indices``."""

    num_leads: int
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    deep_stem: bool = False
    avg_down: bool = False
    frozen_stages: int = -1
    multi_grid: Optional[Sequence[int]] = None
    contract_dilation: bool = False
    block: str = "basic"
    stage_blocks: Sequence[int] = (2, 2, 2, 2)
    zero_init_residual: bool = False
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # activation checkpointing (jax.checkpoint) per residual block: trades
    # recompute FLOPs for HBM — for deep variants (resnet101/152) or long
    # signals where stage activations dominate memory. Param tree, outputs
    # and gradients are identical either way.
    remat: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    quantize: Optional[str] = None

    @property
    def block_cls(self):
        return BasicBlock if self.block == "basic" else Bottleneck

    @property
    def feat_dim(self) -> int:
        expansion = 1 if self.block == "basic" else 4
        return expansion * self.base_channels * 2 ** (self.num_stages - 1)

    def no_weight_decay(self) -> set:
        return set()

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        assert 1 <= self.num_stages <= 4, "num_stages should be in [1, 4]"
        assert len(self.strides) == len(self.dilations) == self.num_stages, (
            "strides and dilations should be lists of the same length as"
            f" num_stages, but got {len(self.strides)}, {len(self.dilations)}"
            f" and {self.num_stages}"
        )
        x = x.astype(self.dtype)

        # frozen stages run in inference mode: no BN stat updates
        # (resnet.py:341-351 `.eval()` parity; param freezing happens in the
        # optimizer's frozen mask)
        stem_train = train and self.frozen_stages < 0

        # Stem (resnet.py:206-257): k7/s2 conv (or 3 stacked k3) + maxpool
        if self.deep_stem:
            half = self.stem_channels // 2
            for i, (feats, stride) in enumerate(
                [(half, 2), (half, 1), (self.stem_channels, 1)]
            ):
                x = nn.relu(
                    ConvBN(feats, 3, stride, dtype=self.dtype,
                           quantize=self.quantize,
                           name=f"stem_{i}")(x, stem_train)
                )
        else:
            x = nn.relu(
                ConvBN(self.stem_channels, 7, 2, dtype=self.dtype,
                       quantize=self.quantize,
                       name="stem_0")(x, stem_train)
            )
        # select-and-scatter-free backward (ops/pooling.py): same fwd HLO,
        # closed-form VJP — the XLA SelectAndScatter grad was 35 us/step
        x = max_pool_k3s2(x)

        block_cls = self.block_cls
        if self.remat:
            # static_argnums=(2,): `train` is a Python bool, not a tracer
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 1 if self.block == "basic" else 4
        inplanes = self.stem_channels
        outs = []
        stage_blocks = tuple(self.stage_blocks)[: self.num_stages]
        for i, num_blocks in enumerate(stage_blocks):
            stage_train = train and (i + 1) > self.frozen_stages
            stride = self.strides[i]
            dilation = self.dilations[i]
            stage_multi_grid = (
                self.multi_grid if i == len(stage_blocks) - 1 else None
            )
            planes = self.base_channels * 2**i
            # first-block dilation (resnet.py:295-302)
            if stage_multi_grid is None:
                first_dilation = (
                    dilation // 2
                    if dilation > 1 and self.contract_dilation
                    else dilation
                )
            else:
                first_dilation = stage_multi_grid[0]
            has_down = stride != 1 or inplanes != planes * expansion
            x = block_cls(
                planes=planes,
                stride=stride,
                dilation=first_dilation,
                has_downsample=has_down,
                avg_down=self.avg_down,
                zero_init_residual=self.zero_init_residual,
                dtype=self.dtype,
                quantize=self.quantize,
                name=f"layer{i + 1}_block0",
            )(x, stage_train)
            for j in range(1, num_blocks):
                x = block_cls(
                    planes=planes,
                    dilation=(
                        dilation if stage_multi_grid is None
                        else stage_multi_grid[j]
                    ),
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    name=f"layer{i + 1}_block{j}",
                )(x, stage_train)
            inplanes = planes * expansion
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


def _factory(block: str, stage_blocks):
    def make(num_leads: int, **kwargs) -> ResNet1D:
        kwargs.setdefault("block", block)
        kwargs.setdefault("stage_blocks", tuple(stage_blocks))
        return ResNet1D(num_leads=num_leads, **kwargs)

    return make


resnet18 = _factory("basic", (2, 2, 2, 2))
resnet34 = _factory("basic", (3, 4, 6, 3))
resnet50 = _factory("bottleneck", (3, 4, 6, 3))
resnet101 = _factory("bottleneck", (3, 4, 23, 3))
resnet152 = _factory("bottleneck", (3, 8, 36, 3))
