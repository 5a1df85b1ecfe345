"""EncoderDecoder wrapper (flax.linen).

Parity with the reference wrapper (src/models/encoder_decoder.py:10-136):
backbone → feature tuple; decode head on the tuple; logits linearly
interpolated back to the input length; optional CE loss; optional projected
latent (ReCo) interpolated to input length; optional auxiliary heads
producing per-head logits + losses. The reference's dead auxiliary-head
block (encoder_decoder.py:113-134 — empty logits list, doubled loss append,
crash when unlabeled) is implemented *correctly* here per SURVEY §2 ⑨.

External contract stays NCW for drop-in compatibility — inputs ``(B, leads,
T)``, ``seg_logits`` ``(B, num_classes, T)`` — while everything inside runs
NWC ``(B, T, C)`` so convolutions hit the MXU without layout shuffles; the
two transposes at the boundary are fused into neighbouring ops by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.interpolate import linear_interpolate
from ..ops.losses import cross_entropy
from .norm import TorchBatchNorm


class LatentProjection(nn.Module):
    """2-layer conv projection head for ReCo latents: Conv(k3) → ReLU → BN →
    Conv(k1), both bias-free (encoder_decoder.py:31-48 parity, including the
    unusual ReLU-before-BN order)."""

    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_dim, (3,), padding=[(1, 1)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32, name="BatchNorm_0")(x)
        x = nn.Conv(self.out_dim, (1,), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        return x


class EncoderDecoder(nn.Module):
    backbone: nn.Module
    decode_head: nn.Module
    auxiliary_heads: Optional[Sequence[nn.Module]] = None
    latent_projection: Optional[nn.Module] = None

    @property
    def with_auxiliary_heads(self) -> bool:
        return self.auxiliary_heads is not None and len(self.auxiliary_heads) > 0

    @property
    def with_projection(self) -> bool:
        return self.latent_projection is not None

    def no_weight_decay(self) -> set:
        rst = set()
        for m in (self.backbone, self.decode_head):
            if hasattr(m, "no_weight_decay"):
                rst |= m.no_weight_decay()
        return rst

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        return_loss: bool = False,
        return_latent: bool = False,
        train: bool = False,
    ) -> dict:
        outputs = {}
        seq_len = inputs.shape[2]
        x_nwc = jnp.swapaxes(inputs, 1, 2)  # (B, T, C)
        feats = self.backbone(x_nwc, train=train)

        if return_latent:
            embedding = feats[-1]
            latent = (
                self.latent_projection(embedding, train=train)
                if self.with_projection else embedding
            )
            latent = linear_interpolate(
                latent, seq_len,
                align_corners=self.decode_head.align_corners, time_axis=1,
            )
            outputs["latent"] = jnp.swapaxes(latent, 1, 2)  # NCW

        seg = self.decode_head(feats, train=train)  # (B, t, classes)
        seg = linear_interpolate(
            seg, seq_len, align_corners=self.decode_head.align_corners,
            time_axis=1,
        )
        seg_logits = jnp.swapaxes(seg, 1, 2)  # (B, classes, T) NCW
        outputs["seg_logits"] = seg_logits

        if return_loss:
            outputs["loss"] = cross_entropy(seg_logits, labels)

        if train and self.with_auxiliary_heads:
            aux_logits_list = []
            aux_loss_list = []
            for aux_head in self.auxiliary_heads:
                aux = aux_head(feats, train=train)
                aux = linear_interpolate(
                    aux, seq_len, align_corners=aux_head.align_corners,
                    time_axis=1,
                )
                aux = jnp.swapaxes(aux, 1, 2)
                aux_logits_list.append(aux)
                if return_loss and labels is not None:
                    aux_loss_list.append(cross_entropy(aux, labels))
            outputs["aux_seg_logits"] = aux_logits_list
            if return_loss and labels is not None:
                outputs["loss_aux"] = aux_loss_list

        return outputs
