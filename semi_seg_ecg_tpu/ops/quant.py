"""Dynamic int8 quantization for inference (serving) paths.

TPU MXUs execute s8 x s8 -> s32 matmuls/convolutions at twice the bf16
rate (v5e: 394 vs 197 TOPS), so MXU-bound serving gains ~2x from running
the conv contractions in int8. This module implements *dynamic symmetric*
post-training quantization, fused entirely into the jitted forward:

- **weights**: per-output-channel symmetric int8 (`absmax / 127`), computed
  from the fp32 params inside the program — checkpoints stay fp32 and the
  param tree is byte-identical to the unquantized model, so any trained
  checkpoint serves quantized with a config flag flip;
- **activations**: per-tensor symmetric int8 with the scale computed from
  the live batch (dynamic quantization) — no calibration pass, no stored
  activation statistics, and the two absmax reductions fuse into the
  surrounding elementwise work.

The quantize -> conv -> dequantize sequence stays inside one XLA program;
only the conv contraction itself runs in int8. BatchNorm, residual adds,
and softmax remain in the model's compute dtype. Training is deliberately
unsupported (no straight-through estimator): ``quantize`` is an
inference-model knob (`build_model_from_config(..., train=False)`).

No reference counterpart — bakqui/semi-seg-ecg has no quantization; this
is TPU-native serving capability on top of parity.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

# smallest representable scale: guards all-zero tensors (fresh params,
# zero-padded activations) from a 0/0 in the quantize divide
_EPS = 1e-8


def quantize_symmetric(
    t: jnp.ndarray, axis: Optional[Tuple[int, ...]] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric linear quantization to int8.

    Returns ``(q, scale)`` with ``q ~ round(t / scale)`` clipped to
    [-127, 127] and ``scale = absmax / 127`` reduced over ``axis``
    (``None`` = per-tensor). ``t ~ q * scale``.
    """
    t = t.astype(jnp.float32)
    scale = jnp.max(jnp.abs(t), axis=axis, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(t / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_static(t: jnp.ndarray, scale: jnp.ndarray):
    """Quantize with a precomputed (calibrated) scale: no absmax reduction
    over the live tensor — the dynamic path's per-layer reduction is ~20%
    of the int8 serving step's device time (profile_step --inference)."""
    t = t.astype(jnp.float32)
    scale = jnp.maximum(scale.astype(jnp.float32), _EPS)
    q = jnp.clip(jnp.round(t / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale.reshape((1,) * t.ndim)


def int8_conv(
    x: jnp.ndarray,                # (B, W, C_in) NWC, any float dtype
    kernel: jnp.ndarray,           # (K, C_in, C_out) WIO, fp32 param
    strides: Sequence[int],
    padding,
    kernel_dilation: Sequence[int],
    bias: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    act_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Conv1d with the contraction in s8 x s8 -> s32 on the MXU.

    Per-tensor activation scale — dynamic (from the live batch) by
    default, or static via ``act_scale`` (calibrated absmax/127) — and
    per-output-channel weight scale; the int32 accumulator is exact, so
    the only error vs the float conv is the two rounding steps.
    """
    if act_scale is None:
        xq, sx = quantize_symmetric(x)                   # per-tensor
    else:
        xq, sx = quantize_static(x, act_scale)
    kq, sk = quantize_symmetric(kernel, axis=(0, 1))     # per out-channel
    acc = lax.conv_general_dilated(
        xq, kq,
        window_strides=tuple(strides),
        padding=padding,
        rhs_dilation=tuple(kernel_dilation),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.int32,
    )
    # sx is scalar (keepdims (1,1,1)); sk broadcasts over the out-channel
    # (last) axis of the NWC output
    out = acc.astype(jnp.float32) * (sx * sk.reshape(1, 1, -1))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_dense(
    x: jnp.ndarray,                # (..., C_in), any float dtype
    kernel: jnp.ndarray,           # (C_in, C_out) fp32 param
    bias: Optional[jnp.ndarray] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
    act_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Matmul with the contraction in s8 x s8 -> s32 (ViT serving path)."""
    if act_scale is None:
        xq, sx = quantize_symmetric(x)                   # per-tensor
    else:
        xq, sx = quantize_static(x, act_scale)
    kq, sk = quantize_symmetric(kernel, axis=(0,))       # per out-channel
    acc = lax.dot_general(
        xq, kq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (
        sx * sk.reshape((1,) * (acc.ndim - 1) + (-1,)))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
