"""1-D linear interpolation with exact ``F.interpolate(mode='linear')``
semantics, expressed as an MXU matmul.

The reference upsamples decode-head logits (and ReCo latents) back to the
input length with ``F.interpolate(..., mode='linear', align_corners=...)``
(src/models/encoder_decoder.py:94-107). Sizes are static under jit, so the
interpolation weights form a constant sparse matrix ``W`` of shape
``(out_len, in_len)`` with ≤2 non-zeros per row; the resize is then a single
``x @ W.T`` contraction — a dense matmul the TPU MXU executes at full tilt,
instead of the gather/scatter a direct translation would emit.

Both ``align_corners`` conventions are implemented:
- ``False`` (reference configs): source coord ``(i + 0.5) * in/out - 0.5``,
  clamped at the edges — identical to PyTorch/TF2 half-pixel centres.
- ``True``: source coord ``i * (in-1)/(out-1)``.

The dense matrix is O(out_len x in_len): perfect at flagship sizes
(2500 x 625 = 6 MB, one MXU pass) but impossible at Holter scale (a
T=2^21 record would need a 1 TiB host constant before XLA ever saw it).
Above ``_MATMUL_MAX_ENTRIES`` the same coordinates drive an O(out_len)
two-gather path instead: ``x[lo]*w_lo + x[hi]*w_hi`` with ≤2 taps per
output sample — identical semantics (clamped edges give lo == hi, so the
two taps sum to the single clamped weight), linear memory, and XLA lowers
the static-index takes to efficient dynamic-slice fusions.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# above this out_len*in_len product the dense interpolation matrix stops
# being "a few MXU tiles" and becomes the dominant memory term; switch to
# the two-gather path. 2^24 entries = 64 MB fp32 — flagship (2500 x 625)
# stays matmul by a wide margin, long records go linear.
_MATMUL_MAX_ENTRIES = 1 << 24


@functools.lru_cache(maxsize=64)
def _interp_coords(in_len: int, out_len: int, align_corners: bool):
    """(lo, hi, w_lo, w_hi) source taps per output sample — O(out_len)."""
    if out_len == 1:
        src = np.zeros(1) if align_corners else np.array(
            [0.5 * in_len - 0.5]
        ).clip(0, in_len - 1)
    elif align_corners:
        src = np.arange(out_len) * (in_len - 1) / (out_len - 1)
    else:
        src = (np.arange(out_len) + 0.5) * in_len / out_len - 0.5
        src = np.clip(src, 0.0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    w_hi = (src - lo).astype(np.float32)
    w_lo = (1.0 - w_hi).astype(np.float32)
    return lo, hi, w_lo, w_hi


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_len: int, out_len: int, align_corners: bool) -> np.ndarray:
    lo, hi, w_lo, w_hi = _interp_coords(in_len, out_len, align_corners)
    mat = np.zeros((out_len, in_len), dtype=np.float32)
    rows = np.arange(out_len)
    np.add.at(mat, (rows, lo), w_lo)
    np.add.at(mat, (rows, hi), w_hi)
    return mat


def linear_interpolate(
    x: jnp.ndarray, size: int, align_corners: bool = False, time_axis: int = -1
) -> jnp.ndarray:
    """Resize ``x`` along ``time_axis`` to ``size`` samples.

    Works on any rank; dtype of ``x`` is preserved (weights are applied in
    the input dtype so bf16 activations stay bf16 end-to-end).
    """
    time_axis = time_axis % x.ndim
    in_len = x.shape[time_axis]
    if in_len == size:
        return x
    moved = jnp.moveaxis(x, time_axis, -1)
    if in_len * size <= _MATMUL_MAX_ENTRIES:
        w = jnp.asarray(_interp_matrix(in_len, size, align_corners),
                        dtype=x.dtype)
        out = jnp.einsum("...i,oi->...o", moved, w)
    else:
        lo, hi, w_lo, w_hi = _interp_coords(in_len, size, align_corners)
        out = (jnp.take(moved, jnp.asarray(lo), axis=-1)
               * jnp.asarray(w_lo, dtype=x.dtype)
               + jnp.take(moved, jnp.asarray(hi), axis=-1)
               * jnp.asarray(w_hi, dtype=x.dtype))
    return jnp.moveaxis(out, -1, time_axis)
