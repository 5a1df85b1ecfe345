"""On-device (jit-fused) batch augmentation.

The reference augments per sample on the host inside ``__getitem__``
(semi_dataset.py:176-243) — scipy FFT resampling and noise synthesis on CPU,
per record, per epoch. This module implements the same augmentation *stage*
as a pure jnp function over whole batches, so it fuses into the training
step: the host ships raw (resampled+filtered, cacheable) signals once and
the TPU generates the weak/strong views.

Supported ops (the ones the shipped configs use):

- ``random_resize_crop`` (weak view): random time-scale then center-pad +
  random-crop. The reference rescales by Fourier (sinc) interpolation; the
  on-device version uses linear interpolation on a per-sample coordinate
  grid — a documented approximation (band-limited vs piecewise-linear
  resampling) with the same crop/pad geometry and label alignment
  (nearest-neighbour labels).
- ``standardize`` (z-norm per sample, zero-guarded).
- strong view = ``RandAugment`` over {AmplitudeScaling,
  AdaptivePowerlineNoise, RandomPartialWhiteNoise, RandomPartialSineNoise,
  WhiteNoise, SineNoise, YFlip}: N-of-K without replacement via per-sample
  Gumbel top-k masks; every op is computed (cheap VPU elementwise) and
  masked in — branch-free, static shapes.

Enable with ``dataset.device_augment: true``; configs containing host-only
ops fall back loudly (``build_device_augment`` raises).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


def standardize_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample z-norm over (lead, time); zeros where std == 0
    (transforms.Standardize parity)."""
    axes = tuple(range(1, x.ndim))
    loc = jnp.mean(x, axis=axes, keepdims=True)
    scale = jnp.std(x, axis=axes, keepdims=True)
    return jnp.where(scale != 0, (x - loc) / jnp.where(scale == 0, 1, scale),
                     0.0)


def random_resize_crop_batch(
    key,
    x: jnp.ndarray,                      # (B, C, T)
    y: Optional[jnp.ndarray] = None,     # (B, T) int
    target_length: Optional[int] = None,
    scale_min: float = 0.5,
    scale_max: float = 2.0,
):
    """Batched RandomResizeCrop (transforms.py:82-127 geometry).

    For each sample: resized length ``s = floor(T·r)``; content occupies
    ``[left_pad, left_pad+s)`` of a ``max(T, s)``-long canvas; a ``T``-long
    window starts at ``start ∈ [0, canvas−T]``. Output position ``j`` reads
    original coordinate ``(start + j − left_pad) · T / s`` via linear
    (signal) / nearest (label) interpolation, zero outside the content span.
    """
    b, c, t = x.shape
    target_length = target_length or t
    assert target_length == t, "device path assumes fixed-length pipeline"
    k_ratio, k_start = jax.random.split(key)
    ratio = jax.random.uniform(k_ratio, (b,), minval=scale_min,
                               maxval=scale_max)
    s = jnp.floor(t * ratio).astype(jnp.int32)          # resized length
    canvas = jnp.maximum(s, t)
    left_pad = jnp.maximum((t - s) // 2, 0)
    start = (jax.random.uniform(k_start, (b,))
             * (canvas - t + 1).astype(jnp.float32)).astype(jnp.int32)
    start = jnp.minimum(start, canvas - t)

    j = jnp.arange(t)[None, :]                          # (1, T)
    coord = start[:, None] + j - left_pad[:, None]      # resized coords
    inside = (coord >= 0) & (coord < s[:, None])
    # resized coordinate -> original time (scipy.resample keeps the sample
    # spacing convention t_orig = c * T / s)
    t_orig = coord.astype(jnp.float32) * (t / s[:, None].astype(jnp.float32))
    t_orig = jnp.clip(t_orig, 0.0, t - 1)

    i0 = jnp.floor(t_orig).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    w = (t_orig - i0)[:, None, :]
    gather = lambda src, idx: jnp.take_along_axis(
        src, jnp.broadcast_to(idx[:, None, :], (b, c, t)), axis=2
    )
    x_out = gather(x, i0) * (1 - w) + gather(x, i1) * w
    x_out = jnp.where(inside[:, None, :], x_out, 0.0)
    if y is None:
        return x_out, None
    # labels: nearest neighbour of the (reference) linspace(0, T-1, s) grid:
    # resized index c maps to original index round(c * (T-1) / (s-1))
    denom = jnp.maximum(s - 1, 1).astype(jnp.float32)[:, None]
    y_coord = coord.astype(jnp.float32) * ((t - 1) / denom)
    yi = jnp.clip(jnp.round(y_coord).astype(jnp.int32), 0, t - 1)
    y_out = jnp.take_along_axis(y, yi, axis=1)
    y_out = jnp.where(inside, y_out, 0)
    return x_out, y_out


# --- strong augmentation ops (signal-only, elementwise) ---------------------


def _span_mask(key, t: int, ratio: float, shape_prefix):
    """Random contiguous span [start, start+count) as a float mask (B, T)."""
    k1, k2 = jax.random.split(key)
    count = (jax.random.uniform(k1, shape_prefix) * ratio * t).astype(
        jnp.int32)
    start = (jax.random.uniform(k2, shape_prefix)
             * (t - count).astype(jnp.float32)).astype(jnp.int32)
    j = jnp.arange(t)
    return ((j[None, :] >= start[:, None])
            & (j[None, :] < (start + count)[:, None])).astype(jnp.float32), \
        start


def make_strong_ops(ops_cfg: List[Dict[str, Any]], fs: int = 250
                    ) -> List[Callable]:
    """Build the device-side equivalents of the RandAugment op list."""
    ops = []
    for entry in ops_cfg:
        name, kwargs = list(entry.items())[0] if isinstance(entry, dict) \
            else (entry, {})
        kwargs = kwargs or {}
        if name == "AmplitudeScaling":
            sigma = kwargs.get("sigma", 0.5)

            def amp(key, x, sigma=sigma):
                return x * jax.random.normal(key, x.shape) * sigma + x

            ops.append(amp)
        elif name == "AdaptivePowerlineNoise":
            op_fs = kwargs.get("fs", fs)

            def powerline(key, x, op_fs=op_fs):
                b, c, t = x.shape
                k1, _ = jax.random.split(key)
                hi = jnp.percentile(x, 95, axis=2, keepdims=True)
                lo = jnp.percentile(x, 5, axis=2, keepdims=True)
                amplitude = (hi - lo) / 2
                freq = jnp.where(jax.random.uniform(k1, (b, 1, 1)) < 0.5,
                                 50.0, 60.0)
                tt = (jnp.arange(t) / op_fs)[None, None, :]
                return x + amplitude * jnp.sin(2 * jnp.pi * freq * tt)

            ops.append(powerline)
        elif name in ("RandomPartialWhiteNoise", "RandomPartialSineNoise",
                      "WhiteNoise", "SineNoise"):
            amplitude = kwargs.get("amplitude", 1.0)
            freq = kwargs.get("freq", 0.5)
            ratio = kwargs.get("ratio", 0.5)
            partial = name.startswith("RandomPartial")
            sine = "Sine" in name

            def noise(key, x, amplitude=amplitude, freq=freq, ratio=ratio,
                      partial=partial, sine=sine):
                b, c, t = x.shape
                k1, k2 = jax.random.split(key)
                if sine:
                    tt = (jnp.arange(t) / t)[None, None, :]
                    n = amplitude * jnp.sin(2 * jnp.pi * tt / freq)
                    n = jnp.broadcast_to(n, x.shape)
                else:
                    n = amplitude * jax.random.normal(k1, x.shape)
                if partial:
                    mask, start = _span_mask(k2, t, ratio, (b,))
                    # reference writes noise[:, :count] into the span — for
                    # sine that shifts phase; white noise is shift-invariant
                    if sine:
                        j = jnp.arange(t)[None, :]
                        shifted = (j - start[:, None]) % t
                        n = jnp.take_along_axis(
                            n, jnp.broadcast_to(shifted[:, None, :],
                                                (b, c, t)), axis=2)
                    n = n * mask[:, None, :]
                return x + n

            ops.append(noise)
        elif name == "YFlip":
            def yflip(key, x):
                return -x

            ops.append(yflip)
        else:
            raise ValueError(
                f"device_augment does not support strong op '{name}'; "
                "disable dataset.device_augment to use the host pipeline"
            )
    return ops


def rand_augment_batch(key, x: jnp.ndarray, ops: List[Callable],
                       num_layers: int, prob: float) -> jnp.ndarray:
    """Per-sample N-of-K RandAugment (transforms.py:628-657): choose
    ``num_layers`` distinct ops via Gumbel top-k, gate each by ``prob``."""
    b = x.shape[0]
    k_sel, k_prob, k_ops = jax.random.split(key, 3)
    gumbel = jax.random.gumbel(k_sel, (b, len(ops)))
    threshold = jnp.sort(gumbel, axis=1)[:, len(ops) - num_layers][:, None]
    selected = gumbel >= threshold                       # (B, K), N per row
    applied = selected & (jax.random.uniform(k_prob, (b, len(ops))) < prob)
    op_keys = jax.random.split(k_ops, len(ops))
    for i, op in enumerate(ops):
        xi = op(op_keys[i], x)
        x = jnp.where(applied[:, i][:, None, None], xi, x)
    return x


def build_device_augment(dataset_cfg: Dict[str, Any]):
    """Config → jit-able ``augment(key, batch) -> batch``.

    The incoming batch holds raw views (``ecg`` labeled, ``ecg_u_w``
    unlabeled — post resample/filter, pre augmentation/standardize); the
    output matches the host pipeline's contract: weak-augmented +
    standardized ``ecg``/``target``/``ecg_u_w`` and a strong view
    ``ecg_u_s`` built on top of the weak view (semi_dataset.py:240-243).
    """
    aug_cfg = dataset_cfg.get("augmentations") or []
    rrc_kwargs = None
    for entry in aug_cfg:
        name, kwargs = list(entry.items())[0] if isinstance(entry, dict) \
            else (entry, {})
        if name == "random_resize_crop":
            rrc_kwargs = kwargs or {}
        else:
            raise ValueError(
                f"device_augment does not support weak op '{name}'"
            )
    strong_cfg = dataset_cfg.get("strong_augmentations") or []
    strong_ops = None
    ra_layers, ra_prob = 2, 0.5
    for entry in strong_cfg:
        name, kwargs = list(entry.items())[0]
        if name != "RandAugment":
            raise ValueError(
                f"device_augment does not support strong op '{name}'"
            )
        level = kwargs.get("level", 10)
        ra_layers = kwargs.get("num_layers", 2)
        ra_prob = kwargs.get("prob", 0.5)
        ops_cfg = kwargs["ops"]
        # apply RandAugment magnitude to AmplitudeScaling like set_level
        scaled_cfg = []
        for op in ops_cfg:
            op_name, op_kwargs = list(op.items())[0]
            op_kwargs = dict(op_kwargs or {})
            if op_name == "AmplitudeScaling":
                op_kwargs["sigma"] = level / 10 * 0.5
            scaled_cfg.append({op_name: op_kwargs})
        strong_ops = make_strong_ops(scaled_cfg)

    def augment(key, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(batch)
        k_lab, k_unlab, k_strong = jax.random.split(key, 3)
        if "ecg" in batch:
            x, y = batch["ecg"], batch.get("target")
            if rrc_kwargs is not None:
                x, y = random_resize_crop_batch(k_lab, x, y, **rrc_kwargs)
            out["ecg"] = standardize_batch(x)
            if y is not None:
                out["target"] = y
        if "ecg_u_w" in batch:
            u = batch["ecg_u_w"]
            if rrc_kwargs is not None:
                u, _ = random_resize_crop_batch(k_unlab, u)
            out["ecg_u_w"] = standardize_batch(u)
            if strong_ops is not None:
                u_s = rand_augment_batch(k_strong, u, strong_ops, ra_layers,
                                         ra_prob)
                out["ecg_u_s"] = standardize_batch(u_s)
        return out

    return augment
