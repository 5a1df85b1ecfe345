"""On-device (jit-fused) batch augmentation.

The reference augments per sample on the host inside ``__getitem__``
(semi_dataset.py:176-243) — scipy FFT resampling and noise synthesis on CPU,
per record, per epoch. This module implements the same augmentation *stage*
as pure jnp functions over whole batches, so it fuses into the training
step: the host ships raw (resampled+filtered, cacheable) signals once and
the TPU generates the weak/strong views.

Every augmentation class in ``data/transforms.py`` that keeps its shape has
a batched, masked/branch-free device equivalent (reference semantics anchor:
src/utils/transforms.py:315-625):

=====================  =======================================================
host op                device strategy
=====================  =======================================================
random_resize_crop     per-sample coordinate grid, linear interp (see below)
xflip / yflip          time-reverse (labels too) / negate
amplitude_scaling      ``x * N(1, sigma)``
drop (RandomMask)      double-argsort rank of per-point uniforms < count
cutout                 span mask zeroes signal and label
shift (RandomShift)    masked gather ``out[j] = x[j -/+ s]``, zero-padded
random_baseline_shift  per-lead median x random span x signed scale
*_noise (+partial)     synthesized waveform; partial variants place
                       ``noise[:count]`` into a random span (phase-shifted)
standardize            per-sample z-norm, zero-guarded
RandomApply            per-sample Bernoulli blend
RandAugment            per-sample Gumbel top-k N-of-K, per-op prob gate,
                       magnitude ``level`` applied like ``set_level``
=====================  =======================================================

``random_resize_crop`` is the one documented approximation: the reference
rescales by Fourier (sinc) interpolation; on device we use linear
interpolation on a per-sample coordinate grid — distributional, not bitwise,
equivalence, with the same crop/pad geometry and nearest-neighbour label
alignment.

Shape-changing ops (crops), filters, and resampling stay on the host — crops
because static shapes are decided there, filters/resample because they are
deterministic per *file* and cached (``data/dataset.py`` prefix cache), so
they cost nothing per epoch anyway.

:func:`plan_device_augment` splits an arbitrary config between host and
device **per branch**: if some op in a chain has no device equivalent, that
chain (and whatever must precede it) falls back to the host pipeline while
the rest still fuses into the step — ``device_augment: true`` is safe on any
config, never an error.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .pallas.gather1d import monotonic_gather, monotonic_gather_int
from .select import exact_quantiles

MAX_LEVEL = 10  # RandAugment magnitude scale (transforms.py set_level)


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

    # the gathers run on the Pallas slope-bounded kernel on TPU (the
    # XLA lowering is a scalarized gather-engine read, profiled at
    # 386 us / 1.6 GB/s — ops/pallas/gather1d.py): t_orig is monotone
    # per sample with slope t/s <= t / floor(t * scale_min)
    s_min = max(int(t * scale_min), 1)
    x_out = monotonic_gather(x, t_orig, max_slope=t / s_min)
    x_out = jnp.where(inside[:, None, :], x_out, 0.0)
    if y is None:
        return x_out, None
    # labels: nearest neighbour of the (reference) linspace(0, T-1, s) grid:
    # resized index c maps to original index round(c * (T-1) / (s-1))
    denom = jnp.maximum(s - 1, 1).astype(jnp.float32)[:, None]
    y_coord = coord.astype(jnp.float32) * ((t - 1) / denom)
    yi = jnp.clip(jnp.round(y_coord).astype(jnp.int32), 0, t - 1)
    y_out = monotonic_gather_int(y, yi,
                                 max_slope=(t - 1) / max(s_min - 1, 1))
    y_out = jnp.where(inside, y_out, 0)
    return x_out, y_out


# ---------------------------------------------------------------------------
# Shared randomness helpers
# ---------------------------------------------------------------------------


def _uniform_span(key, b: int, t: int, ratio: float):
    """Random contiguous span per sample: ``count = int(U(0, ratio)·T)``,
    ``start = int(U[0, T−count))`` — transforms.py span convention.
    Returns (mask(B,T) float, start(B,), count(B,))."""
    k1, k2 = jax.random.split(key)
    count = (jax.random.uniform(k1, (b,)) * ratio * t).astype(jnp.int32)
    # ratio > 1 would make count > t and start negative (the reference's
    # np.random.randint would raise there); clamp so every span consumer —
    # including the doubled-waveform roll's position arithmetic — stays
    # in-bounds for any configured ratio
    count = jnp.minimum(count, t)
    start = (jax.random.uniform(k2, (b,))
             * (t - count).astype(jnp.float32)).astype(jnp.int32)
    j = jnp.arange(t)
    mask = ((j[None, :] >= start[:, None])
            & (j[None, :] < (start + count)[:, None])).astype(jnp.float32)
    return mask, start, count


# kept under its original name: external tests/users build on it
def _span_mask(key, t: int, ratio: float, shape_prefix):
    mask, start, _ = _uniform_span(key, shape_prefix[0], t, ratio)
    return mask, start


# ---------------------------------------------------------------------------
# Device op registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DeviceOp:
    """One batched augmentation: ``apply(key, x, y) -> (x, y)`` on
    (B, C, T) signals / (B, T) labels (y may be None)."""

    apply: Callable
    label_changeable: bool = False


def _signal_only(fn: Callable) -> DeviceOp:
    return DeviceOp(apply=lambda key, x, y, _fn=fn: (_fn(key, x), y))


def _noise_level(kwargs: Dict[str, Any], level: Optional[int]):
    """amplitude/freq after RandAugment magnitude (transforms._Noise
    .set_level: amplitude = level/10, freq = 0.5 / (level/10))."""
    if level is None:
        return kwargs.get("amplitude", 1.0), kwargs.get("freq", 0.5)
    frac = level / MAX_LEVEL
    # level 0 => amplitude 0: the noise vanishes, so any finite freq works
    # (the reference's 0.5/0 would crash on a legal magnitude setting)
    return frac * 1.0, 0.5 / max(frac, 1e-9)


def _wave(name: str, t: int, amplitude: float, freq: float) -> jnp.ndarray:
    """Deterministic (1, 1, T) waveform for sine/square noise."""
    tt = jnp.arange(t) / t
    phase_frac = (tt / freq) % 1.0
    if name == "sine":
        w = jnp.sin(2 * jnp.pi * tt / freq)
    else:  # square: +1 for phase in [0, pi), -1 in [pi, 2*pi)
        w = jnp.where(phase_frac < 0.5, 1.0, -1.0)
    return (amplitude * w)[None, None, :]


def _make_noise_op(kind: str, partial: bool, kwargs: Dict[str, Any],
                   level: Optional[int]) -> DeviceOp:
    amplitude, freq = _noise_level(kwargs, level)
    ratio = kwargs.get("ratio", 0.5)
    if level is not None:
        ratio = level / MAX_LEVEL * 0.5  # _RandomPartialNoise.set_level

    def noise(key, x):
        b, c, t = x.shape
        k1, k2 = jax.random.split(key)
        if kind == "white":
            n = amplitude * jax.random.normal(k1, x.shape)
        else:
            n = jnp.broadcast_to(_wave(kind, t, amplitude, freq), x.shape)
        if partial:
            mask, start, _ = _uniform_span(k2, b, t, ratio)
            if kind != "white":
                # reference writes noise[:, :count] into the span — the
                # waveform restarts at phase 0 there; white noise is
                # shift-invariant so only deterministic waves need the
                # roll. The circular map (j - start) % t is two monotone
                # segments; over a doubled waveform it is ONE monotone
                # slope-1 map (j - start + t), so the Pallas gather
                # kernel covers it too.
                j = jnp.arange(t)[None, :]
                pos = (j - start[:, None] + t).astype(jnp.float32)
                n = monotonic_gather(jnp.concatenate([n, n], axis=2), pos,
                                     max_slope=1.0)
            n = n * mask[:, None, :]
        return x + n

    return _signal_only(noise)


def _make_device_op(name: str, kwargs: Dict[str, Any],
                    level: Optional[int] = None) -> Optional[DeviceOp]:
    """Device equivalent of one transform config entry, or None when the op
    only exists on the host (filters, resampling, crops, to_tensor).

    ``level`` is the RandAugment magnitude; when set it overrides the
    statistical knobs exactly like ``Transform.set_level`` does."""
    kwargs = dict(kwargs or {})

    if name in ("amplitude_scaling", "AmplitudeScaling"):
        sigma = kwargs.get("sigma", 0.5)
        if level is not None:
            sigma = level / MAX_LEVEL * 0.5

        def amp(key, x, sigma=sigma):
            return x * (1.0 + sigma * jax.random.normal(key, x.shape))

        return _signal_only(amp)

    if name in ("xflip", "XFlip"):
        def xflip(key, x, y):
            x = jnp.flip(x, axis=-1)
            return x, (None if y is None else jnp.flip(y, axis=-1))

        return DeviceOp(apply=xflip, label_changeable=True)

    if name in ("yflip", "YFlip"):
        return _signal_only(lambda key, x: -x)

    if name in ("drop", "RandomMask"):
        ratio = kwargs.get("mask_ratio", 0.3)

        def drop(key, x, ratio=ratio):
            b, c, t = x.shape
            k1, k2 = jax.random.split(key)
            max_count = max(int(t * ratio), 1)
            count = (jax.random.uniform(k1, (b,)) * max_count).astype(
                jnp.int32)
            # rank of each time point among per-sample uniforms: the
            # ``count`` smallest ranks are the masked points — a batched
            # choice-without-replacement
            u = jax.random.uniform(k2, (b, t))
            rank = jnp.argsort(jnp.argsort(u, axis=1), axis=1)
            keep = (rank >= count[:, None])[:, None, :]
            return x * keep

        return _signal_only(drop)

    if name in ("cutout", "Cutout"):
        ratio = kwargs.get("mask_ratio", 0.3)

        def cutout(key, x, y, ratio=ratio):
            b, c, t = x.shape
            mask, _, _ = _uniform_span(key, b, t, ratio)
            x = x * (1.0 - mask[:, None, :])
            if y is not None:
                y = jnp.where(mask.astype(bool), 0, y)  # cut label -> bg
            return x, y

        return DeviceOp(apply=cutout, label_changeable=True)

    if name in ("shift", "RandomShift"):
        ratio = kwargs.get("mask_ratio", 0.3)

        def shift(key, x, y, ratio=ratio):
            b, c, t = x.shape
            k1, k2 = jax.random.split(key)
            amount = (jax.random.uniform(k1, (b,)) * ratio * t).astype(
                jnp.int32)
            right = jax.random.bernoulli(k2, 0.5, (b,))
            signed = jnp.where(right, amount, -amount)[:, None]
            j = jnp.arange(t)[None, :]
            src = j - signed                       # out[j] = in[j - s]
            valid = (src >= 0) & (src < t)
            src = jnp.clip(src, 0, t - 1)
            # per-sample shift is a slope-1 monotone gather -> Pallas
            # kernel on TPU (see random_resize_crop_batch note)
            xg = monotonic_gather(x, src.astype(jnp.float32),
                                  max_slope=1.0)
            x = jnp.where(valid[:, None, :], xg, 0.0)
            if y is not None:
                yg = monotonic_gather_int(y, src, max_slope=1.0)
                y = jnp.where(valid, yg, 0)
            return x, y

        return DeviceOp(apply=shift, label_changeable=True)

    if name in ("random_baseline_shift", "RandomBaselineShift"):
        ratio = kwargs.get("ratio", 0.5)
        scale = kwargs.get("scale", 3.0)
        if level is not None:
            ratio = level / MAX_LEVEL * 0.5
            scale = level / MAX_LEVEL * 3.0

        def baseline(key, x, ratio=ratio, scale=scale):
            b, c, t = x.shape
            k1, k2, k3 = jax.random.split(key, 3)
            # radix-select median: no sort in the fused step (ops/select.py)
            background, = exact_quantiles(x, (50.0,))           # per lead
            mask, _, _ = _uniform_span(k1, b, t, ratio)
            sign = 1.0 - 2.0 * jax.random.bernoulli(
                k2, 0.5, (b,)).astype(jnp.float32)
            amt = jax.random.uniform(k3, (b,)) * scale * sign
            return x + background * amt[:, None, None] * mask[:, None, :]

        return _signal_only(baseline)

    if name in ("adaptive_powerline_noise", "AdaptivePowerlineNoise"):
        op_fs = kwargs.get("fs", 500)

        def powerline(key, x, op_fs=op_fs):
            b, c, t = x.shape
            # radix-select quantiles: the jnp.percentile sort was 17% of
            # the fused step's device time (NOTES round-3 profile);
            # radix-select is 4-32x cheaper at batch >= 48 (ops/select.py)
            lo, hi = exact_quantiles(x, (5.0, 95.0))
            mains = jnp.where(jax.random.uniform(key, (b, 1, 1)) < 0.5,
                              50.0, 60.0)
            tt = (jnp.arange(t) / op_fs)[None, None, :]
            return x + 0.5 * (hi - lo) * jnp.sin(2 * jnp.pi * mains * tt)

        return _signal_only(powerline)

    if name in ("sine_noise", "SineNoise"):
        return _make_noise_op("sine", False, kwargs, level)
    if name in ("square_noise", "SquareNoise"):
        return _make_noise_op("square", False, kwargs, level)
    if name in ("white_noise", "WhiteNoise"):
        return _make_noise_op("white", False, kwargs, level)
    if name in ("partial_sine_noise", "RandomPartialSineNoise"):
        return _make_noise_op("sine", True, kwargs, level)
    if name in ("partial_square_noise", "RandomPartialSquareNoise"):
        return _make_noise_op("square", True, kwargs, level)
    if name in ("partial_white_noise", "RandomPartialWhiteNoise"):
        return _make_noise_op("white", True, kwargs, level)

    if name in ("standardize", "Standardize"):
        axis = kwargs.get("axis", (-1, -2))
        axis = tuple(axis) if isinstance(axis, (list, tuple)) else (axis,)
        if sorted(axis) != [-2, -1]:
            # per-lead or exotic axes stay on the host: standardize_batch
            # normalizes jointly over (lead, time), which only matches the
            # host op for the (-1, -2) schema
            return None

        def std(key, x):
            return standardize_batch(x)

        return _signal_only(std)

    if name in ("random_resize_crop", "RandomResizeCrop"):
        rrc_kwargs = kwargs

        def rrc(key, x, y, rrc_kwargs=rrc_kwargs):
            return random_resize_crop_batch(key, x, y, **rrc_kwargs)

        return DeviceOp(apply=rrc, label_changeable=True)

    if name == "RandomApply":
        inner_entry = kwargs.get("transform")
        prob = kwargs.get("prob", 0.5)
        if inner_entry is None:
            return None
        iname, ikwargs = _entry_name_kwargs(inner_entry)
        inner = _make_device_op(iname, ikwargs, level)
        if inner is None:
            return None

        def rapply(key, x, y, inner=inner, prob=prob):
            k_gate, k_op = jax.random.split(key)
            gate = jax.random.uniform(k_gate, (x.shape[0],)) < prob
            xi, yi = inner.apply(k_op, x, y)
            x = jnp.where(gate[:, None, None], xi, x)
            if y is not None and yi is not None:
                y = jnp.where(gate[:, None], yi, y)
            return x, y

        return DeviceOp(apply=rapply,
                        label_changeable=inner.label_changeable)

    if name == "RandAugment":
        ops_cfg = kwargs.get("ops")
        if not ops_cfg:
            return None
        ra_level = kwargs.get("level", 10)
        num_layers = kwargs.get("num_layers", 2)
        prob = kwargs.get("prob", 0.5)
        members: List[DeviceOp] = []
        for entry in ops_cfg:
            ename, ekwargs = _entry_name_kwargs(entry)
            op = _make_device_op(ename, ekwargs, level=ra_level)
            if op is None:
                return None
            members.append(op)

        def ra(key, x, y, members=members, num_layers=num_layers, prob=prob):
            return _rand_augment(key, x, y, members, num_layers, prob)

        return DeviceOp(
            apply=ra,
            label_changeable=any(m.label_changeable for m in members))

    return None  # host-only op (filters, crops, resample, to_tensor, ...)


def _rand_augment(key, x, y, ops: List[DeviceOp], num_layers: int,
                  prob: float):
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
        xi, yi = op.apply(op_keys[i], x, y)
        x = jnp.where(applied[:, i][:, None, None], xi, x)
        if y is not None and yi is not None:
            y = jnp.where(applied[:, i][:, None], yi, y)
    return x, y


def _apply_chain(key, ops: List[DeviceOp], x, y=None):
    if not ops:
        return x, y
    for k, op in zip(jax.random.split(key, len(ops)), ops):
        x, y = op.apply(k, x, y)
    return x, y


def _entry_name_kwargs(entry) -> Tuple[str, Dict[str, Any]]:
    if isinstance(entry, str):
        return entry, {}
    name, kwargs = list(entry.items())[0]
    return name, (kwargs or {})


def _build_chain(cfg_list) -> Optional[List[DeviceOp]]:
    """Device ops for a whole transform chain, or None if ANY entry lacks a
    device equivalent (that chain then runs on the host)."""
    ops = []
    for entry in cfg_list or []:
        name, kwargs = _entry_name_kwargs(entry)
        op = _make_device_op(name, kwargs)
        if op is None:
            return None
        ops.append(op)
    return ops


# ---------------------------------------------------------------------------
# Pipeline split planning
# ---------------------------------------------------------------------------

_TO_TENSOR_ONLY = [{"to_tensor": {"dtype": "float"}}]


@dataclass
class DeviceAugPlan:
    """How ``device_augment: true`` splits a dataset config.

    ``labeled_overrides`` / ``unlabeled_overrides`` are merged over the
    dataset config when building the *train* datasets (eval always uses the
    plain host path); ``augment`` is the jit-able ``(key, batch) -> batch``
    device stage (None when everything stayed on the host)."""

    labeled_overrides: Dict[str, Any] = field(default_factory=dict)
    unlabeled_overrides: Dict[str, Any] = field(default_factory=dict)
    augment: Optional[Callable] = None
    summary: str = "host-only"


def plan_device_augment(dataset_cfg: Dict[str, Any]) -> DeviceAugPlan:
    """Split the augmentation pipeline between host and device.

    Branch rules (the strong view builds ON TOP of the weak view,
    semi_dataset.py:240-243, which constrains the split):

    - weak chain on device -> labeled + unlabeled ship raw signals.
    - weak on host but strong on device -> unlabeled ships the host-weak
      view *pre-standardize* (the strong view must derive from it).
    - strong on host but weak on device -> the unlabeled branch falls back
      to the full host path (the host can't strong-augment a view that
      only exists on device); the labeled branch still fuses.
    - ``transforms`` other than standardize/to_tensor -> full host fallback.
    """
    aug_cfg = dataset_cfg.get("augmentations") or []
    strong_cfg = dataset_cfg.get("strong_augmentations") or []
    transforms_cfg = dataset_cfg.get("transforms") or _TO_TENSOR_ONLY

    # the final per-view transform chain (host: dataset.get applies it to
    # each view's signal after augmentation; to_tensor is the host's dtype
    # cast and has no device work). It runs on device as a real op chain —
    # exactly what the config lists, nothing forced in or dropped.
    final_ops = _build_chain([
        e for e in transforms_cfg
        if _entry_name_kwargs(e)[0] != "to_tensor"
    ])
    if final_ops is None:
        return DeviceAugPlan(summary="host-only (unsupported transforms)")

    weak_ops = _build_chain(aug_cfg)
    strong_ops = _build_chain(strong_cfg) if strong_cfg else []
    weak_dev = weak_ops is not None
    strong_dev = strong_ops is not None and bool(strong_cfg)

    labeled_device = weak_dev
    unlab_weak_device = weak_dev and (strong_dev or not strong_cfg)
    # weak on device + strong host-only is unservable for unlabeled: full
    # host fallback there (see docstring)
    device_strong = strong_dev

    labeled_overrides: Dict[str, Any] = {}
    unlabeled_overrides: Dict[str, Any] = {}
    if labeled_device:
        labeled_overrides = {
            "augmentations": None,
            # the labeled view's strong branch is never consumed
            # (combined_batches reads only the unlabeled one) — skip it
            "strong_augmentations": None,
            "transforms": _TO_TENSOR_ONLY,
        }
    if unlab_weak_device:
        unlabeled_overrides = {
            "augmentations": None,
            "strong_augmentations": None,
            "transforms": _TO_TENSOR_ONLY,
        }
    elif device_strong:
        # host computes the weak view but must NOT standardize it: the
        # device builds the strong view on top, then standardizes both
        unlabeled_overrides = {
            "strong_augmentations": None,
            "transforms": _TO_TENSOR_ONLY,
        }

    unlab_final_device = unlab_weak_device or device_strong
    if not (labeled_device or unlab_final_device):
        return DeviceAugPlan(summary="host-only (unsupported augmentations)")

    def augment(key, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        out = dict(batch)
        k_lab, k_unlab, k_strong, k_fl, k_fu, k_fs = jax.random.split(key, 6)
        if labeled_device and "ecg" in batch:
            x, y = _apply_chain(k_lab, weak_ops, batch["ecg"],
                                batch.get("target"))
            # final transforms are signal-only (dataset.get parity)
            out["ecg"], _ = _apply_chain(k_fl, final_ops, x)
            if y is not None:
                out["target"] = y
        if "ecg_u_w" in batch and unlab_final_device:
            u = batch["ecg_u_w"]
            if unlab_weak_device:
                u, _ = _apply_chain(k_unlab, weak_ops, u)
            out["ecg_u_w"], _ = _apply_chain(k_fu, final_ops, u)
            if device_strong:
                # strong view derives from the PRE-transform weak view
                # (semi_dataset.py:240-243)
                u_s, _ = _apply_chain(k_strong, strong_ops, u)
                out["ecg_u_s"], _ = _apply_chain(k_fs, final_ops, u_s)
        return out

    parts = []
    parts.append("weak=device" if weak_dev else "weak=host")
    if strong_cfg:
        parts.append("strong=device" if device_strong else "strong=host")
    if weak_dev and strong_cfg and not device_strong:
        parts.append("unlabeled=host (strong chain unsupported)")
    return DeviceAugPlan(
        labeled_overrides=labeled_overrides,
        unlabeled_overrides=unlabeled_overrides,
        augment=augment,
        summary=", ".join(parts),
    )


def build_device_augment(dataset_cfg: Dict[str, Any]):
    """Config → jit-able ``augment(key, batch) -> batch`` (or None when the
    whole pipeline stays host-side).

    The incoming batch holds the host-produced views (``ecg`` labeled,
    ``ecg_u_w`` unlabeled — raw when the weak chain runs on device,
    host-weak-augmented otherwise); the output matches the host pipeline's
    contract: weak-augmented + standardized ``ecg``/``target``/``ecg_u_w``
    and a strong view ``ecg_u_s`` built on top of the weak view
    (semi_dataset.py:240-243).
    """
    return plan_device_augment(dataset_cfg).augment


# ---------------------------------------------------------------------------
# Back-compat helpers (kept for tests / external users)
# ---------------------------------------------------------------------------


def make_strong_ops(ops_cfg: List[Dict[str, Any]], fs: int = 250
                    ) -> List[Callable]:
    """Signal-only device callables for a RandAugment op list."""
    ops = []
    for entry in ops_cfg:
        name, kwargs = _entry_name_kwargs(entry)
        if name == "AdaptivePowerlineNoise":
            kwargs = {"fs": fs, **(kwargs or {})}
        op = _make_device_op(name, kwargs)
        if op is None:
            raise ValueError(
                f"no device equivalent for strong op '{name}'")
        ops.append(lambda key, x, _op=op: _op.apply(key, x, None)[0])
    return ops


def rand_augment_batch(key, x: jnp.ndarray, ops: List[Callable],
                       num_layers: int, prob: float) -> jnp.ndarray:
    """Per-sample N-of-K RandAugment over signal-only callables."""
    wrapped = [DeviceOp(apply=lambda k, xx, yy, _f=f: (_f(k, xx), yy))
               for f in ops]
    out, _ = _rand_augment(key, x, None, wrapped, num_layers, prob)
    return out
