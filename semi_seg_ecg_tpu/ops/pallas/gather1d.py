"""Slope-bounded time-axis gather as a Pallas TPU kernel.

Why: the fused device-augmentation program (ops/preprocess.py) gathers
signals along the time axis with per-sample index maps — linear-interp
resampling in ``random_resize_crop_batch`` and shifted reads in
``RandomShift``. XLA lowers ``jnp.take_along_axis`` over that axis to a
scalarized gather on the TPU's (shared, ~3x oversubscribed) gather engine:
profiled at 386 us per call at 1.6 GB/s effective with zero FLOPs
(NOTES.md round-3 profile findings), six such calls per fused step.

The augment index maps are not arbitrary: they are per-sample monotonic
maps with a *statically bounded slope* (resample slope <= 1/scale_min,
shift slope == 1). So an output tile of ``block_j`` positions only ever
reads a ``~slope * block_j`` input span. This kernel exploits that:

- grid = (batch, output tiles); a scalar-prefetched per-tile span start
  (128-aligned, computed on the XLA side from the tile-min index) picks
  the input window with one dynamic VMEM slice — no HBM gather;
- the within-span gather + linear interpolation is ONE small one-hot
  matmul on the MXU: ``out = x_span @ M`` where
  ``M[s, j] = (s == i0_j)(1-w_j) + (s == i0_j+1) w_j`` is built in
  registers from an iota compare — never materialised to HBM.

Semantics (matches the jnp formulation in preprocess.py exactly):

    out[b, c, j] = (1-w) * x[b, c, i0] + w * x[b, c, i0+1]
    i0 = floor(pos[b, j]), w = pos - i0,  pos must lie in [0, T-1]

``pos == T-1`` has ``w == 0`` so the (out-of-range) ``i0+1`` term never
contributes; callers clip ``pos`` into range (preprocess.py already does).
Integer/nearest gathers pass an integral ``pos`` (w == 0 throughout) —
:func:`monotonic_gather_int` wraps the float round-trip (exact for label
values, i.e. anything < 2**24).

No VJP is defined: every call site is data augmentation ahead of the
network, outside the differentiated region.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# hardware-swept (v5e, t=2500, slope 2.0): 256 runs the bare gather 2.9x
# faster than 128 at batch 16 (39 vs 115 us) and ~4% faster at batch 256;
# 512 loses both (the one-hot tile's FLOPs grow with span x block_j)
DEFAULT_BLOCK_J = 256

# per-program working set must stay far under the ~16 MB/core VMEM (an
# overflow wedges the remote tunnel for ~1 h, NOTES.md)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024

# module knob (tests/benchmarks): "auto" uses the kernel on TPU backends,
# "xla" forces the jnp fallback, "pallas" forces the kernel, "interpret"
# forces the kernel in interpreter mode (CPU-exercisable). The env var is
# the no-code-edit escape hatch for hardware/Mosaic trouble in the field.
GATHER_IMPL = os.environ.get("ECG_GATHER_IMPL", "auto")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _span_for(block_j: int, max_slope: float, t_pad: int) -> int:
    """Static input-span length for one output tile: the tile covers
    ``slope * (block_j - 1) + 2`` input positions (i0..i1 inclusive),
    plus 128 slack because span starts are rounded DOWN to a lane-aligned
    multiple of 128 (alignment keeps the dynamic VMEM slice relayout-free).
    """
    need = int(max_slope * (block_j - 1)) + 2
    return min(_round_up(need, 128) + 128, t_pad)


def fits_vmem(c: int, t: int, block_j: int = DEFAULT_BLOCK_J,
              max_slope: float = 2.0) -> bool:
    t_pad = _round_up(t, 128)
    span = _span_for(block_j, max_slope, t_pad)
    resident = (c * t_pad            # x row
                + span * block_j     # one-hot tile (f32)
                + c * span           # span slice
                + c * block_j        # out tile
                + 4 * block_j)       # pos/i0/w temporaries
    return resident * 4 <= _VMEM_BUDGET_BYTES


def _kernel(starts_ref, x_ref, pos_ref, o_ref, *, span: int):
    b, jt = pl.program_id(0), pl.program_id(1)
    st = pl.multiple_of(starts_ref[b, jt], 128)
    pos = pos_ref[0, :, :]                         # (1, block_j) f32
    i0 = jnp.floor(pos).astype(jnp.int32)
    w = pos - i0.astype(jnp.float32)
    local = i0 - st                                # (1, block_j)
    xs = x_ref[0, :, pl.ds(st, span)]              # (C, span)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (span, pos.shape[1]), 0)
    onehot = ((s_iota == local).astype(jnp.float32) * (1.0 - w)
              + (s_iota == local + 1).astype(jnp.float32) * w)
    # HIGHEST precision: the MXU's default single-pass bf16 would round
    # the signal values (and lerp weights), quietly de-exacting the
    # w==0 paths (shift, labels) that must be bit-copies; the matmul is
    # tiny (span x block_j per tile), so the multi-pass cost is noise
    out = jnp.dot(xs.astype(jnp.float32), onehot,
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    o_ref[0, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_slope", "block_j",
                                             "interpret"))
def _pallas_gather(x, pos, *, max_slope: float, block_j: int,
                   interpret: bool):
    b, c, t = x.shape
    j = pos.shape[1]
    t_pad = _round_up(t, 128)
    j_pad = _round_up(j, block_j)
    n_tiles = j_pad // block_j
    span = _span_for(block_j, max_slope, t_pad)

    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t)))
    # pad pos with its per-sample last value: keeps the padded tail
    # monotone so tile spans stay bounded; padded outputs are sliced off.
    # The singleton middle axis keeps Mosaic's block rule happy: the
    # block's last-two dims (1, block_j) must each divide-or-equal the
    # array's — a flat (1, block_j) block over (B, J) fails it for B > 1.
    pos = pos.astype(jnp.float32)
    pos_p = jnp.pad(pos, ((0, 0), (0, j_pad - j)), mode="edge")[:, None, :]

    # per-(sample, tile) span start: tile-min i0, rounded down to the
    # 128-aligned lane boundary, clamped so st + span stays in bounds
    tile_min = jnp.floor(pos_p).astype(jnp.int32).reshape(
        b, n_tiles, block_j).min(axis=2)
    starts = jnp.clip((tile_min // 128) * 128, 0, t_pad - span)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, t_pad), lambda bi, ji, st: (bi, 0, 0)),
            pl.BlockSpec((1, 1, block_j), lambda bi, ji, st: (bi, 0, ji)),
        ],
        out_specs=pl.BlockSpec((1, c, block_j),
                               lambda bi, ji, st: (bi, 0, ji)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, span=span),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, j_pad), x.dtype),
        interpret=interpret,
    )(starts, x_p, pos_p)
    return out[:, :, :j]


def _xla_gather(x, pos):
    b, c, t = x.shape
    i0 = jnp.floor(pos).astype(jnp.int32)
    w = (pos - i0)[:, None, :]
    i1 = jnp.minimum(i0 + 1, t - 1)
    take = lambda idx: jnp.take_along_axis(
        x, jnp.broadcast_to(idx[:, None, :], (b, c, pos.shape[1])), axis=2)
    return take(i0) * (1 - w) + take(i1) * w


def monotonic_gather(x: jnp.ndarray, pos: jnp.ndarray, *, max_slope: float,
                     block_j: int = DEFAULT_BLOCK_J) -> jnp.ndarray:
    """Linear-interpolation gather along time: ``(B, C, T), (B, J) -> (B,
    C, J)``. ``pos`` must lie in ``[0, T-1]`` and each ``block_j``-sized
    output tile must read at most a ``max_slope * block_j`` input span
    (monotone per-sample maps with slope <= max_slope qualify; the span
    sizing is STATIC, so a violating ``pos`` silently drops the
    out-of-span term — callers own the bound).

    Dispatch: the Pallas kernel on TPU (or under ``GATHER_IMPL`` in
    {"pallas", "interpret"}), the jnp formulation otherwise.
    """
    impl = GATHER_IMPL
    if impl not in ("auto", "xla", "pallas", "interpret"):
        raise ValueError(
            f"unknown gather impl {impl!r} (GATHER_IMPL / ECG_GATHER_IMPL "
            "must be one of: auto, xla, pallas, interpret)")
    if impl == "auto":
        b, c, t = x.shape
        on_tpu = jax.default_backend() == "tpu"
        impl = ("pallas" if on_tpu and fits_vmem(c, t, block_j, max_slope)
                else "xla")
    if impl == "xla":
        return _xla_gather(x, pos.astype(jnp.float32))
    return _sharded(x, pos, max_slope=max_slope, block_j=block_j,
                    interpret=(impl == "interpret"))


def _sharded(x, pos, *, max_slope, block_j, interpret):
    """pallas_call has no GSPMD partitioning rule: inside a jitted step
    over a multi-device mesh the bare kernel would run fully replicated
    behind an all-gather. The gather is embarrassingly parallel over
    batch, so shard_map it with batch on the ``data`` axis (same pattern
    as sharded_flash_attention)."""
    from ...parallel.mesh import DATA_AXIS, get_current_mesh

    call = functools.partial(_pallas_gather, max_slope=max_slope,
                             block_j=block_j, interpret=interpret)
    mesh = get_current_mesh()
    if mesh is None or mesh.size == 1:
        return call(x, pos)
    dp = mesh.shape[DATA_AXIS]
    if x.shape[0] % dp != 0:
        return call(x, pos)

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        call, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None), check_vma=False,
    )(x, pos)


def monotonic_gather_int(y: jnp.ndarray, idx: jnp.ndarray, *,
                         max_slope: float,
                         block_j: int = DEFAULT_BLOCK_J) -> jnp.ndarray:
    """Nearest (integer-index) gather for label rows: ``(B, T), (B, J)
    int -> (B, J)`` with ``out[b, j] = y[b, idx[b, j]]``. Runs the float
    kernel with ``w == 0`` — exact for values below 2**24 (labels are
    tiny class ids)."""
    out = monotonic_gather(y[:, None, :].astype(jnp.float32),
                           idx.astype(jnp.float32), max_slope=max_slope,
                           block_j=block_j)
    return jnp.round(out[:, 0, :]).astype(y.dtype)
