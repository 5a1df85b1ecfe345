"""Windowed overlap-add inference for arbitrarily long records.

The reference's inference surface ends at fixed 2,500-sample windows
(``src/inference.py:112-125`` runs the test split row by row); a real
Holter/telemetry record is hours long, and segmenting it means sliding
the trained window across the record and reconciling the overlaps. This
module is the TPU-native engine for that: one jitted ``lax.scan`` whose
body gathers a batch of overlapping windows from the on-device record,
applies the test-time per-window standardization (transforms
``standardize: axis [-1, -2]`` semantics), runs the model, and
accumulates taper-weighted probabilities — so an N-hour record is ONE
dispatch and ONE device→host fetch, never a Python loop of forwards.

Overlap-add is done densely, not with scatters: ``hop`` must divide
``window`` (k = window//hop sub-blocks), every window's contribution is
folded into k hop-sized blocks with static-slice adds, and the batch's
(B+k-1)-block slab is read-modify-written into the accumulator with one
``dynamic_update_slice``. XLA keeps the whole loop on-device; the only
data-dependent op is the initial window gather.

Numerics: probabilities are accumulated in f32 weighted by a tapered
window (raised cosine with a 0.05 floor, sampled at half-integer offsets
so no weight is exactly zero) and normalized by the accumulated weight —
regions covered by a single window reproduce that window's probabilities
exactly (w/w == 1); overlapped regions get a smooth taper-weighted blend,
which suppresses the boundary artifacts a hard concatenation shows at
window seams.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["overlap_add_infer", "plan_windows"]


def _taper(window: int, kind: str) -> np.ndarray:
    if kind == "flat":
        return np.ones(window, np.float32)
    if kind == "hann":
        # half-sample offset: strictly positive at the endpoints; the 0.05
        # floor keeps single-cover normalization well-conditioned in f32
        w = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(window) + 0.5) / window)
        return (0.05 + 0.95 * w).astype(np.float32)
    raise ValueError(f"unknown taper '{kind}' (expected 'hann' or 'flat')")


def plan_windows(total: int, window: int, hop: int,
                 batch: int) -> Tuple[int, int, int, int]:
    """Static window plan: ``(n_win, n_win_pad, n_blocks, padded_len)``.

    ``n_win`` windows at stride ``hop`` cover ``total`` samples (the last
    window may run into padding); ``n_win_pad`` rounds up to a batch
    multiple; the padded record is ``n_blocks * hop`` samples where each
    block is one hop-sized output tile.
    """
    if window % hop != 0:
        raise ValueError(f"hop ({hop}) must divide window ({window})")
    if total < 1:
        raise ValueError("record must contain at least one sample")
    n_win = max(0, math.ceil((total - window) / hop)) + 1
    n_win_pad = math.ceil(n_win / batch) * batch
    k = window // hop
    n_blocks = n_win_pad - 1 + k
    return n_win, n_win_pad, n_blocks, n_blocks * hop


# Compiled programs keyed by (infer identity, record geometry) — a bounded
# LRU: entries hold a reference to ``infer`` (and thus its weights), so a
# caller that builds a fresh closure per record (e.g.
# ``long_record_inference(config, ...)`` in a loop) must not grow device
# memory without bound. Reuse one ``infer`` across records to actually hit.
_PROGRAMS: "OrderedDict[tuple, tuple]" = OrderedDict()
_PROGRAMS_MAX = 32


def _build_program(infer, leads, total, window, hop, batch, taper,
                   standardize, num_classes, mesh=None):
    k = window // hop
    n_shards = int(mesh.shape["data"]) if mesh is not None else 1
    n_win, n_win_pad, n_blocks, _ = plan_windows(
        total, window, hop, batch * n_shards)
    steps_per = n_win_pad // (batch * n_shards)  # scan steps per shard
    w_per = steps_per * batch                    # windows per shard
    slab_blocks = w_per - 1 + k                  # hop-blocks one shard touches
    wvec = jnp.asarray(_taper(window, taper))

    def local_scan(record, first_win):
        """Overlap-add the ``w_per`` windows starting at global window id
        ``first_win`` into a local ``slab_blocks``-block accumulator.

        The scan carries only the ``k-1`` seam blocks still awaiting
        contributions from the next batch; each step EMITS its ``batch``
        finalized blocks as scan outputs, written exactly once — no
        full-accumulator read-modify-write rides the loop (same carry
        algebra as serving.StreamingSegmenter, bit-identical to the
        slab form since the one reassociation it moves is a commutative
        two-operand add).
        """
        def body(carry, step):
            seam, wseam = carry  # (k-1, C, hop), (k-1, hop)
            win_ids = first_win + step * batch + jnp.arange(batch)
            # windowing without a gather (XLA's gather lowering on TPU is
            # scalarized and slow — the same pathology ops/pallas/gather1d
            # exists for): the batch's windows tile one contiguous span at
            # uniform stride, so ONE dynamic_slice + k static strided views
            # materialize them densely — the exact inverse of the
            # overlap-add fold below
            span_start = (first_win + step * batch) * hop
            span = jax.lax.dynamic_slice(
                record, (0, span_start), (leads, (batch + k - 1) * hop))
            blocks = span.reshape(leads, batch + k - 1, hop)
            win = jnp.stack([blocks[:, j:j + batch] for j in range(k)],
                            axis=2)  # (leads, B, k, hop)
            win = jnp.moveaxis(win.reshape(leads, batch, window), 1, 0)
            if standardize:
                mu = win.mean(axis=(1, 2), keepdims=True)
                sd = win.std(axis=(1, 2), keepdims=True)
                win = jnp.where(sd != 0.0,
                                (win - mu) / jnp.where(sd != 0.0, sd, 1.0),
                                0.0)
            probs = infer(win).astype(jnp.float32)  # (B, C, window)
            valid = (win_ids < n_win).astype(jnp.float32)
            wwin = wvec[None, :] * valid[:, None]  # (B, window)
            contrib = probs * wwin[:, None, :]
            cb = contrib.reshape(batch, num_classes, k, hop)
            wb = wwin.reshape(batch, k, hop)
            local = jnp.zeros((batch + k - 1, num_classes, hop), jnp.float32)
            wlocal = jnp.zeros((batch + k - 1, hop), jnp.float32)
            for j in range(k):  # k is small and static: dense adds, no scatter
                local = local.at[j:j + batch].add(cb[:, :, j])
                wlocal = wlocal.at[j:j + batch].add(wb[:, j])
            local = local.at[:k - 1].add(seam)
            wlocal = wlocal.at[:k - 1].add(wseam)
            return ((local[batch:], wlocal[batch:]),
                    (local[:batch], wlocal[:batch]))

        seam0 = jnp.zeros((k - 1, num_classes, hop), jnp.float32)
        wseam0 = jnp.zeros((k - 1, hop), jnp.float32)
        (seam, wseam), (blocks, wblocks) = jax.lax.scan(
            body, (seam0, wseam0), jnp.arange(steps_per))
        acc = jnp.concatenate(
            [blocks.reshape(w_per, num_classes, hop), seam], axis=0)
        wacc = jnp.concatenate([wblocks.reshape(w_per, hop), wseam], axis=0)
        return acc, wacc  # (slab_blocks, C, hop), (slab_blocks, hop)

    def run(record):
        # record: (leads, n_blocks * hop) — already padded by the caller
        if n_shards == 1:
            acc, wacc = local_scan(record, 0)  # slab_blocks == n_blocks
        else:
            from jax.sharding import PartitionSpec as P

            def shard_fn(rec):
                r = jax.lax.axis_index("data")
                return local_scan(rec, r * w_per)

            # record replicated; each data-rank returns its slab; slabs of
            # adjacent ranks overlap in the k-1 seam blocks and are summed
            # below — windows never compute twice
            acc_s, wacc_s = jax.shard_map(
                shard_fn, mesh=mesh, in_specs=P(),
                out_specs=P("data"), check_vma=False)(record)
            acc_s = acc_s.reshape(n_shards, slab_blocks, num_classes, hop)
            wacc_s = wacc_s.reshape(n_shards, slab_blocks, hop)
            acc = jnp.zeros((n_blocks, num_classes, hop), jnp.float32)
            wacc = jnp.zeros((n_blocks, hop), jnp.float32)
            for r in range(n_shards):  # static, n_shards-bounded
                acc = acc.at[r * w_per:r * w_per + slab_blocks].add(acc_s[r])
                wacc = wacc.at[r * w_per:r * w_per + slab_blocks].add(
                    wacc_s[r])
        flat = jnp.moveaxis(acc, 1, 0).reshape(num_classes, n_blocks * hop)
        wflat = wacc.reshape(n_blocks * hop)
        probs = flat[:, :total] / jnp.maximum(wflat[:total], 1e-8)
        return probs, jnp.argmax(probs, axis=0).astype(jnp.int32)

    return jax.jit(run)


def overlap_add_infer(infer: Callable, ecg, *, window: int,
                      hop: int | None = None, batch: int = 64,
                      taper: str = "hann", standardize: bool = True,
                      mesh=None):
    """Segment an arbitrary-length record with a fixed-window model.

    ``infer`` maps ``(B, leads, window) -> (B, C, window)`` class
    probabilities (e.g. from :func:`serving.make_serving_fn` or a loaded
    export artifact); ``ecg`` is the full record ``(leads, total)`` (or
    ``(total,)``, promoted to one lead). Returns ``(probs, labels)`` —
    ``(C, total)`` f32 stitched probabilities and their argmax — as
    device arrays; the caller pays the single D2H fetch.

    ``hop`` defaults to ``window // 2`` (50% overlap) and must divide
    ``window``; ``standardize`` applies the test pipeline's per-window
    z-normalization on device. One XLA program compiles per record
    geometry ``(leads, total, window, hop, batch)`` and is cached for
    the life of the process — bucket record lengths upstream if callers
    present many distinct lengths.

    ``mesh`` (a ``jax.sharding.Mesh`` with a ``data`` axis, e.g. from
    ``parallel.make_mesh``) scales the stitcher out: the record is
    replicated (a 24 h record is ~86 MB — activations, not the signal,
    are the memory) and each data-rank scans its contiguous span of
    windows via ``shard_map``; the per-rank block slabs overlap-add at
    the seams, so results match the single-device program to float
    addition-order tolerance and throughput scales with the data axis.
    """
    ecg = jnp.asarray(ecg, jnp.float32)
    if ecg.ndim == 1:
        ecg = ecg[None, :]
    if ecg.ndim != 2:
        raise ValueError(f"record must be (leads, T) or (T,), got {ecg.shape}")
    hop = window // 2 if hop is None else hop
    leads, total = ecg.shape
    n_shards = int(mesh.shape["data"]) if mesh is not None else 1
    n_win, _, _, padded = plan_windows(total, window, hop, batch * n_shards)
    # two-stage tail pad: the VALID windows' reach gets signal-shaped
    # content (reflection keeps the last window's standardization honest;
    # tiny records fall back to edge values) — its extent depends only on
    # (total, window, hop), so results are invariant to batch/shard count.
    # The batch-rounding remainder beyond it is read only by weight-zero
    # padding windows; zeros suffice.
    reach = (n_win - 1) * hop + window
    content_pad = max(0, reach - total)
    ecg = jnp.pad(ecg, ((0, 0), (0, content_pad)),
                  mode="reflect" if content_pad < total else "edge")
    ecg = jnp.pad(ecg, ((0, 0), (0, padded - total - content_pad)))

    key = (id(infer), leads, total, window, hop, batch, taper,
           bool(standardize), id(mesh) if mesh is not None else None)
    entry = _PROGRAMS.get(key)
    if entry is None:
        out = jax.eval_shape(
            infer, jax.ShapeDtypeStruct((batch, leads, window), jnp.float32))
        prog = _build_program(infer, leads, total, window, hop, batch,
                              taper, standardize, out.shape[1], mesh=mesh)
        # keep `infer` alive alongside its program: id() keys are only
        # valid while the object lives
        _PROGRAMS[key] = entry = (prog, infer)
        while len(_PROGRAMS) > _PROGRAMS_MAX:
            _PROGRAMS.popitem(last=False)
    else:
        _PROGRAMS.move_to_end(key)
    return entry[0](ecg)
