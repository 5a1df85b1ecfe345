"""Import machinery for running the ACTUAL reference code under torch-CPU.

The lockstep/parity tests execute `/root/reference/src` modules directly
(they are the ground truth this framework must match). Two environment
mismatches need shimming, neither of which touches the numerics under test:

- ``utils.misc`` does ``from torch._six import inf`` (misc.py:11) — a
  torch-1.11-ism removed in torch 2.x; shimmed with ``math.inf``.
- ``utils.perf_metrics`` imports ``torchmetrics`` (not installed here); the
  lockstep tests never call ``build_metric_fn``, so an empty module stub
  satisfies the import.

``torch.cuda.synchronize()`` (called every step, base.py:150) raises on a
CPU-only build; it is patched to a no-op — it has no numerical effect.
"""

from __future__ import annotations

import sys
import types

REFERENCE_SRC = "/root/reference/src"


def install_reference_path() -> None:
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)


def install_stubs() -> None:
    import math

    import torch

    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.inf = math.inf
        sys.modules["torch._six"] = six
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.Metric = object
        tm.MetricCollection = dict
        seg = types.ModuleType("torchmetrics.segmentation")
        tm.segmentation = seg
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.segmentation"] = seg
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None


def install_functional_metrics_stub() -> None:
    """Replace the empty ``torchmetrics`` stub with working segmentation
    metrics so the reference's FULL ``train()``/``test()`` can run end to
    end (perf_metrics.py:9-47 reflects over ``torchmetrics.segmentation``
    class names and needs real update/compute/reset behavior).

    Semantics mirror ``semi_seg_ecg_tpu.ops.metrics`` exactly (itself a
    torchmetrics-1.5.2 parity implementation): per update, the batch-mean
    of per-sample class-mean IoU/Dice with the 0-where-union-0 convention;
    ``compute()`` averages the per-update scores. Using ONE metric
    definition on both sides makes the head-to-head converged-quality
    comparison apples-to-apples.
    """
    import sys as _sys

    import numpy as np
    import torch

    install_stubs()
    tm = _sys.modules["torchmetrics"]
    seg = _sys.modules["torchmetrics.segmentation"]

    class _SegMetric:
        higher_is_better = True

        def __init__(self, num_classes, include_background=True,
                     per_class=False, input_format="one-hot", **_ignored):
            self.num_classes = num_classes
            self.include_background = include_background
            self.per_class = per_class
            assert input_format == "one-hot", input_format
            self.reset()

        def reset(self):
            shape = (self.num_classes,) if self.per_class else ()
            self.score = np.zeros(shape)
            self.num_batches = 0

        def to(self, device):
            return self

        @staticmethod
        def _safe_divide(num, den):
            return np.divide(num, den,
                             out=np.zeros(np.broadcast(num, den).shape),
                             where=den != 0)

        def _counts(self, preds, labels):
            """One-hot (B, C, ...) tensors -> per-sample per-class
            (intersection, pred_sum, target_sum), like
            ops.metrics.segmentation_stats."""
            p = preds.detach().cpu().numpy().astype(bool)
            t = labels.detach().cpu().numpy().astype(bool)
            axes = tuple(range(2, p.ndim))
            inter = (p & t).sum(axis=axes).astype(np.float64)
            psum = p.sum(axis=axes).astype(np.float64)
            tsum = t.sum(axis=axes).astype(np.float64)
            if not self.include_background:
                inter, psum, tsum = inter[:, 1:], psum[:, 1:], tsum[:, 1:]
            return inter, psum, tsum

        def _per_sample(self, inter, psum, tsum):
            raise NotImplementedError

        def update(self, preds, labels):
            score = self._per_sample(*self._counts(preds, labels))
            self.score = self.score + score.mean(axis=0)
            self.num_batches += 1

        def compute(self):
            value = self.score / max(self.num_batches, 1)
            return torch.as_tensor(value if self.per_class else float(value))

    class MeanIoU(_SegMetric):
        def _per_sample(self, inter, psum, tsum):
            iou = self._safe_divide(inter, psum + tsum - inter)
            return iou if self.per_class else iou.mean(axis=1)

    class DiceScore(_SegMetric):
        def _per_sample(self, inter, psum, tsum):
            dice = self._safe_divide(2.0 * inter, psum + tsum)
            return dice if self.per_class else dice.mean(axis=1)

    class _Collection(dict):
        """torchmetrics.MetricCollection parity surface used by the
        reference: keyed by class name; update/compute/reset fan out
        (base.py:218,227,244,388)."""

        def __init__(self, metrics):
            super().__init__(
                {type(m).__name__: m for m in metrics}
                if isinstance(metrics, (list, tuple)) else metrics)

        def to(self, device):
            return self

        def update(self, preds, labels):
            for m in self.values():
                m.update(preds, labels)

        def compute(self):
            return {name: m.compute() for name, m in self.items()}

        def reset(self):
            for m in self.values():
                m.reset()

    seg.MeanIoU = MeanIoU
    seg.DiceScore = DiceScore
    tm.MetricCollection = _Collection


def import_reference_module(name: str):
    """Import e.g. ``algorithms.base`` / ``models.backbones`` from the
    reference tree with the compatibility shims installed."""
    install_reference_path()
    install_stubs()
    import importlib

    return importlib.import_module(name)
