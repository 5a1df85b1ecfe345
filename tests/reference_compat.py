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


def import_reference_module(name: str):
    """Import e.g. ``algorithms.base`` / ``models.backbones`` from the
    reference tree with the compatibility shims installed."""
    install_reference_path()
    install_stubs()
    import importlib

    return importlib.import_module(name)
