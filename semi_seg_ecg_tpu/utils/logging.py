"""Observability sinks: smoothed meters, epoch JSONL log, optional TensorBoard.

Capability parity with the reference's three sinks (src/utils/misc.py:14-177,
src/algorithms/base.py:160-172,408-432):

1. stdout — ``MetricLogger.log_every`` prints iter/ETA/meters/step-time/
   data-wait periodically; timestamps on every line (the reference
   monkey-patches ``builtins.print``; we just format here).
2. TensorBoard — per-iter scalars on the ``epoch_1000x`` x-axis and per-epoch
   ``perf/*`` scalars. Optional: enabled when ``tensorboard`` is importable
   and an output dir exists.
3. ``log.txt`` — append-only, one JSON dict per epoch.

Everything here is host-side and framework-agnostic (no jax imports), so the
jitted step never blocks on logging.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional


class SmoothedValue:
    """Track a series of values with a windowed median/avg and global stats.

    Mirrors misc.SmoothedValue (misc.py:14-73) minus the torch.distributed
    sync: in this framework per-step scalars are already globally reduced
    inside the jitted step (a ``jnp.mean`` over the sharded batch axis is a
    cross-replica reduction under GSPMD), so no host-side all_reduce exists.
    """

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        if not d:
            return 0.0
        m = len(d) // 2
        return d[m] if len(d) % 2 else 0.5 * (d[m - 1] + d[m])

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / self.count if self.count else 0.0

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


class MetricLogger:
    """Meter dict + periodic progress printer (misc.py:76-159 parity)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def __getattr__(self, attr: str):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "",
                  length: Optional[int] = None):
        if length is None:
            try:
                length = len(iterable)  # type: ignore[arg-type]
            except TypeError:
                length = None
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        total_fmt = f"{{:{len(str(length))}d}}" if length else "{}"
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (length and i == length - 1):
                if length:
                    eta = iter_time.global_avg * (length - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    progress = f"[{total_fmt.format(i)}/{length}]"
                    eta_part = f"eta: {eta_str}"
                else:
                    progress = f"[{i}]"
                    eta_part = ""
                parts = [header, progress, eta_part, str(self),
                         f"time: {iter_time}", f"data: {data_time}"]
                log(self.delimiter.join(p for p in parts if p))
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        total_time_str = str(datetime.timedelta(seconds=int(total_time)))
        per_it = total_time / max(i, 1)
        log(f"{header} Total time: {total_time_str} ({per_it:.4f} s / it)")

    def stats(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}


_LOG_ENABLED = True


def set_logging_enabled(enabled: bool) -> None:
    """Rank-0-only printing (parity with misc.setup_for_distributed)."""
    global _LOG_ENABLED
    _LOG_ENABLED = enabled


def log(*args, force: bool = False) -> None:
    if _LOG_ENABLED or force:
        now = datetime.datetime.now().strftime("[%Y-%m-%d %H:%M:%S]")
        print(now, *args, flush=True)


class TensorBoardWriter:
    """Thin optional wrapper so training code never imports tensorboard."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._writer = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class JsonlLogger:
    """Append-only per-epoch JSON log (base.py:417-432 parity)."""

    def __init__(self, output_dir: Optional[str], filename: str = "log.txt"):
        self.path = os.path.join(output_dir, filename) if output_dir else None

    def write(self, stats: Dict) -> None:
        if self.path is None:
            return
        with open(self.path, mode="a", encoding="utf-8") as f:
            f.write(json.dumps(stats) + "\n")
