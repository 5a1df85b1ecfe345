"""Profiling + device-memory observability.

The reference's tracing is a homemade meter printout with
``torch.cuda.max_memory_allocated`` every 20 iters and per-step
``torch.cuda.synchronize`` for honest timings (misc.py:113-159,
base.py:150). TPU-native equivalents:

- :class:`ProfileSchedule` drives ``jax.profiler`` to capture a real XLA
  trace (TensorBoard-viewable) for a configured step window —
  ``config['profile'] = {'trace_dir': ..., 'start_step': 10, 'num_steps': 5}``;
- :func:`device_memory_mb` reads allocator stats off the PJRT client (no
  sync needed — queried between steps, not inside them);
- step timing stays honest without per-step blocking: the driver drains
  device scalars at the print cadence, which bounds dispatch depth the same
  way a periodic ``block_until_ready`` would.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax


class ProfileSchedule:
    """Start/stop a jax.profiler trace around a configured step window."""

    def __init__(self, profile_cfg: Optional[Dict[str, Any]]):
        cfg = profile_cfg or {}
        self.trace_dir = cfg.get("trace_dir")
        self.start_step = int(cfg.get("start_step", 10))
        self.num_steps = int(cfg.get("num_steps", 5))
        self._active = False
        self._done = False

    def step(self, global_step: int) -> None:
        if self.trace_dir is None or self._done:
            return
        if not self._active and global_step == self.start_step:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and global_step >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True


def device_memory_mb() -> Optional[float]:
    """Peak bytes in use on the first local device, in MB (analogue of
    ``torch.cuda.max_memory_allocated`` in the reference's meter line)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if not stats:
            return None
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
        return peak / (1024 * 1024) if peak is not None else None
    except Exception:
        return None
