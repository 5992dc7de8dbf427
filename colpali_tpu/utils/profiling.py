"""Profiling helpers: jax.profiler traces + step timing.

SURVEY.md §5: the reference's observability is pynvml prints + HF Trainer
logging; the TPU-native equivalents are XLA profiler traces (viewable in
TensorBoard/Perfetto) and step-time statistics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block.

    View with TensorBoard (`tensorboard --logdir <log_dir>`) or upload the
    .trace.json.gz to Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time statistics (the torch loop's every-10-step timing,
    colmodel_torch_training.py:209-227, without host syncs per step)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        return {
            "step_time_p50": ts[len(ts) // 2],
            "step_time_mean": sum(ts) / len(ts),
            "steps_per_second": len(ts) / sum(ts),
        }
