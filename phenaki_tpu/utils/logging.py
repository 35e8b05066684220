"""Metrics logging / observability.

The reference has only an accum_log dict helper + rank-0 prints + tqdm
(SURVEY.md §5.5). Here: the same accum_log surface plus a structured
MetricLogger that appends JSONL (easy to tail / plot) and optional
jax.profiler trace capture around hot regions (SURVEY.md §5.1 asks the TPU
build to add tracing hooks the reference lacks).
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, Optional

import jax


def accum_log(log: Dict, new_logs: Dict) -> Dict:
    """Accumulate values into a dict (reference cvivit_trainer.py:48-52)."""
    for key, new_value in new_logs.items():
        log[key] = log.get(key, 0.0) + new_value
    return log


class MetricLogger:
    """Rank-0 JSONL metrics sink with wall-clock stamps."""

    def __init__(self, path: Optional[str] = None):
        self.path = Path(path) if path else None
        self._t0 = time.time()
        if self.path and jax.process_index() == 0:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self.path is None or jax.process_index() != 0:
            return
        # metrics may arrive as device scalars (trainers avoid per-step
        # syncs); only a logger with a sink pays the fetch
        record = {
            "step": step,
            "t": time.time() - self._t0,
            **{k: float(v) for k, v in metrics.items()},
        }
        with self.path.open("a") as f:
            f.write(json.dumps(record) + "\n")


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context for inspecting a training/sampling region
    in TensorBoard/XProf."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
