"""Profiling & observability helpers — the structured upgrade of the
reference's printf-tracing (SURVEY.md §5: `jax_log_compiles` + flush prints).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def log_compiles(enabled: bool = True) -> Iterator[None]:
    import jax

    prev = jax.config.read("jax_log_compiles")
    jax.config.update("jax_log_compiles", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_log_compiles", prev)


class ThroughputMeter:
    """Rolling it/sec + examples/sec meter (train.py:141-145's loop print,
    structured)."""

    def __init__(self, window: int = 100, batch_size: Optional[int] = None):
        self.window = window
        self.batch_size = batch_size
        self._t0 = time.time()
        self._count = 0

    def step(self) -> Optional[Dict[str, float]]:
        self._count += 1
        if self._count % self.window:
            return None
        dt = time.time() - self._t0
        self._t0 = time.time()
        out = {"it_per_sec": self.window / dt}
        if self.batch_size:
            out["examples_per_sec"] = self.window * self.batch_size / dt
        return out


def log_jsonl(path: str, record: Dict):
    """Append one JSON line (metrics stream consumable by any dashboard)."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
