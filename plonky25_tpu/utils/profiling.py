"""Profiling / observability (SURVEY.md §5: absent in the reference, a
first-class subsystem here since the BASELINE metrics are throughput and
scaling efficiency).

Two layers:
  * `StageTimer` — wall-clock per-stage accounting with device sync at the
    boundaries (on the axon TPU tunnel, block_until_ready is unreliable, so
    the sync forces a tiny device->host transfer instead);
  * `trace(logdir)` — context manager around jax.profiler for capturing a
    full XLA trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np


def sync(x) -> None:
    """Block until `x`'s leaves are computed (tunnel-safe: forces a
    device->host copy of one element per leaf)."""
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "shape"):
            arr = leaf
            for _ in range(getattr(arr, "ndim", 0)):
                arr = arr[0]
            np.asarray(arr)


@dataclass
class StageTimer:
    """Accumulates wall-clock per named stage across repetitions.

    with timer.stage("transcript"):
        out = fn(x)
        # sync happens on exit
    """

    times: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "result" in holder:
                sync(holder["result"])
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.times.setdefault(name, []).append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            a = np.asarray(ts)
            out[name] = {
                "n": int(a.size),
                "mean_ms": float(a.mean() * 1e3),
                "min_ms": float(a.min() * 1e3),
                "total_s": float(a.sum()),
            }
        return out

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2, sort_keys=True)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Capture a jax.profiler trace (TensorBoard `logdir`), no-op if None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_throughput(fn, args, n_items: int, iters: int = 20,
                       warmup: int = 1) -> Dict[str, float]:
    """items/s of `fn(*args)` with device sync per timed region."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    dt = (time.perf_counter() - t0) / iters
    return {"sec_per_call": dt, "items_per_sec": n_items / dt}
