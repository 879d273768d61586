"""Profiling and timing harnesses.

The reference has no tracing/profiling beyond tqdm (SURVEY.md §5). TPU
equivalents provided here:

* `trace(logdir)` — context manager around `jax.profiler` producing a
  Perfetto/TensorBoard trace of device execution
* `time_fn` — steady-state wall timing with `block_until_ready` and
  warmup, the honest way to time dispatched XLA programs
* `step_timer` — lightweight per-step timer accumulating a breakdown dict
  (host data time vs device step time) for the train loop
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


def host_rss_mb() -> float | None:
    """Current process resident set size in MB (Linux /proc), or None.

    Standing telemetry for the axon client's host-RAM leak (~= total
    bytes ever device_put, CLAUDE.md): the train loop records it per
    epoch so long runs prove their memory stays bounded."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024.0, 1)
    except OSError:
        pass
    return None


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Time `fn(*args)` steady-state; returns seconds per call stats."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"mean_s": sum(times) / len(times), "p50_s": times[len(times) // 2],
            "min_s": times[0], "max_s": times[-1], "iters": iters}


class step_timer:
    """Accumulates named wall-time buckets:

        timer = step_timer()
        with timer("data"):   batch = next(it)
        with timer("step"):   ... jitted update ...
        timer.summary()  -> {"data_s": ..., "step_s": ..., "data_frac": ...}
    """

    def __init__(self):
        self.buckets: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.buckets[name] = (self.buckets.get(name, 0.0)
                                  + time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        total = sum(self.buckets.values()) or 1.0
        out = {f"{k}_s": round(v, 4) for k, v in self.buckets.items()}
        out.update({f"{k}_frac": round(v / total, 4)
                    for k, v in self.buckets.items()})
        return out

    def reset(self):
        self.buckets.clear()
