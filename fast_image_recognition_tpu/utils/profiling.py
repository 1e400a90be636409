"""Profiling / observability.

Reference instrumentation (SURVEY.md §5): wall-clock spans
(chrono::high_resolution_clock, ann.cpp:97-104), work-proportional counters
(distanceCalcCount / avgCheckedPercent, ann.h:29-30; num_of_unreliable,
ImageTesting.cpp:33; per-level break counts, sequential_inference.py:487-499).

TPU additions: jax.profiler trace capture around any span, and device-step
timing that separates compile from steady-state.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict
from typing import Dict

import jax


@dataclasses.dataclass
class _SpanHolder:
    """Mutable slot a ``Timer.span`` block fills with its final device output."""

    result: object = None


@dataclasses.dataclass
class Counters:
    """The ann.h:29-30 counter set, batched."""

    distance_calcs: int = 0
    probes: int = 0
    gallery_size: int = 0
    unreliable: int = 0

    def add_checked(self, checked_counts) -> None:
        import numpy as np

        self.distance_calcs += int(np.sum(checked_counts))
        self.probes += len(checked_counts)

    @property
    def avg_checked_percent(self) -> float:
        if not self.probes or not self.gallery_size:
            return -1.0
        return 100.0 * self.distance_calcs / (self.probes * self.gallery_size)


def host_sync(out) -> None:
    """Force completion of all device work queued before ``out``.

    On the axon TPU tunnel ``jax.block_until_ready`` / ``jax.effects_barrier``
    return before the device finishes (they ack at the tunnel boundary), so
    honest timing must pull real bytes to the host: TPU executes one in-order
    stream, so transferring any element of the last output fences everything
    queued before it.
    """
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.device_get(leaves[-1])).ravel()[:1]


class Timer:
    """Named wall-clock spans with device sync at the boundary.

    For spans that end with device work in flight, pass the final device
    output to the yielded holder (``span.result = out``) so the boundary can
    fence with a real host transfer (see ``host_sync``); ``effects_barrier``
    alone does not synchronize on the tunnel.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync: bool = True):
        holder = _SpanHolder()
        t0 = time.perf_counter()
        yield holder
        if sync:
            if holder.result is not None:
                host_sync(holder.result)
            else:
                # best effort when the caller gave us nothing to transfer
                jax.effects_barrier()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: total={t*1e3:.2f}ms n={n} avg={t*1e3/n:.3f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace capture (inspect with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn, *args, iters: int = 10) -> Dict[str, float]:
    """Separate first-call (compile) time from steady-state time.

    Steady state is measured tunnel-safely: queue ``iters`` dispatches, then
    force ONE host transfer of the last output (``host_sync``) before reading
    the clock — total = iters * compute + one transfer. Using
    ``block_until_ready`` here would measure dispatch-queue time on the axon
    tunnel and report impossibly high throughput.
    """
    t0 = time.perf_counter()
    out = fn(*args)
    host_sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    host_sync(out)
    steady_s = (time.perf_counter() - t0) / iters
    return {"compile_s": compile_s, "steady_s": steady_s}
