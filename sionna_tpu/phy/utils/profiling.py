"""Profiling utilities (SURVEY.md 5: tracing/profiling subsystem).

The reference exposes timing only through sim_ber's runtime column;
on TPU the interesting split is host bookkeeping vs compile vs device
execution, plus optional XLA trace capture for xprof/TensorBoard.

``Profiler`` is a lightweight named-phase wall-clock accumulator that
can also drive ``jax.profiler`` trace capture:

    with Profiler(trace_dir="/tmp/trace") as prof:
        with prof.phase("encode"):
            c = enc(u)
        with prof.phase("decode"):
            b = dec(llr)
    print(prof.summary())

``sim_ber(..., profiler=prof)`` records per-phase times (compile,
device chunks, host bookkeeping) into a provided profiler.
"""

import time
from contextlib import contextmanager

import jax

__all__ = ["Profiler"]


class Profiler:
    """Named-phase wall-clock profiler with optional XLA tracing.

    Parameters
    ----------
    trace_dir : str or None
        If set, a ``jax.profiler`` trace is captured for the ``with``
        block and written there (viewable in TensorBoard/xprof).
    """

    def __init__(self, trace_dir=None):
        self._trace_dir = trace_dir
        self._tracing = False
        self._times = {}
        self._counts = {}
        self._stack = []

    # -- context management -------------------------------------------
    def __enter__(self):
        if self._trace_dir is not None:
            jax.profiler.start_trace(self._trace_dir)
            self._tracing = True
        return self

    def __exit__(self, exc_type, exc, tb):
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        return False

    # -- phases --------------------------------------------------------
    @contextmanager
    def phase(self, name):
        """Accumulates wall time under ``name``; nests freely.  Also
        emits a ``jax.profiler.TraceAnnotation`` so the phase shows up
        on the xprof timeline when tracing is active."""
        t0 = time.perf_counter()
        self._stack.append(name)
        try:
            with jax.profiler.TraceAnnotation(name):
                yield self
        finally:
            self._stack.pop()
            dt = time.perf_counter() - t0
            self._times[name] = self._times.get(name, 0.) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    # -- reporting -----------------------------------------------------
    @property
    def times(self):
        """dict name -> accumulated seconds"""
        return dict(self._times)

    @property
    def counts(self):
        """dict name -> number of phase entries"""
        return dict(self._counts)

    def as_dict(self):
        return {n: {"seconds": self._times[n],
                    "count": self._counts[n]}
                for n in self._times}

    def summary(self):
        """Formatted per-phase table, longest first."""
        if not self._times:
            return "(no phases recorded)"
        width = max(len(n) for n in self._times)
        lines = [f"{'phase':<{width}} | {'count':>6} | "
                 f"{'total [s]':>10} | {'mean [ms]':>10}"]
        lines.append("-" * len(lines[0]))
        for n in sorted(self._times, key=self._times.get,
                        reverse=True):
            t, c = self._times[n], self._counts[n]
            lines.append(f"{n:<{width}} | {c:>6} | {t:>10.3f} | "
                         f"{1e3 * t / c:>10.3f}")
        return "\n".join(lines)

    def reset(self):
        self._times.clear()
        self._counts.clear()
