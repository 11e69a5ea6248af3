"""Profiling hooks (SURVEY.md §5 "Tracing / profiling").

The reference prints phase wall-clocks; here `jax.profiler` Perfetto traces
capture device timelines. Enable by setting SLAMEM_TRACE_DIR or wrapping a
region in `maybe_trace`.
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def maybe_trace(label: str = "slamem"):
    """Trace the enclosed region if SLAMEM_TRACE_DIR is set."""
    trace_dir = os.environ.get("SLAMEM_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        with jax.profiler.TraceAnnotation(label):
            yield
