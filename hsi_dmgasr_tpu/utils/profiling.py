"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock timing around the
sampling loop (sr_gae.py:301-320); this module adds jax-profiler traces
and lightweight phase timers as a superset.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("base")


@contextlib.contextmanager
def phase_timer(name, log=True):
    """Wall-clock timer; yields a dict that receives 'seconds'."""
    out = {}
    t0 = time.time()
    try:
        yield out
    finally:
        out["seconds"] = time.time() - t0
        if log:
            logger.info("[timer] %s: %.3fs", name, out["seconds"])


@contextlib.contextmanager
def device_trace(log_dir):
    """jax profiler trace (open with TensorBoard's profile plugin or
    Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
