"""Profiling / tracing utilities.

The reference has no profiling beyond wall-clock prints
(scripts/cine_SENSE_real_img_2d_time.py:163-182, SURVEY.md §5). Here:
jax.profiler trace capture (view in TensorBoard / Perfetto), named
annotations for sampler phases, and a timing helper that blocks on device
results so numbers mean what they say.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace",
          create_perfetto_link: bool = False):
    """Capture a device trace around a code block."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3,
          **kwargs) -> Dict[str, Any]:
    """Compile + time a jitted callable; blocks until ready every iteration.
    Returns {'compile_s', 'mean_s', 'best_s', 'result'}."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return {"compile_s": compile_s, "mean_s": sum(times) / len(times),
            "best_s": min(times), "result": out}
