"""Profiling / tracing hooks.

Equivalent of the reference's `@profiler.time_function` surface
(nerfstudio profiler on the eval functions, umhs_pipeline.py:119,138) plus
TPU-native tracing: `jax.profiler` traces viewable in TensorBoard /
Perfetto, and a simple wall-clock registry printed at exit.
"""

from __future__ import annotations

import atexit
import contextlib
import functools
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

_TIMINGS: Dict[str, list] = defaultdict(list)
_REGISTERED = False


def _print_report():
    if not _TIMINGS:
        return
    print("\n-- profiler report (wall clock) --")
    for name, times in sorted(_TIMINGS.items()):
        total = sum(times)
        print(
            f"  {name}: n={len(times)} total={total:.3f}s "
            f"mean={total / len(times) * 1e3:.1f}ms"
        )


def time_function(fn):
    """Decorator recording wall-clock timings, reported at process exit."""
    global _REGISTERED
    if not _REGISTERED:
        atexit.register(_print_report)
        _REGISTERED = True

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        try:
            return fn(*args, **kwargs)
        finally:
            _TIMINGS[fn.__qualname__].append(time.time() - t0)

    return wrapper


@contextlib.contextmanager
def trace(log_dir: Optional[Path] = None):
    """XLA-level device trace: `with trace('profiles/'): step()` then open in
    TensorBoard's profile plugin or Perfetto."""
    import jax

    log_dir = str(log_dir or "profiles")
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
