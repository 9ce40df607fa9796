"""Timing and tracing harness.

The reference's only instrumentation is a CLI wall-clock and tqdm rates
(safepy/safe.py:1323, safe_extras.py:56). Here:

  * :class:`StageTimer` — named stage wall-clock accounting with
    ``block_until_ready`` barriers, so device-async dispatch doesn't misattribute
    time to the next host line;
  * :func:`trace` — context manager around ``jax.profiler`` for XLA-level traces
    viewable in TensorBoard/Perfetto;
  * :func:`log_compile_time` — splits first-call (compile) from steady-state time
    for a jitted callable.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import OrderedDict


class StageTimer:
    """Accumulates wall-clock per named stage; device-aware."""

    def __init__(self):
        self.stages = OrderedDict()
        self._t0 = None
        self._name = None

    @contextlib.contextmanager
    def stage(self, name: str, *, sync=None):
        """Time a stage; pass ``sync=arrays`` to block on device results."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self, logger=None) -> str:
        total = sum(self.stages.values())
        lines = [f"  {name}: {t:.3f}s ({100 * t / total:.0f}%)"
                 for name, t in self.stages.items()]
        text = "Stage timings (total %.3fs):\n%s" % (total, "\n".join(lines))
        (logger or logging).info(text)
        return text


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace around a block: ``with trace('/tmp/trace'): ...``."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_time(fn, *args, label: str = "fn", **kwargs):
    """Run twice; log (compile+run, steady) seconds. Returns the steady result."""
    import jax
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kwargs))
    steady_s = time.perf_counter() - t0
    logging.info("%s: compile+run %.3fs, steady %.3fs", label, compile_s, steady_s)
    return out
