"""Tracing / profiling utilities.

The reference's observability is a wall-clock progress bar inside an
``omp critical`` (rslf_depth_computation_core.hpp:794-874).  The TPU
equivalents here: simple wall-clock scopes, a console progress line, and
jax.profiler trace capture for per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Optional


class Timer:
    """Accumulating wall-clock timer: ``with timer.scope("sweep"): ...``"""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def scope(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, file=sys.stderr):
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            print(f"{name:30s} {total:8.3f}s  x{n} "
                  f"({total / n * 1e3:8.2f} ms/call)", file=file)


class ProgressBar:
    """Console progress bar mirroring the reference's
    (core.hpp:858-874), without the lock contention."""

    def __init__(self, total: int, width: int = 40, file=sys.stderr):
        self.total = total
        self.width = width
        self.file = file
        self.t0 = time.time()
        self.n = 0

    def step(self, k: int = 1):
        self.n += k
        pos = self.width * self.n // max(1, self.total)
        bar = "=" * pos + (">" if pos < self.width else "") + \
            " " * max(0, self.width - pos - 1)
        pct = 100 * self.n // max(1, self.total)
        elapsed = int(time.time() - self.t0)
        print(f"[{bar}] {pct}% \t{elapsed}s \r", end="", file=self.file)
        self.file.flush()

    def done(self):
        print(file=self.file)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compilation_cache(cache_dir: Optional[str] = None):
    """Enable JAX's persistent compilation cache.

    The sweep kernels take minutes of XLA compile time at production
    shapes; the on-disk cache amortizes that to zero across runs (the
    reference has no compile step to amortize — this is a TPU-framework
    concern).  Defaults to ``.jax_cache/`` next to the package; override
    with the JAX_COMPILATION_CACHE_DIR environment variable.
    """
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        import pathlib

        cache_dir = str(
            pathlib.Path(__file__).resolve().parents[2] / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
