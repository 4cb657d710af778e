"""Lightweight profiling helpers.

The reference's observability is wall-clock throughput printing and
progress bars (SURVEY.md §5); here:

- :func:`trace`: context manager around :func:`jax.profiler.trace` for
  capturing TensorBoard-compatible device traces;
- :class:`StageTimer`: accumulates per-stage wall time and item counts
  and reports items/s per stage (the "per-stage patterns/s counters").
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a JAX device trace into ``log_dir`` (view with
    TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate wall time and item counts per named pipeline stage.

    Example
    -------
    >>> timer = StageTimer()
    >>> with timer.stage("preprocess", items=1024):
    ...     pass  # run the stage
    >>> report = timer.report()
    """

    def __init__(self) -> None:
        self._stages: dict[str, tuple[float, int]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            prev_t, prev_n = self._stages.get(name, (0.0, 0))
            self._stages[name] = (prev_t + dt, prev_n + items)

    def report(self) -> dict[str, dict[str, float]]:
        """Per-stage seconds, items, and items/s."""
        out = {}
        for name, (seconds, items) in self._stages.items():
            out[name] = {
                "seconds": seconds,
                "items": items,
                "items_per_second": items / seconds if seconds > 0 else 0.0,
            }
        return out

    def __repr__(self) -> str:
        rows = [
            f"{name}: {v['seconds']:.3f}s"
            + (f", {v['items_per_second']:.1f} items/s" if v["items"] else "")
            for name, v in self.report().items()
        ]
        return "StageTimer(" + "; ".join(rows) + ")"
