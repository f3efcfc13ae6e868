"""Observability: phase timers, device tracing, and progress reporting.

The reference's only observability is console progress bars and optimizer
iteration prints (SURVEY.md section 5). This module adds structured timers
(tunnel-safe: device work is fetch-synchronized), `jax.profiler` trace
capture, and a minimal progress reporter used by long-running host loops.
"""
import contextlib
import sys
import time
from pathlib import Path
from typing import Any, Dict, Union


def sync(value: Any) -> Any:
    """Force completion of device work backing ``value``.

    On tunneled backends ``jax.block_until_ready`` may not synchronize;
    fetching a scalar does. No-op for host values.
    """
    try:
        import numpy as np

        if hasattr(value, "device") or hasattr(value, "sharding"):
            np.asarray(value).ravel()[:1]
    except Exception:
        pass
    return value


class Timer:
    """Named phase timers accumulating wall time and call counts.

    Example:
        timer = Timer()
        with timer("decode"):
            ...
        with timer("step", sync_value=outputs["mean"]):
            ...
        print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync_value: Any = None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                sync(sync_value)
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        """Human-readable per-phase totals."""
        lines = []
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(
                f"{name:30s} {total:9.3f} s  ({count} calls, "
                f"{total / count * 1e3:8.2f} ms/call)"
            )
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        """Totals and counts as a JSON-serializable dict."""
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name]}
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: Union[str, Path]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    import jax

    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Progress:
    """Minimal in-place console progress reporter (host loops)."""

    def __init__(self, total: int, label: str = "", stream=None) -> None:
        self.total = total
        self.label = label
        self.count = 0
        self.start = time.perf_counter()
        self.stream = stream or sys.stdout

    def next(self, n: int = 1) -> None:
        self.count += n
        elapsed = time.perf_counter() - self.start
        rate = self.count / elapsed if elapsed > 0 else 0
        self.stream.write(
            f"\r{self.label} {self.count}/{self.total} "
            f"({rate:.1f}/s, {elapsed:.0f}s)"
        )
        self.stream.flush()

    def finish(self) -> None:
        self.stream.write("\n")
        self.stream.flush()
