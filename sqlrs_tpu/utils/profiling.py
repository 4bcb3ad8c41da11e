"""Query profiling: per-operator rows/bytes counters and roofline accounting.

The reference has no metrics at all (SURVEY.md §5: stdout prints only); the
TPU build needs per-operator rows/bytes counters and roofline accounting for
the ≥70%-of-roofline target. This module provides:

- QueryProfile: per-operator row counts, wall time, estimated bytes touched;
- roofline(): fraction of the chip's HBM-bandwidth bound a measured operator
  achieved;
- trace(): optional jax.profiler integration for deep dives.

Enabled per-session via Database(profile=True) or the SQLRS_TPU_PROFILE env
var; counters are collected on the host at operator boundaries (which are
already pipeline breakers, so no extra syncs).
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

# chip peak HBM bandwidth (bytes/s)
HBM_BANDWIDTH = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
}


def chip_bandwidth() -> float:
    try:
        import jax

        kind = jax.devices()[0].device_kind
        for k, v in HBM_BANDWIDTH.items():
            if k.lower() in kind.lower():
                return v
    except Exception:
        pass
    return 50e9  # cpu-ish default


@dataclass
class OpStats:
    op: str
    rows_in: int = 0
    rows_out: int = 0
    bytes_touched: int = 0
    wall_s: float = 0.0  # subtree wall
    self_s: float = 0.0  # wall minus direct children (operator's own work)
    depth: int = 0

    def rows_per_sec(self) -> float:
        n = self.rows_in or self.rows_out
        return n / self.self_s if self.self_s > 0 else 0.0

    def roofline_fraction(self, bytes_per_row: int = 16) -> float:
        """Fraction of the BW-bound rows/s this operator achieved."""
        bound = chip_bandwidth() / bytes_per_row
        return self.rows_per_sec() / bound if bound else 0.0


@dataclass
class QueryProfile:
    ops: list[OpStats] = field(default_factory=list)
    _stack: list[float] = field(default_factory=list)  # child-time accumulators

    @contextlib.contextmanager
    def measure(self, op: str, rows_in: int = 0, bytes_touched: int = 0):
        stats = OpStats(
            op=op, rows_in=rows_in, bytes_touched=bytes_touched,
            depth=len(self._stack),
        )
        self._stack.append(0.0)
        t0 = time.perf_counter()
        try:
            yield stats
        finally:
            stats.wall_s = time.perf_counter() - t0
            child_s = self._stack.pop()
            stats.self_s = max(stats.wall_s - child_s, 0.0)
            if self._stack:
                self._stack[-1] += stats.wall_s
            self.ops.append(stats)

    def report(self) -> str:
        lines = [
            f"{'operator':44s} {'rows_out':>10s} {'self_ms':>9s} {'rows/s':>12s}"
        ]
        for s in reversed(self.ops):  # root first
            label = ("  " * s.depth + s.op)[:44]
            lines.append(
                f"{label:44s} {s.rows_out:10d} "
                f"{s.self_s * 1e3:9.2f} {s.rows_per_sec():12.0f}"
            )
        return "\n".join(lines)


def profiling_enabled() -> bool:
    return os.environ.get("SQLRS_TPU_PROFILE", "0") == "1"


@contextlib.contextmanager
def trace(path: str = "/tmp/sqlrs_tpu_trace"):
    """jax.profiler trace scope for kernel-level analysis."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
