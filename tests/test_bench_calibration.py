"""Guards for bench.py's frozen host-calibration probes (VERDICT r12 #1/#5).

The r12 lesson: the CPU calibration shipped with an expression that
deterministically overflowed LongType under Spark 4's default ANSI mode,
so `calibration_sec` was null in EVERY artifact through r12 — the round
that breached the 2x perf bar had no in-artifact way to prove host drift.
These tests make that failure mode impossible to reintroduce silently:
the probes must RUN (not just parse) and the frozen definitions are
pinned textually.
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_cpu_calibration_runs_and_is_positive(spark):
    """The probe must survive ANSI mode end-to-end on the real 2**27
    range — a smaller range would not re-create the overflow (the old
    sum(xxhash64(id)) only overflows with certainty at width 2**27)."""
    val = bench.bench_calibration(spark)
    assert isinstance(val, float) and val > 0


def test_cpu_calibration_expression_is_frozen():
    """The expression is the series origin from r13 — normalization
    across rounds is only meaningful while it never changes. pmod
    bounds the sum at 2**27 x (1e9+6) ~ 1.3e17 << 2**63."""
    src = inspect.getsource(bench.bench_calibration)
    assert '"sum(pmod(xxhash64(id), 1000000007)) AS s"' in src
    assert "1 << 27" in src


def test_io_calibration_runs_and_is_positive():
    val = bench.bench_calibration_io()
    assert isinstance(val, float) and val > 0


def test_io_calibration_definition_is_frozen():
    assert bench.IO_PROBE_BYTES == 256 << 20
    assert bench.IO_PROBE_CHUNK == 4 << 20
