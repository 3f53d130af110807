"""Measure exact vs --approx modes at sf1 (10× bench scale) for the five
approx-capable operators (VERDICT r6 directive #5): winsorize_stats,
mad_outliers, conversion_time_quantiles, encoding_advisor_lineitem,
agg_percentile_disc.

The 100 TB claim under test: the exact percentile paths buffer values
per group (percentile/percentile_disc/median are value-buffering
aggregates — memory and spill grow with group size), while the approx
paths run GK-style bounded-memory summaries (approx_percentile) — so at
10× data the approx paths should hold wall-time and peak memory flat
while exact grows.

Methodology: every (query, mode) pair runs in a FRESH JVM (one
subprocess per cell) — a shared JVM's RSS never returns freed pages to
the OS, so in-process "deltas" attribute earlier queries' high-water
marks to whatever runs later. Per cell: session warm-up, then min
wall-time of 3 noop-sink runs, and the peak RSS of the JVM child over
the whole cell (startup-adjusted: sampled baseline right after warm-up).

Usage: python scripts/approx_scale_bench.py [sf_dir]   (default /tmp/sf1)
Prints a markdown table ready for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ("winsorize_stats", "collimate_spark.operators.dataeng"),
    ("mad_outliers", "collimate_spark.operators.stats"),
    ("conversion_time_quantiles", "collimate_spark.operators.events"),
    ("encoding_advisor_lineitem", "collimate_spark.operators.dataeng"),
    ("agg_percentile_disc", "collimate_spark.operators.grouped"),
]
N_RUNS = 3

_JVM_PID: int | None = None


def _find_jvm_pid() -> int | None:
    """In local mode the executors live in the JVM child of this Python
    driver — that's where percentile buffering shows up, not in
    /proc/self. Locate the java child once."""
    me = str(os.getpid())
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if parts[3] == me and "java" in parts[1]:
                return int(pid)
        except OSError:
            continue
    return None


def _rss_kb() -> int:
    pid = _JVM_PID if _JVM_PID is not None else "self"
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


class PeakRss(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.base = _rss_kb()
        self.peak = self.base
        self._halt = threading.Event()

    def run(self) -> None:
        while not self._halt.is_set():
            self.peak = max(self.peak, _rss_kb())
            time.sleep(0.05)

    def stop(self) -> int:
        self._halt.set()
        self.join()
        return max(0, self.peak - self.base)


def run_single(name: str, mode: str, sf_dir: str) -> None:
    """Child process: one (query, mode) cell in a fresh JVM. Prints one
    JSON line {"t": best_seconds, "mem_mib": peak_rss_over_cell}."""
    import importlib

    from collimate_spark.scratch import clear_scratch
    from collimate_spark.session import get_session

    mod = dict(QUERIES)[name]
    fn = getattr(importlib.import_module(mod), name)
    kw = {"approx": True} if mode == "approx" else {}

    spark = get_session("approx-scale-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM/codegen warm-up
    global _JVM_PID
    _JVM_PID = _find_jvm_pid()

    mon = PeakRss()  # baseline AFTER warm-up: excludes JVM startup
    mon.start()
    best = None
    for _ in range(N_RUNS):
        clear_scratch()
        spark.catalog.clearCache()
        df = fn(spark, sf_dir, **kw)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    mem = mon.stop()
    print(json.dumps({"t": round(best, 2), "mem_mib": round(mem / 1024)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        run_single(sys.argv[2], sys.argv[3], sys.argv[4])
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if not os.path.isdir(sf_dir):
        sys.exit(f"{sf_dir} missing — run scripts/make_sf1.py first")

    rows = []
    for name, _ in QUERIES:
        rec = {"query": name}
        for mode in ("exact", "approx"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", name, mode, sf_dir],
                capture_output=True,
                text=True,
                timeout=600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            rec[mode] = json.loads(line)
        rows.append(rec)
        print(f"  {name}: exact {rec['exact']} approx {rec['approx']}", file=sys.stderr)

    print("\n| query | exact s | exact peak-RSS MiB | approx s | approx peak-RSS MiB | speedup |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        e, a = r["exact"], r["approx"]
        print(
            f"| {r['query']} | {e['t']} | {e['mem_mib']} | {a['t']} | {a['mem_mib']} "
            f"| {round(e['t'] / a['t'], 2)}x |"
        )


if __name__ == "__main__":
    main()
