"""Measure exact vs --approx modes at sf1 (10× bench scale) for the five
approx-capable operators (VERDICT r6 directive #5): winsorize_stats,
mad_outliers, conversion_time_quantiles, encoding_advisor_lineitem,
agg_percentile_disc.

The 100 TB claim under test: the exact percentile paths buffer every
value per group (percentile/percentile_disc/median are SORT-based
aggregates — memory and spill grow with group size), while the approx
paths run GK/KLL-style constant-memory summaries (approx_percentile) —
so at 10× data the approx wall-time should scale ~linearly and the
exact path's gap should widen.

Peak memory: a sampler thread records the peak RSS delta of this JVM
(local mode — driver and executors share the process) across each
query, which is exactly the buffering the claim is about.

Usage: python scripts/approx_scale_bench.py [sf_dir]   (default /tmp/sf1)
Prints a markdown table ready for BASELINE.md.
"""

from __future__ import annotations

import os
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


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


class PeakRss(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.base = _rss_kb()
        self.peak = self.base
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            self.peak = max(self.peak, _rss_kb())
            time.sleep(0.05)

    def stop(self) -> int:
        self._stop.set()
        self.join()
        return max(0, self.peak - self.base)


def main() -> None:
    import importlib

    from collimate_spark.scratch import clear_scratch
    from collimate_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if not os.path.isdir(sf_dir):
        sys.exit(f"{sf_dir} missing — run scripts/make_sf1.py first")
    spark = get_session("approx-scale-bench")
    # warm the JVM/codegen so the first row isn't charged startup cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows = []
    for name, mod in QUERIES:
        fn = getattr(importlib.import_module(mod), name)
        rec = {"query": name}
        for label, kw in (("exact", {}), ("approx", {"approx": True})):
            best_t, best_mem = None, None
            for _ in range(2):
                clear_scratch()
                spark.catalog.clearCache()
                df = fn(spark, sf_dir, **kw)
                mon = PeakRss()
                mon.start()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                mem = mon.stop()
                if best_t is None or dt < best_t:
                    best_t, best_mem = dt, mem
            rec[label] = (round(best_t, 2), round(best_mem / 1024))
        rows.append(rec)
        print(f"  {name}: exact {rec['exact']} approx {rec['approx']}", file=sys.stderr)

    print(f"\n| query | exact s | exact peak-RSS MiB | approx s | approx peak-RSS MiB | speedup |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        et, em = r["exact"]
        at, am = r["approx"]
        print(f"| {r['query']} | {et} | {em} | {at} | {am} | {round(et / at, 2)}x |")
    spark.stop()


if __name__ == "__main__":
    main()
