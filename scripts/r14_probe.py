"""Round-13 per-query probe: time individual queries (noop sink,
min-of-N) and dump .explain('formatted') to plans/r14/.

Usage:
    python scripts/r14_probe.py [--runs N] [--plans-suffix before|after] q1 q2 ...

Each query is built fresh per run (the bench methodology), timed against
the noop sink, and its formatted plan written to
plans/r14/<name>_<suffix>.txt. Scratch caches are released between
queries so one query's cached frames never inflate the next row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from collimate_spark.operators import all_queries  # noqa: E402
from collimate_spark.scratch import clear_scratch  # noqa: E402
from collimate_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "plans", "r14"
)


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    suffix = None
    plan_only = False
    if "--plan-only" in args:
        plan_only = True
        args.remove("--plan-only")
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--plans-suffix" in args:
        i = args.index("--plans-suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args
    spark = get_session("collimate_spark_r14_probe")
    queries = all_queries()
    # warm-up: JVM + parquet footer caches (same as bench.py)
    queries["q6_forecast_revenue"](spark, SF_DIR).count()
    if suffix:
        os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        try:
            if suffix:
                df = queries[name](spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as f:
                    f.write(plan)
            if plan_only:
                print(f"{name}: plan written", flush=True)
                continue
            times = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"r14_probe: {name}")
                df = queries[name](spark, SF_DIR)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
            print(
                f"{name}: min={min(times):.3f} all={[round(t, 3) for t in times]}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - one red row, not a dead probe
            print(f"{name}: ERROR {e}", flush=True)
        finally:
            clear_scratch()


if __name__ == "__main__":
    main()
