"""Shuffle-width A/B for the dedup_containment 5M-doc cell (VERDICT r11
directive #5).

The r11 staged attribution showed ~85% of the 909.9s third-decade cell is
the candidate-join + distinct + verify shuffles, not the index build. The
r9 conf lesson says initial shuffle width is the lever local boxes
under-report — so this probe measures the SAME cell (BATCHES=3 constant,
scale mode on, 48 GiB heap, fresh JVM per arm) under
``initialPartitionNum`` 1024 (the validated decade default) vs 4096, ONE
end-to-end run per arm (the A/B wants a ratio, not a round artifact; the
two arms share host state back-to-back, which is what makes the ratio
meaningful). If the wide arm wins materially, the cell is
shuffle-width-bound and divides further on a real cluster; if it ties,
the cell is IO/scratch-bound on this box and the conclusion goes to
BASELINE.md with no code change.

Usage:
    python scripts/probe_containment_width.py [sf_dir]   # default /tmp/sf100m
    python scripts/probe_containment_width.py --arm 4096 /tmp/sf100m  # child
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARMS = ("1024", "4096")


def run_arm(width: str, sf_dir: str) -> None:
    """Child: one end-to-end dedup_containment run in a fresh JVM.

    Sets its own confs (ADVICE r12): the width argument must BE the
    effective shuffle width, not a label — a manual ``--arm 4096``
    invocation without the parent's env would otherwise run at the
    default 1024 with scale mode off while reporting width=4096. Env is
    set before get_session (session confs are read at builder time);
    the effective value is read back from the live session and emitted,
    so the JSON can never lie about what ran.
    """
    os.environ["SPARK_GRAFT_SCALE_MODE"] = "1"
    os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = width
    os.environ.setdefault("SPARK_GRAFT_CONTAINMENT_BATCHES", "3")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    from collimate_spark.operators import all_queries
    from collimate_spark.session import get_session

    spark = get_session("containment-width-probe")
    effective = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "unset"
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    t0 = time.time()
    df = all_queries()["dedup_containment"](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(json.dumps({"width": effective, "t": round(dt, 1)}))
    spark.stop()


def _run_child(width: str, sf_dir: str, timeout: int = 7200) -> dict:
    # start_new_session + killpg on timeout (ADVICE r12 — same pattern
    # as scale_sweep._cell): SIGKILLing only the direct Python child
    # leaves the Spark JVM grandchild holding the capture pipes, so
    # communicate() blocks forever and the dying JVM contaminates the
    # other arm's timing.
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--arm", width, sf_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        start_new_session=True,
    )
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)  # pgid == pid (new session)
        except ProcessLookupError:
            pass
        try:
            proc.communicate(timeout=30)
        except Exception:
            pass
        return {"width": width, "t": None, "timeout_s": timeout}
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.exit(f"arm {width} produced no result:\n{stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    if "--arm" in sys.argv:
        i = sys.argv.index("--arm")
        run_arm(sys.argv[i + 1], sys.argv[i + 2])
        return
    sf_dir = next((a for a in sys.argv[1:] if not a.startswith("-")), "/tmp/sf100m")
    results = {}
    for width in ARMS:
        print(f"arm initialPartitionNum={width} on {sf_dir} ...", file=sys.stderr)
        rec = _run_child(width, sf_dir)
        results[rec["width"]] = rec["t"]
        print(f"  width {rec['width']}: {rec['t']}s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
