"""Old-vs-new wall-clock A/B at decade scale for the r13/r14 structural
rewrites (VERDICT r13 #1: "prove the tie-locally/win-at-scale changes").

Each (tree, query, sf_dir) cell runs in a FRESH JVM subprocess with
PYTHONPATH pointed at either this repo or a pinned historical tree (the
r12 artifact commit c075f3d in a git worktree — the code BEFORE the r13
optimization round), SPARK_GRAFT_SCALE_MODE=1 (the decade-cell conf set,
same as scale_sweep.py), min of N end-to-end runs (query construction +
noop sink — eagerly-materialized state is charged), plus one count() for
the output-rows column. Both trees read the SAME mutated slice, so the
ONLY variable is the code.

Usage:
    git worktree add /tmp/r12repo c075f3d
    python scripts/r14_scale_probe.py [--old /tmp/r12repo] [--runs 2]
        [--cells name:sfdir,name:sfdir,...]

Defaults to CELLS below: the five r13 structural rewrites VERDICT r13
flagged as locally-tied, the three as-of collapse variants,
heavy_hitters_words (ADVICE r13 #2), and pit_join_scd2 (r14's collapse).
Embedding cells run at /tmp/sf1m (20k vectors, clusters of ~2k — 10x the
bench cluster size; the slices replicate embeddings since r14, labels
preserved); document/event cells at /tmp/sf10m (100x bench).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELLS = [
    ("inverted_index_postings", "/tmp/sf1m"),
    ("inverted_index_postings", "/tmp/sf10m"),
    ("curate_corpus", "/tmp/sf10m"),
    ("concurrent_sessions_timeline", "/tmp/sf10m"),
    ("semdedup_prune", "/tmp/sf1m"),
    ("dedup_embedding_cosine", "/tmp/sf1m"),
    ("asof_join_events_orders", "/tmp/sf10m"),
    ("asof_join_forward", "/tmp/sf10m"),
    ("asof_join_nearest", "/tmp/sf10m"),
    ("heavy_hitters_words", "/tmp/sf10m"),
    ("pit_join_scd2", "/tmp/sf10m"),
]

CELL_SRC = r"""
import json, sys, time
name, sf_dir, runs = sys.argv[1], sys.argv[2], int(sys.argv[3])
from collimate_spark.operators import all_queries
from collimate_spark.scratch import clear_scratch
from collimate_spark.session import get_session

fn = all_queries()[name]
spark = get_session("r14-scale-probe")
spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
best = None
for _ in range(runs):
    clear_scratch()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
clear_scratch()
spark.catalog.clearCache()
rows = fn(spark, sf_dir).count()
print(json.dumps({"t": round(best, 2), "rows": rows}))
spark.stop()
"""


def _cell(tree: str, name: str, sf_dir: str, runs: int, timeout: int = 2400) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    env["SPARK_GRAFT_SCALE_MODE"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-c", CELL_SRC, name, sf_dir, str(runs)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
        cwd=tree,
        start_new_session=True,
    )
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        import signal

        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        try:
            proc.communicate(timeout=30)
        except Exception:
            pass
        return {"t": None, "rows": None, "timeout_s": timeout}
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"t": None, "rows": None, "error": stderr[-1500:]}
    return json.loads(lines[-1])


def main() -> None:
    args = sys.argv[1:]
    old = "/tmp/r12repo"
    runs = 2
    cells = list(CELLS)
    if "--old" in args:
        old = args[args.index("--old") + 1]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--cells" in args:
        cells = [
            tuple(c.split(":", 1)) for c in args[args.index("--cells") + 1].split(",")
        ]
    if not os.path.isdir(os.path.join(old, "collimate_spark")):
        sys.exit(f"old tree {old} missing — git worktree add {old} c075f3d")
    print("| query @ slice | r12 s | r12 rows | now s | now rows | speedup |")
    print("|---|---|---|---|---|---|")
    for name, sf_dir in cells:
        o = _cell(old, name, sf_dir, runs)
        n = _cell(REPO, name, sf_dir, runs)
        tag = f"{name} @ {os.path.basename(sf_dir)}"
        if o.get("t") is None or n.get("t") is None:
            print(f"| {tag} | {o} | | {n} | | — |", flush=True)
            continue
        sp = round(o["t"] / n["t"], 2) if n["t"] else float("inf")
        print(
            f"| {tag} | {o['t']} | {o['rows']} | {n['t']} | {n['rows']} | {sp}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
