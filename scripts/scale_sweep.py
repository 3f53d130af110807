"""Repeatable dedup-family scale sweep (VERDICT r7 directives #2/#8):
measure WORK growth of every pair-emitting / candidate-generating text
op at 10× corpus, on the MUTATED replication slice where the true pair
output grows ~linearly (see scripts/make_sf1.py SF_MUTATE) — so a
superlinear runtime ratio means a superlinear candidate step, not an
output artifact. This is the screen that caught dedup_ngram_jaccard's
frequency-quadratic candidate join in round 7; run it against every new
pair-emitting operator.

Methodology (the r7 lessons, pinned): each (query, sf_dir) cell runs in
a FRESH JVM (one subprocess — a shared session inflates late queries
5-10× via page-cache/GC pressure), warm-up first, min of N_RUNS
noop-sink timings, plus one count() for the output-rows column (shows
output growth separately from work growth).

Usage:
    python scripts/scale_sweep.py [--base DIR] [--scaled DIR]
        [--update-baseline] [--ops name1,name2,...]
--ops sweeps an arbitrary registered query list instead of the default
pair-emitting family (screen any new operator without editing OPS;
--update-baseline is refused for a non-default list so the pinned
BASELINE.md table always reflects the canonical family).
Defaults: base=/root/testdata/sf0.1 (5k docs), scaled=/tmp/sf1m (50k
docs, mutated replication — built automatically if missing).
--update-baseline rewrites the marked section of BASELINE.md with the
fresh table. `make scale-sweep` = both.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The pair-emitting / candidate-join family. Multimodal pair ops are
# excluded by construction: their asset universe is capped (asset_id <
# 200) so corpus replication doesn't change their input; semdedup_prune
# and the embedding dedups read the embeddings table, which the scaled
# slice passes through unreplicated.
OPS = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_containment",
    "set_overlap_join_prefix",
    "winnow_fingerprint_pairs",
    "block_dedup_stats",
    "dup_span_coverage",
]
N_RUNS = 2
BASE_DEFAULT = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED_DEFAULT = "/tmp/sf1m"
MARK_BEGIN = "<!-- scale-sweep:begin -->"
MARK_END = "<!-- scale-sweep:end -->"


def run_single(name: str, sf_dir: str) -> None:
    """Child process: one (query, sf_dir) cell in a fresh JVM. Prints one
    JSON line {"t": best_seconds, "rows": output_rows}."""
    from collimate_spark.operators import all_queries
    from collimate_spark.scratch import clear_scratch
    from collimate_spark.session import get_session

    fn = all_queries()[name]
    spark = get_session("scale-sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    best = None
    for _ in range(N_RUNS):
        clear_scratch()
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    clear_scratch()
    spark.catalog.clearCache()
    rows = fn(spark, sf_dir).count()
    print(json.dumps({"t": round(best, 2), "rows": rows}))
    spark.stop()


def _ensure_scaled(scaled: str) -> None:
    if os.path.isdir(scaled):
        return
    print(f"building mutated 10x slice at {scaled} ...", file=sys.stderr)
    env = dict(os.environ, SF_MUTATE="1")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_sf1.py"),
         BASE_DEFAULT, scaled],
        check=True,
        env=env,
    )


def _cell(name: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single", name, sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"{name}@{sf_dir} produced no result:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def _table(rows: list[dict]) -> str:
    md = [
        "| op | base s | base rows | 10x s | 10x rows | work growth | output growth |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        b, s = r["base"], r["scaled"]
        wg = round(s["t"] / b["t"], 1) if b["t"] > 0 else float("inf")
        og = round(s["rows"] / b["rows"], 1) if b["rows"] else float("inf")
        flag = " **superlinear**" if wg > 10 else ""
        md.append(
            f"| {r['query']} | {b['t']} | {b['rows']} | {s['t']} | {s['rows']} "
            f"| {wg}x{flag} | {og}x |"
        )
    return "\n".join(md)


def _update_baseline(table_md: str, base: str, scaled: str) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    src = open(path).read()
    if MARK_BEGIN not in src:
        sys.exit(f"BASELINE.md missing {MARK_BEGIN} marker")
    head, rest = src.split(MARK_BEGIN, 1)
    _, tail = rest.split(MARK_END, 1)
    body = (
        f"{MARK_BEGIN}\n"
        f"Sweep of the pair-emitting dedup family at 10× corpus on the\n"
        f"MUTATED replication slice (`make scale-sweep`; base={base},\n"
        f"scaled={scaled} — replicas are not near-dups of their source, so\n"
        f"true pair output grows ~linearly and the work-growth column is\n"
        f"the quadratic-candidate screen; fresh JVM per cell, min of\n"
        f"{N_RUNS} noop-sink runs):\n\n"
        f"{table_md}\n"
        f"{MARK_END}"
    )
    open(path, "w").write(head + body + tail)
    print(f"BASELINE.md section updated", file=sys.stderr)


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--single":
        run_single(sys.argv[2], sys.argv[3])
        return

    args = sys.argv[1:]
    base = BASE_DEFAULT
    scaled = SCALED_DEFAULT
    update = "--update-baseline" in args
    if "--base" in args:
        base = args[args.index("--base") + 1]
    if "--scaled" in args:
        scaled = args[args.index("--scaled") + 1]
    ops = list(OPS)
    if "--ops" in args:
        ops = args[args.index("--ops") + 1].split(",")
        if update:
            sys.exit("--update-baseline requires the default op list")
    _ensure_scaled(scaled)

    rows = []
    for name in ops:
        rec = {"query": name}
        rec["base"] = _cell(name, base)
        rec["scaled"] = _cell(name, scaled)
        rows.append(rec)
        print(f"  {name}: base {rec['base']} 10x {rec['scaled']}", file=sys.stderr)

    table_md = _table(rows)
    print("\n" + table_md)
    if update:
        _update_baseline(table_md, base, scaled)


if __name__ == "__main__":
    main()
