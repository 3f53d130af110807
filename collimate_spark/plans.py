"""Physical-plan introspection helpers — the programmatic form of the
`.explain("formatted")` review the 100 TB design rules require.

``plan_features`` distills an executed plan into the quantities that
matter at scale (exchanges, broadcasts, scans, codegen spans, pushed
filters); ``assert_scalable`` turns the common red flags into one call.
tests/test_plans.py pins specific operators; these helpers are the
reusable surface for ad-hoc checks, CI gates on user queries, and
notebook "why is this slow" triage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _runtime_lines(plan: str) -> list[str]:
    """Plan lines with each cached build subtree counted ONCE.

    A line nested under an ``InMemoryTableScan`` node is a re-print of a
    cache's build plan (executed once per cache, not once per reference)
    — those dedupe globally on content. Every other line counts per
    occurrence, because identical sibling subtrees OUTSIDE a cache
    really do execute per branch. Nesting is recovered from the
    ``toString`` indentation prefix (`` :+-`` gutter width).

    KNOWN UNDERCOUNT CAVEAT: the global content dedup cannot tell "the
    same cache re-printed" apart from "a DIFFERENT cache whose build
    contains identical line text" — e.g. two caches that both scan the
    same parquet with the same pruned schema share a FileScan line, so
    the second build's scan is counted once though both builds read the
    file. Per-cache namespacing was attempted (round 6) and is NOT
    text-recoverable: every reference re-aliases the header expression
    ids (``InMemoryTableScan [x#1]`` vs ``[x#24]``), and nested-AQE
    section printing RESETS the gutter depth mid-subtree (a nested
    ``== Final Plan ==`` prints shallower than its own parent), so
    neither header lines nor indentation yield a stable cache identity.
    Counts here are therefore a LOWER bound on distinct cache-build
    work; the pinned SCAN_CEILINGS are calibrated against this rule."""
    out: list[str] = []
    seen_cached: set[str] = set()
    cache_depths: list[int] = []  # gutter widths of open InMemoryTableScans
    skip_depths: list[int] = []  # gutter widths of open "== Initial Plan ==" headers
    for raw in plan.splitlines():
        content = raw.lstrip(" :+-")
        depth = len(raw) - len(content)
        while cache_depths and depth <= cache_depths[-1]:
            cache_depths.pop()
        # strict <: section BODY lines print at the SAME gutter depth as
        # the "== Initial Plan ==" header; the section is always the last
        # one inside its AdaptiveSparkPlan, so it ends when the tree
        # returns to a shallower ancestor
        while skip_depths and depth < skip_depths[-1]:
            skip_depths.pop()
        # an executed AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
        # "== Initial Plan ==" sections; the Initial section is the
        # pre-AQE plan that never runs once isFinalPlan=true — drop it
        # wholesale (its distinct expression ids defeat content-dedup)
        if content.startswith("== Initial Plan =="):
            skip_depths.append(depth)
            continue
        if skip_depths:
            continue
        under_cache = bool(cache_depths)
        if "InMemoryTableScan" in content:
            cache_depths.append(depth)
        stripped = raw.strip(" :+-")
        if under_cache:
            if stripped in seen_cached:
                continue
            seen_cached.add(stripped)
        out.append(stripped)
    return out


def plan_features(df: DataFrame) -> dict:
    """Distill the physical plan into scale-relevant counts.

    Keys: n_exchanges (shuffles), n_broadcasts, n_scans,
    n_codegen_spans, has_cartesian, has_bnl_join (BroadcastNestedLoop —
    fine for 1-row/dim frames, a red flag between facts), pushed_filters
    (list), read_schemas (list of pruned scan schemas), exchange_keys
    (partitioning expressions seen on hash exchanges)."""
    plan = executed_plan(df)
    fmt = formatted_plan(df)
    exchange_keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # toString re-prints a cached relation's ENTIRE build subtree under
    # every InMemoryTableScan that references it, though the build
    # executes once — dedupe ONLY lines inside those subtrees (keyed on
    # content, shared across all InMemoryTableScans of the same cache).
    # Lines outside any cached subtree count per occurrence: an UNCACHED
    # subtree shared by two plan branches prints with identical
    # expression ids too but genuinely executes per branch, so a global
    # content-dedup would hide exactly the cache-removal regressions the
    # scan ceilings exist to catch.
    uniq = _runtime_lines(plan)
    return {
        "n_exchanges": sum(
            1 for line in uniq if "Exchange " in line and "Reused" not in line
        ),
        "n_broadcasts": sum(1 for line in uniq if "BroadcastExchange" in line),
        "n_scans": sum(1 for line in uniq if "FileScan" in line or "BatchScan" in line),
        "n_codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "has_cartesian": "CartesianProduct" in plan,
        "has_bnl_join": "BroadcastNestedLoopJoin" in plan,
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", fmt),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", fmt),
        "exchange_keys": exchange_keys,
    }


def assert_scalable(
    df: DataFrame,
    max_exchanges: int | None = None,
    allow_bnl: bool = True,
    require_pushdown: bool = False,
) -> dict:
    """Raise AssertionError on the plan shapes that kill 100× scale-ups:
    cartesian products always; BroadcastNestedLoop joins unless
    ``allow_bnl`` (they are legitimate for 1-row bound frames); more
    shuffles than ``max_exchanges`` when given; zero pushed filters when
    ``require_pushdown``. Returns the feature dict for further checks."""
    f = plan_features(df)
    assert not f["has_cartesian"], "plan contains a CartesianProduct"
    if not allow_bnl:
        assert not f["has_bnl_join"], "plan contains BroadcastNestedLoopJoin"
    if max_exchanges is not None:
        assert f["n_exchanges"] <= max_exchanges, (
            f"{f['n_exchanges']} exchanges > allowed {max_exchanges}"
        )
    if require_pushdown:
        assert any(p.strip() for p in f["pushed_filters"]), "no filters pushed to scan"
    return f


_PLANS_HEADER = """# Physical-plan audit

Scale-relevant features of every registered query's physical plan at
sf0.001 (regenerate: `python -m collimate_spark.plans`). Columns:
shuffles = Exchange nodes (excluding reuse), scans = FileScan/BatchScan
count, bcast = BroadcastExchange count, wscg = distinct WholeStageCodegen
spans, cart/bnlj = CartesianProduct / BroadcastNestedLoopJoin present
(bnlj is legitimate only against 1-row/dimension frames; the blanket test
tests/test_plans.py::test_no_cartesian_products_anywhere enforces the
cartesian ban). Oracle = driver-verifiable DuckDB twin registered.
Iterative operators (kcore, pagerank, CC) report their FINAL composed
plan; per-round shapes are described in their docstrings.

| query | shuffles | scans | bcast | wscg | cart | bnlj | oracle |
|---|---|---|---|---|---|---|---|
"""


def regenerate_plans_md(out_path: str, sf_dir: str = "/root/testdata/sf0.001") -> str:
    """Rebuild the PLANS.md audit table over every registered query."""
    import io

    from pyspark.sql import SparkSession

    from collimate_spark.operators import all_oracles, all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("plan-audit")
        .getOrCreate()
    )
    queries, oracles = all_queries(), all_oracles()
    buf = io.StringIO()
    buf.write(_PLANS_HEADER)
    max_sh, max_q, n_cart = -1, "", 0
    for name in sorted(queries):
        f = plan_features(queries[name](spark, sf_dir))
        # matches the audit's historical definition: every Exchange node
        # (broadcast exchanges included; the bcast column isolates those)
        sh = f["n_exchanges"]
        if sh > max_sh:
            max_sh, max_q = sh, name
        n_cart += bool(f["has_cartesian"])
        buf.write(
            "| {} | {} | {} | {} | {} | {} | {} | {} |\n".format(
                name,
                sh,
                f["n_scans"],
                f["n_broadcasts"],
                f["n_codegen_spans"],
                "X" if f["has_cartesian"] else "",
                "X" if f["has_bnl_join"] else "",
                "yes" if name in oracles else "rows-only",
            )
        )
    buf.write(
        f"\n{len(queries)} queries audited; {n_cart} cartesian products; "
        f"max shuffles {max_sh} ({max_q}).\n"
    )
    text = buf.getvalue()
    with open(out_path, "w") as fh:
        fh.write(text)
    return text


if __name__ == "__main__":
    import os
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    regenerate_plans_md(out)
    print(f"wrote {out}")
