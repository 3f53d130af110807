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
    return {
        "n_exchanges": sum(
            1 for line in plan.splitlines() if "Exchange " in line and "Reused" not in line
        ),
        "n_broadcasts": plan.count("BroadcastExchange"),
        "n_scans": plan.count("FileScan") + plan.count("BatchScan"),
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
