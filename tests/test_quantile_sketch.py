"""Mergeable quantile summary: error bound vs exact percentile, summary
size bound, and determinism for a fixed partition layout."""

from __future__ import annotations

import pyspark.sql.functions as F

from collimate_spark.catalog import load_table
from collimate_spark.operators.stats import QS_K, QS_TARGETS, quantile_sketch_value


def test_quantile_sketch_error_bound(spark, sf_dir):
    est = quantile_sketch_value(spark, sf_dir).collect()[0]
    ev = load_table(spark, "events", sf_dir)
    n_parts = ev.select("value").rdd.getNumPartitions()
    assert est.n_summary_rows <= n_parts * QS_K
    exact = ev.agg(
        *[
            F.expr(f"percentile(value, {p})").alias(f"p{int(p*100):02d}")
            for p in QS_TARGETS
        ]
    ).collect()[0]
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    spread = hi - lo
    for p in QS_TARGETS:
        k = f"p{int(p*100):02d}"
        # rank error <= n_parts/QS_K of total rank mass; translate into a
        # loose value tolerance via the distribution spread
        assert abs(est[k] - exact[k]) <= 0.05 * spread, (k, est[k], exact[k])


def test_quantile_sketch_deterministic(spark, sf_dir):
    a = quantile_sketch_value(spark, sf_dir).collect()
    b = quantile_sketch_value(spark, sf_dir).collect()
    assert a == b


def test_countmin_guarantees(spark, sf_dir):
    """CM invariants on real data: estimates NEVER undercount (the
    structural guarantee — holds for EVERY word under ANY hash), and the
    probabilistic ε-bound holds in aggregate: P[overcount > e·N/W] ≤
    e^-D per word, so with D=4 at most a small fraction of the
    vocabulary may exceed e·N/W (the earlier all-words-within-4·N/W
    assertion was hash-lottery, not a CM property — it broke the moment
    the hash changed). Plus determinism across runs (the sketch is
    linear, so the merged matrix is partition-grid-independent)."""
    import math

    from collimate_spark.operators.stats import CM_W, countmin_word_frequencies

    rows = countmin_word_frequencies(spark, sf_dir).collect()
    assert rows
    n_total = sum(r.freq for r in rows)
    eps_bound = math.e * n_total / CM_W
    over_eps = 0
    for r in rows:
        assert r.overcount >= 0, (r.word, r.freq, r.cm_est)
        # hard sanity ceiling: no estimate can exceed the corpus size
        assert r.cm_est <= n_total, (r.word, r.cm_est)
        if r.overcount > eps_bound:
            over_eps += 1
    # e^-4 ≈ 1.8% per word; allow up to 10% of the vocab as slack
    assert over_eps <= max(1, len(rows) // 10), (over_eps, len(rows))
    a = [tuple(x) for x in countmin_word_frequencies(spark, sf_dir).collect()]
    assert a == [tuple(x) for x in rows]  # deterministic


def test_hll_native_relative_error(spark, sf_dir):
    """Native DataSketches HLL estimates within 5% of exact per group,
    and the <all> union estimate within 5% of global exact."""
    import pyspark.sql.functions as FF

    from collimate_spark.catalog import load_table
    from collimate_spark.operators.udx import hll_native_distinct

    got = {r.o_orderpriority: r.est_distinct for r in hll_native_distinct(spark, sf_dir).collect()}
    orders = load_table(spark, "orders", sf_dir)
    exact = {
        r.o_orderpriority: r.d
        for r in orders.groupBy("o_orderpriority")
        .agg(FF.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    exact["<all>"] = orders.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / max(e, 1) <= 0.05, (k, got[k], e)


def test_approx_percentile_rank_error_bound(spark, sf_dir):
    """The GK guarantee behind approx_percentile_error: the approx
    quantile is an actual data element whose RANK is within
    max(1, n/accuracy) of the target rank."""
    import bisect

    from collimate_spark.catalog import load_table
    from collimate_spark.operators.stats import _APPROX_ACC, approx_percentile_error

    rep = {r["event_type"]: r for r in approx_percentile_error(spark, sf_dir).collect()}
    ev = load_table(spark, "events", sf_dir).select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        tol_rank = max(1.0, n / _APPROX_ACC)
        for q, col in ((0.5, "approx_p50"), (0.95, "approx_p95")):
            approx = rep[et][col]
            # rounded to 4 decimals in the report; find nearest element
            i = bisect.bisect_left(vals, approx - 5e-4)
            j = bisect.bisect_right(vals, approx + 5e-4)
            assert j > i, f"{et} {col}={approx} is not a data element"
            target = q * (n - 1)
            assert i - tol_rank - 1 <= target <= j + tol_rank, (
                f"{et} {col} rank window [{i},{j}] vs target {target}"
            )


def test_hll_intersection_error_bound(spark, sf_dir):
    """Derived HLL intersection (inclusion-exclusion) must land within a
    union-scaled error envelope of the exact overlap: each of the three
    estimates carries ~1.6% HLL error at default lgK, so the derived
    intersection's absolute error is bounded by ~3 × 2% of the UNION
    size (generous envelope; the point is it scales with |A∪B|, not
    |A∩B|)."""
    from collimate_spark.operators.udx import hll_intersection_users

    r = hll_intersection_users(spark, sf_dir).collect()[0]
    envelope = 3 * 0.02 * max(r.est_union, 1) + 1
    assert abs(r.est_intersection - r.exact_intersection) <= envelope, r
